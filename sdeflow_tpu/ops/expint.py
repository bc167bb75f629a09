"""Exponential integrators (DPM-Solver family) for the VP-SDE PF-ODE.

No reference counterpart: the reference samples only through the
stochastic reverse SDE at 128 RK4 steps = 512 score-net evaluations
(sde_scheme.py:44-269, MSGM_higherDim.py:903). For the SGM VP-SDE
(SDEs.py:161-215) the probability-flow ODE's linear drift −½β(s)y can be
integrated *exactly* in closed form, leaving only the learned score term
to quadrature — the DPM-Solver insight (Lu et al. 2022): change variables
to the log-SNR λ(s) = log(α(s)/σ(s)) and the solution is

    y(s_next) = (α_next/α_cur)·y(s_cur) − σ_next ∫ e^{λ−λ_next} ε̂ dλ

with ε̂ the noise-prediction head. Taylor-expanding ε̂ in λ gives solvers
whose per-step error is O(h^{k+1}) in λ-steps *without* discretizing the
stiff linear part, so 8–16 score evaluations reach the quality the
generic RK4 path needs hundreds for — a pure serving-throughput lever.

Implemented orders (the ``method`` names used across serving/config/CLI):
  * ``dpm1``  — first order; identical to DDIM. 1 NFE/step.
  * ``dpm2``  — single-step midpoint (DPM-Solver-2, r=½). 2 NFE/step.
  * ``dpm2m`` — multistep data-prediction (DPM-Solver++ 2M). 1 NFE/step;
                the serving default.
  * ``sdpm1`` — STOCHASTIC first order (SDE-DPM-Solver-1, Lu et al. 2022
                App. — the reverse diffusion SDE with the linear part
                integrated exactly and the injected noise carrying its
                exact conditional variance σ_r²(e^{2h}−1)). 1 NFE/step;
                needs a PRNG key; the exponential counterpart of the
                Euler–Maruyama reverse step.
  * ``dpm3m`` — third-order multistep data-prediction (DPM-Solver++ 3M):
                two extra history slots in the scan carry buy an O(h⁴)
                local error at the same 1 NFE/step; warms up through
                1st→2nd order on the first two intervals.
  * ``sdpm2m`` — STOCHASTIC multistep data-prediction
                (SDE-DPM-Solver++(2M), Lu et al. 2022b): the same
                exact-variance noise in the half-annealed e^{−h} form,
                with the 2nd-order multistep x̂ extrapolation of dpm2m.
                1 NFE/step; needs a PRNG key; repairs sdpm1's blow-up
                below ~16 steps (measured in ODE_STUDY_CPU.json).

Scope: SDEs with a closed-form Gaussian forward kernel (``mean_weight`` /
``var``), i.e. SGM. MSGM's state-dependent skew diffusion has no such
kernel — its linear part is not diagonalizable per-sample — so this module
gates on the same capability probe as ``PluginReverseSDE.dsm``.

TPU design: the time grid (uniform in λ by default — the standard choice;
``grid="time"`` for uniform s) and all per-step coefficients are
precomputed as O(num_steps) elementwise tensors OUTSIDE the scan, via a
dense monotone interpolation of λ(s) (schedule-agnostic: no closed-form
schedule inversion needed). The solve itself is a single ``lax.scan`` whose
body is one (or two) score-net calls plus axpy updates — fully static
shapes, no data-dependent control flow.

The score/noise bridge: the SSM loss trains a ≈ gᵀ∇log q = √β·∇log q
(SDEs.py:617-646), so ε̂(y,s) = −σ(s)·∇log p ≈ −(σ(s)/√β(s))·a(y,s).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NFE_PER_STEP = {"dpm1": 1, "dpm2": 2, "dpm2m": 1, "dpm3m": 1,
                 "sdpm1": 1, "sdpm2m": 1}


def _check_kernel(base_sde):
    if not (hasattr(base_sde, "mean_weight") and hasattr(base_sde, "var")):
        raise ValueError(
            "DPM-Solver sampling requires a closed-form Gaussian forward "
            "kernel (mean_weight/var), i.e. the SGM VP-SDE; got "
            f"{type(base_sde).__name__}. Use sampler='sde'/'ode' for MSGM."
        )


def _dense_table(base_sde, dtype, dense=4096):
    """(s_dense increasing, λ(s_dense) decreasing) over [t_epsilon, T] —
    the monotone table both the grid and the dpm2 midpoints interpolate."""
    T = jnp.asarray(base_sde.T, dtype)
    t_eps = jnp.asarray(base_sde.t_epsilon, dtype)
    s_dense = jnp.linspace(t_eps, T, dense, dtype=dtype)
    return s_dense, _lam(base_sde, s_dense)


def _s_of_lambda(lam_targets, s_dense, lam):
    """Invert λ(s) by interpolation (xp must increase: reverse both)."""
    return jnp.interp(lam_targets, lam[::-1], s_dense[::-1])


def _grid(base_sde, num_steps, dtype, grid="logsnr", dense=4096):
    """Time grid s_0=T > s_1 > … > s_N = t_epsilon, (N+1,).

    ``logsnr``: uniform in λ(s) = log α − log σ, found by interpolating a
    dense monotone λ(s) table (works for any β schedule, traceable under
    jit). ``time``: uniform in s. ``karras``: the EDM ρ=7 schedule on the
    noise scale e^{−λ} — denser steps at low noise.
    """
    T = jnp.asarray(base_sde.T, dtype)
    t_eps = jnp.asarray(base_sde.t_epsilon, dtype)
    if grid == "time":
        return jnp.linspace(T, t_eps, num_steps + 1, dtype=dtype)
    if grid == "karras":
        # EDM ρ-schedule (Karras et al. 2022, eq. 5) on the VP noise scale
        # σ_edm(s) = σ(s)/α(s) = e^{−λ(s)}: steps cluster at LOW noise,
        # where the data manifold sharpens — the standard low-NFE lever.
        s_dense, lam = _dense_table(base_sde, dtype, dense)
        rho = 7.0
        sig_max = jnp.exp(-lam[-1])  # λ(T): the high-noise end
        sig_min = jnp.exp(-lam[0])   # λ(t_eps): the low-noise end
        r = jnp.linspace(0.0, 1.0, num_steps + 1, dtype=dtype)
        inv = 1.0 / rho
        sig = (sig_max**inv + r * (sig_min**inv - sig_max**inv)) ** rho
        s = _s_of_lambda(-jnp.log(sig), s_dense, lam)
        return s.at[0].set(T).at[-1].set(t_eps)
    if grid != "logsnr":
        raise ValueError(f"unknown dpm grid {grid!r} (logsnr|time|karras)")
    s_dense, lam = _dense_table(base_sde, dtype, dense)
    lam_targets = jnp.linspace(lam[-1], lam[0], num_steps + 1, dtype=dtype)
    s = _s_of_lambda(lam_targets, s_dense, lam)
    # targets run λ(T)→λ(t_eps), i.e. s runs T→t_eps; pin the endpoints
    return s.at[0].set(T).at[-1].set(t_eps)


def _lam(base_sde, s):
    alpha = base_sde.mean_weight(s)
    return jnp.log(alpha) - 0.5 * jnp.log(base_sde.var(s))


def integrate_dpm(
    flow,
    x0,
    num_steps,
    *,
    method="dpm2m",
    grid="logsnr",
    keep_all=False,
    include_t0=False,
    key=None,
):
    """Solve the reverse process with a DPM-Solver exponential integrator.

    Args:
      flow: PluginReverseSDE over an SDE with a closed-form kernel (SGM).
      x0: (B, d) latents from ``flow.latent_sample`` (the s=T prior).
      num_steps: static grid-interval count (NFE = num_steps × 1 or 2).
      method: "dpm1" | "dpm2" | "dpm2m" | "dpm3m" | "sdpm1" | "sdpm2m"
        (see module docstring).
      grid: "logsnr" (default) | "time" | "karras" (EDM ρ=7 schedule).
      keep_all / include_t0: trajectory capture, as in integrate_ode.
      key: PRNG key — required by (and only by) the stochastic methods
        "sdpm1" and "sdpm2m".

    The dpm1/dpm2/dpm2m/dpm3m paths are deterministic (no PRNG key), like
    ``ops.ode.integrate_ode``; sdpm1/sdpm2m solve the reverse diffusion SDE.
    """
    if method not in _NFE_PER_STEP:
        raise ValueError(
            f"unknown dpm method {method!r} "
            "(dpm1|dpm2|dpm2m|dpm3m|sdpm1|sdpm2m)"
        )
    if method.startswith("sdpm") and key is None:
        raise ValueError(f"{method} is stochastic: pass key=")
    base = flow.base_sde
    _check_kernel(base)
    x0 = jnp.asarray(x0)
    dtype = x0.dtype

    s = _grid(base, num_steps, dtype, grid=grid)  # (N+1,) T → t_eps
    s_mid = None
    if method == "dpm2":
        lam_g = _lam(base, s)
        lam_mid = 0.5 * (lam_g[:-1] + lam_g[1:])
        s_mid = _s_of_lambda(lam_mid, *_dense_table(base, dtype))

    def coefs(sv):
        alpha = base.mean_weight(sv)
        sigma = jnp.sqrt(base.var(sv))
        lam = jnp.log(alpha) - jnp.log(sigma)
        # ε̂ = −(σ/√β)·a : precompute the per-grid-point scale
        c_eps = sigma / jnp.sqrt(base.beta(sv))
        return alpha, sigma, lam, c_eps

    alpha, sigma, lam, c_eps = coefs(s)

    def eps_hat(y, sv, c):
        return -c * flow.score(y, sv)

    # per-interval packed coefficients, all shape (N,)
    xs = dict(
        s_cur=s[:-1], a_cur=alpha[:-1], c_cur=c_eps[:-1],
        a_nxt=alpha[1:], sg_nxt=sigma[1:], sg_cur=sigma[:-1],
        h=lam[1:] - lam[:-1],  # > 0: λ rises as s falls
        i=jnp.arange(num_steps),
    )
    if method == "dpm2":
        a_m, sg_m, _, c_m = coefs(s_mid)
        xs.update(s_mid=s_mid, a_mid=a_m, sg_mid=sg_m, c_mid=c_m)

    if method == "dpm1":

        def body(y, p):
            e = eps_hat(y, p["s_cur"], p["c_cur"])
            y = (p["a_nxt"] / p["a_cur"]) * y - p["sg_nxt"] * jnp.expm1(p["h"]) * e
            return y, (y if keep_all else None)

        carry0 = x0
    elif method == "sdpm1":

        def body(y, p):
            e = eps_hat(y, p["s_cur"], p["c_cur"])
            z = jax.random.normal(
                jax.random.fold_in(key, p["i"]), y.shape, y.dtype
            )
            y = (
                (p["a_nxt"] / p["a_cur"]) * y
                - 2.0 * p["sg_nxt"] * jnp.expm1(p["h"]) * e
                + p["sg_nxt"] * jnp.sqrt(jnp.expm1(2.0 * p["h"])) * z
            )
            return y, (y if keep_all else None)

        carry0 = x0
    elif method == "dpm2":

        def body(y, p):
            e1 = eps_hat(y, p["s_cur"], p["c_cur"])
            u = (p["a_mid"] / p["a_cur"]) * y - p["sg_mid"] * jnp.expm1(
                0.5 * p["h"]
            ) * e1
            e2 = eps_hat(u, p["s_mid"], p["c_mid"])
            y = (p["a_nxt"] / p["a_cur"]) * y - p["sg_nxt"] * jnp.expm1(p["h"]) * e2
            return y, (y if keep_all else None)

        carry0 = x0
    elif method == "dpm3m":
        # DPM-Solver++(3M), Lu et al. 2022b: third-order multistep on the
        # data prediction x̂. Carry holds the two previous x̂ and λ-steps;
        # the first two intervals warm up at order 1 / order 2 (the same
        # masked-coefficient trick as dpm2m's first step — no cond needed,
        # the scan body stays a single fused program).

        def body(carry, p):
            y, m1, m2, h1, h2 = carry
            e = eps_hat(y, p["s_cur"], p["c_cur"])
            m0 = (y - p["sg_cur"] * e) / p["a_cur"]
            h = p["h"]
            r0, r1 = h1 / h, h2 / h
            d1_0 = (m0 - m1) / r0
            d1_1 = (m1 - m2) / r1
            d1 = d1_0 + r0 / (r0 + r1) * (d1_0 - d1_1)
            d2 = (d1_0 - d1_1) / (r0 + r1)
            phi1 = jnp.expm1(-h)
            phi2 = phi1 / h + 1.0
            phi3 = phi2 / h - 0.5
            # order-3 correction; order-2 (−½φ₁D1_0) on interval 1; none
            # on interval 0 (history slots hold zeros/dummy h's there)
            corr = jnp.where(
                p["i"] == 0, 0.0,
                jnp.where(p["i"] == 1, -0.5 * phi1 * d1_0,
                          phi2 * d1 - phi3 * d2),
            )
            y = (
                (p["sg_nxt"] / p["sg_cur"]) * y
                - p["a_nxt"] * phi1 * m0
                + p["a_nxt"] * corr
            )
            return (y, m0, m1, p["h"], h1), (y if keep_all else None)

        carry0 = (x0, jnp.zeros_like(x0), jnp.zeros_like(x0),
                  jnp.ones((), dtype), jnp.ones((), dtype))
    elif method == "sdpm2m":
        # SDE-DPM-Solver++(2M): x_r = (σ_r/σ_s)e^{−h} x_s
        #   + α_r(1−e^{−2h})·D + σ_r√(1−e^{−2h})·z, D the 2nd-order
        # multistep x̂ extrapolation. Exact-variance check: with x̂ frozen
        # the update's stationary response reproduces the kernel's
        # conditional law (same derivation route as sdpm1, with the noise
        # split between the decayed state and the injected z).

        def body(carry, p):
            y, x_prev, h_prev = carry
            e = eps_hat(y, p["s_cur"], p["c_cur"])
            x_pred = (y - p["sg_cur"] * e) / p["a_cur"]
            coef = jnp.where(p["i"] == 0, 0.0, p["h"] / (2.0 * h_prev))
            D = x_pred + coef * (x_pred - x_prev)
            z = jax.random.normal(
                jax.random.fold_in(key, p["i"]), y.shape, y.dtype
            )
            decay = jnp.exp(-p["h"])
            y = (
                (p["sg_nxt"] / p["sg_cur"]) * decay * y
                - p["a_nxt"] * jnp.expm1(-2.0 * p["h"]) * D
                + p["sg_nxt"] * jnp.sqrt(-jnp.expm1(-2.0 * p["h"])) * z
            )
            return (y, x_pred, p["h"]), (y if keep_all else None)

        carry0 = (x0, jnp.zeros_like(x0), jnp.ones((), dtype))
    else:  # dpm2m — multistep data prediction (DPM-Solver++ 2M)

        def body(carry, p):
            y, x_prev, h_prev = carry
            e = eps_hat(y, p["s_cur"], p["c_cur"])
            x_pred = (y - p["sg_cur"] * e) / p["a_cur"]
            # 2nd-order multistep correction D = x̂ + (h/2h_prev)(x̂ − x̂_prev);
            # first interval falls back to 1st order (coef 0)
            coef = jnp.where(p["i"] == 0, 0.0, p["h"] / (2.0 * h_prev))
            D = x_pred + coef * (x_pred - x_prev)
            y = (p["sg_nxt"] / p["sg_cur"]) * y - p["a_nxt"] * jnp.expm1(-p["h"]) * D
            return (y, x_pred, p["h"]), (y if keep_all else None)

        carry0 = (x0, jnp.zeros_like(x0), jnp.ones((), dtype))

    carry, traj = jax.lax.scan(body, carry0, xs)
    x_final = carry[0] if method in ("dpm2m", "dpm3m", "sdpm2m") else carry
    if not keep_all:
        return x_final
    if include_t0:
        traj = jnp.concatenate([x0[None], traj], axis=0)
    return traj


def nfe(method, num_steps):
    """Score-net evaluations for a ``num_steps``-interval DPM solve."""
    return _NFE_PER_STEP[method] * num_steps

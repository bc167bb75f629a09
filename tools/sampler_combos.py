"""Shared sampler:steps combo parsing + solve dispatch for the parity
tools (parity_image_ours.py / parity_signal_ours.py).

One place to wire a new sampler family into the parity harnesses; keeps
the two tools from diverging (they previously carried copy-pasted
dispatch blocks). Combo grammar, used by both tools' --eval flags:
  sde  = rk4 reverse SDE (the reference's path)
  ode  = rk4 probability-flow ODE           (ops/ode.py)
  pc   = em + 1 Langevin corrector step     (ops/integrators.py)
  dopri = adaptive Dormand-Prince PF-ODE    (ops/ode.py; steps = capture
          grid only — the step size is tolerance-controlled)
  dpm   = dpm2m exponential integrator      (ops/expint.py, SGM only)
  dpm3  = dpm3m 3rd-order multistep         (ops/expint.py, SGM only)
  sdpm  = sdpm1 stochastic exponential      (ops/expint.py, SGM only)
  sdpm2 = sdpm2m stochastic 2nd-order       (ops/expint.py, SGM only)
"""

SGM_ONLY = ("dpm", "dpm3", "sdpm", "sdpm2")


def parse_combos(eval_arg, default_steps):
    """"sde:64,ode:8" -> [("sde", 64), ("ode", 8)]; None -> the default."""
    if not eval_arg:
        return [("sde", default_steps)]
    return [
        (c.split(":")[0], int(c.split(":")[1])) for c in eval_arg.split(",")
    ]


def make_solve(samp, steps, is_msgm, dpm_grid="logsnr"):
    """(gen, latents, key) -> samples for one combo. dpm_grid picks the
    exponential-integrator time grid (logsnr | time | karras)."""
    from sdeflow_tpu.ops.expint import integrate_dpm
    from sdeflow_tpu.ops.integrators import integrate_sde
    from sdeflow_tpu.ops.ode import integrate_ode

    def _solve(g, z, k):
        if samp == "ode":
            return integrate_ode(g, z, steps, method="rk4",
                                 norm_correction=bool(is_msgm))
        if samp == "dopri":
            return integrate_ode(g, z, steps, method="dopri",
                                 norm_correction=bool(is_msgm))
        if samp == "dpm":
            return integrate_dpm(g, z, steps, method="dpm2m", grid=dpm_grid)
        if samp == "dpm3":
            return integrate_dpm(g, z, steps, method="dpm3m", grid=dpm_grid)
        if samp == "sdpm":
            return integrate_dpm(g, z, steps, method="sdpm1", key=k,
                                 grid=dpm_grid)
        if samp == "sdpm2":
            return integrate_dpm(g, z, steps, method="sdpm2m", key=k,
                                 grid=dpm_grid)
        return integrate_sde(
            g, z, k, steps, method="em" if samp == "pc" else "rk4",
            norm_correction=bool(is_msgm),
            corrector_steps=1 if samp == "pc" else 0,
        )

    return _solve

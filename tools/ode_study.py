"""Samplers study: quality (√MMD) vs NFE + throughput, across the
stochastic reverse SDE (the reference's only path), the probability-flow
ODE, and predictor-corrector sampling.

The reference generates only through the stochastic reverse SDE
(/root/reference/sde_scheme.py:44-269), defaulting to 128 RK4 steps
(/root/reference/MSGM_higherDim.py:903). The probability-flow ODE
(ops/ode.py) shares the SDE's marginals but integrates a smooth
deterministic trajectory, so it typically reaches the same sample quality
with far fewer score-net evaluations (NFE) — a serving-throughput lever
the reference does not have.

This trains the quality-parity arms (SGM + MSGM swissroll, the
tools/parity_ours_run.py config) once each, then sweeps
sampler x method x steps, recording √MMD against a held-out test set and
device-honest samples/s (utils.profiling.device_seconds — the remote
runtime does not honor block_until_ready). Writes ODE_STUDY.json.

Usage:
    python tools/ode_study.py                     # TPU, full sweep
    python tools/ode_study.py --cpu --iters 2048  # smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# (sampler_kind, method, corrector_steps)
SAMPLER_GRID = (
    ("sde", "em", 0),     # the cheapest stochastic baseline
    ("sde", "rk4", 0),    # the reference's choice
    ("ode", "rk4", 0),    # deterministic PF-ODE
    ("sde", "em", 1),     # predictor-corrector (1 Langevin step / predictor)
    ("dpm", "dpm1", 0),   # DDIM (exponential integrator, order 1) — SGM only
    ("dpm", "dpm2m", 0),  # DPM-Solver++ 2M — SGM only, 1 NFE/step
    ("dpm", "dpm3m", 0),  # DPM-Solver++ 3M — SGM only, 1 NFE/step
    ("dpm", "sdpm1", 0),  # stochastic exponential integrator — SGM only
    ("dpm", "sdpm2m", 0),  # stochastic 2nd-order multistep — SGM only
    ("ode", "dopri", 0),  # adaptive Dormand–Prince — tolerance-targeted,
                          # one row (step count is solver-chosen; nfe null)
)

_EVALS_PER_STEP = {"em": 1, "heun": 2, "rk4": 4,
                   "dpm1": 1, "dpm2": 2, "dpm2m": 1, "dpm3m": 1,
                   "sdpm1": 1, "sdpm2m": 1}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--samples", type=int, default=10_000)
    ap.add_argument("--steps", default="2,4,8,16,32,64,128")
    ap.add_argument("--arms", default="sgm,msgm")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-timing", action="store_true",
                    help="skip device_seconds throughput (quality only)")
    ap.add_argument("--ema-rate", type=float, default=None,
                    help="train with EMA and evaluate the EMA head "
                         "(tools/ema_ablation.py measures raw-vs-EMA; "
                         "this sweeps every sampler on the EMA weights)")
    ap.add_argument("--dpm-grid", default="logsnr",
                    choices=["logsnr", "time", "karras"],
                    help="time grid for the dpm arms (recorded per row)")
    ap.add_argument("--out", default="ODE_STUDY.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdeflow_tpu.data import SwissRoll
    from sdeflow_tpu.eval import compute_mmd
    from sdeflow_tpu.eval.diagnostics import filter_blowups
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.ops.ode import DOPRI_ATOL, DOPRI_RTOL
    from sdeflow_tpu.sde import MSGMSde, PluginReverseSDE, SGMSde
    from sdeflow_tpu.serving import make_sampler_fn
    from sdeflow_tpu.training import Trainer
    from sdeflow_tpu.utils.profiling import device_seconds

    steps_list = [int(s) for s in args.steps.split(",")]
    arms = [a.strip().lower() for a in args.arms.split(",")]
    d = 2
    out = {"backend": jax.default_backend(), "iters": args.iters,
           "samples": args.samples, "rows": [],
           **({"ema_rate": args.ema_rate} if args.ema_rate else {})}

    for is_msgm in (False, True):
        arm = "MSGM" if is_msgm else "SGM"
        if arm.lower() not in arms:
            continue
        print(f"=== training {arm} arm on {jax.default_backend()} ===",
              flush=True)
        key = jax.random.PRNGKey(args.seed)
        sampler = SwissRoll()
        premodule = "NormalizeLogRadius" if is_msgm else None
        model = MLP(input_dim=d, premodule=premodule)
        x_probe = sampler.sample(key, 64)
        variables = model.init(key, x_probe, jnp.zeros((64,)))
        if is_msgm:
            x_init = sampler.sample(jax.random.fold_in(key, 1), 100_000)
            sde = MSGMSde.create(
                jax.random.fold_in(key, 2), x_init, beta_min=0.1,
                beta_max=20.0, t_epsilon=1e-3, num_steps_forward=16,
                dense_tensor=True, norm_sampler="ecdf", norm_map="log",
                estimate_norm_constant=False,
            )
        else:
            sde = SGMSde.create(beta_min=0.1, beta_max=20.0, t_epsilon=1e-3,
                                num_steps_forward=16)
        gen0 = PluginReverseSDE.create(sde, model.apply, variables)
        trainer = Trainer(gen0, sampler, lr=1e-3, batch_size=args.batch,
                          print_every=max(1, args.iters // 2),
                          ema_rate=args.ema_rate)
        t0 = time.perf_counter()
        state, _ = trainer.run(jax.random.fold_in(key, 3), args.iters)
        print(f"trained in {time.perf_counter() - t0:.1f}s", flush=True)
        gen = trainer.ema_gen_sde if args.ema_rate else state.gen_sde

        xtest = sampler.sampletest(jax.random.fold_in(key, 5), args.samples)
        xtrain = sampler.sample(jax.random.fold_in(key, 6), args.samples)
        mmd_floor = float(compute_mmd(xtrain, xtest)) ** 0.5
        k_solve = jax.random.fold_in(key, 4)

        # exact PF-ODE likelihood of the trained arm (eval/nll.py,
        # normalized latent prior) — the density-fit axis alongside the
        # sample-space sqrt-MMD rows; no reference counterpart (ELBO only)
        from sdeflow_tpu.eval.nll import nll_summary

        nll = nll_summary(gen, xtest, jax.random.fold_in(key, 7))
        out[f"nll_bits_per_dim_{arm.lower()}"] = nll
        print(f"{arm} exact NLL = {nll['mean']} bits/dim", flush=True)

        for sampler_kind, method, corr in SAMPLER_GRID:
            if sampler_kind == "dpm" and is_msgm:
                continue  # exponential integrators need the closed-form kernel
            # adaptive: steps only set the (unused) capture grid — one row
            arm_steps = steps_list[:1] if method == "dopri" else steps_list
            for num_steps in arm_steps:
                fn = jax.jit(make_sampler_fn(
                    gen, args.samples, d, num_steps, method=method,
                    norm_correction=bool(is_msgm), sampler=sampler_kind,
                    corrector_steps=corr, dpm_grid=args.dpm_grid,
                ))
                xgen = fn(k_solve)
                xgen_f, dropped = filter_blowups(xgen)
                n = min(xgen_f.shape[0], args.samples)
                mmd = float(
                    compute_mmd(jnp.asarray(xgen_f[:n]), xtest[:n])
                ) ** 0.5
                row = dict(
                    arm=arm, sampler=sampler_kind, method=method,
                    # adaptive: the step count is solver-chosen, governed
                    # by the tolerances (ops/ode.py defaults) — record
                    # those instead of the meaningless capture-grid size
                    steps=(None if method == "dopri" else num_steps),
                    **({"rtol": DOPRI_RTOL, "atol": DOPRI_ATOL}
                       if method == "dopri" else {}),
                    corrector_steps=corr,
                    **({"dpm_grid": args.dpm_grid}
                       if sampler_kind == "dpm" and args.dpm_grid != "logsnr"
                       else {}),
                    nfe=(None if method == "dopri" else
                         num_steps * (_EVALS_PER_STEP[method] + corr)),
                    sqrt_mmd=mmd, sqrt_mmd_floor=mmd_floor,
                    dropped=dropped,
                )
                if not args.no_timing:
                    # fold i into the key so iterations can't be hoisted
                    step = lambda i: jnp.sum(  # noqa: E731
                        fn(jax.random.fold_in(k_solve, i))[0]
                    )
                    sec = device_seconds(step)
                    row["samples_per_s"] = args.samples / sec
                print(json.dumps(row), flush=True)
                out["rows"].append(row)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

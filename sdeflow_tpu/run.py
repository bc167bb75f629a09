"""CLI entry point mirroring `python MSGM_higherDim.py` semantics
(reference: README.md:7-11), with named presets instead of in-file edits:

    python -m sdeflow_tpu.run --preset swissroll
    python -m sdeflow_tpu.run --preset swissroll_dbg --iterations 200
    python -m sdeflow_tpu.run --preset cauchy --eval-mmd --cpu
"""

from __future__ import annotations

import argparse
from dataclasses import replace


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="swissroll",
                   help="experiment preset (append _dbg for the smoke config)")
    p.add_argument("--iterations", type=int, default=None,
                   help="override the iteration sweep with a single value")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--steps-backward", type=int, default=None)
    p.add_argument("--backward-method",
                   choices=["rk4", "heun", "em", "dopri", "dpm1", "dpm2",
                            "dpm2m", "dpm3m", "sdpm1", "sdpm2m"],
                   default=None,
                   help="generation integrator (default rk4; dpm* names "
                        "apply with --sampler dpm; dopri — adaptive "
                        "Dormand-Prince — with --sampler ode)")
    p.add_argument("--sampler", choices=["sde", "ode", "dpm"], default=None,
                   help="generation path: stochastic reverse SDE (default), "
                        "deterministic probability-flow ODE, or DPM-Solver "
                        "exponential integrator (SGM only)")
    p.add_argument("--corrector-steps", type=int, default=None,
                   help="Langevin corrector MCMC steps after each predictor "
                        "step (predictor-corrector sampling; default 0)")
    p.add_argument("--snr", type=float, default=None,
                   help="corrector signal-to-noise step-size knob "
                        "(default 0.16)")
    p.add_argument("--dpm-grid", choices=["logsnr", "time", "karras"],
                   default=None,
                   help="dpm sampler time grid (default logsnr; karras = "
                        "EDM rho=7 noise schedule)")
    p.add_argument("--eval-mmd", action="store_true",
                   help="compute the MMD result tensors")
    p.add_argument("--eval-nll", action="store_true",
                   help="report each trained arm's exact NLL (bits/dim) via "
                        "the PF-ODE likelihood (normalized prior; the "
                        "reference only has the ELBO bound)")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--just-load", action="store_true",
                   help="reload saved sample trajectories instead of sampling")
    p.add_argument("--just-load-mmd", action="store_true",
                   help="reload saved MMD result tensors and regenerate the "
                        "convergence plots (the reference's justLoadmmmd)")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the reference's force_cpu)")
    p.add_argument("--data-root", default=None,
                   help="root for file-backed datasets (../MSGM-data/)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel degree: shard training batches and "
                        "grad-psum over a 'data' mesh axis of this size")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree: shard score-net params over "
                        "a 'model' mesh axis of this size")
    p.add_argument("--attention-impl", choices=["auto", "unfused", "ring"],
                   default=None,
                   help="U-Net attention backend: 'auto' fuses the whole "
                        "heads==1 block into one Pallas program on the "
                        "no-grad TPU path, 'unfused' forces the module "
                        "composition, 'ring' runs sequence-parallel ring "
                        "attention over the mesh's 'model' axis (requires "
                        "--tp > 1)")
    p.add_argument("--ema-rate", type=float, default=None,
                   help="exponential-moving-average rate for the score-net "
                        "params (e.g. 0.999); sampling/eval then use the "
                        "averaged weights (TrainConfig.ema_rate)")
    p.add_argument("--no-ema-warmup", action="store_true",
                   help="disable the min(rate, (1+n)/(10+n)) EMA decay "
                        "warmup (fixed-rate EMA is init-dominated on short "
                        "budgets: 0.999^768 ≈ 0.46 of the weight stays on "
                        "the random init)")
    p.add_argument("--grad-clip", type=float, default=None,
                   help="clip gradients to this global norm before the "
                        "optimizer update (TrainConfig.grad_clip; the "
                        "reference trains unclipped)")
    p.add_argument("--weight-decay", type=float, default=None,
                   help="AdamW decoupled weight decay "
                        "(TrainConfig.weight_decay; default 0 = the "
                        "reference's bare Adam)")
    p.add_argument("--lr-warmup", type=int, default=None,
                   help="linear LR warmup over this many steps "
                        "(TrainConfig.lr_warmup_steps; default 0)")
    p.add_argument("--parameterization", choices=["direct", "eps"],
                   default=None,
                   help="learned-drift output form (TrainConfig"
                        ".parameterization): 'eps' rescales the net output "
                        "by -g/std so the net learns O(1) noise (SGM arms "
                        "only; better-conditioned targets, required for "
                        "bf16 SGM training)")
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="score-net compute dtype (TrainConfig.compute_dtype; "
                        "bfloat16 = mixed precision: fp32 params/optimizer "
                        "state/loss reduction, bf16 matmuls on the MXU)")
    p.add_argument("--print-ram", action="store_true",
                   help="log host RSS + device HBM at each print cadence "
                        "(working version of the reference's dormant "
                        "print_RAM flag, MSGM_higherDim.py:397)")
    p.add_argument("--delay", type=float, default=0.0,
                   help="sleep this many seconds before starting, to stagger "
                        "concurrent runs (the reference's `delayed` flag, "
                        "MSGM_higherDim.py:171-172, 773-776)")
    return p


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)

    if args.delay > 0:
        import time

        print(f"delayed {args.delay}s ...")
        time.sleep(args.delay)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.dp * args.tp > 1:
            # self-provision virtual CPU devices so --dp/--tp smoke runs
            # work without an XLA_FLAGS incantation (same trick as
            # __graft_entry__.dryrun_multichip; no-op if the backend is
            # already initialized with enough devices)
            try:
                jax.config.update("jax_num_cpu_devices", args.dp * args.tp)
            except RuntimeError:
                pass

    from sdeflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from sdeflow_tpu.configs import get_preset
    from sdeflow_tpu.experiments.driver import ExperimentDriver

    if args.data_root:
        from sdeflow_tpu.data import set_data_root

        set_data_root(args.data_root)

    cfg = get_preset(args.preset)
    sweep = cfg.sweep
    if args.iterations is not None:
        sweep = replace(sweep, iterationss=(args.iterations,))
    if args.batch_size is not None:
        sweep = replace(sweep, batch_sizes=(args.batch_size,))
    if args.num_samples is not None:
        sweep = replace(sweep, num_samples=args.num_samples)
    if args.steps_backward is not None:
        sweep = replace(sweep, num_stepss_backward=(args.steps_backward,))
    if args.backward_method is not None:
        sweep = replace(sweep, backward_method=args.backward_method)
    if args.sampler is not None:
        sweep = replace(sweep, sampler=args.sampler)
    # fail fast on an invalid combo instead of a KeyError after training:
    # dpm* method names only exist under the dpm sampler
    if sweep.backward_method.startswith(("dpm", "sdpm")) and \
            sweep.sampler != "dpm":
        parser.error(
            f"--backward-method {sweep.backward_method} requires "
            "--sampler dpm (exponential integrators, ops/expint.py)"
        )
    if sweep.backward_method == "dopri" and sweep.sampler != "ode":
        parser.error(
            "--backward-method dopri requires --sampler ode (adaptive "
            "probability-flow solve, ops/ode.py)"
        )
    if args.dpm_grid is not None:
        if sweep.sampler != "dpm":
            parser.error("--dpm-grid only applies with --sampler dpm")
        sweep = replace(sweep, dpm_grid=args.dpm_grid)
    if args.corrector_steps is not None:
        sweep = replace(sweep, corrector_steps=args.corrector_steps)
    if args.snr is not None:
        sweep = replace(sweep, snr=args.snr)
    if args.eval_mmd:
        sweep = replace(sweep, eval_mmd=True)
    if args.eval_nll:
        sweep = replace(sweep, eval_nll=True)
    if args.print_ram:
        cfg = replace(cfg, train=replace(cfg.train, print_ram=True))
    if args.grad_clip is not None:
        cfg = replace(cfg, train=replace(cfg.train, grad_clip=args.grad_clip))
    if args.weight_decay is not None:
        cfg = replace(
            cfg, train=replace(cfg.train, weight_decay=args.weight_decay)
        )
    if args.lr_warmup is not None:
        cfg = replace(
            cfg, train=replace(cfg.train, lr_warmup_steps=args.lr_warmup)
        )
    if args.parameterization is not None:
        cfg = replace(
            cfg, train=replace(cfg.train, parameterization=args.parameterization)
        )
    if args.compute_dtype is not None:
        cfg = replace(
            cfg, train=replace(cfg.train, compute_dtype=args.compute_dtype)
        )
    if args.ema_rate is not None:
        cfg = replace(cfg, train=replace(cfg.train, ema_rate=args.ema_rate))
    if args.no_ema_warmup:
        cfg = replace(cfg, train=replace(cfg.train, ema_warmup=False))
    if args.attention_impl is not None:
        if args.attention_impl == "ring" and args.tp <= 1:
            raise SystemExit("--attention-impl ring requires --tp > 1 "
                             "(the ring shards the sequence over 'model')")
        cfg = replace(
            cfg, train=replace(cfg.train, attention_impl=args.attention_impl)
        )
    cfg = replace(cfg, sweep=sweep, results_dir=args.results_dir,
                  seed=args.seed)

    mesh = None
    if args.dp * args.tp > 1:
        from sdeflow_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=args.dp, n_model=args.tp)
        print(f"mesh = {dict(mesh.shape)} over {args.dp * args.tp} devices")

    print(f"preset = {cfg.name}; backend = {jax.default_backend()}")
    driver = ExperimentDriver(cfg, make_plots=not args.no_plots, mesh=mesh)
    if args.just_load_mmd:
        results = driver.load_mmd_and_plot()
    else:
        results = driver.run(jax.random.PRNGKey(args.seed),
                             just_load=args.just_load)
    if args.eval_mmd:
        import numpy as np

        print("sqrt-MMD SGM:", np.sqrt(np.maximum(results["mmd_sgm"], 0)).mean())
        print("sqrt-MMD MSGM:", np.sqrt(np.maximum(results["mmd_msgm"], 0)).mean())
        print("sqrt-MMD floor:", np.sqrt(np.maximum(results["mmd_ref"], 0)).mean())
    if args.eval_nll and results.get("nll_bits_per_dim"):
        for arm, v in results["nll_bits_per_dim"].items():
            print(f"NLL bits/dim [{arm}]: {v['mean']:.4f} ± {v['stderr']:.4f}")
    return results


if __name__ == "__main__":
    main()

"""Signal-config quality parity: sdeflow_tpu's UNet1D arm on the
synthetically integrated Lorenz-63 delay-window dataset.

Mirrors tools/parity_signal_reference.py exactly (same fixture file via
tools/l63_fixture.py, loaded through our own file-backed data.Lorenz63
pipeline; same sparse d=1000 Unet1D hyperparameters from
MSGM_higherDim.py:186-191/178-202; same budget/metric). Writes
parity_signal_ours.json. Run on TPU (default backend) or --cpu.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.l63_fixture import ensure_fixture


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=768)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--steps-back", type=int, default=64)
    ap.add_argument("--arms", default="sgm,msgm")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-root", default="/tmp/l63_parity_data")
    ap.add_argument("--archi", default="unet1d", choices=["unet1d", "dit"],
                    help="score net: the reference-parity UNet1D or the "
                         "MXU-native DiT (models/dit.py, measured-default "
                         "shape) — same SDE/training/eval harness")
    ap.add_argument("--eval", default=None,
                    help="comma list of sampler:steps combos to evaluate on "
                         "the SAME trained model (sde = rk4 reverse SDE, "
                         "the reference path; ode = rk4 PF-ODE; dopri = "
                         "adaptive Dormand-Prince PF-ODE; pc = em + 1 "
                         "Langevin corrector step; dpm/dpm3 = dpm2m/dpm3m "
                         "and sdpm/sdpm2 = stochastic sdpm1/sdpm2m, SGM arm "
                         "only — full grammar in tools/sampler_combos.py). "
                         "Default: sde:<steps-back>")
    ap.add_argument("--dpm-grid", default="logsnr",
                    choices=["logsnr", "time", "karras"],
                    help="time grid for dpm/sdpm/sdpm2 combos")
    ap.add_argument("--ema-rate", type=float, default=None,
                    help="train with EMA and evaluate the EMA head. The "
                         "parity arms stay EMA-off (the reference protocol "
                         "never calls its update_ema); --ema-rate 0.999 is "
                         "the production-mode measurement")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="score-net compute dtype. The parity arms stay "
                         "fp32 (the reference is pure-fp32 CUDA); bfloat16 "
                         "is the production mixed-precision measurement "
                         "(fp32 params/optimizer/loss reduction)")
    ap.add_argument("--parameterization", default="direct",
                    choices=["direct", "eps"],
                    help="SGM-arm output parameterization (sde/reverse.py). "
                         "The parity arms stay direct (the reference learns "
                         "a directly); 'eps' is the production bf16 pairing "
                         "— the net learns O(1) noise. MSGM arms always run "
                         "direct (no closed-form kernel)")
    ap.add_argument("--out", default="parity_signal_ours.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdeflow_tpu.data import Lorenz63, set_data_root
    from sdeflow_tpu.models import UNet1D
    from sdeflow_tpu.sde import SGMSde, MSGMSde, PluginReverseSDE
    from sdeflow_tpu.training import Trainer
    from sdeflow_tpu.eval import compute_mmd
    from sdeflow_tpu.eval.diagnostics import filter_blowups
    from sdeflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ensure_fixture(args.data_root)
    set_data_root(args.data_root)

    arms = [a.strip().lower() for a in args.arms.split(",")]
    results = []
    for is_msgm in (False, True):
        arm = "MSGM" if is_msgm else "SGM"
        if arm.lower() not in arms:
            continue
        print(f"running {arm} signal arm on {jax.default_backend()}...",
              flush=True)
        key = jax.random.PRNGKey(args.seed)
        sampler = Lorenz63(dim=1000, normalized=True)
        d = sampler.dim
        premodule = "NormalizeLogRadius" if is_msgm else None
        dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                 else jnp.float32)
        if args.archi == "dit":
            from sdeflow_tpu.models import DiT1D

            model = DiT1D(input_dim=d, premodule=premodule, dtype=dtype)
        else:
            model = UNet1D(input_dim=d, base_channels=32,
                           channel_mults=(1, 2, 4), num_res_blocks=2,
                           premodule=premodule, emb_dim=128, dtype=dtype)
        x_probe = sampler.sample(key, 8)
        variables = model.init(key, x_probe, jnp.zeros((8,)))
        beta_min, beta_max, t_eps, steps_fwd = 0.1, 20.0, 1e-3, 16
        if is_msgm:
            x_init = sampler.sample(
                jax.random.fold_in(key, 1),
                min(100_000, args.iters * args.batch),
            )
            sde = MSGMSde.create(
                jax.random.fold_in(key, 2), x_init, beta_min=beta_min,
                beta_max=beta_max, t_epsilon=t_eps,
                num_steps_forward=steps_fwd, dense_tensor=False,
                norm_sampler="ecdf", norm_map="log",
                estimate_norm_constant=False,
            )
        else:
            sde = SGMSde.create(beta_min=beta_min, beta_max=beta_max,
                                t_epsilon=t_eps, num_steps_forward=steps_fwd)
        if is_msgm and args.parameterization != "direct":
            print("MSGM arm: parameterization forced to direct "
                  "(no closed-form kernel)", file=sys.stderr)
        if (not is_msgm and args.compute_dtype == "bfloat16"
                and args.parameterization == "direct"):
            print("hint: SGM + bfloat16 + direct parameterization measured "
                  "~4x worse (BF16_ABLATION_UNET1D.json); production bf16 "
                  "runs should pair --compute-dtype bfloat16 with "
                  "--parameterization eps", file=sys.stderr)
        gen = PluginReverseSDE.create(
            sde, model.apply, variables,
            parameterization="direct" if is_msgm else args.parameterization)
        trainer = Trainer(gen, sampler, lr=1e-4, batch_size=args.batch,
                          print_every=max(1, args.iters // 8),
                          ema_rate=args.ema_rate)
        t0 = time.perf_counter()
        state, final_loss = trainer.run(jax.random.fold_in(key, 3), args.iters)
        train_s = time.perf_counter() - t0
        gen_eval = trainer.ema_gen_sde if args.ema_rate else state.gen_sde

        from tools.sampler_combos import SGM_ONLY, make_solve, parse_combos

        combos = parse_combos(args.eval, args.steps_back)

        k_lat, k_solve = jax.random.split(jax.random.fold_in(key, 4))
        x0 = gen_eval.latent_sample(k_lat, args.samples, d)
        xtest = sampler.sampletest(jax.random.fold_in(key, 5), args.samples)
        xtrain = sampler.sample(jax.random.fold_in(key, 6), args.samples)
        for samp, steps in combos:
            if samp in SGM_ONLY and is_msgm:
                continue  # exponential integrators need the SGM kernel
            solve = jax.jit(make_solve(samp, steps, is_msgm,
                                 dpm_grid=args.dpm_grid))
            # scalar-fetch sync: see tools/parity_image_ours.py
            xgen = solve(gen_eval, x0, k_solve)
            float(xgen.sum())
            t0 = time.perf_counter()
            xgen = solve(gen_eval, x0, k_solve)
            float(xgen.sum())
            sample_s = time.perf_counter() - t0

            xgen_f, dropped = filter_blowups(xgen)
            n = min(xgen_f.shape[0], args.samples)
            mmd = float(compute_mmd(jnp.asarray(xgen_f[:n]), xtest[:n]))
            mmd_floor = float(compute_mmd(xtrain[:n], xtest[:n]))
            res = dict(
                arm=arm, config=f"l63_1000_{args.archi}", iters=args.iters,
                batch=args.batch, sampler=samp, steps_back=steps,
                **({"dpm_grid": args.dpm_grid} if samp in SGM_ONLY
                   else {}),
                **({"ema_rate": args.ema_rate} if args.ema_rate else {}),
                **({"compute_dtype": args.compute_dtype}
                   if args.compute_dtype != "float32" else {}),
                **({"parameterization": args.parameterization}
                   if not is_msgm and args.parameterization != "direct"
                   else {}),
                backend=jax.default_backend(),
                train_s=train_s, ms_per_step=train_s / args.iters * 1000,
                sample_s=sample_s, samples_per_s=args.samples / sample_s,
                sqrt_mmd=mmd ** 0.5, sqrt_mmd_floor=mmd_floor ** 0.5,
                dropped=dropped, final_loss=float(final_loss),
            )
            print(json.dumps(res), flush=True)
            results.append(res)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

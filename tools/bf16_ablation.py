"""bf16 mixed-precision ablation: does compute_dtype=bfloat16 cost quality?

Trains the same arm twice — fp32 compute vs bfloat16 compute — with the
identical seed, data order, optimizer and budget (params/Adam state are
fp32 in both; only the score net's per-op compute dtype differs), then
evaluates √MMD through the reference generation path (rk4 reverse SDE,
128 steps) and the PF-ODE at 32 steps. Sampling always runs the arm's own
compute dtype, so the bf16 row measures the full mixed-precision pipeline
end to end.

No reference counterpart (the reference trains pure-fp32 CUDA,
MSGM_higherDim.py:789); this quantifies the quality side of the
TrainConfig.compute_dtype="bfloat16" knob whose speed side is
tools/measure_perf.py sec_bf16_trainer.

Usage: python tools/bf16_ablation.py [--cpu] [--iters 16384] [--seeds 0,1]
       python tools/bf16_ablation.py --archi unet1d --dim 64 --iters 4096
Writes BF16_ABLATION.json (MLP d=2 swissroll) / BF16_ABLATION_UNET1D.json
(--archi unet1d: conv score net on a correlated Gaussian, the reference's
gaussiancor datatype at conv-realistic width — the regime where bfloat16
would actually be deployed).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--samples", type=int, default=10_000)
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--arms", default="sgm,msgm",
                    help="comma list of arms to run (sgm, msgm)")
    ap.add_argument("--archi", default="mlp", choices=["mlp", "unet1d"],
                    help="score net: the d=2 MLP on swissroll (default) or "
                         "UNet1D on a correlated Gaussian (--dim)")
    ap.add_argument("--dim", type=int, default=64,
                    help="signal dimension for --archi unet1d")
    ap.add_argument("--parameterization", default="direct",
                    choices=["direct", "eps"],
                    help="learned-drift output form for the SGM arm: 'eps' "
                         "rescales the net output by -g/std so the net "
                         "learns O(1) noise (sde/reverse.py). MSGM arms "
                         "always run direct (no closed-form kernel)")
    ap.add_argument("--no-fp32-head", action="store_true",
                    help="compute the output projection in the net's bf16 "
                         "dtype instead of the default fp32 head "
                         "(models/mlp.py fp32_head) — measures what the "
                         "fp32 head buys")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="BF16_ABLATION.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdeflow_tpu.data import Gaussian, SwissRoll
    from sdeflow_tpu.eval import compute_mmd
    from sdeflow_tpu.eval.diagnostics import filter_blowups
    from sdeflow_tpu.models import MLP, UNet1D
    from sdeflow_tpu.sde import MSGMSde, PluginReverseSDE, SGMSde
    from sdeflow_tpu.serving import make_sampler_fn
    from sdeflow_tpu.training import Trainer

    out = {"backend": jax.default_backend(), "iters": args.iters,
           "archi": args.archi, "parameterization": args.parameterization,
           "fp32_head": not args.no_fp32_head, "rows": []}
    d = 2 if args.archi == "mlp" else args.dim
    for seed in [int(x) for x in args.seeds.split(",")]:
        key = jax.random.PRNGKey(seed)
        for is_msgm in (False, True):
            arm = "MSGM" if is_msgm else "SGM"
            if arm.lower() not in args.arms.lower().split(","):
                continue
            if args.archi == "unet1d":
                sampler = Gaussian(jax.random.fold_in(key, 7), dim=d,
                                   correlation=True, normalized=True)
            else:
                sampler = SwissRoll()
            premodule = "NormalizeLogRadius" if is_msgm else None
            x_probe = sampler.sample(key, 64)
            if is_msgm:
                x_init = sampler.sample(jax.random.fold_in(key, 1), 100_000)
                sde = MSGMSde.create(
                    jax.random.fold_in(key, 2), x_init, beta_min=0.1,
                    beta_max=20.0, t_epsilon=1e-3, num_steps_forward=16,
                    dense_tensor=True, norm_sampler="ecdf", norm_map="log",
                    estimate_norm_constant=False,
                )
            else:
                sde = SGMSde.create(beta_min=0.1, beta_max=20.0,
                                    t_epsilon=1e-3, num_steps_forward=16)

            xtest = sampler.sampletest(jax.random.fold_in(key, 5),
                                       args.samples)
            xtrain = sampler.sample(jax.random.fold_in(key, 6), args.samples)
            floor = float(compute_mmd(xtrain, xtest)) ** 0.5
            k_solve = jax.random.fold_in(key, 4)

            for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
                if args.archi == "unet1d":
                    model = UNet1D(input_dim=d, base_channels=32,
                                   channel_mults=(1, 2), num_res_blocks=2,
                                   premodule=premodule, emb_dim=64,
                                   dtype=dtype,
                                   fp32_head=not args.no_fp32_head)
                else:
                    model = MLP(input_dim=d, premodule=premodule, dtype=dtype,
                                fp32_head=not args.no_fp32_head)
                # same init key -> identical fp32 initial params in both arms
                variables = model.init(key, x_probe, jnp.zeros((64,)))
                param = args.parameterization if not is_msgm else "direct"
                gen0 = PluginReverseSDE.create(sde, model.apply, variables,
                                               parameterization=param)
                trainer = Trainer(gen0, sampler, lr=1e-3,
                                  batch_size=args.batch,
                                  print_every=max(1, args.iters // 2))
                state, _ = trainer.run(jax.random.fold_in(key, 3), args.iters)

                for samp, meth, steps in (("sde", "rk4", 128),
                                          ("ode", "rk4", 32)):
                    fn = jax.jit(make_sampler_fn(
                        state.gen_sde, args.samples, d, steps, method=meth,
                        norm_correction=bool(is_msgm), sampler=samp,
                    ))
                    xgen, dropped = filter_blowups(fn(k_solve))
                    n = min(xgen.shape[0], args.samples)
                    mmd = float(
                        compute_mmd(jnp.asarray(xgen[:n]), xtest[:n])
                    ) ** 0.5
                    row = dict(seed=seed, arm=arm, dtype=tag, sampler=samp,
                               steps=steps, sqrt_mmd=mmd,
                               sqrt_mmd_floor=floor, dropped=dropped)
                    out["rows"].append(row)
                    print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
"""EMA ablation: does sampling with EMA-averaged weights improve quality?

One training run per arm with Trainer(ema_rate) enabled, then BOTH heads
of the same run are evaluated — the raw final params (state.gen_sde) and
the exponential moving average (trainer.ema_gen_sde) — so the comparison
isolates the EMA exactly (same data order, same optimizer trajectory).
√MMD vs a held-out test set through the reference generation path
(rk4 reverse SDE, 128 steps) and the PF-ODE at 32 steps.

The reference defines update_ema but never calls it
(/root/reference/model/nn_utils.py:117-127); this framework wires it
(`Trainer(ema_rate=...)` / `--ema-rate`) — this tool measures what it buys.

Usage: python tools/ema_ablation.py [--cpu] [--iters 16384] [--seeds 0,1]
Writes EMA_ABLATION.json.
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
    ap.add_argument("--ema-rate", type=float, default=0.999)
    ap.add_argument("--ema-warmup", choices=("on", "off"), default="on",
                    help="min(rate,(1+n)/(10+n)) decay ramp (default on; "
                         "'off' reproduces the fixed-rate EMA, which is "
                         "init-dominated on short budgets)")
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="EMA_ABLATION.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdeflow_tpu.data import SwissRoll
    from sdeflow_tpu.eval import compute_mmd
    from sdeflow_tpu.eval.diagnostics import filter_blowups
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import MSGMSde, PluginReverseSDE, SGMSde
    from sdeflow_tpu.serving import make_sampler_fn
    from sdeflow_tpu.training import Trainer

    out = {"backend": jax.default_backend(), "iters": args.iters,
           "ema_rate": args.ema_rate, "ema_warmup": args.ema_warmup,
           "rows": []}
    d = 2
    for seed in [int(x) for x in args.seeds.split(",")]:
        key = jax.random.PRNGKey(seed)
        for is_msgm in (False, True):
            arm = "MSGM" if is_msgm else "SGM"
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
                sde = SGMSde.create(beta_min=0.1, beta_max=20.0,
                                    t_epsilon=1e-3, num_steps_forward=16)
            gen0 = PluginReverseSDE.create(sde, model.apply, variables)
            trainer = Trainer(gen0, sampler, lr=1e-3, batch_size=args.batch,
                              print_every=max(1, args.iters // 2),
                              ema_rate=args.ema_rate,
                              ema_warmup=args.ema_warmup == "on")
            state, _ = trainer.run(jax.random.fold_in(key, 3), args.iters)

            xtest = sampler.sampletest(jax.random.fold_in(key, 5),
                                       args.samples)
            xtrain = sampler.sample(jax.random.fold_in(key, 6), args.samples)
            floor = float(compute_mmd(xtrain, xtest)) ** 0.5
            k_solve = jax.random.fold_in(key, 4)

            for head, gen in (("raw", state.gen_sde),
                              ("ema", trainer.ema_gen_sde)):
                for samp, meth, steps in (("sde", "rk4", 128),
                                          ("ode", "rk4", 32)):
                    fn = jax.jit(make_sampler_fn(
                        gen, args.samples, d, steps, method=meth,
                        norm_correction=bool(is_msgm), sampler=samp,
                    ))
                    xgen, dropped = filter_blowups(fn(k_solve))
                    n = min(xgen.shape[0], args.samples)
                    mmd = float(
                        compute_mmd(jnp.asarray(xgen[:n]), xtest[:n])
                    ) ** 0.5
                    row = dict(seed=seed, arm=arm, head=head, sampler=samp,
                               steps=steps, sqrt_mmd=mmd,
                               sqrt_mmd_floor=floor, dropped=dropped)
                    out["rows"].append(row)
                    print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

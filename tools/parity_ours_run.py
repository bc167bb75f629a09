"""Run sdeflow_tpu's swissroll SGM/MSGM arms for quality parity.

Mirrors tools/parity_reference_run.py exactly (same iterations, batch,
backward steps, sample counts, MMD kernel) on this framework. Writes
parity_ours.json. Run on TPU (default backend) or --cpu.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--samples", type=int, default=10_000)
    ap.add_argument("--steps-back", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="parity_ours.json")
    ap.add_argument("--arms", default="sgm,msgm",
                    help="comma list of arms to run (sgm, msgm)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--project", action="store_true",
                    help="enable project_training_norms (our quality knob)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdeflow_tpu.data import SwissRoll
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, MSGMSde, PluginReverseSDE
    from sdeflow_tpu.training import Trainer
    from sdeflow_tpu.eval import compute_mmd
    from sdeflow_tpu.eval.diagnostics import filter_blowups
    from sdeflow_tpu.ops.integrators import integrate_sde

    arms = [a.strip().lower() for a in args.arms.split(",")]
    results = []
    for is_msgm in (False, True):
        arm = "MSGM" if is_msgm else "SGM"
        if arm.lower() not in arms:
            continue
        print(f"running {arm} arm on {jax.default_backend()}...", flush=True)
        key = jax.random.PRNGKey(args.seed)
        sampler = SwissRoll()
        d = 2
        premodule = "NormalizeLogRadius" if is_msgm else None
        model = MLP(input_dim=d, premodule=premodule)
        x_probe = sampler.sample(key, 64)
        variables = model.init(key, x_probe, jnp.zeros((64,)))
        if is_msgm:
            x_init = sampler.sample(
                jax.random.fold_in(key, 1),
                min(100_000, args.iters * args.batch),
            )
            sde = MSGMSde.create(
                jax.random.fold_in(key, 2), x_init, beta_min=0.1,
                beta_max=20.0, t_epsilon=1e-3, num_steps_forward=16,
                dense_tensor=True, norm_sampler="ecdf", norm_map="log",
                estimate_norm_constant=False,
                project_training_norms=args.project,
            )
        else:
            sde = SGMSde.create(beta_min=0.1, beta_max=20.0, t_epsilon=1e-3,
                                num_steps_forward=16)
        gen = PluginReverseSDE.create(sde, model.apply, variables)
        trainer = Trainer(gen, sampler, lr=1e-3, batch_size=args.batch,
                          print_every=max(1, args.iters // 4))
        t0 = time.perf_counter()
        state, final_loss = trainer.run(jax.random.fold_in(key, 3), args.iters)
        train_s = time.perf_counter() - t0

        k_lat, k_solve = jax.random.split(jax.random.fold_in(key, 4))
        x0 = state.gen_sde.latent_sample(k_lat, args.samples, d)
        solve = jax.jit(
            lambda g, z, k: integrate_sde(
                g, z, k, args.steps_back, method="rk4",
                norm_correction=bool(is_msgm),
            )
        )
        xgen = solve(state.gen_sde, x0, k_solve)
        xgen.block_until_ready()
        t0 = time.perf_counter()
        xgen = solve(state.gen_sde, x0, k_solve)
        xgen.block_until_ready()
        sample_s = time.perf_counter() - t0

        xgen_f, dropped = filter_blowups(xgen)
        xtest = sampler.sampletest(jax.random.fold_in(key, 5), args.samples)
        xtrain = sampler.sample(jax.random.fold_in(key, 6), args.samples)
        n = min(xgen_f.shape[0], args.samples)
        mmd = float(compute_mmd(jnp.asarray(xgen_f[:n]), xtest[:n]))
        mmd_floor = float(compute_mmd(xtrain[:n], xtest[:n]))
        res = dict(
            arm=arm, iters=args.iters, batch=args.batch,
            steps_back=args.steps_back, backend=jax.default_backend(),
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

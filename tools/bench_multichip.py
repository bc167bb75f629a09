"""One-command multi-chip scaling harness (round-2 review item 6).

Measures DP-scaling of the fused trainer and of batch-sharded sampling
across mesh sizes {1, 2, 4, 8}. On this machine the mesh is 8 virtual CPU
devices (one physical core), so the numbers demonstrate CORRECTNESS and the
overhead shape of the sharded programs, not real scaling; the same entry is
the to-run benchmark on real multi-chip TPU hardware, where the "data"-axis
collectives ride ICI:

    python tools/bench_multichip.py                 # virtual CPU mesh
    python tools/bench_multichip.py --backend tpu   # real hardware, when available

Per mesh size N it runs, on a ("data"=N, "model"=1) mesh:
  - fused DP training (make_parallel_train_chunk): K SSM+Adam steps per
    dispatch on the swissroll MLP config, global batch scaled with N
    (weak scaling, the production regime) -> steps/s,
  - batch-sharded reverse-SDE sampling (parallel_sample, 64-step RK4),
    num_samples scaled with N -> samples/s,
and reports efficiency = throughput(N) / (N * throughput(1)) for the weak
scaling (ideal = 1.0). Writes MULTICHIP_BENCH.json.

Each size runs in a fresh subprocess because the device count must be fixed
before the JAX backend initializes. No reference counterpart (the torch
reference is single-device, MSGM_higherDim.py:438-446).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(n_devices: int, backend: str, iters: int, batch_per_dev: int,
           samples_per_dev: int) -> None:
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, REPO)
    from sdeflow_tpu.data import SwissRoll
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.parallel import (
        make_mesh,
        make_parallel_train_chunk,
        parallel_sample,
        replicate,
    )

    key = jax.random.PRNGKey(0)
    sampler = SwissRoll()
    model = MLP(input_dim=2)
    x = sampler.sample(key, 64)
    variables = model.init(key, x, jnp.zeros((64,)))
    sde = SGMSde.create(num_steps_forward=16)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    opt = optax.adam(1e-3)

    mesh = make_mesh(n_data=n_devices, n_model=1)
    state = TrainState(
        gen_sde=replicate(gen, mesh),
        opt_state=replicate(opt.init(gen.a_params), mesh),
        step=jnp.zeros((), jnp.int32),
    )
    batch = batch_per_dev * n_devices
    chunk = make_parallel_train_chunk(opt, sampler.sample, batch, mesh)

    # train: warm (compile) then time the fused dispatch
    state, loss = chunk(state, key, iters)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    state, loss = chunk(state, jax.random.fold_in(key, 1), iters)
    jax.block_until_ready(loss)
    train_s = time.perf_counter() - t0

    # sampling: batch-sharded 64-step RK4
    n_samples = samples_per_dev * n_devices
    out = parallel_sample(state.gen_sde, key, n_samples, 2, 64, mesh)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = parallel_sample(state.gen_sde, jax.random.fold_in(key, 2),
                          n_samples, 2, 64, mesh)
    jax.block_until_ready(out)
    sample_s = time.perf_counter() - t0
    assert bool(jnp.all(jnp.isfinite(out))), "non-finite sharded samples"

    # batch-sharded exact-likelihood eval (eval/nll.py): the augmented
    # PF-ODE scan + Hutchinson JVPs under the same DP sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_nll = samples_per_dev * n_devices
    x_nll = jax.device_put(
        sampler.sampletest(jax.random.fold_in(key, 3), n_nll),
        NamedSharding(mesh, P("data", None)),
    )
    from sdeflow_tpu.eval.nll import nll_bits_per_dim

    bpd_fn = jax.jit(lambda xx, kk: nll_bits_per_dim(
        state.gen_sde, xx, kk, num_steps=64))
    bpd = bpd_fn(x_nll, jax.random.fold_in(key, 4))
    jax.block_until_ready(bpd)
    t0 = time.perf_counter()
    bpd = bpd_fn(x_nll, jax.random.fold_in(key, 5))
    jax.block_until_ready(bpd)
    nll_s = time.perf_counter() - t0

    print(json.dumps(dict(
        n_devices=n_devices,
        backend=jax.default_backend(),
        global_batch=batch,
        train_steps_per_s=iters / train_s,
        final_loss=float(loss),
        num_samples=n_samples,
        samples_per_s=n_samples / sample_s,
        nll_points_per_s=n_nll / nll_s,
    )))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch-per-dev", type=int, default=64)
    ap.add_argument("--samples-per-dev", type=int, default=2048)
    ap.add_argument("--out", default="MULTICHIP_BENCH.json")
    ap.add_argument("--worker", type=int, default=0, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.backend, args.iters, args.batch_per_dev,
               args.samples_per_dev)
        return

    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(n),
               "--backend", args.backend, "--iters", str(args.iters),
               "--batch-per-dev", str(args.batch_per_dev),
               "--samples-per-dev", str(args.samples_per_dev)]
        print(f"mesh size {n} ...", flush=True)
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600)
        if res.returncode != 0:
            raise RuntimeError(f"worker {n} failed:\n{res.stderr[-2000:]}")
        rows.append(json.loads(res.stdout.strip().splitlines()[-1]))
        print(rows[-1], flush=True)

    # Efficiency = throughput(N) / (N * throughput(1)) is only a measurement
    # when each mesh device is a real chip. On a virtual CPU mesh the N
    # "devices" oversubscribe the same core(s), so the ratio is an artifact
    # of scheduler noise (it has printed 4.6 "efficiency" on one core) —
    # refuse to emit the column rather than label it (round-4 review item 8).
    virtual_mesh = rows[0]["backend"] == "cpu"
    base = rows[0]
    if not virtual_mesh:
        for r in rows:
            n = r["n_devices"] / base["n_devices"]
            r["train_efficiency"] = (
                r["train_steps_per_s"] / base["train_steps_per_s"]
            )
            r["sample_efficiency"] = (
                r["samples_per_s"] / (n * base["samples_per_s"])
            )
            r["nll_efficiency"] = (
                r["nll_points_per_s"] / (n * base["nll_points_per_s"])
            )
    out = dict(
        efficiency_valid=not virtual_mesh,
        note=("VIRTUAL CPU mesh (devices share one host's cores): raw "
              "throughputs demonstrate correctness + overhead shape only, "
              "and efficiency columns are OMITTED because N virtual devices "
              "oversubscribing the same core cannot measure scaling; run "
              "with --backend tpu on real multi-chip hardware"
              if virtual_mesh else "real hardware run"),
        rows=rows,
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

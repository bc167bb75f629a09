"""Benchmark: reverse-SDE sampling throughput on the real accelerator.

Times the throughput-critical path (BASELINE.md / reference
MSGM_higherDim.py:902-906): RK4-Stratonovich reverse sampling with the MLP
score net on the SGM VP-SDE — 10,000 samples x 128 steps x 4 score-net
evaluations per step — as ONE jitted lax.scan program on the TPU.

Baseline: the PyTorch reference measured on this machine's CPU by
tools/measure_baseline.py (the reference publishes no numbers; see
BASELINE_MEASURED.json). Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import time

import jax
import jax.numpy as jnp


NUM_SAMPLES = 10_000
NUM_STEPS = 128
DIM = 2
REPEATS = 5


def main():
    from sdeflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # repeated runs skip the remote compile
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.ops.integrators import integrate_sde

    key = jax.random.PRNGKey(0)
    # bf16 compute for the score net: validated quality-neutral on trained
    # models (sqrt-MMD 0.0404 fp32 vs 0.0405 bf16 on the swissroll config)
    # and 1.57x faster — the serving-mode configuration
    model = MLP(input_dim=DIM, dtype=jnp.bfloat16)
    x_dummy = jnp.zeros((NUM_SAMPLES, DIM))
    variables = model.init(key, x_dummy, jnp.zeros((NUM_SAMPLES,)))
    sde = SGMSde.create(beta_min=0.1, beta_max=20.0, num_steps_forward=16)
    gen = PluginReverseSDE.create(sde, model.apply, variables)

    @jax.jit
    def sample(gen, k):
        k_lat, k_solve = jax.random.split(k)
        x0 = gen.latent_sample(k_lat, NUM_SAMPLES, DIM)
        return integrate_sde(gen, x0, k_solve, NUM_STEPS, method="rk4")

    # warmup / compile
    out = sample(gen, key)
    jax.block_until_ready(out)

    # pipeline INNER async dispatches per timed repeat so per-call host
    # round-trip latency (milliseconds over a remote-TPU link) amortizes
    INNER = 10
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        outs = [
            sample(gen, jax.random.fold_in(key, i * INNER + j))
            for j in range(INNER)
        ]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / INNER)
    best = min(times)
    value = NUM_SAMPLES / best

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        base = ref.get("reverse_samples_per_sec")
        if base:
            vs_baseline = value / base

    print(json.dumps({
        "metric": "reverse_sde_samples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "samples/s (bf16 MLP score net, RK4, 128 steps, d=2)",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()

"""Benchmark: reverse-SDE sampling throughput + MFU on the real accelerator.

Times the throughput-critical path (BASELINE.md / reference
MSGM_higherDim.py:902-906): RK4-Stratonovich reverse sampling with the MLP
score net on the SGM VP-SDE — 10,000 samples x 128 steps x 4 score-net
evaluations per step — as ONE jitted lax.scan program on the TPU.

Timing methodology: the remote (axon) runtime does not honor
block_until_ready, so per-call host loops measure dispatch pipelining, not
device time. Here every measurement chains N solves inside one jitted
fori_loop (utils.profiling.device_seconds) and reports the slope between
two chain lengths — pure device time, dispatch/transfer constants cancel.

Also reports MFU (model FLOPs / device time / chip peak) for (a) this
sampling config — tiny d=2 compute, so its MFU is honestly tiny — and
(b) a compute-bound config: the 16x16 attention U-Net forward at B=2048
in bf16 (the serving-mode image scorer).

Baseline: the PyTorch reference measured on this machine's CPU by
tools/measure_baseline.py (the reference publishes no numbers; see
BASELINE_MEASURED.json). Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "mfu": ...}
"""

import json
import os

import jax
import jax.numpy as jnp


NUM_SAMPLES = 10_000
NUM_STEPS = 128
DIM = 2

UNET_BATCH = 2048
UNET_SPACE = 16


def sampling_benchmark():
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.ops.integrators import integrate_sde
    from sdeflow_tpu.utils import device_seconds, compiled_flops, peak_flops

    key = jax.random.PRNGKey(0)
    # bf16 compute for the score net: validated quality-neutral on trained
    # models (sqrt-MMD 0.0404 fp32 vs 0.0405 bf16 on the swissroll config)
    # — the serving-mode configuration
    model = MLP(input_dim=DIM, dtype=jnp.bfloat16)
    x_dummy = jnp.zeros((NUM_SAMPLES, DIM))
    variables = model.init(key, x_dummy, jnp.zeros((NUM_SAMPLES,)))
    sde = SGMSde.create(beta_min=0.1, beta_max=20.0, num_steps_forward=16)
    gen = PluginReverseSDE.create(sde, model.apply, variables)

    def solve(k):
        k_lat, k_solve = jax.random.split(k)
        x0 = gen.latent_sample(k_lat, NUM_SAMPLES, DIM)
        return integrate_sde(gen, x0, k_solve, NUM_STEPS, method="rk4")

    def step(i):
        return solve(jax.random.fold_in(jax.random.PRNGKey(1), i)).mean()

    sec = device_seconds(step, short=2)
    flops = compiled_flops(jax.jit(solve), key)
    peak = peak_flops()
    mfu = flops / sec / peak if peak else None
    return NUM_SAMPLES / sec, mfu


def unet_forward_mfu():
    """MFU of the compute-bound serving config: 16x16 attention U-Net
    forward, B=2048, bf16 compute (README performance section)."""
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.utils import device_seconds, compiled_flops, peak_flops

    key = jax.random.PRNGKey(0)
    model = VorticityUNet(
        base_channels=32,
        channel_mults=(1, 2, 4),
        num_res_blocks=2,
        premodule="NormalizeLogRadius",
        in_space=UNET_SPACE,
        attention_resolutions=(2, 4),
        flatten_order="F",
        dtype=jnp.bfloat16,
    )
    x = jax.random.normal(key, (UNET_BATCH, UNET_SPACE * UNET_SPACE))
    t = jnp.linspace(0.01, 1.0, UNET_BATCH)
    variables = model.init(key, x[:8], t[:8])

    def fwd(xi):
        return model.apply(variables, xi, t)

    # FLOP numerator from the unfused twin (identical params/math): XLA's
    # cost analysis cannot count inside the fused AttentionBlock custom call
    model_unfused = model.clone(attention_impl="unfused")

    def fwd_unfused(xi):
        return model_unfused.apply(variables, xi, t)

    def step(i):
        # i-dependent input so iterations can't be hoisted loop-invariant
        return fwd(x + 1e-6 * i).mean().astype(jnp.float32)

    sec = device_seconds(step, short=1)
    flops = compiled_flops(jax.jit(fwd_unfused), x)
    peak = peak_flops()
    imgs_per_s = UNET_BATCH / sec
    return (flops / sec / peak if peak else None), imgs_per_s


def dit2d_forward_mfu():
    """MFU of the recommended production architecture for the same image
    workload: DiT2D (models/dit.py) forward, B=2048, bf16 — the MXU-native
    transformer that replaces the U-Net's small-channel convs with width-512
    dense matmuls (PARITY.md "recommended production architecture")."""
    from sdeflow_tpu.models import DiT2D
    from sdeflow_tpu.utils import device_seconds, compiled_flops, peak_flops

    key = jax.random.PRNGKey(0)
    model = DiT2D(
        in_space=UNET_SPACE,
        patch=4,
        width=512,
        depth=6,
        heads=4,
        premodule="NormalizeLogRadius",
        flatten_order="F",
        dtype=jnp.bfloat16,
    )
    x = jax.random.normal(key, (UNET_BATCH, UNET_SPACE * UNET_SPACE))
    t = jnp.linspace(0.01, 1.0, UNET_BATCH)
    variables = model.init(key, x[:8], t[:8])

    def fwd(xi):
        return model.apply(variables, xi, t)

    def step(i):
        return fwd(x + 1e-6 * i).mean().astype(jnp.float32)

    sec = device_seconds(step, short=1)
    flops = compiled_flops(jax.jit(fwd), x)
    peak = peak_flops()
    return (flops / sec / peak if peak else None), UNET_BATCH / sec


def main():
    from sdeflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # repeated runs skip the remote compile

    value, mfu_sampling = sampling_benchmark()
    mfu_unet, unet_imgs_per_s = unet_forward_mfu()
    mfu_dit2d, dit2d_imgs_per_s = dit2d_forward_mfu()

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
        # headline MFU = the compute-bound flagship image model (16x16
        # attention U-Net fwd, B=2048, bf16); the d=2 sampling config is
        # bandwidth-bound by construction so its MFU is reported only as a
        # clearly-labeled secondary diagnostic (VERDICT r3 #7)
        "mfu": round(mfu_unet, 4) if mfu_unet else None,
        "mfu_model": "unet16_fwd_b2048_bf16",
        "unet16_fwd_b2048_bf16_imgs_per_s": round(unet_imgs_per_s, 1),
        # the recommended production architecture for the same workload
        # (PARITY.md): DiT2D forward at the same batch/space, bf16
        "dit2d_fwd_b2048_bf16_mfu": (
            round(mfu_dit2d, 4) if mfu_dit2d else None
        ),
        "dit2d_fwd_b2048_bf16_imgs_per_s": round(dit2d_imgs_per_s, 1),
        "mfu_sampling_d2_bandwidth_bound": (
            round(mfu_sampling, 5) if mfu_sampling else None
        ),
    }))


if __name__ == "__main__":
    main()

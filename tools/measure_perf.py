"""Regenerate EVERY device-performance number in README.md from one tool.

All timings use utils.profiling.device_seconds — N calls chained inside a
single jitted fori_loop, slope between two chain lengths — because the
remote (axon) runtime does not honor block_until_ready (host loops measure
dispatch pipelining, not device time). Results merge into PERF_MEASURED.json
at the repo root, per-section, so a wedged-tunnel section can be re-run
alone:

    python tools/measure_perf.py --section mlp_sampling
    python tools/measure_perf.py --section msgm_circulant      # pallas on
    SDEFLOW_DISABLE_PALLAS=1 python tools/measure_perf.py --section msgm_circulant
    python tools/measure_perf.py --section unet_forward
    python tools/measure_perf.py --section trainer
    python tools/measure_perf.py --section flash_fwd           # pallas on
    SDEFLOW_DISABLE_PALLAS=1 python tools/measure_perf.py --section flash_fwd
    python tools/measure_perf.py --section flash_bwd
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PERF_MEASURED.json")


def _pallas_tag():
    from sdeflow_tpu.ops.pallas.common import pallas_enabled

    return "pallas" if pallas_enabled() else "xla"


def sec_mlp_sampling():
    """Headline config (reference MSGM_higherDim.py:902-906): 10k samples,
    128-step RK4 reverse solve, d=2 MLP score net — bf16 and fp32."""
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.ops.integrators import integrate_sde
    from sdeflow_tpu.utils import device_seconds, compiled_flops, peak_flops

    n, d, steps = 10_000, 2, 128
    key = jax.random.PRNGKey(0)
    out = {}
    for tag, dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        model = MLP(input_dim=d, dtype=dtype)
        variables = model.init(key, jnp.zeros((n, d)), jnp.zeros((n,)))
        sde = SGMSde.create(beta_min=0.1, beta_max=20.0, num_steps_forward=16)
        gen = PluginReverseSDE.create(sde, model.apply, variables)

        def solve(k):
            k_lat, k_solve = jax.random.split(k)
            x0 = gen.latent_sample(k_lat, n, d)
            return integrate_sde(gen, x0, k_solve, steps, method="rk4")

        sec = device_seconds(
            lambda i: solve(jax.random.fold_in(key, i)).mean().astype(jnp.float32),
            short=2,
        )
        out[f"sampling_mlp_{tag}_samples_per_s"] = n / sec
        peak = peak_flops()
        if peak:
            out[f"sampling_mlp_{tag}_mfu"] = (
                compiled_flops(jax.jit(solve), key) / sec / peak
            )
    return out


def sec_msgm_circulant():
    """MSGM sparse (circulant) d=1024, B=4096, 128-step norm-corrected RK4
    reverse solve — the Pallas stencil's showcase. Run once normally and
    once under SDEFLOW_DISABLE_PALLAS=1 for the XLA-roll comparison."""
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import MSGMSde, PluginReverseSDE
    from sdeflow_tpu.ops.integrators import integrate_sde
    from sdeflow_tpu.utils import device_seconds

    d, b, steps = 1024, 4096, 128
    key = jax.random.PRNGKey(0)
    x_init = jax.random.normal(key, (4096, d))
    sde = MSGMSde.create(key, x_init, dense_tensor=False)
    model = MLP(input_dim=d, premodule="NormalizeLogRadius")
    variables = model.init(key, x_init[:8], jnp.zeros((8,)))
    gen = PluginReverseSDE.create(sde, model.apply, variables)

    def solve(k):
        k_lat, k_solve = jax.random.split(k)
        x0 = gen.latent_sample(k_lat, b, d)
        return integrate_sde(gen, x0, k_solve, steps, method="rk4",
                             norm_correction=True)

    sec = device_seconds(
        lambda i: solve(jax.random.fold_in(key, i)).mean().astype(jnp.float32),
        short=1,
    )
    return {f"msgm_circulant_d1024_{_pallas_tag()}_samples_per_s": b / sec}


def sec_msgm_fwd_step():
    """SURVEY §7 step 8: the fused whole-RK4-step circulant kernel vs the
    per-stage stencil composition vs pure XLA, at d=1024, B=4096 (one
    forward step of the MSGM noising flow; Stratonovich drift = 0)."""
    from sdeflow_tpu.ops.pallas.circulant import (
        circulant_rk4_step, _rk4_math_fwd, circulant_apply,
    )
    from sdeflow_tpu.utils import device_seconds

    b, d = 4096, 1024
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, d))
    w = jax.random.normal(jax.random.fold_in(key, 1), (b, d)) * 0.1
    sb3 = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (b, 3))) + 0.5

    def staged(sb3, x, w):
        # generic integrators.rk4_step composition: 4 Pallas stencil calls
        # with the combine left to XLA
        k1 = circulant_apply(sb3[:, 0:1], x, w)
        k2 = circulant_apply(sb3[:, 1:2], x + 0.5 * k1, w)
        k3 = circulant_apply(sb3[:, 1:2], x + 0.5 * k2, w)
        k4 = circulant_apply(sb3[:, 2:3], x + k3, w)
        return x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0

    out = {}
    for name, fn in (("fused", circulant_rk4_step),
                     ("staged_stencil", staged),
                     ("xla_math", _rk4_math_fwd)):
        sec = device_seconds(
            lambda i: fn(sb3, x + 1e-6 * i, w).mean(), short=2,
        )
        out[f"msgm_fwd_rk4_step_d1024_{name}_us"] = sec * 1e6
    return out


def sec_unet_forward():
    """16x16 attention U-Net score-net forward (serving config): B=256 and
    B=2048, fp32 and bf16, with MFU for the compute-bound shapes."""
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.utils import device_seconds, compiled_flops, peak_flops

    key = jax.random.PRNGKey(0)
    out = {}
    for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = VorticityUNet(
            base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
            premodule="NormalizeLogRadius", in_space=16,
            attention_resolutions=(2, 4), flatten_order="F", dtype=dtype,
        )
        # FLOP numerator from the unfused twin: XLA's cost analysis cannot
        # see inside the fused AttentionBlock custom call, and the param
        # trees are identical by construction
        model_unfused = model.clone(attention_impl="unfused")
        for b in (256, 2048):
            x = jax.random.normal(key, (b, 256))
            t = jnp.linspace(0.01, 1.0, b)
            variables = model.init(key, x[:8], t[:8])

            def fwd(xi):
                return model.apply(variables, xi, t)

            def fwd_unfused(xi):
                return model_unfused.apply(variables, xi, t)

            sec = device_seconds(
                lambda i: fwd(x + 1e-6 * i).mean().astype(jnp.float32),
                short=1,
            )
            out[f"unet16_fwd_b{b}_{tag}_imgs_per_s"] = b / sec
            out[f"unet16_fwd_b{b}_{tag}_ms"] = sec * 1e3
            peak = peak_flops()
            if peak:
                out[f"unet16_fwd_b{b}_{tag}_mfu"] = (
                    compiled_flops(jax.jit(fwd_unfused), x) / sec / peak
                )
    return out


def sec_unet_sampling():
    """End-to-end flagship image generation: MSGM circulant d=256 with the
    16x16 attention U-Net score net, 64-step norm-corrected RK4 reverse
    solve, B=1024 — fp32 and bf16 serving modes (4 U-Net evals per step,
    reference MSGM_higherDim.py:902-906 at the image config)."""
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.sde import MSGMSde, PluginReverseSDE
    from sdeflow_tpu.ops.integrators import integrate_sde
    from sdeflow_tpu.utils import device_seconds

    b, d, steps = 1024, 256, 64
    key = jax.random.PRNGKey(0)
    # fit the radial prior to actual GRF fields so the benchmarked program
    # IS the parity configuration (tools/parity_image_ours.py), not an
    # isotropic stand-in (round-2 advisor note)
    from sdeflow_tpu.data import SmoothedGRF

    x_init = SmoothedGRF(npixel=16).sample(key, 8192)
    sde = MSGMSde.create(key, x_init, beta_min=0.4, beta_max=80.0,
                         t_epsilon=4e-3, num_steps_forward=64,
                         dense_tensor=False, norm_map="log")
    out = {}
    for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = VorticityUNet(
            base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
            premodule="NormalizeLogRadius", in_space=16,
            attention_resolutions=(2, 4), flatten_order="F", dtype=dtype,
        )
        variables = model.init(key, x_init[:8], jnp.zeros((8,)))
        gen = PluginReverseSDE.create(sde, model.apply, variables)

        def solve(k):
            k_lat, k_solve = jax.random.split(k)
            x0 = gen.latent_sample(k_lat, b, d)
            return integrate_sde(gen, x0, k_solve, steps, method="rk4",
                                 norm_correction=True)

        sec = device_seconds(
            lambda i: solve(jax.random.fold_in(key, i)).mean().astype(jnp.float32),
            short=1,
        )
        out[f"unet16_msgm_sampling_{tag}_imgs_per_s"] = b / sec
    return out


def sec_trainer():
    """Fused lax.scan trainer steps/s: SGM (swissroll MLP, batch 256) and
    MSGM (16-step RK4 forward solve inside every loss eval). Device time per
    step is the slope between a 64-step and a 512-step chunk program."""
    import time

    import numpy as np
    import optax

    from sdeflow_tpu.data import SwissRoll, GaussianCauchy
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.sde import SGMSde, MSGMSde, PluginReverseSDE
    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.training.train import make_train_chunk

    key = jax.random.PRNGKey(0)
    out = {}

    def steps_per_s(chunk, state):
        def run(n):
            t0 = time.perf_counter()
            np.asarray(chunk(state, key, n)[1])
            return time.perf_counter() - t0

        run(64), run(512)  # compile both lengths
        t64 = min(run(64) for _ in range(3))
        t512 = min(run(512) for _ in range(3))
        return 448 / max(t512 - t64, 1e-9)

    # SGM arm
    sampler = SwissRoll()
    model = MLP(input_dim=2)
    x0 = sampler.sample(key, 256)
    variables = model.init(key, x0, jnp.zeros((256,)))
    sde = SGMSde.create(num_steps_forward=16)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    opt = optax.adam(1e-3)
    state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                       step=jnp.zeros((), jnp.int32))
    chunk = make_train_chunk(opt, sampler.sample, 256)
    out["train_sgm_fused_steps_per_s"] = steps_per_s(chunk, state)

    # MSGM arm (16-step RK4 forward solve per loss eval)
    sampler_m = GaussianCauchy(key, dim=2)
    xm = sampler_m.sample(key, 2048)
    sde_m = MSGMSde.create(key, xm, beta_max=2.0, num_steps_forward=16,
                           norm_map="log")
    model_m = MLP(input_dim=2, premodule="NormalizeLogRadius")
    vm = model_m.init(key, xm[:8], jnp.zeros((8,)))
    gen_m = PluginReverseSDE.create(sde_m, model_m.apply, vm)
    state_m = TrainState(gen_sde=gen_m, opt_state=opt.init(gen_m.a_params),
                         step=jnp.zeros((), jnp.int32))
    chunk_m = make_train_chunk(opt, sampler_m.sample, 256)
    out["train_msgm_fused_steps_per_s"] = steps_per_s(chunk_m, state_m)
    return out


def sec_flash_fwd():
    """No-grad long-sequence attention forward at T=4096, 4 heads, C=64,
    B=8: the dispatcher's choice (Pallas flash kernel when enabled, tiled
    flash-math jnp otherwise) vs the dense (T, T) math. Run once normally
    and once under SDEFLOW_DISABLE_PALLAS=1."""
    from sdeflow_tpu.ops.pallas.attention import qkv_attention, _attention_math
    from sdeflow_tpu.utils import device_seconds

    qkv = jax.random.normal(jax.random.PRNGKey(0), (8, 4096, 3 * 64))
    tag = _pallas_tag()
    existing = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = json.load(f)
    out = {}
    for name, fn in ((f"flash_{tag}", qkv_attention),
                     ("dense_math", _attention_math)):
        if name == "dense_math" and "attn_fwd_T4096_dense_math_ms" in existing:
            continue  # already measured this baseline in a previous run
        sec = device_seconds(
            lambda i: fn(qkv + 1e-6 * i, 4).mean().astype(jnp.float32),
            short=2,
        )
        out[f"attn_fwd_T4096_{name}_ms"] = sec * 1e3
    return out


def sec_flash_bwd():
    """Delegates to tools/measure_flash_bwd.py's methodology. Also measures
    the reverse-mode Pallas pair (fwd-with-stats kernel + one-pass backward
    kernel via custom_vjp) — the round-2 review's implement-or-reject item;
    the dispatch decision lives in ops/pallas/common.flash_vjp_enabled."""
    from tools.measure_flash_bwd import time_grad
    from sdeflow_tpu.ops.pallas.attention import (
        _attention_math, _attention_flash_math, flash_attention_vjp,
    )
    from sdeflow_tpu.ops.pallas.common import pallas_enabled

    qkv = jax.random.normal(jax.random.PRNGKey(0), (4, 4096, 3 * 64))
    out = {
        "attn_bwd_T4096_dense_ms": time_grad(_attention_math, qkv) * 1e3,
        "attn_bwd_T4096_flash_ms": time_grad(_attention_flash_math, qkv) * 1e3,
    }
    if pallas_enabled():
        out["attn_bwd_T4096_pallas_vjp_ms"] = (
            time_grad(flash_attention_vjp, qkv) * 1e3
        )
    return out


def sec_unet1d():
    """The d=1000 UNet1D lorenz63 signal config on TPU (round-2 review
    item 4): fused-trainer steps/s (SGM + circulant MSGM SSM), reverse
    sampling rate, and forward-pass MFU. Hyperparameters are the
    lorenz63_unet1d preset / parity arms (MSGM_higherDim.py:186-191,
    717-725): base 32, mults (1,2,4), 2 res blocks, emb 128, batch 32,
    64-step norm-corrected RK4 sampling. Timing uses unit-variance synthetic
    windows — identical shapes/program to the normalized L63 data (values
    do not affect device time)."""
    import optax

    from sdeflow_tpu.models import UNet1D
    from sdeflow_tpu.sde import SGMSde, MSGMSde, PluginReverseSDE
    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.training.train import make_train_chunk
    from sdeflow_tpu.ops.integrators import integrate_sde
    from sdeflow_tpu.utils import device_seconds, compiled_flops, peak_flops
    import time

    import numpy as np

    d, batch = 1000, 32
    key = jax.random.PRNGKey(0)
    out = {}

    def sample_fn(k, n):
        return jax.random.normal(k, (n, d), dtype=jnp.float32)

    def steps_per_s(chunk, state):
        def run(n):
            t0 = time.perf_counter()
            np.asarray(chunk(state, key, n)[1])
            return time.perf_counter() - t0

        run(16), run(144)
        t16 = min(run(16) for _ in range(3))
        t144 = min(run(144) for _ in range(3))
        return 128 / max(t144 - t16, 1e-9)

    opt = optax.adam(1e-4)
    for arm in ("sgm", "msgm"):
        is_msgm = arm == "msgm"
        premodule = "NormalizeLogRadius" if is_msgm else None
        model = UNet1D(input_dim=d, base_channels=32, channel_mults=(1, 2, 4),
                       num_res_blocks=2, premodule=premodule, emb_dim=128)
        variables = model.init(key, jnp.zeros((8, d)), jnp.zeros((8,)))
        if is_msgm:
            x_init = sample_fn(key, 4096)
            sde = MSGMSde.create(key, x_init, beta_min=0.1, beta_max=20.0,
                                 t_epsilon=1e-3, num_steps_forward=16,
                                 dense_tensor=False, norm_map="log")
        else:
            sde = SGMSde.create(beta_min=0.1, beta_max=20.0, t_epsilon=1e-3,
                                num_steps_forward=16)
        gen = PluginReverseSDE.create(sde, model.apply, variables)
        state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                           step=jnp.zeros((), jnp.int32))
        chunk = make_train_chunk(opt, sample_fn, batch)
        out[f"unet1d_d1000_{arm}_train_steps_per_s"] = steps_per_s(chunk, state)

        b_s, steps = 1024, 64
        def solve(k):
            k_lat, k_solve = jax.random.split(k)
            x0 = gen.latent_sample(k_lat, b_s, d)
            return integrate_sde(gen, x0, k_solve, steps, method="rk4",
                                 norm_correction=is_msgm)

        sec = device_seconds(
            lambda i: solve(jax.random.fold_in(key, i)).mean().astype(
                jnp.float32
            ),
            short=1,
        )
        out[f"unet1d_d1000_{arm}_sampling_samples_per_s"] = b_s / sec

    # forward-pass MFU at the sampling batch
    model = UNet1D(input_dim=d, base_channels=32, channel_mults=(1, 2, 4),
                   num_res_blocks=2, emb_dim=128)
    x = jax.random.normal(key, (1024, d))
    t = jnp.linspace(0.01, 1.0, 1024)
    variables = model.init(key, x[:8], t[:8])

    def fwd(xi):
        return model.apply(variables, xi, t)

    sec = device_seconds(lambda i: fwd(x + 1e-6 * i).mean(), short=1)
    out["unet1d_d1000_fwd_b1024_ms"] = sec * 1e3
    peak = peak_flops()
    if peak:
        out["unet1d_d1000_fwd_b1024_mfu"] = (
            compiled_flops(jax.jit(fwd), x) / sec / peak
        )
    return out


def sec_unet_trainer():
    """Fused-trainer throughput for the 16x16 image config (the piv16/grf16
    preset's training regime: VorticityUNet base 32 mults (1,2,4) res 2,
    SSM loss, batch 128, lr 1e-4; MSGM adds the 64-step circulant RK4
    forward solve per loss eval). Completes the reference's 100k-iteration
    image budget in minutes; the torch reference measures 3.4-4.4 s/step
    on this config (parity_image_reference*.json)."""
    import time

    import numpy as np
    import optax

    from sdeflow_tpu.data import SmoothedGRF
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.sde import SGMSde, MSGMSde, PluginReverseSDE
    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.training.train import make_train_chunk

    key = jax.random.PRNGKey(0)
    sampler = SmoothedGRF(npixel=16)
    batch = 128
    x_probe = sampler.sample(key, 8)
    opt = optax.adam(1e-4)
    out = {}

    def steps_per_s(chunk, state):
        def run(n):
            t0 = time.perf_counter()
            np.asarray(chunk(state, key, n)[1])
            return time.perf_counter() - t0

        run(8), run(72)
        t8 = min(run(8) for _ in range(3))
        t72 = min(run(72) for _ in range(3))
        return 64 / max(t72 - t8, 1e-9)

    for arm in ("sgm", "msgm"):
        is_msgm = arm == "msgm"
        model = VorticityUNet(
            base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
            premodule="NormalizeLogRadius" if is_msgm else None,
            in_space=16, attention_resolutions=(2, 4), flatten_order="F",
        )
        variables = model.init(key, x_probe, jnp.zeros((8,)))
        if is_msgm:
            x_init = sampler.sample(jax.random.fold_in(key, 1), 8192)
            sde = MSGMSde.create(key, x_init, beta_min=0.4, beta_max=80.0,
                                 t_epsilon=4e-3, num_steps_forward=64,
                                 dense_tensor=False, norm_map="log")
        else:
            sde = SGMSde.create(beta_min=0.4, beta_max=80.0, t_epsilon=4e-3,
                                num_steps_forward=64)
        gen = PluginReverseSDE.create(sde, model.apply, variables)
        state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                           step=jnp.zeros((), jnp.int32))
        chunk = make_train_chunk(opt, sampler.sample, batch)
        out[f"unet16_{arm}_train_steps_per_s"] = steps_per_s(chunk, state)
    return out


def sec_bf16_trainer():
    """Mixed-precision training (TrainConfig.compute_dtype="bfloat16"):
    fused-trainer steps/s with bf16 vs fp32 compute dtype, measured in one
    session for an honest ratio, on the two conv-heavy configs — the 16x16
    image VorticityUNet (SGM arm of sec_unet_trainer) and the d=1000
    UNet1D (SGM arm of sec_unet1d). Params, Adam state and the SSM loss
    reduction stay fp32 (sde/reverse.py score() boundary); only the net's
    matmuls/convs run bf16 on the MXU."""
    import time

    import numpy as np
    import optax

    from sdeflow_tpu.data import SmoothedGRF
    from sdeflow_tpu.models import UNet1D, VorticityUNet
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.training.train import make_train_chunk

    key = jax.random.PRNGKey(0)
    opt = optax.adam(1e-4)
    out = {}

    def steps_per_s(chunk, state, small, big):
        def run(n):
            t0 = time.perf_counter()
            np.asarray(chunk(state, key, n)[1])
            return time.perf_counter() - t0

        run(small), run(big)
        ts = min(run(small) for _ in range(3))
        tb = min(run(big) for _ in range(3))
        return (big - small) / max(tb - ts, 1e-9)

    sde = SGMSde.create(beta_min=0.4, beta_max=80.0, t_epsilon=4e-3,
                        num_steps_forward=64)
    sampler = SmoothedGRF(npixel=16)
    x_probe = sampler.sample(key, 8)
    for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = VorticityUNet(
            base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
            in_space=16, attention_resolutions=(2, 4), flatten_order="F",
            dtype=dtype,
        )
        variables = model.init(key, x_probe, jnp.zeros((8,)))
        gen = PluginReverseSDE.create(sde, model.apply, variables)
        state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                           step=jnp.zeros((), jnp.int32))
        chunk = make_train_chunk(opt, sampler.sample, 128)
        out[f"unet16_sgm_train_{tag}_steps_per_s"] = steps_per_s(
            chunk, state, 8, 72)

    d = 1000
    sde1d = SGMSde.create(beta_min=0.1, beta_max=20.0, t_epsilon=1e-3,
                          num_steps_forward=16)

    def sample_fn(k, n):
        return jax.random.normal(k, (n, d), dtype=jnp.float32)

    for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = UNet1D(input_dim=d, base_channels=32, channel_mults=(1, 2, 4),
                       num_res_blocks=2, emb_dim=128, dtype=dtype)
        variables = model.init(key, jnp.zeros((8, d)), jnp.zeros((8,)))
        gen = PluginReverseSDE.create(sde1d, model.apply, variables)
        state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                           step=jnp.zeros((), jnp.int32))
        chunk = make_train_chunk(opt, sample_fn, 32)
        out[f"unet1d_d1000_sgm_train_{tag}_steps_per_s"] = steps_per_s(
            chunk, state, 16, 144)
    return out


def _train_steps_per_s(train_step, state, key, sample_fn, batch,
                       short=8, long=72):
    """Slope-timed train steps/s: `long-short` steps inside ONE jitted
    dynamic-bound fori_loop (same executable for both lengths, so compile
    load on the tunnel stays at one program), state carried through."""
    import time

    import numpy as np

    @jax.jit
    def chain(state, n):
        def body(i, carry):
            st, _ = carry
            k = jax.random.fold_in(key, i)
            kd, kl = jax.random.split(k)
            x = sample_fn(kd, batch)
            return train_step(st, kl, x)

        _, loss = jax.lax.fori_loop(
            0, n, body, (state, jnp.zeros(()))
        )
        return loss

    def run(n):
        t0 = time.perf_counter()
        np.asarray(chain(state, n))
        return time.perf_counter() - t0

    run(short), run(long)
    ts = min(run(short) for _ in range(3))
    tl = min(run(long) for _ in range(3))
    return (long - short) / max(tl - ts, 1e-9)


def sec_train_mfu():
    """Characterize the SSM train step — the reference's actual hot loop
    (reference SDEs.py:607-646 + MSGM_higherDim.py:800-850) — as FLOPs and
    MFU, not just steps/s (round-4 review item 1): XLA-counted FLOPs of
    (a) one score-net forward, (b) the SSM loss (forward + Hutchinson JVP),
    (c) the full train step (loss + VJP backward + Adam), so the
    fwd/JVP/VJP decomposition is explicit; steps/s slope-timed; train MFU =
    step_flops x steps/s / peak. Covers the 16x16 image config on BOTH
    architectures (attention U-Net and DiT2D), fp32 and bf16, batch 128
    (the image-parity training batch), plus the MSGM DiT2D arm."""
    import optax

    from sdeflow_tpu.data import SmoothedGRF
    from sdeflow_tpu.models import DiT2D, VorticityUNet
    from sdeflow_tpu.sde import MSGMSde, SGMSde, PluginReverseSDE
    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.training.train import make_train_step
    from sdeflow_tpu.utils import compiled_flops, peak_flops

    key = jax.random.PRNGKey(0)
    sampler = SmoothedGRF(npixel=16)
    batch = 128
    x_probe = sampler.sample(key, 8)
    x = sampler.sample(jax.random.fold_in(key, 1), batch)
    opt = optax.adam(1e-4)
    peak = peak_flops()
    out = {}

    def make_model(archi, dtype):
        if archi == "unet16":
            return VorticityUNet(
                base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
                in_space=16, attention_resolutions=(2, 4),
                flatten_order="F", dtype=dtype,
            )
        return DiT2D(in_space=16, patch=4, width=512, depth=6, heads=4,
                     flatten_order="F", dtype=dtype)

    sde = SGMSde.create(beta_min=0.4, beta_max=80.0, t_epsilon=4e-3,
                        num_steps_forward=64)
    t_vec = jnp.linspace(0.01, 1.0, batch)
    for archi in ("unet16", "dit2d"):
        for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            model = make_model(archi, dtype)
            variables = model.init(key, x_probe, jnp.zeros((8,)))
            gen = PluginReverseSDE.create(sde, model.apply, variables)
            state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                               step=jnp.zeros((), jnp.int32))
            pre = f"{archi}_sgm_b{batch}_{tag}"

            fwd = jax.jit(lambda v, xi, ti, m=model: m.apply(v, xi, ti))
            out[pre + "_fwd_flops"] = compiled_flops(fwd, variables, x, t_vec)
            loss_fn = jax.jit(lambda k, xi, g=gen: g.ssm(k, xi).mean())
            out[pre + "_loss_flops"] = compiled_flops(loss_fn, key, x)
            step = make_train_step(opt)
            out[pre + "_step_flops"] = compiled_flops(step, state, key, x)

            sps = _train_steps_per_s(step, state, key, sampler.sample, batch)
            out[pre + "_train_steps_per_s"] = sps
            if peak:
                out[pre + "_train_mfu"] = out[pre + "_step_flops"] * sps / peak
            print(pre, out, flush=True)

    # MSGM DiT2D arm (the unet16 MSGM twin already lives in sec_unet_trainer;
    # this fills the dit2d_*_train gap): adds the 64-step circulant forward
    # RK4 solve to every loss eval
    x_init = sampler.sample(jax.random.fold_in(key, 2), 8192)
    msgm = MSGMSde.create(key, x_init, beta_min=0.4, beta_max=80.0,
                          t_epsilon=4e-3, num_steps_forward=64,
                          dense_tensor=False, norm_map="log")
    model = DiT2D(in_space=16, patch=4, width=512, depth=6, heads=4,
                  premodule="NormalizeLogRadius", flatten_order="F")
    variables = model.init(key, x_probe, jnp.zeros((8,)))
    gen = PluginReverseSDE.create(msgm, model.apply, variables)
    state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(opt)
    out["dit2d_msgm_b128_step_flops"] = compiled_flops(step, state, key, x)
    sps = _train_steps_per_s(step, state, key, sampler.sample, batch)
    out["dit2d_msgm_b128_train_steps_per_s"] = sps
    if peak:
        out["dit2d_msgm_b128_train_mfu"] = (
            out["dit2d_msgm_b128_step_flops"] * sps / peak
        )
    return out


def sec_dpm_sampling():
    """Low-NFE serving with the DPM-Solver++ 2M exponential integrator
    (ops/expint.py, SGM only): the same two SGM serving programs as the
    headline sections, at 16 score evals instead of the reference's 512
    (128-step RK4 x 4). Quality-vs-NFE for this sampler is measured
    separately (ODE_STUDY_CPU.json); this section measures device
    throughput of the compiled dpm2m programs."""
    from sdeflow_tpu.data import SmoothedGRF
    from sdeflow_tpu.models import MLP, VorticityUNet
    from sdeflow_tpu.ops.expint import integrate_dpm
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.utils import device_seconds

    key = jax.random.PRNGKey(0)
    out = {}

    # a) d=2 MLP headline config, bf16 serving mode, 16-step dpm2m
    n, d, steps = 10_000, 2, 16
    model = MLP(input_dim=d, dtype=jnp.bfloat16)
    variables = model.init(key, jnp.zeros((n, d)), jnp.zeros((n,)))
    sde = SGMSde.create(beta_min=0.1, beta_max=20.0, num_steps_forward=16)
    gen = PluginReverseSDE.create(sde, model.apply, variables)

    def solve_mlp(k):
        x0 = gen.latent_sample(k, n, d)
        return integrate_dpm(gen, x0, steps, method="dpm2m")

    sec = device_seconds(
        lambda i: solve_mlp(jax.random.fold_in(key, i)).mean().astype(jnp.float32),
        short=2,
    )
    out["dpm2m16_mlp_bf16_samples_per_s"] = n / sec

    # b) 16x16 U-Net SGM image config, B=1024, 16-step dpm2m (vs the
    #    64-step RK4 SDE = 256 U-Net evals in sec_unet_sampling)
    b, d, steps = 1024, 256, 16
    # the parity SGM image arm's SDE (tools/parity_image_ours.py)
    x_init = SmoothedGRF(npixel=16).sample(key, 64)
    sde = SGMSde.create(beta_min=0.1, beta_max=20.0, t_epsilon=4e-3,
                        num_steps_forward=64)
    for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = VorticityUNet(
            base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
            in_space=16, attention_resolutions=(2, 4), flatten_order="F",
            dtype=dtype,
        )
        variables = model.init(key, x_init[:8], jnp.zeros((8,)))
        gen = PluginReverseSDE.create(sde, model.apply, variables)

        def solve_img(k):
            x0 = gen.latent_sample(k, b, d)
            return integrate_dpm(gen, x0, steps, method="dpm2m")

        sec = device_seconds(
            lambda i: solve_img(jax.random.fold_in(key, i)).mean().astype(
                jnp.float32),
            short=1,
        )
        out[f"dpm2m16_unet16_sgm_{tag}_imgs_per_s"] = b / sec
    return out


def sec_dit():
    """DiT transformer score net (models/dit.py) on the d=1000 signal-config
    shapes, vs UNet1D's numbers in sec_unet1d: forward MFU at B=1024 and
    fused-trainer steps/s at batch 32. The DiT is sized to a comparable
    param count at much higher arithmetic density (every FLOP a wide
    matmul), so this measures how much closer the MXU gets to peak."""
    import time

    import optax

    from sdeflow_tpu.models import DiT1D
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.training.train import make_train_chunk
    from sdeflow_tpu.utils import compiled_flops, device_seconds, peak_flops

    d = 1000
    key = jax.random.PRNGKey(0)
    out = {}
    for tag, dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        model = DiT1D(input_dim=d, dtype=dtype)  # measured default shape
        x = jax.random.normal(key, (1024, d))
        variables = model.init(key, x[:8], jnp.zeros((8,)))
        n_params = sum(v.size for v in jax.tree_util.tree_leaves(variables))
        out["dit_d1000_params"] = int(n_params)

        fwd = jax.jit(lambda v, x, t: model.apply(v, x, t))
        t_vec = jnp.linspace(0.01, 1.0, 1024)
        sec = device_seconds(
            lambda i: fwd(variables, x + 0.0 * i, t_vec).mean().astype(
                jnp.float32)
        )
        out[f"dit_d1000_fwd_b1024_{tag}_ms"] = sec * 1e3
        peak = peak_flops()
        if peak:
            out[f"dit_d1000_fwd_b1024_{tag}_mfu"] = (
                compiled_flops(fwd, variables, x, t_vec) / sec / peak
            )

    # fused-trainer steps/s, batch 32 (the signal-config training shape)
    model = DiT1D(input_dim=d)
    variables = model.init(key, jnp.zeros((32, d)), jnp.zeros((32,)))
    sde = SGMSde.create(num_steps_forward=16)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    opt = optax.adam(1e-4)
    state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                       step=jnp.zeros((), jnp.int32))

    def sample_fn(k, n):
        return jax.random.normal(k, (n, d))

    chunk = make_train_chunk(opt, sample_fn, 32)
    state, _ = chunk(state, key, 16)  # compile
    times = []
    for n_steps in (64, 512):
        s2, loss = chunk(state, jax.random.fold_in(key, 1), n_steps)
        float(loss)
        t0 = time.perf_counter()
        s2, loss = chunk(state, jax.random.fold_in(key, 2), n_steps)
        float(loss)
        times.append(time.perf_counter() - t0)
    step_s = (times[1] - times[0]) / (512 - 64)
    out["dit_d1000_sgm_train_steps_per_s"] = 1.0 / step_s
    return out


def sec_dit2d():
    """DiT2D transformer score net (models/dit.py) on the 16x16 image-config
    shapes, vs the attention U-Net's numbers in sec_unet_forward /
    sec_unet_sampling: forward img/s + MFU at B=256/2048, and the
    end-to-end MSGM circulant d=256 generation rate (64-step
    norm-corrected RK4, B=1024). The U-Net's small-channel convs cap it
    near ~35% MFU (README "U-Net roofline"); DiT2D's FLOPs are all
    width-512 dense matmuls, so this measures what the MXU-native
    architecture buys on the same workload."""
    from sdeflow_tpu.data import SmoothedGRF
    from sdeflow_tpu.models import DiT2D
    from sdeflow_tpu.ops.integrators import integrate_sde
    from sdeflow_tpu.sde import MSGMSde, PluginReverseSDE
    from sdeflow_tpu.utils import compiled_flops, device_seconds, peak_flops

    key = jax.random.PRNGKey(0)
    out = {}
    for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = DiT2D(in_space=16, patch=4, width=512, depth=6, heads=4,
                      premodule="NormalizeLogRadius", flatten_order="F",
                      dtype=dtype)
        for b in (256, 2048):
            x = jax.random.normal(key, (b, 256))
            t = jnp.linspace(0.01, 1.0, b)
            variables = model.init(key, x[:8], t[:8])
            if "dit2d_params" not in out:
                out["dit2d_params"] = int(sum(
                    v.size for v in jax.tree_util.tree_leaves(variables)))

            def fwd(xi):
                return model.apply(variables, xi, t)

            sec = device_seconds(
                lambda i: fwd(x + 1e-6 * i).mean().astype(jnp.float32),
                short=1,
            )
            out[f"dit2d_fwd_b{b}_{tag}_imgs_per_s"] = b / sec
            out[f"dit2d_fwd_b{b}_{tag}_ms"] = sec * 1e3
            peak = peak_flops()
            if peak:
                out[f"dit2d_fwd_b{b}_{tag}_mfu"] = (
                    compiled_flops(jax.jit(fwd), x) / sec / peak
                )

    # end-to-end MSGM image generation (sec_unet_sampling twin)
    b, d, steps = 1024, 256, 64
    x_init = SmoothedGRF(npixel=16).sample(key, 8192)
    sde = MSGMSde.create(key, x_init, beta_min=0.4, beta_max=80.0,
                         t_epsilon=4e-3, num_steps_forward=64,
                         dense_tensor=False, norm_map="log")
    for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = DiT2D(in_space=16, patch=4, width=512, depth=6, heads=4,
                      premodule="NormalizeLogRadius", flatten_order="F",
                      dtype=dtype)
        variables = model.init(key, x_init[:8], jnp.zeros((8,)))
        gen = PluginReverseSDE.create(sde, model.apply, variables)

        def solve(k):
            k_lat, k_solve = jax.random.split(k)
            x0 = gen.latent_sample(k_lat, b, d)
            return integrate_sde(gen, x0, k_solve, steps, method="rk4",
                                 norm_correction=True)

        sec = device_seconds(
            lambda i: solve(jax.random.fold_in(key, i)).mean().astype(
                jnp.float32),
            short=1,
        )
        out[f"dit2d_msgm_sampling_{tag}_imgs_per_s"] = b / sec
    return out


SECTIONS = {
    "mlp_sampling": sec_mlp_sampling,
    "msgm_circulant": sec_msgm_circulant,
    "msgm_fwd_step": sec_msgm_fwd_step,
    "unet_forward": sec_unet_forward,
    "unet_sampling": sec_unet_sampling,
    "unet_trainer": sec_unet_trainer,
    "bf16_trainer": sec_bf16_trainer,
    "trainer": sec_trainer,
    "flash_fwd": sec_flash_fwd,
    "flash_bwd": sec_flash_bwd,
    "unet1d": sec_unet1d,
    "train_mfu": sec_train_mfu,
    "dpm_sampling": sec_dpm_sampling,
    "dit": sec_dit,
    "dit2d": sec_dit2d,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", required=True, choices=sorted(SECTIONS))
    args = ap.parse_args()

    from sdeflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    result = SECTIONS[args.section]()
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged.update({k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in result.items()})
    merged["backend"] = jax.default_backend()
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

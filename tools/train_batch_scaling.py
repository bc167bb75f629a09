"""Does the unet16 bf16 train regression vanish at compute-bound batches?

TRAIN_BF16_DIAG.json localizes the bf16-vs-fp32 train gap (196 vs 218
steps/s at the reference's batch 128) to the attention blocks' VJP, and
the compute-dtype scale fix did not move it — at b128 the attention
backward holds ~0.2 GFLOP of matmuls (microseconds at peak), so the gap
is small-op/cast overhead, not matmul dtype. This measures the same SSM
train step at batch 128 / 512 / 1024, both dtypes (slope-timed fused
chunks, one program per cell) — if bf16 crosses fp32 as the step becomes
compute-bound, the b128 regression is a small-batch artifact, matching
the forward (bf16 1.41x at b2048) and UNet1D d=1000 (bf16 1.12x) wins.

Writes TRAIN_BATCH_SCALING.json. Run on the real TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "TRAIN_BATCH_SCALING.json")


def main():
    import optax

    from sdeflow_tpu.data import SmoothedGRF
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.training.train import make_train_chunk
    from sdeflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    opt = optax.adam(1e-4)
    sampler = SmoothedGRF(npixel=16)
    x_probe = sampler.sample(key, 8)
    sde = SGMSde.create(beta_min=0.4, beta_max=80.0, t_epsilon=4e-3,
                        num_steps_forward=64)
    out = {"backend": jax.default_backend()}

    def steps_per_s(chunk, state, small, big):
        def run(n):
            t0 = time.perf_counter()
            np.asarray(chunk(state, key, n)[1])
            return time.perf_counter() - t0

        run(small), run(big)
        ts = min(run(small) for _ in range(3))
        tb = min(run(big) for _ in range(3))
        return (big - small) / max(tb - ts, 1e-9)

    for batch, small, big in ((128, 8, 72), (512, 4, 36), (1024, 2, 18)):
        for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            model = VorticityUNet(
                base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
                in_space=16, attention_resolutions=(2, 4),
                flatten_order="F", dtype=dtype,
            )
            variables = model.init(key, x_probe, jnp.zeros((8,)))
            gen = PluginReverseSDE.create(sde, model.apply, variables)
            state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                               step=jnp.zeros((), jnp.int32))
            chunk = make_train_chunk(opt, sampler.sample, batch)
            sps = steps_per_s(chunk, state, small, big)
            out[f"unet16_sgm_train_b{batch}_{tag}_steps_per_s"] = round(sps, 2)
            out[f"unet16_sgm_train_b{batch}_{tag}_imgs_per_s"] = round(
                sps * batch, 1)
            print(batch, tag, round(sps, 2), "steps/s", flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()

"""Diagnose WHERE bf16 loses to fp32 on the 16x16 image TRAIN step
(round-4 review item 1: every prior attribution was forward-only, yet the
production regression is on the trainer — 196 bf16 vs 211 fp32 steps/s).

The SSM train step = score-net forward + Hutchinson JVP (forward-mode
through the net) + VJP backward + Adam (reference hot loop:
SDEs.py:607-646, MSGM_higherDim.py:800-850). Per-op attribution by measured
ablation of the FULL train step (fp32 vs bf16, batch 128, slope-timed over
one dynamic-bound fori_loop so the tunnel compiles one program per
variant):

  full          the production train step
  precast       params pre-cast to bf16 (bf16 rows only): isolates the
                per-access fp32->bf16 weight casts — in the grad path each
                cast is also TRANSPOSED to a bf16->fp32 cast per parameter
                cotangent, so training pays it twice per step
  fp32head_off  conv_out in compute dtype (bf16 rows only)
  no_attention  attention_resolutions=() — attention fwd+JVP+VJP share
  no_groupnorm  GroupNorm+SiLU -> identity — normalization share (GN's
                fp32 statistics run HIGHEST-precision matmuls whose
                backward is fp32 regardless of compute dtype)
  convs_only    all of the above off: pure conv/dense train step
  loss_only     value (no grad/Adam): forward + Hutchinson JVP alone —
                subtracting isolates the VJP backward's share

Writes TRAIN_BF16_DIAG.json. Run on the real TPU:
    python tools/train_bf16_diag.py
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
                   "TRAIN_BF16_DIAG.json")

BATCH = 128


def make_step(dtype, attention=True, groupnorm=True, precast=False,
              fp32_head=True, loss_only=False):
    import optax

    from sdeflow_tpu.data import SmoothedGRF
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
    from sdeflow_tpu.training import TrainState
    from sdeflow_tpu.training.train import make_train_step

    key = jax.random.PRNGKey(0)
    sampler = SmoothedGRF(npixel=16)
    model = VorticityUNet(
        base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
        in_space=16, attention_resolutions=(2, 4) if attention else (),
        flatten_order="F", dtype=dtype, fp32_head=fp32_head,
    )
    variables = model.init(key, sampler.sample(key, 8), jnp.zeros((8,)))
    if precast:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            variables,
        )
    sde = SGMSde.create(beta_min=0.4, beta_max=80.0, t_epsilon=4e-3,
                        num_steps_forward=64)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    opt = optax.adam(1e-4)
    state = TrainState(gen_sde=gen, opt_state=opt.init(gen.a_params),
                       step=jnp.zeros((), jnp.int32))
    if loss_only:
        def step(st, k, x):
            return st, st.gen_sde.ssm(k, x).mean()
    else:
        step = make_train_step(opt)

    def run_variant():
        @jax.jit
        def chain(state, n):
            def body(i, carry):
                st, _ = carry
                k = jax.random.fold_in(key, i)
                kd, kl = jax.random.split(k)
                x = sampler.sample(kd, BATCH)
                st, loss = step(st, kl, x)
                return st, loss.astype(jnp.float32)

            _, loss = jax.lax.fori_loop(0, n, body, (state, jnp.zeros(())))
            return loss

        def run(n):
            t0 = time.perf_counter()
            np.asarray(chain(state, n))
            return time.perf_counter() - t0

        run(8), run(72)
        t8 = min(run(8) for _ in range(3))
        t72 = min(run(72) for _ in range(3))
        return max(t72 - t8, 1e-9) / 64

    return run_variant


def main():
    from sdeflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    out = {"backend": jax.default_backend(), "batch": BATCH}

    variants = {
        "full": dict(),
        "loss_only": dict(loss_only=True),
        "no_attention": dict(attention=False),
        "no_groupnorm": dict(groupnorm=False),
        "convs_only": dict(attention=False, groupnorm=False),
    }
    bf16_only = {
        "precast": dict(precast=True),
        "fp32head_off": dict(fp32_head=False),
    }
    for dtype_tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        rows = dict(variants)
        if dtype_tag == "bf16":
            rows.update(bf16_only)
        for name, kw in rows.items():
            groupnorm = kw.pop("groupnorm", True)
            if not groupnorm:
                import sdeflow_tpu.ops.pallas.groupnorm as G

                orig = G.group_norm_silu
                G.group_norm_silu = lambda x, g, b, grp, silu=True: x
                try:
                    sec = make_step(dtype, **kw)()
                finally:
                    G.group_norm_silu = orig
            else:
                sec = make_step(dtype, **kw)()
            key = f"{name}_{dtype_tag}"
            out[key + "_ms_per_step"] = round(sec * 1e3, 4)
            out[key + "_steps_per_s"] = round(1.0 / sec, 2)
            print(key, out[key + "_ms_per_step"], "ms/step", flush=True)

    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged.update(out)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""Diagnose WHERE bf16 loses to fp32 on the 16x16 attention U-Net forward
(VERDICT r3 #1: bf16 is the production mode yet measured slower at b256 and
only marginally ahead at b2048; MFU 0.248 vs the ~0.35 architecture cap).

Per-op attribution by measured ablation, at BOTH b256 and b2048, both
dtypes (slope-timed, utils.profiling.device_seconds — serial host timing on
the remote runtime measures tunnel RTT, not device time):

  full         the production forward
  precast      params pre-cast to bf16 before apply (bf16 rows only):
               isolates the per-call fp32->bf16 weight-cast cost the flax
               dtype= convention pays on every invocation
  fp32head_off conv_out in compute dtype (bf16 rows only): isolates the
               fp32 output head's share
  no_attention attention_resolutions=() — attention blocks' share
  no_groupnorm GroupNorm+SiLU replaced by identity — normalization share
  convs_only   all three off: pure conv/dense stack

Writes UNET_BF16_DIAG.json. Run on the real TPU:
    python tools/unet_bf16_diag.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "UNET_BF16_DIAG.json")


def make_fwd(batch, dtype, attention=True, groupnorm=True, premodule=True,
             precast=False, fp32_head=True, unfused=False):
    from sdeflow_tpu.models import VorticityUNet

    model = VorticityUNet(
        base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
        premodule="NormalizeLogRadius" if premodule else None, in_space=16,
        attention_resolutions=(2, 4) if attention else (),
        flatten_order="F", dtype=dtype, fp32_head=fp32_head,
        attention_impl="unfused" if unfused else "auto",
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 256))
    t = jnp.linspace(0.01, 1.0, batch)
    variables = model.init(key, x[:8], t[:8])
    if precast:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            variables,
        )

    if not groupnorm:
        import sdeflow_tpu.ops.pallas.groupnorm as G

        orig = G.group_norm_silu

        def fwd(xi):
            G.group_norm_silu = lambda x, g, b, grp, silu=True: x
            try:
                return model.apply(variables, xi, t)
            finally:
                G.group_norm_silu = orig

        return fwd, x
    return (lambda xi: model.apply(variables, xi, t)), x


def main():
    from sdeflow_tpu.utils import device_seconds, compiled_flops, peak_flops
    from sdeflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    out = {"backend": jax.default_backend()}
    peak = peak_flops()

    variants = {
        "full": dict(),
        "no_attention": dict(attention=False),
        "no_groupnorm": dict(groupnorm=False),
        "convs_only": dict(attention=False, groupnorm=False, premodule=False),
    }
    bf16_only = {
        "precast": dict(precast=True),
        "fp32head_off": dict(fp32_head=False),
    }
    for b in (256, 2048):
        for dtype_tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            rows = dict(variants)
            if dtype_tag == "bf16":
                rows.update(bf16_only)
            for name, kw in rows.items():
                fwd, x = make_fwd(b, dtype, **kw)
                sec = device_seconds(
                    lambda i: fwd(x + 1e-6 * i).mean().astype(jnp.float32),
                    short=1,
                )
                key = f"b{b}_{name}_{dtype_tag}"
                out[key + "_ms"] = round(sec * 1e3, 4)
                out[key + "_imgs_per_s"] = round(b / sec, 1)
                if peak and name == "full":
                    # FLOP numerator from the unfused twin: XLA's cost
                    # analysis can't count inside the fused-block custom call
                    fwd_f, xf = make_fwd(b, dtype, unfused=True)
                    out[key + "_mfu"] = round(
                        compiled_flops(jax.jit(fwd_f), xf) / sec / peak, 4
                    )
                print(key, out[key + "_ms"], "ms",
                      out[key + "_imgs_per_s"], "img/s", flush=True)

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

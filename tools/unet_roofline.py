"""Attribute the 16x16 attention U-Net forward's MFU gap (round-2 review
item 2): where do the non-MXU milliseconds go, and what does the MXU tiling
geometry cap this architecture at?

Two independent attributions, written to UNET_ROOFLINE.json:

1. **Measured ablations** (real TPU, slope-timed like tools/measure_perf.py):
   the full forward vs variants with components removed —
   attention off (attention_resolutions=()), GroupNorm+SiLU replaced by
   identity, NormalizeLogRadius premodule off, and all three at once
   (convs+denses only). Differences bound each component's share of the
   wall-clock.
2. **Analytic MXU ceiling**: per conv layer, FLOPs and the systolic-array
   tile utilization u = (K/ceil128(K)) * (Cout/ceil128(Cout)) (the MXU
   multiplies 128x128 tiles; a 3x3x32->32 conv uses K=288 of ceil 384
   contraction lanes and 32 of 128 output lanes). The FLOP-weighted mean
   utilization is the ceiling MFU this architecture can reach even with
   zero overhead between matmuls — at base 32/mults (1,2,4) the shallow
   levels waste most of the array's columns.

Run: python tools/unet_roofline.py          (real TPU)
     SDEFLOW_PALLAS_NN=1 python tools/unet_roofline.py   (fused-GN variant)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "UNET_ROOFLINE.json")


def ceil128(n):
    return ((n + 127) // 128) * 128


def analytic_ceiling(base=32, mults=(1, 2, 4), res_blocks=2, in_space=16):
    """FLOP-weighted MXU tile utilization over every conv/dense in the
    forward pass (encoder + middle + decoder, skip concats included)."""
    layers = []  # (flops, k_contract, c_out)

    def conv(hw, cin, cout, k=3):
        layers.append((2 * hw * hw * k * k * cin * cout, k * k * cin, cout))

    ch = base * mults[0]
    conv(in_space, 1, ch)  # conv_in
    hw = in_space
    hs = [ch]
    for level, m in enumerate(mults):
        for _ in range(res_blocks):
            cout = m * base
            conv(hw, ch, cout)          # in_conv
            conv(hw, cout, cout)        # out_conv
            if ch != cout:
                layers.append((2 * hw * hw * ch * cout, ch, cout))  # 1x1 skip
            ch = cout
            hs.append(ch)
        if level != len(mults) - 1:
            conv(hw, ch, ch)            # downsample stride-2 (output hw/2)
            hw //= 2
            hs.append(ch)
    conv(hw, ch, ch)                    # mid res0 (x2 convs)
    conv(hw, ch, ch)
    conv(hw, ch, ch)                    # mid res1
    conv(hw, ch, ch)
    for level, m in reversed(list(enumerate(mults))):
        for _ in range(res_blocks + 1):
            skip = hs.pop()
            cout = m * base
            conv(hw, ch + skip, cout)
            conv(hw, cout, cout)
            layers.append((2 * hw * hw * (ch + skip) * cout,
                           ch + skip, cout))  # 1x1 skip (channels differ)
            ch = cout
        if level:
            conv(hw, ch, ch)            # upsample conv at 2x size
            hw *= 2
    conv(hw, ch, 1)                     # conv_out

    total = sum(f for f, _, _ in layers)
    weighted = sum(
        f * (k / ceil128(k)) * (c / ceil128(c)) for f, k, c in layers
    )
    return dict(
        conv_flops_per_image=total,
        mxu_tile_utilization_ceiling=weighted / total,
        worst_layer_utilization=min(
            (k / ceil128(k)) * (c / ceil128(c)) for _, k, c in layers
        ),
    )


def make_fwd(dtype, attention, groupnorm, premodule, unfused=False):
    from sdeflow_tpu.models import VorticityUNet

    model = VorticityUNet(
        base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
        premodule="NormalizeLogRadius" if premodule else None, in_space=16,
        attention_resolutions=(2, 4) if attention else (),
        flatten_order="F", dtype=dtype,
        attention_impl="unfused" if unfused else "auto",
    )
    key = jax.random.PRNGKey(0)
    b = 2048
    x = jax.random.normal(key, (b, 256))
    t = jnp.linspace(0.01, 1.0, b)
    variables = model.init(key, x[:8], t[:8])

    if not groupnorm:
        # identity GroupNorm(+SiLU keeps the nonlinearity out too): isolates
        # the normalization's memory-bound share
        import sdeflow_tpu.ops.pallas.groupnorm as G

        orig = G.group_norm_silu

        def fwd(xi):
            G.group_norm_silu = lambda x, g, bta, grp, silu=True: x
            try:
                return model.apply(variables, xi, t)
            finally:
                G.group_norm_silu = orig

        return fwd, x
    return (lambda xi: model.apply(variables, xi, t)), x


def main():
    from sdeflow_tpu.utils import device_seconds, compiled_flops, peak_flops
    from sdeflow_tpu.utils.cache import enable_compilation_cache
    from sdeflow_tpu.ops.pallas.common import nn_kernels_enabled

    enable_compilation_cache()
    out = dict(analytic=analytic_ceiling(),
               gn_kernel_on=nn_kernels_enabled(),
               backend=jax.default_backend())
    peak = peak_flops()

    variants = {
        "full": dict(attention=True, groupnorm=True, premodule=True),
        "no_attention": dict(attention=False, groupnorm=True, premodule=True),
        "no_groupnorm": dict(attention=True, groupnorm=False, premodule=True),
        "no_premodule": dict(attention=True, groupnorm=True, premodule=False),
        "convs_only": dict(attention=False, groupnorm=False, premodule=False),
    }
    suffix = "_gnfused" if nn_kernels_enabled() else ""
    for dtype_tag, dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        for name, kw in variants.items():
            if nn_kernels_enabled() and name != "full":
                continue  # the fused-GN run only re-measures the full model
            fwd, x = make_fwd(dtype, **kw)
            sec = device_seconds(
                lambda i: fwd(x + 1e-6 * i).mean().astype(jnp.float32),
                short=1,
            )
            key = f"{name}_{dtype_tag}{suffix}"
            out[key + "_ms"] = round(sec * 1e3, 4)
            if peak and name in ("full", "convs_only"):
                # FLOP numerator from the unfused twin (identical params):
                # cost analysis can't see inside the fused block custom call
                fwd_flops, xf = make_fwd(dtype, unfused=True, **kw)
                out[key + "_mfu"] = round(
                    compiled_flops(jax.jit(fwd_flops), xf) / sec / peak, 4
                )
            print(key, out[key + "_ms"], "ms", flush=True)

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

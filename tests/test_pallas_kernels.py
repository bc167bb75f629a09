"""Pallas kernels: interpret-mode parity with the jnp reference math, and
autodiff dispatch (jvp/grad must work through the custom_jvp rules)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdeflow_tpu.ops.pallas.common import force_interpret, pallas_enabled
from sdeflow_tpu.ops.pallas.attention import qkv_attention, _attention_math
from sdeflow_tpu.ops.pallas.groupnorm import group_norm_silu, _gn_math
from sdeflow_tpu.ops.pallas.circulant import circulant_apply, _circ_math
from sdeflow_tpu.ops.gapply import circulant_sigma_apply


def test_attention_kernel_matches_math(rng):
    qkv = jax.random.normal(rng, (3, 64, 3 * 32))
    ref = _attention_math(qkv, num_heads=4)
    with force_interpret():
        assert pallas_enabled()
        out = qkv_attention(qkv, 4)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attention_grad_and_jvp(rng):
    qkv = jax.random.normal(rng, (2, 16, 3 * 8))
    g = jax.grad(lambda q: qkv_attention(q, 2).sum())(qkv)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0
    v = jax.random.normal(jax.random.fold_in(rng, 1), qkv.shape)
    _, tangent = jax.jvp(lambda q: qkv_attention(q, 2), (qkv,), (v,))
    _, tangent_ref = jax.jvp(lambda q: _attention_math(q, 2), (qkv,), (v,))
    assert np.allclose(np.asarray(tangent), np.asarray(tangent_ref), atol=1e-5)


def test_groupnorm_kernel_matches_math(rng):
    x = jax.random.normal(rng, (4, 49, 32)) * 3 + 1
    gamma = jax.random.normal(jax.random.fold_in(rng, 1), (32,)) + 1
    beta = jax.random.normal(jax.random.fold_in(rng, 2), (32,))
    for silu in (False, True):
        ref = _gn_math(x, gamma, beta, 8, silu)
        with force_interpret():
            out = group_norm_silu(x, gamma, beta, 8, silu)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_groupnorm_normalizes(rng):
    x = jax.random.normal(rng, (2, 100, 16)) * 5 + 2
    out = group_norm_silu(x, jnp.ones((16,)), jnp.zeros((16,)), 4, False)
    xg = np.asarray(out).reshape(2, 100, 4, 4)
    assert np.allclose(xg.mean(axis=(1, 3)), 0.0, atol=1e-4)
    assert np.allclose(xg.var(axis=(1, 3)), 1.0, atol=1e-3)


def test_groupnorm_grad(rng):
    x = jax.random.normal(rng, (2, 10, 8))
    gamma, beta = jnp.ones((8,)), jnp.zeros((8,))
    g = jax.grad(lambda a: group_norm_silu(a, gamma, beta, 4, True).sum())(x)
    assert bool(jnp.isfinite(g).all())


def test_circulant_kernel_matches_math(rng):
    y = jax.random.normal(rng, (300, 256))  # pads rows (300 -> 512 blocks)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (300, 256))
    sb = jnp.full((300, 1), 1.3)
    ref = _circ_math(sb, y, w)
    with force_interpret():
        out = circulant_apply(sb, y, w)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # consistency with the plain gapply stencil
    assert np.allclose(
        np.asarray(ref), np.asarray(circulant_sigma_apply(sb, y, w)), atol=1e-6
    )


def test_circulant_jvp(rng):
    y = jax.random.normal(rng, (8, 16))
    w = jax.random.normal(jax.random.fold_in(rng, 1), (8, 16))
    sb = jnp.ones((8, 1))
    dy = jax.random.normal(jax.random.fold_in(rng, 2), y.shape)
    _, t1 = jax.jvp(lambda yy: circulant_apply(sb, yy, w), (y,), (dy,))
    _, t2 = jax.jvp(lambda yy: _circ_math(sb, yy, w), (y,), (dy,))
    assert np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)


def test_unet_with_kernels_still_trains(rng):
    """The U-Net (now routed through the fused GroupNorm+SiLU and attention
    ops) must still produce gradients through the SSM loss path."""
    from sdeflow_tpu.models import VorticityUNet
    from sdeflow_tpu.sde import SGMSde, PluginReverseSDE

    model = VorticityUNet(base_channels=8, channel_mults=(1, 2),
                          num_res_blocks=1, in_space=16,
                          attention_resolutions=(2,))
    x = jax.random.normal(rng, (4, 256))
    variables = model.init(rng, x, jnp.zeros((4,)))
    gen = PluginReverseSDE.create(SGMSde.create(), model.apply, variables)

    def loss(params):
        return gen.replace(a_params=params).ssm(jax.random.fold_in(rng, 1), x).mean()

    val, grads = jax.value_and_grad(loss)(gen.a_params)
    assert bool(jnp.isfinite(val))
    assert all(
        bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(grads)
    )


def test_flash_attention_matches_math(rng):
    """The flash-tiled long-sequence path (online softmax over KV tiles)
    must agree with the reference math; exercised at T=2048 where the
    single-block (T, T) scores would be 16 MB."""
    from sdeflow_tpu.ops.pallas.attention import _attention_flash

    qkv = jax.random.normal(rng, (2, 2048, 3 * 16)) * 2.0
    ref = _attention_math(qkv, num_heads=2)
    with force_interpret():
        out = _attention_flash(qkv, 2)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    # dispatcher routes long sequences to the flash path
    with force_interpret():
        out2 = qkv_attention(qkv, 2)
    assert np.allclose(np.asarray(out2), np.asarray(ref), atol=2e-4)


def test_fused_rk4_step_kernel_matches_math(rng):
    """The fused whole-RK4-step circulant kernel (4 stencil stages + combine
    in one Pallas program, SURVEY §7 step 8) against its jnp reference, in
    interpreter mode."""
    from sdeflow_tpu.ops.pallas.circulant import (
        circulant_rk4_step,
        _rk4_math_fwd,
    )

    b, d = 8, 256
    x = jax.random.normal(rng, (b, d))
    w = jax.random.normal(jax.random.fold_in(rng, 1), (b, d)) * 0.1
    sb3 = jnp.abs(jax.random.normal(jax.random.fold_in(rng, 2), (b, 3))) + 0.5
    ref = _rk4_math_fwd(sb3, x, w)
    with force_interpret():
        out = circulant_rk4_step(sb3, x, w)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # jvp routes through the identical math (SSM-path forward mode)
    v = (jnp.zeros_like(sb3), jnp.ones_like(x) * 0.01, jnp.zeros_like(w))
    _, tan = jax.jvp(circulant_rk4_step, (sb3, x, w), v)
    _, tan_ref = jax.jvp(_rk4_math_fwd, (sb3, x, w), v)
    assert np.allclose(np.asarray(tan), np.asarray(tan_ref), atol=1e-5)


def test_fused_rk4_forward_flow_matches_generic(rng):
    """ForwardFlow.rk4_step on a circulant MSGM must equal the generic
    per-stage composition (zero Stratonovich drift + stencil stages)."""
    from sdeflow_tpu.sde import MSGMSde
    from sdeflow_tpu.sde.forward import ForwardFlow
    from sdeflow_tpu.ops.integrators import rk4_step as generic_rk4

    d = 256
    x0 = jax.random.normal(rng, (32, d))
    sde = MSGMSde.create(rng, x0, dense_tensor=False, num_steps_forward=8)
    flow = ForwardFlow(base_sde=sde, T=sde.T)
    t = jnp.float32(0.25)
    delta = jnp.float32(0.125)
    dW = jax.random.normal(jax.random.fold_in(rng, 1), (32, d)) * 0.1
    fused = flow.rk4_step(t, x0, delta, dW)
    generic = generic_rk4(flow, t, x0, delta, dW)
    assert np.allclose(np.asarray(fused), np.asarray(generic), atol=1e-5)


def test_flash_math_matches_math(rng):
    """The jnp flash-tiled autodiff path (scan over KV tiles, remat body)
    is the same function as the (T, T) reference up to fp reordering."""
    from sdeflow_tpu.ops.pallas.attention import _attention_flash_math

    qkv = jax.random.normal(rng, (2, 2048, 3 * 16)) * 2.0
    ref = _attention_math(qkv, num_heads=2)
    out = _attention_flash_math(qkv, 2)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_flash_attention_grad_and_jvp_long_seq(rng):
    """jax.grad AND the SSM-path jvp of qkv_attention at T > 1024 must match
    the dense reference — the backward now runs through the O(T)-memory
    flash-math scan, not the materialized (T, T) weights."""
    qkv = jax.random.normal(rng, (1, 2048, 3 * 8))

    g = jax.grad(lambda q: (qkv_attention(q, 2) ** 2).sum())(qkv)
    g_ref = jax.grad(lambda q: (_attention_math(q, 2) ** 2).sum())(qkv)
    assert np.allclose(np.asarray(g), np.asarray(g_ref), atol=3e-4)

    v = jax.random.normal(jax.random.fold_in(rng, 1), qkv.shape)
    _, tangent = jax.jvp(lambda q: qkv_attention(q, 2), (qkv,), (v,))
    _, tangent_ref = jax.jvp(lambda q: _attention_math(q, 2), (qkv,), (v,))
    assert np.allclose(np.asarray(tangent), np.asarray(tangent_ref), atol=3e-4)


def test_flash_math_grad_memory_is_tiled():
    """Compiled-memory evidence for the O(T·block) backward: XLA's temp
    allocation for grad(flash_math) at T=4096 must be far below
    grad(dense math), which keeps (T, T) weights alive per head."""
    from sdeflow_tpu.ops.pallas.attention import _attention_flash_math

    t, c = 4096, 16
    shape = jax.ShapeDtypeStruct((1, t, 3 * c), jnp.float32)

    def temp_bytes(fn):
        g = jax.jit(jax.grad(lambda q: (fn(q, 1) ** 2).sum()))
        return g.lower(shape).compile().memory_analysis().temp_size_in_bytes

    dense = temp_bytes(_attention_math)
    flash = temp_bytes(_attention_flash_math)
    # dense keeps ~2 fp32 (T, T) buffers (fwd weights + bwd); flash holds
    # only (T, kv_block) tiles
    assert flash < dense / 4, f"flash temp {flash} vs dense temp {dense}"


def test_flash_stats_kernel_matches_math(rng):
    """Forward flash kernel with stats: output matches the dense math and the
    emitted lse equals logsumexp of the scaled scores."""
    from sdeflow_tpu.ops.pallas.attention import _attention_flash_stats

    b, t, c, h = 2, 256, 32, 2
    qkv = jax.random.normal(rng, (b, t, 3 * c))
    ref = _attention_math(qkv, h)
    with force_interpret():
        out, lse = _attention_flash_stats(qkv, h)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # lse oracle from the dense scores
    ch = c // h
    qkv_h = qkv.reshape(b, t, h, 3 * ch)
    scale = 1.0 / np.sqrt(np.sqrt(ch))
    q = np.asarray(qkv_h[..., :ch]) * scale
    k = np.asarray(qkv_h[..., ch : 2 * ch]) * scale
    s = np.einsum("bthc,bshc->bhts", q, k)
    lse_ref = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    assert np.allclose(np.asarray(lse), lse_ref, atol=1e-4)


def test_flash_vjp_grad_matches_math(rng):
    """The one-pass Pallas backward kernel reproduces XLA's gradient of the
    dense attention math (dq, dk, dv packed in dqkv)."""
    from sdeflow_tpu.ops.pallas.attention import flash_attention_vjp

    b, t, c, h = 2, 256, 32, 4
    qkv = jax.random.normal(rng, (b, t, 3 * c))
    g = jax.random.normal(jax.random.fold_in(rng, 1), (b, t, c))
    with force_interpret():
        out = flash_attention_vjp(qkv, h)
        grad = jax.grad(
            lambda q: jnp.vdot(flash_attention_vjp(q, h), g)
        )(qkv)
    ref_out = _attention_math(qkv, h)
    ref_grad = jax.grad(lambda q: jnp.vdot(_attention_math(q, h), g))(qkv)
    assert np.allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    assert np.allclose(np.asarray(grad), np.asarray(ref_grad), atol=2e-4), (
        np.abs(np.asarray(grad) - np.asarray(ref_grad)).max()
    )


def test_attention_core_dispatch(rng, monkeypatch):
    """attention_core: default path is the custom_jvp qkv_attention (fwd-mode
    works); with the flag + a qualifying T it routes to the custom_vjp pair."""
    from sdeflow_tpu.ops.pallas import attention as A
    from sdeflow_tpu.ops.pallas import common as C

    qkv = jax.random.normal(rng, (1, 64, 3 * 8))
    v = jax.random.normal(jax.random.fold_in(rng, 1), qkv.shape)
    # short T: identical to qkv_attention, jvp fine
    out, tan = jax.jvp(lambda q: A.attention_core(q, 2), (qkv,), (v,))
    assert np.all(np.isfinite(np.asarray(tan)))

    monkeypatch.setattr(C, "_FLASH_VJP", True)
    qkv_long = jax.random.normal(rng, (1, 2048, 3 * 8))
    with force_interpret():
        out_vjp = A.attention_core(qkv_long, 1)
        out_ref = A._attention_math(qkv_long, 1)
        assert np.allclose(np.asarray(out_vjp), np.asarray(out_ref), atol=1e-5)
        # reverse mode through the custom_vjp pair works...
        gr = jax.grad(lambda q: A.attention_core(q, 1).sum())(qkv_long)
        assert np.all(np.isfinite(np.asarray(gr)))
        # ...and forward mode raises the documented custom_vjp error
        with pytest.raises(TypeError):
            jax.jvp(lambda q: A.attention_core(q, 1), (qkv_long,),
                    (jnp.ones_like(qkv_long),))


def test_fused_attention_block_param_and_output_parity(rng):
    """attention_impl='auto' (fused whole-block) vs 'unfused' (module
    composition): identical param trees AND init values (path-derived RNG),
    identical outputs/grads, and the forward-mode JVP (SSM loss) works."""
    from sdeflow_tpu.models.unet2d import AttentionBlock

    c = 32
    fused = AttentionBlock(channels=c, num_heads=1)
    unfused = AttentionBlock(channels=c, num_heads=1,
                             attention_impl="unfused")
    x = jax.random.normal(rng, (2, 4, 4, c))
    vf = fused.init(rng, x)
    vu = unfused.init(rng, x)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vu)
    for a, b in zip(jax.tree_util.tree_leaves(vf),
                    jax.tree_util.tree_leaves(vu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # perturb params away from the zero-init proj so the core actually runs
    vf = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.ones_like(a), vf
    )
    yf = fused.apply(vf, x)
    yu = unfused.apply(vf, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu), atol=2e-5)

    g = jax.random.normal(jax.random.fold_in(rng, 1), yf.shape)
    gf = jax.grad(lambda v: jnp.vdot(fused.apply(v, x), g))(vf)
    gu = jax.grad(lambda v: jnp.vdot(unfused.apply(v, x), g))(vf)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    v_t = jax.random.normal(jax.random.fold_in(rng, 2), x.shape)
    _, tan = jax.jvp(lambda xi: fused.apply(vf, xi), (x,), (v_t,))
    _, tan_u = jax.jvp(lambda xi: unfused.apply(vf, xi), (x,), (v_t,))
    np.testing.assert_allclose(np.asarray(tan), np.asarray(tan_u),
                               rtol=1e-4, atol=1e-5)


def test_fused_attention_block_kernel_matches_math(rng):
    """The one-program Pallas block (interpret mode) reproduces the jnp
    composition at both U-Net attention shapes, in fp32 AND on the `native`
    sub-fp32 branch (folded GN affine, compute-dtype residual)."""
    from sdeflow_tpu.ops.pallas.attnblock import (
        _attn_block_math, _attn_block_pallas,
    )

    # bf16: kernel and math both run compute-dtype score operands with
    # fp32 accumulation, but packing reorders the accumulation — a few
    # elements land one bf16 ulp (~0.03 at these magnitudes) apart
    for dtype, atol in ((jnp.float32, 5e-5), (jnp.bfloat16, 4e-2)):
        for t, c in ((64, 64), (16, 128)):
            x = jax.random.normal(rng, (4, t, c)).astype(dtype)
            k1, k2 = jax.random.split(jax.random.fold_in(rng, t))
            gn_s = 1.0 + 0.1 * jax.random.normal(k1, (c,))
            gn_b = 0.1 * jax.random.normal(k2, (c,))
            wqkv = jax.random.normal(k1, (c, 3 * c)) / np.sqrt(c)
            bqkv = 0.01 * jax.random.normal(k2, (3 * c,))
            wproj = jax.random.normal(k2, (c, c)) / np.sqrt(c)
            bproj = 0.01 * jax.random.normal(k1, (c,))
            groups = 32
            ref = _attn_block_math(x, gn_s, gn_b, wqkv, bqkv, wproj, bproj,
                                   groups)
            with force_interpret():
                out = _attn_block_pallas(x, gn_s, gn_b, wqkv, bqkv, wproj,
                                         bproj, groups)
            assert out.dtype == dtype
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                atol=atol, err_msg=f"{dtype} t={t} c={c}")


def test_fused_attention_block_multihead(rng):
    """heads > 1 (static in-kernel head loop): the math twin matches the
    unfused MODULE composition — layout parity with attention_core's
    interleaved per-head [q_h k_h v_h] channel split — and the Pallas
    kernel (interpret mode) matches the math twin in fp32 and bf16 at both
    U-Net attention shapes, with sample packing active."""
    from sdeflow_tpu.models.unet2d import AttentionBlock
    from sdeflow_tpu.ops.pallas.attnblock import (
        _attn_block_math, _attn_block_pallas,
    )

    c = 64
    fused = AttentionBlock(channels=c, num_heads=4)
    unfused = AttentionBlock(channels=c, num_heads=4,
                             attention_impl="unfused")
    x = jax.random.normal(rng, (2, 4, 4, c))
    v = fused.init(rng, x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(unfused.init(rng, x)))
    v = jax.tree_util.tree_map(lambda a: a + 0.05 * jnp.ones_like(a), v)
    np.testing.assert_allclose(np.asarray(fused.apply(v, x)),
                               np.asarray(unfused.apply(v, x)), atol=2e-5)
    # forward-mode JVP (the SSM loss path) agrees too
    v_t = jax.random.normal(jax.random.fold_in(rng, 1), x.shape)
    _, tan = jax.jvp(lambda xi: fused.apply(v, xi), (x,), (v_t,))
    _, tan_u = jax.jvp(lambda xi: unfused.apply(v, xi), (x,), (v_t,))
    np.testing.assert_allclose(np.asarray(tan), np.asarray(tan_u),
                               rtol=1e-4, atol=1e-5)

    for heads in (2, 4):
        # bf16 atol looser than the single-head test: the packed per-head
        # kernel and the einsum math accumulate in different orders
        for dtype, atol in ((jnp.float32, 5e-5), (jnp.bfloat16, 4e-2)):
            for t, cc in ((64, 64), (16, 128)):
                xk = jax.random.normal(rng, (4, t, cc)).astype(dtype)
                k1, k2 = jax.random.split(jax.random.fold_in(rng, t + heads))
                gn_s = 1.0 + 0.1 * jax.random.normal(k1, (cc,))
                gn_b = 0.1 * jax.random.normal(k2, (cc,))
                wqkv = jax.random.normal(k1, (cc, 3 * cc)) / np.sqrt(cc)
                bqkv = 0.01 * jax.random.normal(k2, (3 * cc,))
                wproj = jax.random.normal(k2, (cc, cc)) / np.sqrt(cc)
                bproj = 0.01 * jax.random.normal(k1, (cc,))
                ref = _attn_block_math(xk, gn_s, gn_b, wqkv, bqkv, wproj,
                                       bproj, 32, heads)
                with force_interpret():
                    out = _attn_block_pallas(xk, gn_s, gn_b, wqkv, bqkv,
                                             wproj, bproj, 32, heads)
                assert out.dtype == dtype
                np.testing.assert_allclose(
                    np.asarray(out, np.float32), np.asarray(ref, np.float32),
                    atol=atol, err_msg=f"heads={heads} {dtype} t={t} c={cc}")


def test_attn_pack_env_override_rounds_to_power_of_two(rng, monkeypatch):
    """A non-power-of-two SDEFLOW_ATTN_PACK (e.g. 3) must not blow up the
    kernel's reshape at trace time — it is rounded down to a power of two."""
    from sdeflow_tpu.ops.pallas.attnblock import (
        _attn_block_math, _attn_block_pallas,
    )

    t, c, groups = 16, 32, 32
    x = jax.random.normal(rng, (8, t, c))
    k1, k2 = jax.random.split(rng)
    gn_s = jnp.ones((c,))
    gn_b = jnp.zeros((c,))
    wqkv = jax.random.normal(k1, (c, 3 * c)) / np.sqrt(c)
    bqkv = jnp.zeros((3 * c,))
    wproj = jax.random.normal(k2, (c, c)) / np.sqrt(c)
    bproj = jnp.zeros((c,))
    ref = _attn_block_math(x, gn_s, gn_b, wqkv, bqkv, wproj, bproj, groups)
    for bad in ("3", "0"):
        monkeypatch.setenv("SDEFLOW_ATTN_PACK", bad)
        with force_interpret():
            out = _attn_block_pallas(x, gn_s, gn_b, wqkv, bqkv, wproj,
                                     bproj, groups)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, err_msg=f"pack={bad}")

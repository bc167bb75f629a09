"""Mixed-precision (bfloat16 compute) training and serving.

No reference counterpart — the reference trains pure-fp32 CUDA. Here the
score nets take a ``dtype`` knob (flax compute dtype: params stay fp32,
operands are cast per-op so the MXU sees bf16), `PluginReverseSDE.score`
casts the net output back to the state dtype so the SDE algebra / Hutchinson
JVP / ‖a‖² reduction run fp32, and `TrainConfig.compute_dtype` /
`run.py --compute-dtype bfloat16` thread it through the driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sdeflow_tpu.configs import get_preset
from sdeflow_tpu.experiments.driver import make_model
from sdeflow_tpu.models import MLP, UNet1D
from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
from dataclasses import replace


def _all_param_dtypes(params):
    return {leaf.dtype for leaf in jax.tree_util.tree_leaves(params)}


def test_unet1d_bf16_params_stay_fp32(rng):
    model = UNet1D(input_dim=24, base_channels=4, channel_mults=(1, 2),
                   premodule="NormalizeLogRadius", emb_dim=8,
                   dtype=jnp.bfloat16)
    x = jax.random.normal(rng, (3, 24))
    variables = model.init(rng, x, jnp.zeros((3,)))
    assert _all_param_dtypes(variables["params"]) == {jnp.dtype(jnp.float32)}
    out = model.apply(variables, x, jnp.full((3,), 0.5))
    # the body runs bf16 but the default fp32 head emits fp32
    assert out.dtype == jnp.float32
    out16 = UNet1D(input_dim=24, base_channels=4, channel_mults=(1, 2),
                   premodule="NormalizeLogRadius", emb_dim=8,
                   dtype=jnp.bfloat16, fp32_head=False,
                   ).apply(variables, x, jnp.full((3,), 0.5))
    assert out16.dtype == jnp.bfloat16
    assert out.shape == (3, 24)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_unet1d_bf16_close_to_fp32(rng):
    """Same params, bf16 vs fp32 compute: outputs agree to bf16 tolerance."""
    kw = dict(input_dim=24, base_channels=4, channel_mults=(1, 2),
              premodule="NormalizeLogRadius", emb_dim=8)
    x = jax.random.normal(rng, (8, 24))
    t = jnp.full((8,), 0.3)
    m32 = UNet1D(**kw)
    variables = m32.init(rng, x, t)
    y32 = m32.apply(variables, x, t)
    y16 = UNet1D(**kw, dtype=jnp.bfloat16).apply(variables, x, t)
    err = jnp.abs(y16.astype(jnp.float32) - y32)
    scale = jnp.maximum(jnp.abs(y32), 1e-2)
    assert float(jnp.median(err / scale)) < 0.1


def test_score_boundary_is_state_dtype(rng):
    """score() output is fp32 even with a bf16 net, so the SSM loss math
    (Hutchinson JVP + squared-norm reduction) runs in fp32."""
    model = MLP(input_dim=2, index_dim=1, hidden_dim=16,
                dtype=jnp.bfloat16)
    x = jax.random.normal(rng, (16, 2))
    variables = model.init(rng, x, jnp.zeros((16,)))
    sde = SGMSde.create(num_steps_forward=8)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    a = gen.score(x, jnp.full((16,), 0.5))
    assert a.dtype == jnp.float32
    loss = gen.ssm(rng, x)
    assert loss.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(loss)))


def test_bf16_training_decreases_loss(rng):
    """A bf16-compute MLP trains through bare Adam: fp32 params/opt state
    throughout, loss decreases on a fixed 2-d mixture batch."""
    key_data, key_init, key_train = jax.random.split(rng, 3)
    centers = jnp.asarray([[-2.0, 0.0], [2.0, 0.0]])
    comp = jax.random.bernoulli(key_data, shape=(256,)).astype(jnp.int32)
    x = centers[comp] + 0.3 * jax.random.normal(key_data, (256, 2))

    model = MLP(input_dim=2, index_dim=1, hidden_dim=32, dtype=jnp.bfloat16)
    variables = model.init(key_init, x, jnp.zeros((256,)))
    sde = SGMSde.create(num_steps_forward=8)
    gen = PluginReverseSDE.create(sde, model.apply, variables)

    opt = optax.adam(1e-3)
    opt_state = opt.init(variables)

    @jax.jit
    def step(variables, opt_state, key):
        def loss_fn(v):
            g = gen.replace(a_params=v)
            return jnp.mean(g.ssm(key, x))

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    losses = []
    v = variables
    for i in range(300):
        key_train, k = jax.random.split(key_train)
        v, opt_state, loss = step(v, opt_state, k)
        losses.append(float(loss))
    assert _all_param_dtypes(v["params"]) == {jnp.dtype(jnp.float32)}
    # grads land fp32 (loss boundary is fp32), so Adam state is fp32 too
    assert jnp.dtype(jnp.bfloat16) not in _all_param_dtypes(opt_state)
    assert np.mean(losses[-50:]) < np.mean(losses[:20]) - 1.0
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("preset,dim", [
    ("swissroll", 2),
    ("lorenz63_unet1d", 24),
    ("lorenz63_dit", 32),
])
def test_make_model_threads_compute_dtype(preset, dim):
    cfg = get_preset(preset)
    cfg = replace(cfg, train=replace(cfg.train, compute_dtype="bfloat16"))
    model = make_model(cfg, dim, premodule=None)
    assert model.dtype == jnp.bfloat16


def test_make_model_rejects_unknown_dtype():
    cfg = get_preset("swissroll")
    cfg = replace(cfg, train=replace(cfg.train, compute_dtype="float16"))
    with pytest.raises(ValueError, match="compute_dtype"):
        make_model(cfg, 2, premodule=None)


def test_fp32_head_default(rng):
    """The output projection runs fp32 under a bf16 compute dtype by
    default (fp32_head=True): the head output is exact fp32 math on the
    (bf16-rounded) last hidden layer. With fp32 compute the knob is a
    no-op (bitwise-identical outputs)."""
    x = jax.random.normal(rng, (16, 2))
    t = jnp.full((16,), 0.5)
    kw = dict(input_dim=2, index_dim=1, hidden_dim=32)
    v = MLP(**kw).init(rng, x, t)

    # no-op for fp32 compute
    y_on = MLP(**kw, fp32_head=True).apply(v, x, t)
    y_off = MLP(**kw, fp32_head=False).apply(v, x, t)
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))

    # bf16 compute: fp32 head = fp32 matmul of the bf16 hidden state, so
    # it matches the manual reference exactly, while the bf16 head differs
    y16_on = MLP(**kw, dtype=jnp.bfloat16, fp32_head=True).apply(v, x, t)
    y16_off = MLP(**kw, dtype=jnp.bfloat16, fp32_head=False).apply(v, x, t)
    assert y16_on.dtype == jnp.float32  # MLP returns fp32 at the boundary
    assert not np.array_equal(np.asarray(y16_on), np.asarray(y16_off))
    # (pointwise error vs the fp32 model is dominated by the shared bf16
    # body on a random net — the quality effect of the head is measured
    # end to end in BF16_ABLATION.json, not asserted here)

"""Serving: exported sampler round-trips through serialization and matches
the in-process program exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from sdeflow_tpu.data import SwissRoll
from sdeflow_tpu.models import MLP
from sdeflow_tpu.sde import SGMSde, PluginReverseSDE
from sdeflow_tpu.serving import make_sampler_fn, export_sampler, Sampler


def _mk_gen(rng):
    sampler = SwissRoll()
    model = MLP(input_dim=2)
    x = sampler.sample(rng, 32)
    variables = model.init(rng, x, jnp.zeros((32,)))
    return PluginReverseSDE.create(
        SGMSde.create(num_steps_forward=8), model.apply, variables
    )


def test_export_roundtrip_matches_inprocess(rng, tmp_path):
    gen = _mk_gen(rng)
    path = str(tmp_path / "model.sdeflow")
    meta = export_sampler(gen, path, num_samples=64, dim=2, num_steps=16)
    assert meta["num_samples"] == 64

    served = Sampler(path)
    key = jax.random.PRNGKey(7)
    out_served = served(key)
    out_direct = make_sampler_fn(gen, 64, 2, 16)(key)
    assert out_served.shape == (64, 2)
    assert np.allclose(np.asarray(out_served), np.asarray(out_direct),
                       rtol=1e-4, atol=1e-3)
    # deterministic per key, different across keys
    assert np.allclose(np.asarray(served(key)), np.asarray(out_served))
    assert not np.allclose(
        np.asarray(served(jax.random.PRNGKey(8))), np.asarray(out_served)
    )


def test_exported_artifact_is_self_contained(rng, tmp_path):
    """The serving handle needs only the artifact bytes — no model code or
    params in scope."""
    gen = _mk_gen(rng)
    path = str(tmp_path / "standalone.sdeflow")
    export_sampler(gen, path, num_samples=16, dim=2, num_steps=4)
    del gen
    s = Sampler(path)
    out = s(jax.random.PRNGKey(0))
    assert out.shape == (16, 2)
    assert bool(jnp.isfinite(out).all())
    assert s.meta["method"] == "rk4"


def test_export_msgm_norm_corrected_sampler(rng, tmp_path):
    """MSGM generation program (radial latent prior + norm-corrected RK4)
    exports and serves: radii of served samples follow the training norms."""
    import jax.numpy as jnp
    from sdeflow_tpu.sde import MSGMSde
    from sdeflow_tpu.serving import export_sampler, Sampler

    x_init = jax.random.normal(rng, (2000, 4)) * 2.0
    sde = MSGMSde.create(jax.random.fold_in(rng, 1), x_init,
                         num_steps_forward=8, norm_map="log")
    from sdeflow_tpu.models import MLP

    model = MLP(input_dim=4, premodule="NormalizeLogRadius")
    variables = model.init(rng, x_init[:4], jnp.zeros((4,)))
    from sdeflow_tpu.sde import PluginReverseSDE

    gen = PluginReverseSDE.create(sde, model.apply, variables)
    path = str(tmp_path / "msgm.sdeflow")
    export_sampler(gen, path, num_samples=256, dim=4, num_steps=8,
                   norm_correction=True)
    out = Sampler(path)(jax.random.PRNGKey(5))
    assert out.shape == (256, 4)
    r = np.asarray(jnp.linalg.norm(out, axis=1))
    r_data = np.asarray(jnp.linalg.norm(x_init, axis=1))
    # norm correction preserves the latent radial law exactly
    assert abs(np.median(r) - np.median(r_data)) < 0.3


def test_polymorphic_batch_export(rng, tmp_path):
    """One artifact, any batch size: the symbolic-batch program serves
    b=64 and b=256, matches the fixed-batch artifact bitwise at its own
    batch size, and the fixed artifact refuses other batch sizes."""
    import pytest

    gen = _mk_gen(rng)
    fixed = str(tmp_path / "fixed.sdeflow")
    poly = str(tmp_path / "poly.sdeflow")
    export_sampler(gen, fixed, num_samples=64, dim=2, num_steps=8)
    meta = export_sampler(gen, poly, num_samples=64, dim=2, num_steps=8,
                          polymorphic_batch=True)
    assert meta["polymorphic_batch"] is True

    s_poly, s_fixed = Sampler(poly), Sampler(fixed)
    key = jax.random.PRNGKey(11)
    out64 = s_poly(key)  # defaults to the recorded num_samples
    out256 = s_poly(key, num_samples=256)
    assert out64.shape == (64, 2) and out256.shape == (256, 2)
    assert bool(jnp.isfinite(out256).all())
    # identical math at the exported default batch
    np.testing.assert_array_equal(np.asarray(out64),
                                  np.asarray(s_fixed(key)))
    with pytest.raises(ValueError, match="polymorphic_batch=True"):
        s_fixed(key, num_samples=256)


def test_polymorphic_batch_msgm_and_dpm(rng, tmp_path):
    """The symbolic batch dimension traces through the MSGM radial latent
    prior (quantile inversion) and the dpm2m exponential integrator."""
    from sdeflow_tpu.sde import MSGMSde

    x_init = jax.random.normal(rng, (500, 4)) * 2.0
    sde = MSGMSde.create(jax.random.fold_in(rng, 1), x_init,
                         num_steps_forward=4, norm_map="log")
    model = MLP(input_dim=4, premodule="NormalizeLogRadius")
    variables = model.init(rng, x_init[:4], jnp.zeros((4,)))
    gen_m = PluginReverseSDE.create(sde, model.apply, variables)
    path_m = str(tmp_path / "msgm_poly.sdeflow")
    export_sampler(gen_m, path_m, num_samples=32, dim=4, num_steps=4,
                   norm_correction=True, polymorphic_batch=True)
    out = Sampler(path_m)(jax.random.PRNGKey(2), num_samples=96)
    assert out.shape == (96, 4) and bool(jnp.isfinite(out).all())

    gen_s = _mk_gen(rng)
    path_d = str(tmp_path / "dpm_poly.sdeflow")
    export_sampler(gen_s, path_d, num_samples=32, dim=2, num_steps=8,
                   sampler="dpm", method="dpm2m", polymorphic_batch=True)
    out = Sampler(path_d)(jax.random.PRNGKey(3), num_samples=128)
    assert out.shape == (128, 2) and bool(jnp.isfinite(out).all())


def test_export_encoder_roundtrip(rng, tmp_path):
    """Exported encoder program == in-process encode_ode bitwise; the
    polymorphic artifact serves any batch size; decode inverts it."""
    import pytest

    from sdeflow_tpu.ops.ode import encode_ode, integrate_ode
    from sdeflow_tpu.serving import Encoder, export_encoder

    gen = _mk_gen(rng)
    x = jax.random.normal(rng, (16, 2))
    path = str(tmp_path / "m.encoder")
    meta = export_encoder(gen, path, 16, 2, 32)
    assert meta["kind"] == "encoder" and not meta["polymorphic_batch"]
    enc = Encoder(path)
    np.testing.assert_array_equal(enc(x), encode_ode(gen, x, 32))
    with pytest.raises(ValueError):
        enc(x[:8])

    ppath = str(tmp_path / "m_poly.encoder")
    export_encoder(gen, ppath, 16, 2, 32, polymorphic_batch=True)
    enc_p = Encoder(ppath)
    for b in (4, 16, 33):
        xb = jax.random.normal(jax.random.fold_in(rng, b), (b, 2))
        z = enc_p(xb)
        assert z.shape == (b, 2)
        np.testing.assert_allclose(
            integrate_ode(gen, z, 32), xb, atol=5e-3, rtol=0
        )


def test_export_bf16_net(rng, tmp_path):
    """A bfloat16 compute-dtype score net exports and serves: the bf16
    casts are baked into the serialized program, the artifact reproduces
    the in-process mixed-precision sampler, and outputs stay fp32 at the
    boundary (PluginReverseSDE.score casts back to the state dtype)."""
    sampler = SwissRoll()
    model = MLP(input_dim=2, dtype=jnp.bfloat16)
    x = sampler.sample(rng, 32)
    variables = model.init(rng, x, jnp.zeros((32,)))
    gen = PluginReverseSDE.create(
        SGMSde.create(num_steps_forward=8), model.apply, variables
    )
    path = str(tmp_path / "model_bf16.sdeflow")
    export_sampler(gen, path, num_samples=64, dim=2, num_steps=16)

    served = Sampler(path)
    key = jax.random.PRNGKey(7)
    out_served = served(key)
    out_direct = make_sampler_fn(gen, 64, 2, 16)(key)
    assert out_served.dtype == jnp.float32
    assert np.isfinite(np.asarray(out_served)).all()
    assert np.allclose(np.asarray(out_served), np.asarray(out_direct),
                       rtol=1e-4, atol=1e-3)

"""End-to-end smoke runs: the reference's BASELINE config #1 (swissroll +
MLP + SGM + SSM + reverse sampling + √MMD), its MSGM counterpart, and
checkpoint/resume determinism. (SURVEY.md §4 oracle (h) + §7 step 2.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdeflow_tpu.data import SwissRoll, GaussianCauchy
from sdeflow_tpu.models import MLP
from sdeflow_tpu.sde import SGMSde, MSGMSde, PluginReverseSDE
from sdeflow_tpu.training import Trainer, save_checkpoint, load_checkpoint
from sdeflow_tpu.eval import compute_mmd
from sdeflow_tpu.ops.integrators import integrate_sde


def _mk_sgm_gen(key, sampler, num_steps_forward=16):
    model = MLP(input_dim=sampler.dim)
    x0 = sampler.sample(key, 256)
    variables = model.init(key, x0, jnp.zeros((256,)))
    sde = SGMSde.create(num_steps_forward=num_steps_forward)
    return PluginReverseSDE.create(sde, model.apply, variables)


def test_swissroll_sgm_end_to_end(rng):
    """Train 3k steps, sample with EM, require √MMD(gen, test) below a loose
    threshold above the √MMD(train, test) noise floor."""
    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler)
    trainer = Trainer(gen, sampler, lr=1e-3, batch_size=256, print_every=10_000)
    state, final_loss = trainer.run(jax.random.fold_in(rng, 1), 3000)

    n = 4000
    x0 = state.gen_sde.latent_sample(jax.random.fold_in(rng, 2), n, 2)
    xgen = jax.jit(
        lambda g, k, z: integrate_sde(g, z, k, 100, method="em")
    )(state.gen_sde, jax.random.fold_in(rng, 3), x0)
    xtest = sampler.sampletest(jax.random.fold_in(rng, 4), n)
    xtrain = sampler.sample(jax.random.fold_in(rng, 5), n)

    mmd_gen = float(compute_mmd(xgen, xtest)) ** 0.5
    mmd_floor = float(compute_mmd(xtrain, xtest)) ** 0.5
    assert np.isfinite(mmd_gen)
    assert mmd_gen < 0.15, f"sqrt-MMD {mmd_gen} vs floor {mmd_floor}"
    # training actually reduced the loss vs the first recorded step
    assert trainer.history[0]["loss"] > final_loss + 1.0 or final_loss < 2.0


def test_msgm_gaussian_cauchy_trains(rng):
    """MSGM path end to end on the heavy-tailed GaussianCauchy toy: forward
    RK4 scan inside the loss, radial latent prior, norm-corrected reverse
    RK4. Short run — checks learning signal and finiteness, not quality."""
    sampler = GaussianCauchy(jax.random.fold_in(rng, 0), dim=2)
    x_init = sampler.sample(jax.random.fold_in(rng, 1), 2048)
    sde = MSGMSde.create(
        jax.random.fold_in(rng, 2),
        x_init,
        beta_max=2.0,
        num_steps_forward=8,
        norm_map="log",
    )
    model = MLP(input_dim=2, premodule="NormalizeLogRadius")
    variables = model.init(
        jax.random.fold_in(rng, 3), x_init[:4], jnp.zeros((4,))
    )
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    trainer = Trainer(gen, sampler, lr=1e-3, batch_size=64, print_every=10_000)
    state, final_loss = trainer.run(jax.random.fold_in(rng, 4), 300)
    assert np.isfinite(final_loss)

    x0 = state.gen_sde.latent_sample(jax.random.fold_in(rng, 5), 512, 2)
    xgen = integrate_sde(
        state.gen_sde,
        x0,
        jax.random.fold_in(rng, 6),
        32,
        method="rk4",
        norm_correction=True,
    )
    assert bool(jnp.isfinite(xgen).all())
    # norm-corrected reverse keeps the latent radial law exactly
    assert jnp.allclose(
        jnp.linalg.norm(xgen, axis=1), jnp.linalg.norm(x0, axis=1), rtol=1e-4
    )


def test_checkpoint_roundtrip(rng, tmp_path):
    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler)
    trainer = Trainer(gen, sampler, batch_size=32, print_every=10_000)
    state, _ = trainer.run(jax.random.fold_in(rng, 1), 5)

    path = os.path.join(str(tmp_path), "ckpt")
    key = jax.random.fold_in(rng, 9)
    save_checkpoint(path, state, key, 4)
    restored, key2, it = load_checkpoint(path, state, key)
    assert it == 4
    assert jnp.array_equal(jax.random.key_data(key), jax.random.key_data(key2))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.gen_sde.a_params),
        jax.tree_util.tree_leaves(restored.gen_sde.a_params),
    ):
        assert jnp.array_equal(a, b)


def test_trainer_resume(rng, tmp_path):
    """Interrupted training resumes from the rolling checkpoint at the right
    iteration (reference: MSGM_higherDim.py:794-798)."""
    sampler = SwissRoll()
    path = os.path.join(str(tmp_path), "roll")
    gen = _mk_sgm_gen(rng, sampler)
    t1 = Trainer(gen, sampler, batch_size=32, print_every=2, checkpoint_path=path)
    t1.run(jax.random.fold_in(rng, 1), 4)  # saves at iters 1(,2,4)

    t2 = Trainer(gen, sampler, batch_size=32, print_every=2, checkpoint_path=path)
    logs = []
    t2.log_fn = logs.append
    state, _ = t2.run(jax.random.fold_in(rng, 1), 6, resume=True)
    assert any("Resuming" in l for l in logs)
    assert int(state.step) >= 5


def test_tagged_save_independent_of_print_cadence(rng, tmp_path):
    """Tagged checkpoints fire at save_every multiples even when print_every
    does not divide them (single-step AND fused-chunk paths must both
    surface at the step-5 boundary)."""
    from sdeflow_tpu.training.checkpoint import checkpoint_exists

    sampler = SwissRoll()
    for tag, steps_per_dispatch in (("single", 1), ("chunk", 4)):
        path = os.path.join(str(tmp_path), f"cad_{tag}")
        gen = _mk_sgm_gen(rng, sampler, num_steps_forward=4)
        tr = Trainer(
            gen, sampler, batch_size=16, print_every=3, save_every=5,
            checkpoint_path=path, steps_per_dispatch=steps_per_dispatch,
        )
        tr.run(jax.random.fold_in(rng, 1), 7)
        assert checkpoint_exists(f"{path}_5"), f"{tag}: step-5 tagged save missing"
        assert checkpoint_exists(path)


def test_chunked_trainer_matches_semantics(rng):
    """steps_per_dispatch>1 must complete the same number of steps and learn
    (the fused lax.scan trainer; data sampled on device inside the scan)."""
    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler, num_steps_forward=8)
    tr = Trainer(gen, sampler, batch_size=64, print_every=400,
                 steps_per_dispatch=200)
    state, loss = tr.run(jax.random.fold_in(rng, 1), 800)
    assert int(state.step) == 800
    assert np.isfinite(loss)
    # learned something: loss well below the untrained value
    assert tr.history[-1]["loss"] < tr.history[0]["loss"]


def test_unet1d_sgm_trains_on_signal(rng):
    """1D U-Net end to end on a synthetic correlated 32-dim signal: SSM
    loss decreases and reverse sampling stays finite (the Unet1D config
    family, reference MSGM_higherDim.py:186-191, 717-725)."""
    from sdeflow_tpu.data import Gaussian
    from sdeflow_tpu.models import UNet1D

    d = 32
    sampler = Gaussian(jax.random.fold_in(rng, 0), dim=d, correlation=True)
    model = UNet1D(input_dim=d, base_channels=4, channel_mults=(1, 2),
                   premodule="NormalizeLogRadius", emb_dim=16)
    x0 = sampler.sample(jax.random.fold_in(rng, 1), 16)
    variables = model.init(jax.random.fold_in(rng, 2), x0, jnp.zeros((16,)))
    sde = SGMSde.create(num_steps_forward=8)
    gen = PluginReverseSDE.create(sde, model.apply, variables)
    trainer = Trainer(gen, sampler, lr=1e-3, batch_size=16, print_every=100)
    state, final_loss = trainer.run(jax.random.fold_in(rng, 3), 200)
    assert np.isfinite(final_loss)
    assert trainer.history[-1]["loss"] < trainer.history[0]["loss"]
    xgen = integrate_sde(
        state.gen_sde,
        state.gen_sde.latent_sample(jax.random.fold_in(rng, 4), 64, d),
        jax.random.fold_in(rng, 5),
        16,
        method="rk4",
    )
    assert xgen.shape == (64, d)
    assert bool(jnp.isfinite(xgen).all())


def test_async_checkpoint_save(rng, tmp_path):
    """Non-blocking saves commit in the background and read back intact
    after wait_for_checkpoints."""
    from sdeflow_tpu.training.checkpoint import wait_for_checkpoints

    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler)
    trainer = Trainer(gen, sampler, batch_size=32, print_every=10_000)
    state, _ = trainer.run(jax.random.fold_in(rng, 1), 3)

    path = os.path.join(str(tmp_path), "async_ckpt")
    key = jax.random.fold_in(rng, 9)
    save_checkpoint(path, state, key, 2, block=False)
    wait_for_checkpoints()
    restored, key2, it = load_checkpoint(path, state, key)
    assert it == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(state.gen_sde.a_params),
        jax.tree_util.tree_leaves(restored.gen_sde.a_params),
    ):
        assert jnp.array_equal(a, b)


def test_compilation_cache_skips_cpu():
    """The persistent compile cache is TPU-only (CPU AOT artifacts are
    host-feature-specific; cross-host reload risks SIGILL)."""
    from sdeflow_tpu.utils import enable_compilation_cache

    assert enable_compilation_cache() is None  # tests run on CPU


def test_memory_report_and_print_ram_flag(rng):
    """memory_report() returns a populated line on this platform, and the
    Trainer's print_ram knob (the reference's dormant print_RAM flag,
    MSGM_higherDim.py:397) emits it at the print cadence."""
    from sdeflow_tpu.utils import memory_report, host_rss_bytes

    assert host_rss_bytes() > 0  # procfs available on linux
    line = memory_report()
    assert line.startswith("RAM: ") and "host rss" in line

    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler, num_steps_forward=4)
    lines = []
    trainer = Trainer(
        gen, sampler, batch_size=32, print_every=4, print_ram=True,
        steps_per_dispatch=1, log_fn=lines.append,
    )
    trainer.run(rng, 4)
    assert any(l.startswith("RAM: ") for l in lines)


def test_ema_training_and_checkpoint(rng, tmp_path):
    """Trainer(ema_rate=..., ema_warmup=False): EMA params follow the exact
    target <- rate*target + (1-rate)*source recurrence (reference:
    model/nn_utils.py:117-127), survive a checkpoint roundtrip, track through
    the fused chunk path, and evaluate via trainer.ema_gen_sde."""
    from sdeflow_tpu.training.train import update_ema
    from sdeflow_tpu.eval.elbo import evaluate

    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler)
    rate = 0.9
    trainer = Trainer(gen, sampler, lr=1e-2, batch_size=32,
                      print_every=10_000, ema_rate=rate, ema_warmup=False)
    p0 = trainer.state.params

    # replay the recurrence host-side against the per-step param trajectory
    key = jax.random.fold_in(rng, 1)
    expect = p0
    st = trainer.state
    for i in range(3):
        key, key_data, key_loss = jax.random.split(key, 3)
        x = sampler.sample(key_data, 32)
        st, _ = trainer.train_step(st, key_loss, x)
        expect = update_ema(expect, st.params, rate)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        st.ema_params, expect,
    )
    # EMA lags the raw params
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), st.ema_params, st.params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0

    # checkpoint roundtrip preserves ema_params
    path = str(tmp_path / "ema_ckpt")
    save_checkpoint(path, st, key, 3)
    restored, _, _ = load_checkpoint(path, st, key)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b),
        restored.ema_params, st.ema_params,
    )

    # fused chunk path updates EMA identically (same fold_in schedule as
    # make_train_chunk's body — just check it moves and stays finite)
    t2 = Trainer(gen, sampler, lr=1e-2, batch_size=32, print_every=10_000,
                 steps_per_dispatch=4, ema_rate=rate)
    s2, _ = t2.run(jax.random.fold_in(rng, 2), 8)
    assert all(
        np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(s2.ema_params)
    )

    # eval with the EMA weights via the accessor
    trainer.state = st
    x_eval = sampler.sample(jax.random.fold_in(rng, 3), 64)
    elbo, _ = evaluate(trainer.ema_gen_sde, jax.random.fold_in(rng, 4), x_eval)
    assert np.isfinite(float(elbo))

    # without ema_rate the accessor refuses and state carries no EMA
    t3 = Trainer(gen, sampler, batch_size=32)
    assert t3.state.ema_params is None
    with pytest.raises(ValueError):
        _ = t3.ema_gen_sde


def test_ema_warmup(rng):
    """Default EMA warmup: decay ramps as min(rate, (1+n)/(10+n)) (the
    score_sde-standard schedule) so a short run's EMA tracks the live params
    instead of the random init — a fixed 0.999 decay keeps 0.999^n of the
    weight on the init, which measured √MMD≈1.0 at 768 steps on the d=1000
    signal config. Checks the schedule values, an exact host-side replay of
    the warmed recurrence, and that warmup-on lands far closer to the live
    params than warmup-off after a handful of steps."""
    from sdeflow_tpu.training.train import ema_rate_at, update_ema

    # schedule values
    assert np.isclose(float(ema_rate_at(0.999, jnp.int32(1))), 2.0 / 11.0)
    assert np.isclose(float(ema_rate_at(0.999, jnp.int32(100_000))), 0.999)
    assert float(ema_rate_at(0.999, jnp.int32(1), warmup=False)) == 0.999

    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler)
    rate = 0.999
    tr_w = Trainer(gen, sampler, lr=1e-2, batch_size=32, print_every=10_000,
                   ema_rate=rate)  # warmup default-on
    tr_f = Trainer(gen, sampler, lr=1e-2, batch_size=32, print_every=10_000,
                   ema_rate=rate, ema_warmup=False)
    p0 = tr_w.state.params

    key = jax.random.fold_in(rng, 7)
    st_w, st_f, expect = tr_w.state, tr_f.state, p0
    for i in range(5):
        key, key_data, key_loss = jax.random.split(key, 3)
        x = sampler.sample(key_data, 32)
        st_w, _ = tr_w.train_step(st_w, key_loss, x)
        st_f, _ = tr_f.train_step(st_f, key_loss, x)
        expect = update_ema(expect, st_w.params,
                            float(ema_rate_at(rate, jnp.int32(i + 1))))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        st_w.ema_params, expect,
    )

    def dist(tree_a, tree_b):
        return max(
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                            jax.tree_util.tree_leaves(tree_b))
        )

    # same trajectory (identical keys) — so the heads are directly comparable:
    # fixed-rate EMA is glued to the init; warmed EMA has left it behind
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b),
        st_w.params, st_f.params,
    )
    assert dist(st_f.ema_params, p0) < 0.01 * dist(st_w.ema_params, p0)
    assert dist(st_w.ema_params, st_w.params) < dist(st_f.ema_params,
                                                     st_f.params)


def test_optimizer_injection_and_build_optimizer(rng):
    """Trainer(optimizer=...) takes any optax chain; build_optimizer's
    knobs behave: warmup zeroes the first update, clipping bounds the
    update norm, and all-defaults reproduces bare Adam bitwise
    (the reference's optimizer, MSGM_higherDim.py:789)."""
    import optax

    from sdeflow_tpu.training import build_optimizer

    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler)
    params = gen.a_params
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 100.0, params)

    def gnorm(tree):
        return float(
            jnp.sqrt(
                sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(tree))
            )
        )

    # defaults == bare adam (same update on the same grads)
    tx_def, tx_adam = build_optimizer(1e-3), optax.adam(1e-3)
    u_def, _ = tx_def.update(grads, tx_def.init(params), params)
    u_adam, _ = tx_adam.update(grads, tx_adam.init(params), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), u_def, u_adam
    )

    # linear warmup: step-0 lr is 0, so the first update is exactly zero
    tx_w = build_optimizer(1e-2, lr_warmup_steps=10)
    u_w, _ = tx_w.update(grads, tx_w.init(params), params)
    assert gnorm(u_w) == 0.0

    # clipping caps the gradient global norm entering Adam: with huge raw
    # grads the clipped update matches the update from pre-scaled grads
    tx_c = build_optimizer(1e-3, grad_clip=1.0)
    u_c, _ = tx_c.update(grads, tx_c.init(params), params)
    scaled = jax.tree_util.tree_map(lambda g: g / gnorm(grads), grads)
    u_s, _ = tx_adam.update(scaled, tx_adam.init(params), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8),
        u_c, u_s,
    )

    # the full chain trains end to end through Trainer (per-step AND the
    # fused-chunk path share the injected optimizer)
    tx = build_optimizer(1e-3, grad_clip=1.0, weight_decay=1e-4,
                         lr_warmup_steps=5)
    trainer = Trainer(gen, sampler, batch_size=64, print_every=10_000,
                      optimizer=tx, steps_per_dispatch=10)
    state, final_loss = trainer.run(jax.random.fold_in(rng, 1), 50)
    assert np.isfinite(final_loss)
    assert int(state.step) == 50
    changed = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0, params, state.params
    )
    assert all(jax.tree_util.tree_leaves(changed))


def test_injected_optimizer_checkpoint_roundtrip(rng, tmp_path):
    """A chain optimizer's opt_state (tuple of sub-states incl. the
    schedule count) survives save/load and resumes identically."""
    from sdeflow_tpu.training import build_optimizer

    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler)
    tx = build_optimizer(1e-3, grad_clip=1.0, lr_warmup_steps=20)
    path = str(tmp_path / "ckpt_chain")

    t1 = Trainer(gen, sampler, batch_size=32, print_every=2,
                 optimizer=tx, checkpoint_path=path)
    t1.run(jax.random.fold_in(rng, 1), 6)

    t2 = Trainer(gen, sampler, batch_size=32, print_every=2,
                 optimizer=tx, checkpoint_path=path)
    state2, _ = t2.run(jax.random.fold_in(rng, 1), 12)

    t3 = Trainer(gen, sampler, batch_size=32, print_every=2, optimizer=tx)
    state3, _ = t3.run(jax.random.fold_in(rng, 1), 12)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        state2.params, state3.params,
    )


def test_gradient_accumulation_via_multisteps(rng):
    """optax.MultiSteps composes with Trainer(optimizer=...): k micro-step
    gradients are buffered (params frozen within the window, one real
    update per k steps), through both the per-step and the fused-chunk
    (steps_per_dispatch) paths. This is the production recipe for batches
    too large for HBM — no Trainer-side code needed."""
    import optax

    sampler = SwissRoll()
    gen = _mk_sgm_gen(rng, sampler)
    k = 4
    tx = optax.MultiSteps(optax.adam(1e-3), every_k_schedule=k)

    # per-step path: params must be frozen inside an accumulation window
    t1 = Trainer(gen, sampler, batch_size=64, print_every=1000, optimizer=tx)
    p0 = t1.state.params
    key = jax.random.fold_in(rng, 1)
    state = t1.state
    for i in range(k - 1):
        key, sub = jax.random.split(key)
        x = sampler.sample(sub, 64)
        state, _ = t1.train_step(state, sub, x)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            state.params, p0,
        )
    key, sub = jax.random.split(key)
    state, _ = t1.train_step(state, sub, sampler.sample(sub, 64))
    moved = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(p0))
    )
    assert moved > 0.0  # the k-th micro-step applies the accumulated update

    # fused-chunk path: trains to a lower loss over a few hundred steps
    t2 = Trainer(gen, sampler, batch_size=64, print_every=1000,
                 optimizer=tx, steps_per_dispatch=64)
    _, final_loss = t2.run(jax.random.fold_in(rng, 2), 512)
    first_loss = t2.history[0]["loss"]
    assert np.isfinite(final_loss) and final_loss < first_loss

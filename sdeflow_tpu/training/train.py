"""Training: jitted Adam step over the SSM/DSM loss + host-side loop.

TPU-native counterpart of the reference's inline train loop
(reference: MSGM_higherDim.py:790-850): the whole step — data-batch loss
(including, for MSGM, the forward RK4 scan), JVP divergence estimate,
gradient, Adam update — is ONE jitted XLA program with donated state.
The reference re-enters Python (and, for MSGM, copies every forward step to
host) on every iteration.

Data-parallel scaling is layered on in `sdeflow_tpu.parallel`: shard the
batch over the mesh's data axis and XLA inserts the psum for the grads.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    """Carries everything the jitted step updates. `gen_sde` is the full
    PluginReverseSDE pytree (base SDE constants + score-net params)."""

    gen_sde: Any
    opt_state: Any
    step: jnp.ndarray
    # EMA of the score-net params (None unless Trainer(ema_rate=...) is set;
    # reference: model/nn_utils.py:117-127). Lives in the state so it is
    # updated inside the jitted step and lands in checkpoints.
    ema_params: Any = None

    @property
    def params(self):
        return self.gen_sde.a_params


def ema_rate_at(ema_rate, step, warmup=True):
    """Effective EMA decay at update number `step` (1-based, traced ok).

    With warmup (the diffusion-literature standard, e.g. Song's score_sde
    ExponentialMovingAverage), the decay ramps as min(rate, (1+n)/(10+n)) so
    early EMA states track the live params instead of the random init — a
    fixed 0.999 leaves 0.999^n of the weight on the init, which measured as
    √MMD≈1.0 on a 768-step budget (parity_signal_ours_ema_cpu.json).
    """
    if not warmup:
        return ema_rate
    n = step.astype(jnp.float32)
    return jnp.minimum(jnp.float32(ema_rate), (1.0 + n) / (10.0 + n))


def make_train_step(optimizer, loss="ssm", ema_rate=None, ema_warmup=True):
    """Build a jitted train step: (state, key, x) -> (state, loss).

    loss: "ssm" (reference's objective, MSGM_higherDim.py:807) or "dsm"
    (SGM-only closed-form objective). ema_rate folds an EMA update of the
    score-net params into the same program (state.ema_params must be
    initialized — Trainer does this); ema_warmup ramps the decay via
    `ema_rate_at` so short budgets are not init-dominated.
    """

    def loss_fn(params, gen_sde, key, x):
        gen = gen_sde.replace(a_params=params)
        if loss == "ssm":
            per_sample = gen.ssm(key, x)
        elif loss == "dsm":
            per_sample = gen.dsm(key, x)
        else:
            raise ValueError(f"unknown loss {loss}")
        return per_sample.mean()

    @jax.jit
    def train_step(state: TrainState, key, x):
        value, grads = jax.value_and_grad(loss_fn)(
            state.gen_sde.a_params, state.gen_sde, key, x
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.gen_sde.a_params
        )
        params = optax.apply_updates(state.gen_sde.a_params, updates)
        ema = (
            update_ema(state.ema_params, params,
                       ema_rate_at(ema_rate, state.step + 1, ema_warmup))
            if ema_rate is not None
            else state.ema_params
        )
        return (
            TrainState(
                gen_sde=state.gen_sde.replace(a_params=params),
                opt_state=opt_state,
                step=state.step + 1,
                ema_params=ema,
            ),
            value,
        )

    return train_step


def make_train_chunk(optimizer, sample_fn, batch_size, loss="ssm",
                     ema_rate=None, ema_warmup=True):
    """Fuse MANY train steps into ONE device dispatch.

    TPU-native optimization with no reference counterpart: the reference
    re-enters Python every iteration (MSGM_higherDim.py:803-809). Here a
    `lax.scan` runs `num_steps` full SSM/DSM+Adam steps — including
    on-device data sampling via `sample_fn(key, batch_size)` — inside one
    jitted program, so per-step host dispatch latency (milliseconds over a
    remote-TPU link) amortizes to nothing. Requires a jittable sampler
    (all synthetic samplers and ArraySampler index-gathers qualify).

    Returns chunk(state, key, num_steps static) -> (state, last_loss).
    """
    from functools import partial as _partial

    def loss_fn(params, gen_sde, key, x):
        gen = gen_sde.replace(a_params=params)
        per_sample = gen.ssm(key, x) if loss == "ssm" else gen.dsm(key, x)
        return per_sample.mean()

    # no buffer donation: the state is small and donated inputs trip an
    # InvalidArgument in the remote-TPU (axon) runtime
    @_partial(jax.jit, static_argnums=(2,))
    def chunk(state: TrainState, key, num_steps: int):
        def body(st, i):
            k = jax.random.fold_in(key, i)
            k_data, k_loss = jax.random.split(k)
            x = sample_fn(k_data, batch_size)
            value, grads = jax.value_and_grad(loss_fn)(
                st.gen_sde.a_params, st.gen_sde, k_loss, x
            )
            updates, opt_state = optimizer.update(
                grads, st.opt_state, st.gen_sde.a_params
            )
            params = optax.apply_updates(st.gen_sde.a_params, updates)
            ema = (
                update_ema(st.ema_params, params,
                           ema_rate_at(ema_rate, st.step + 1, ema_warmup))
                if ema_rate is not None
                else st.ema_params
            )
            st = TrainState(
                gen_sde=st.gen_sde.replace(a_params=params),
                opt_state=opt_state,
                step=st.step + 1,
                ema_params=ema,
            )
            return st, value

        state, losses = jax.lax.scan(body, state, jnp.arange(num_steps))
        return state, losses[-1]

    return chunk


def build_optimizer(lr, grad_clip=None, weight_decay=0.0, lr_warmup_steps=0):
    """Compose the production optax chain from scalar knobs.

    The reference trains with bare Adam at a fixed lr
    (MSGM_higherDim.py:789); with all knobs at their defaults this returns
    exactly that. The extras — global-norm gradient clipping, AdamW
    decoupled weight decay, linear LR warmup — have no reference
    counterpart but are standard production levers; any other
    `optax.GradientTransformation` can be injected directly via
    `Trainer(optimizer=...)`.
    """
    if grad_clip is None and weight_decay == 0.0 and lr_warmup_steps == 0:
        return optax.adam(lr)
    sched = (
        optax.linear_schedule(0.0, lr, lr_warmup_steps)
        if lr_warmup_steps > 0
        else lr
    )
    tx = (
        optax.adamw(sched, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(sched)
    )
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def update_ema(target_params, source_params, rate=0.99):
    """Exponential moving average of parameters: target ← rate·target +
    (1−rate)·source (reference: model/nn_utils.py:117-127 — defined there
    but never called; provided here as a real utility). Pure function:
    returns the new target pytree."""
    return jax.tree_util.tree_map(
        lambda t, s: rate * t + (1.0 - rate) * s, target_params, source_params
    )


def make_eval_step():
    """Jitted ELBO evaluation: (gen_sde, key, x_test) -> (mean, stderr).
    Single implementation lives in eval.elbo (reference: NN.py:123-128);
    the jit is created per call site so its compilation cache is freed with
    the owning Trainer instead of accumulating globally across sweep arms."""
    from sdeflow_tpu.eval.elbo import evaluate

    return jax.jit(evaluate)


class Trainer:
    """Host-side loop with the reference driver's cadence: periodic
    loss/ELBO prints with ms/step, rolling + tagged checkpointing,
    delete-on-success, final checkpoint
    (reference: MSGM_higherDim.py:67-68, 790-850)."""

    def __init__(
        self,
        gen_sde,
        sampler,
        *,
        lr=1e-3,
        batch_size=256,
        loss="ssm",
        print_every=10_000,
        save_every=100_000,
        checkpoint_path: Optional[str] = None,
        log_fn: Callable[[str], None] = print,
        steps_per_dispatch: int = 1,
        mesh=None,
        print_ram: bool = False,
        ema_rate: Optional[float] = None,
        ema_warmup: bool = True,
        optimizer=None,
    ):
        # any optax GradientTransformation can be injected (clipping,
        # schedules, weight decay — see build_optimizer); default is the
        # reference's bare Adam (MSGM_higherDim.py:789)
        self.optimizer = optimizer if optimizer is not None else optax.adam(lr)
        self.ema_rate = ema_rate
        self.ema_warmup = ema_warmup
        self.state = TrainState(
            gen_sde=gen_sde,
            opt_state=self.optimizer.init(gen_sde.a_params),
            step=jnp.zeros((), jnp.int32),
            # EMA target starts at the initial params (the reference's
            # ema(..., decay=0) bootstrap, model/nn_utils.py:117-127)
            ema_params=gen_sde.a_params if ema_rate is not None else None,
        )
        self.sampler = sampler
        self.batch_size = batch_size
        self.print_every = print_every
        self.save_every = save_every
        self.checkpoint_path = checkpoint_path
        self.log_fn = log_fn
        self.steps_per_dispatch = int(steps_per_dispatch)
        self.mesh = mesh
        self.print_ram = print_ram
        if mesh is not None:
            # distributed training: batch sharded over the mesh's "data"
            # axis (XLA inserts the grad psum); params keep whatever
            # committed shardings the caller placed (e.g. shard_unet_params
            # tensor parallelism over "model")
            from sdeflow_tpu.parallel import (
                make_parallel_train_step,
                make_parallel_train_chunk,
            )

            self.train_step = make_parallel_train_step(
                self.optimizer, mesh, loss=loss, ema_rate=ema_rate,
                ema_warmup=ema_warmup,
            )
            if self.steps_per_dispatch > 1:
                self.train_chunk = make_parallel_train_chunk(
                    self.optimizer, sampler.sample, batch_size, mesh,
                    loss=loss, ema_rate=ema_rate, ema_warmup=ema_warmup,
                )
        else:
            self.train_step = make_train_step(self.optimizer, loss=loss,
                                              ema_rate=ema_rate,
                                              ema_warmup=ema_warmup)
            if self.steps_per_dispatch > 1:
                self.train_chunk = make_train_chunk(
                    self.optimizer, sampler.sample, batch_size, loss=loss,
                    ema_rate=ema_rate, ema_warmup=ema_warmup,
                )
        self.eval_step = make_eval_step()
        self.history = []

    @property
    def ema_gen_sde(self):
        """The generative SDE with the EMA score-net params swapped in —
        use for eval/sampling when training with Trainer(ema_rate=...)."""
        if self.state.ema_params is None:
            raise ValueError("Trainer was built without ema_rate")
        return self.state.gen_sde.replace(a_params=self.state.ema_params)

    def run(self, key, iterations, x_test=None, resume=True):
        from sdeflow_tpu.training.checkpoint import (
            save_checkpoint,
            load_checkpoint,
            checkpoint_exists,
        )

        start_iter = 0
        if resume and self.checkpoint_path and checkpoint_exists(self.checkpoint_path):
            # capture the live mesh placements first and restore THROUGH
            # them (orbax sharding-aware restore): each leaf materializes
            # directly on its mesh placement — TP shardings preserved, no
            # full-param staging on the host or a single device.
            # Mesh-sharded leaves get their placement back; everything else
            # is replicated over the mesh.
            placements = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                replicated = NamedSharding(self.mesh, PartitionSpec())
                placements = jax.tree_util.tree_map(
                    lambda a: (
                        a.sharding
                        if isinstance(getattr(a, "sharding", None), NamedSharding)
                        else replicated
                    ),
                    self.state,
                )
            self.state, key, start_iter = load_checkpoint(
                self.checkpoint_path, self.state, key, shardings=placements
            )
            self.log_fn(f"Resuming from iteration {start_iter + 1}")
            start_iter += 1

        start_time = time.time()
        loss = None
        i = start_iter  # completed steps
        steps_since_print = 0
        while i < iterations:
            if self.steps_per_dispatch > 1 and i > 0:
                # fused multi-step dispatch, aligned to BOTH the print and
                # tagged-save cadences so neither boundary is skipped over
                boundary = min(
                    iterations,
                    ((i // self.print_every) + 1) * self.print_every,
                    ((i // self.save_every) + 1) * self.save_every,
                )
                n = min(self.steps_per_dispatch, max(1, boundary - i))
                key, key_chunk = jax.random.split(key)
                self.state, loss = self.train_chunk(self.state, key_chunk, n)
                i += n
                steps_since_print += n
            else:
                key, key_data, key_loss = jax.random.split(key, 3)
                x = self.sampler.sample(key_data, self.batch_size)
                self.state, loss = self.train_step(self.state, key_loss, x)
                i += 1
                steps_since_print += 1

            do_print = (i == 1) or (i % self.print_every == 0) or i >= iterations
            # tagged saves fire on their own cadence, independent of
            # print_every (the fused-chunk boundary above guarantees the
            # loop surfaces exactly at each save_every multiple)
            do_tag = i % self.save_every == 0
            if do_print:
                key, key_eval, key_xe = jax.random.split(key, 3)
                x_eval = (
                    x_test
                    if x_test is not None
                    else self.sampler.sample(key_xe, self.batch_size)
                )
                elbo, elbo_std = self.eval_step(self.state.gen_sde, key_eval, x_eval)
                elapsed = time.time() - start_time
                self.log_fn(
                    "| iter {:6d} | {:5.2f} ms/step | loss {:8.3f} | "
                    "elbo {:8.3f} | elbo std {:8.3f}".format(
                        i,
                        elapsed * 1000 / max(1, steps_since_print),
                        float(loss),
                        float(elbo),
                        float(elbo_std),
                    )
                )
                self.history.append(
                    dict(step=i, loss=float(loss), elbo=float(elbo))
                )
                if self.print_ram:
                    from sdeflow_tpu.utils.profiling import memory_report

                    self.log_fn(memory_report())
            if self.checkpoint_path and (do_print or do_tag):
                save_checkpoint(self.checkpoint_path, self.state, key, i - 1)
                if do_tag:
                    save_checkpoint(
                        f"{self.checkpoint_path}_{i}", self.state, key, i - 1
                    )
            if do_print:
                start_time = time.time()
                steps_since_print = 0
        return self.state, float(loss) if loss is not None else None

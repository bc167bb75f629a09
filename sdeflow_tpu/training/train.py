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

    @property
    def params(self):
        return self.gen_sde.a_params


def make_train_step(optimizer, loss="ssm"):
    """Build a jitted train step: (state, key, x) -> (state, loss).

    loss: "ssm" (reference's objective, MSGM_higherDim.py:807) or "dsm"
    (SGM-only closed-form objective).
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
        return (
            TrainState(
                gen_sde=state.gen_sde.replace(a_params=params),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            value,
        )

    return train_step


def update_ema(target_params, source_params, rate=0.99):
    """Exponential moving average of parameters: target ← rate·target +
    (1−rate)·source (reference: model/nn_utils.py:117-127 — defined there
    but never called; provided here as a real utility). Pure function:
    returns the new target pytree."""
    return jax.tree_util.tree_map(
        lambda t, s: rate * t + (1.0 - rate) * s, target_params, source_params
    )


def make_eval_step():
    """Jitted ELBO evaluation: (gen_sde, key, x_test) -> (mean, stderr)
    (reference: NN.py:123-128)."""

    @jax.jit
    def eval_step(gen_sde, key, x_test):
        elbo = gen_sde.elbo_random_t_slice(key, x_test)
        n = elbo.shape[0]
        return elbo.mean(), elbo.std() / jnp.sqrt(jnp.asarray(n, elbo.dtype))

    return eval_step


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
    ):
        self.optimizer = optax.adam(lr)
        self.state = TrainState(
            gen_sde=gen_sde,
            opt_state=self.optimizer.init(gen_sde.a_params),
            step=jnp.zeros((), jnp.int32),
        )
        self.sampler = sampler
        self.batch_size = batch_size
        self.print_every = print_every
        self.save_every = save_every
        self.checkpoint_path = checkpoint_path
        self.log_fn = log_fn
        self.train_step = make_train_step(self.optimizer, loss=loss)
        self.eval_step = make_eval_step()
        self.history = []

    def run(self, key, iterations, x_test=None, resume=True):
        from sdeflow_tpu.training.checkpoint import (
            save_checkpoint,
            load_checkpoint,
            checkpoint_exists,
        )

        start_iter = 0
        if resume and self.checkpoint_path and checkpoint_exists(self.checkpoint_path):
            self.state, key, start_iter = load_checkpoint(
                self.checkpoint_path, self.state, key
            )
            self.log_fn(f"Resuming from iteration {start_iter + 1}")
            start_iter += 1

        start_time = time.time()
        loss = None
        for i in range(start_iter, iterations):
            key, key_data, key_loss = jax.random.split(key, 3)
            x = self.sampler.sample(key_data, self.batch_size)
            self.state, loss = self.train_step(self.state, key_loss, x)

            if (i == 0) or ((i + 1) % self.print_every == 0):
                key, key_eval = jax.random.split(key)
                x_eval = x_test if x_test is not None else x
                elbo, elbo_std = self.eval_step(self.state.gen_sde, key_eval, x_eval)
                elapsed = time.time() - start_time
                self.log_fn(
                    "| iter {:6d} | {:5.2f} ms/step | loss {:8.3f} | "
                    "elbo {:8.3f} | elbo std {:8.3f}".format(
                        i + 1,
                        elapsed * 1000 / self.print_every,
                        float(loss),
                        float(elbo),
                        float(elbo_std),
                    )
                )
                self.history.append(
                    dict(step=i + 1, loss=float(loss), elbo=float(elbo))
                )
                if self.checkpoint_path:
                    save_checkpoint(self.checkpoint_path, self.state, key, i)
                    if (i + 1) % self.save_every == 0:
                        save_checkpoint(
                            f"{self.checkpoint_path}_{i + 1}", self.state, key, i
                        )
                start_time = time.time()
        return self.state, float(loss) if loss is not None else None

"""Deployment: serialized, AOT-exportable samplers.

No reference counterpart (the reference is a research script); this is the
production-serving layer a TPU framework needs: the entire reverse-SDE
generation program — latent draw + N-step solve with the score net baked
in — is staged to StableHLO with `jax.export`, serialized to disk, and
reloadable into any process (same or newer jax) without the Python model
code. The exported artifact takes only a PRNG key and returns samples, so a
serving host needs nothing but jax + the artifact bytes.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jax_export

from sdeflow_tpu.ops.expint import integrate_dpm
from sdeflow_tpu.ops.integrators import integrate_sde
from sdeflow_tpu.ops.ode import encode_ode, integrate_ode


def make_sampler_fn(gen_sde, num_samples, dim, num_steps, *, method="rk4",
                    lmbd=0.0, norm_correction=False, keep_all=False,
                    include_t0=False, sampler="sde", corrector_steps=0,
                    snr=0.16, dpm_grid="logsnr"):
    """Close the generative program over a trained PluginReverseSDE:
    key -> (num_samples, dim) samples (or the full trajectory). This is THE
    generation program — the experiment driver jits it and the serving
    exporter stages it, so both always run identical code.

    sampler: "sde" (stochastic reverse SDE, the reference's path), "ode"
    (deterministic probability-flow ODE, ops/ode.py — the key then only
    seeds the latent draw), or "dpm" (DPM-Solver exponential integrators,
    ops/expint.py, SGM only; `method` is then "dpm1"|"dpm2"|"dpm2m" or
    the stochastic "sdpm1", defaulting to "dpm2m" when a non-dpm method
    name is passed). With
    sampler="sde", corrector_steps > 0 adds that many Langevin corrector
    MCMC steps after each predictor step (predictor–corrector sampling,
    ops/integrators.langevin_corrector). dpm_grid picks the dpm time grid:
    "logsnr" (uniform-λ, default) | "time" | "karras" (EDM ρ=7)."""

    def sample(key):
        k_lat, k_solve = jax.random.split(key)
        x0 = gen_sde.latent_sample(k_lat, num_samples, dim)
        return _solve_from(
            gen_sde, x0, k_solve, num_steps, method=method, lmbd=lmbd,
            norm_correction=norm_correction, keep_all=keep_all,
            include_t0=include_t0, sampler=sampler,
            corrector_steps=corrector_steps, snr=snr, dpm_grid=dpm_grid,
        )

    return sample


def _solve_from(gen_sde, x0, k_solve, num_steps, *, method, lmbd,
                norm_correction, keep_all, include_t0, sampler,
                corrector_steps, snr, dpm_grid="logsnr"):
    """Dispatch one reverse solve from given latents (shared by the fixed
    and batch-polymorphic sampler programs)."""
    if sampler == "dpm":
        m = method if method.startswith(("dpm", "sdpm")) else "dpm2m"
        return integrate_dpm(
            gen_sde, x0, num_steps, method=m, grid=dpm_grid,
            keep_all=keep_all, include_t0=include_t0,
            key=k_solve if m.startswith("sdpm") else None,
        )
    if sampler == "ode":
        return integrate_ode(
            gen_sde, x0, num_steps, method=method,
            norm_correction=norm_correction, keep_all=keep_all,
            include_t0=include_t0,
        )
    return integrate_sde(
        gen_sde, x0, k_solve, num_steps, method=method, lmbd=lmbd,
        norm_correction=norm_correction, keep_all=keep_all,
        include_t0=include_t0, corrector_steps=corrector_steps, snr=snr,
    )


def export_sampler(gen_sde, path, num_samples, dim, num_steps, *,
                   method="rk4", lmbd=0.0, norm_correction=False,
                   sampler="sde", corrector_steps=0, snr=0.16,
                   dpm_grid="logsnr", polymorphic_batch=False,
                   platforms: Optional[list] = None):
    """Stage + serialize the full sampling program to `path`.

    platforms: lowering targets, e.g. ["tpu"], ["cpu"], or both; defaults
    to the current backend.

    polymorphic_batch: export with a SYMBOLIC batch dimension
    (`jax.export.symbolic_shape`): the artifact takes (raw_key,
    template (b, dim) f32) and returns (b, dim) samples for ANY b — one
    serialized program serves every batch size. `num_samples` then only
    records the serving-side default. The fixed-batch artifact (default)
    keys only on the PRNG key, as before.
    """
    # derive the raw-key layout from the configured PRNG implementation
    # (threefry: (2,) uint32; rbg/unsafe_rbg: (4,) uint32) so the artifact's
    # input contract matches the host that exports it
    probe = jax.random.key_data(jax.random.PRNGKey(0))
    key_spec = jax.ShapeDtypeStruct(probe.shape, probe.dtype)

    if polymorphic_batch:
        (b,) = jax_export.symbolic_shape("b")
        template_spec = jax.ShapeDtypeStruct((b, dim), jnp.float32)

        def fn_from_raw(raw_key, template):
            key = jax.random.wrap_key_data(raw_key)
            k_lat, k_solve = jax.random.split(key)
            x0 = gen_sde.latent_sample(k_lat, template.shape[0], dim)
            return _solve_from(
                gen_sde, x0, k_solve, num_steps, method=method, lmbd=lmbd,
                norm_correction=norm_correction, keep_all=False,
                include_t0=False, sampler=sampler,
                corrector_steps=corrector_steps, snr=snr, dpm_grid=dpm_grid,
            )

        exported = jax_export.export(
            jax.jit(fn_from_raw),
            platforms=platforms,
        )(key_spec, template_spec)
    else:
        fn = make_sampler_fn(
            gen_sde, num_samples, dim, num_steps, method=method, lmbd=lmbd,
            norm_correction=norm_correction, sampler=sampler,
            corrector_steps=corrector_steps, snr=snr, dpm_grid=dpm_grid,
        )

        def fn_from_raw(raw_key):
            return fn(jax.random.wrap_key_data(raw_key))

        exported = jax_export.export(
            jax.jit(fn_from_raw),
            platforms=platforms,
        )(key_spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    meta = dict(
        num_samples=num_samples, dim=dim, num_steps=num_steps, method=method,
        lmbd=lmbd, norm_correction=norm_correction, sampler=sampler,
        corrector_steps=corrector_steps, snr=snr, dpm_grid=dpm_grid,
        polymorphic_batch=bool(polymorphic_batch),
        platforms=list(exported.platforms),
        key_shape=list(probe.shape), key_dtype=str(probe.dtype),
        prng_impl=str(jax.config.jax_default_prng_impl),
    )
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def export_encoder(gen_sde, path, num_samples, dim, num_steps, *,
                   method="rk4", t0=0.0, norm_correction=False,
                   polymorphic_batch=False, platforms: Optional[list] = None):
    """Stage + serialize the deterministic PF-ODE ENCODER (data → latent,
    ops.encode_ode) to `path` — the deploy-side twin of `export_sampler`
    for inversion/editing pipelines. The program takes (b, dim) f32 data
    and returns (b, dim) latents; no PRNG input (the transport is
    deterministic). polymorphic_batch exports a symbolic batch dimension
    exactly like export_sampler. Load with `serving.Encoder`."""

    def fn(x):
        return encode_ode(
            gen_sde, x, num_steps, method=method, t0=t0,
            norm_correction=norm_correction,
        )

    if polymorphic_batch:
        (b,) = jax_export.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, dim), jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((num_samples, dim), jnp.float32)
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(x_spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    meta = dict(
        kind="encoder", num_samples=num_samples, dim=dim,
        num_steps=num_steps, method=method, t0=float(t0),
        norm_correction=norm_correction,
        polymorphic_batch=bool(polymorphic_batch),
        platforms=list(exported.platforms),
    )
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class Encoder:
    """Serving-side handle for an exported encoder program:

        e = Encoder("model.encoder")
        z = e(x)          # x: (b, dim) f32 — b free for polymorphic exports
    """

    def __init__(self, path):
        with open(path, "rb") as f:
            self._exported = jax_export.deserialize(bytearray(f.read()))
        meta_path = path + ".json"
        self.meta = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)
        self._call = jax.jit(self._exported.call)

    def __call__(self, x):
        x = jnp.asarray(x, jnp.float32)
        aval = self._exported.in_avals[0]
        fixed = isinstance(aval.shape[0], int)
        if fixed and x.shape[0] != aval.shape[0]:
            raise ValueError(
                f"fixed-batch encoder exported for batch {aval.shape[0]}; "
                "re-export with polymorphic_batch=True for other sizes"
            )
        return self._call(x)


class Sampler:
    """Serving-side handle: load an exported sampling program and generate.

    Usage:
        s = Sampler("model.sdeflow")
        batch = s(jax.random.PRNGKey(0))
        # batch-polymorphic artifacts additionally take a batch size:
        batch = s(jax.random.PRNGKey(0), num_samples=4096)
    """

    def __init__(self, path):
        with open(path, "rb") as f:
            self._exported = jax_export.deserialize(bytearray(f.read()))
        meta_path = path + ".json"
        self.meta = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)
        self._call = jax.jit(self._exported.call)

    def __call__(self, key, num_samples=None):
        raw = jax.random.key_data(key)
        if self.meta and list(raw.shape) != self.meta.get("key_shape", list(raw.shape)):
            raise ValueError(
                f"artifact expects key_data shape {self.meta['key_shape']} "
                f"(prng_impl={self.meta.get('prng_impl')}); this host's key "
                f"has shape {list(raw.shape)} — set jax_default_prng_impl to "
                "match the exporting host"
            )
        # the exported program knows its own arity: two inputs = the
        # batch-polymorphic (raw_key, template) contract — detect it from
        # the artifact itself so a missing .json sidecar fails loudly
        # instead of with a low-level module-signature error
        poly = len(self._exported.in_avals) == 2
        if poly:
            n = num_samples or (self.meta or {}).get("num_samples")
            if not n:
                raise ValueError(
                    "batch-polymorphic artifact: pass num_samples (no "
                    "metadata sidecar with a recorded default was found)"
                )
            dim = (
                int(self.meta["dim"]) if self.meta
                else int(self._exported.in_avals[1].shape[1])
            )
            template = jnp.zeros((int(n), dim), jnp.float32)
            return self._call(raw.astype(jnp.uint32), template)
        if num_samples is not None and self.meta and (
            int(num_samples) != int(self.meta.get("num_samples", num_samples))
        ):
            raise ValueError(
                f"fixed-batch artifact exported for num_samples="
                f"{self.meta['num_samples']}; re-export with "
                "polymorphic_batch=True to serve other batch sizes"
            )
        return self._call(raw.astype(jnp.uint32))

"""Experiment driver: the reference's SGM-vs-MSGM comparison sweeps.

TPU-native rewrite of the reference's `__main__` block
(reference: MSGM_higherDim.py:448-1176): nested sweep over
complexity (train-set size or Reynolds) x dimension x {SGM, MSGM} x
iterations x batch size; per arm it builds the dataset, applies the
fair-comparison budget rules, trains the score net, runs the
reverse-sampling sweep over backward step counts and repeat runs, and
accumulates the 5-D sqrt-MMD result tensors. Figures and result arrays land
under `<results_dir>/<dataset>/` with the hyperparameter-encoding run name.
"""

from __future__ import annotations

import os
from dataclasses import replace
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from sdeflow_tpu.configs import ExperimentConfig
from sdeflow_tpu.experiments.naming import run_name_root, simulation_name
from sdeflow_tpu.models import MLP, UNet1D, VorticityUNet
from sdeflow_tpu.sde import SGMSde, MSGMSde, PluginReverseSDE, ForwardFlow
from sdeflow_tpu.ops.integrators import integrate_sde
from sdeflow_tpu.training import Trainer, build_optimizer
from sdeflow_tpu.training.checkpoint import delete_checkpoint, save_checkpoint
from sdeflow_tpu.plotting.plots import (
    preprocessing,
    postprocessing,
    pairplots_single,
)


from functools import partial


def resolve_std_norm(sampler, normalized, real_dim):
    """Per-dimension std used to de-normalize plots.

    The reference only calls get_std on loaders that actually computed one
    (MSGM_higherDim.py:529-536); loaders without normalization support
    (weather_station, ncar, eof_pressure — which standardize internally)
    have no get_std at all there. Here every ArraySampler inherits get_std,
    so gate on capability explicitly: call get_std unless the sampler is
    using the *inherited* ArraySampler.get_std without ever having computed
    a `.std`. Samplers that override get_std (e.g. GaussianCauchy, which
    delegates to its inner Gaussian) are always called, and any exception a
    working loader raises propagates — no blanket except AttributeError.
    """
    if normalized and hasattr(sampler, "get_std"):
        from sdeflow_tpu.data.filebacked import ArraySampler

        uses_inherited = (
            getattr(type(sampler), "get_std", None) is ArraySampler.get_std
        )
        if not uses_inherited or hasattr(sampler, "std"):
            return sampler.get_std()
    return jnp.ones((real_dim,))


@partial(
    jax.jit,
    static_argnames=(
        "num_samples", "dim", "num_steps", "method", "include_t0",
        "norm_correction", "sampler", "corrector_steps", "snr", "dpm_grid",
    ),
)
def _jit_generate(gen, key, num_samples, dim, num_steps, method, include_t0,
                  norm_correction, sampler="sde", corrector_steps=0,
                  snr=0.16, dpm_grid="logsnr"):
    """One XLA program for the whole generation (the serving module's
    sampler program with trajectory capture), cached per static config
    across the sweep's repeat runs."""
    from sdeflow_tpu.serving import make_sampler_fn

    fn = make_sampler_fn(
        gen, num_samples, dim, num_steps, method=method,
        norm_correction=norm_correction, keep_all=True,
        include_t0=include_t0, sampler=sampler,
        corrector_steps=corrector_steps, snr=snr, dpm_grid=dpm_grid,
    )
    return fn(key)


def make_sampler(cfg: ExperimentConfig, dim, key, complexity=None):
    """Dataset factory (reference: MSGM_higherDim.py:495-639)."""
    from sdeflow_tpu import data as D

    dc = cfg.data
    ntrain_max = complexity if complexity is not None else np.inf
    dt = dc.datatype
    if dt == "swissroll":
        return D.SwissRoll()
    if dt == "gaussian":
        return D.Gaussian(key, dim, correlation=dc.correlation,
                          normalized=dc.normalized)
    if dt == "gaussianCauchy":
        return D.GaussianCauchy(key, dim, correlation=dc.correlation,
                                normalized=dc.normalized)
    if dt == "cauchy":
        return D.Cauchy(key, dim, correlation=dc.correlation,
                        normalized=dc.normalized)
    if dt == "piv":
        return D.PIV(dim, normalized=dc.normalized,
                     large_image=dc.large_image, smoothing=dc.smoothing,
                     localized=dc.localized, few_data=dc.few_data,
                     ntrain_max=ntrain_max)
    if dt == "grf":
        # synthetic smoothed-GRF image stand-in (no reference counterpart;
        # the image-parity distribution, data/synthetic.py)
        return D.SmoothedGRF(npixel=int(np.sqrt(dim)),
                             ell=float(dc.smoothing or 2))
    if dt == "lorenz63":
        return D.Lorenz63(dim, normalized=dc.normalized,
                          few_data=dc.few_data, ntrain_max=ntrain_max)
    if dt == "lorenz96":
        # complexity carries n_dim_L96 here (reference MSGM_higherDim.py:581);
        # the default inf sentinel from ntrain_maxs means "use the default"
        if complexity is None or not np.isfinite(complexity):
            n_dim = dc.n_dim_l96
        else:
            n_dim = int(complexity)
        return D.Lorenz96(n_dim, dim, normalized=dc.normalized)
    if dt == "pod":
        return D.PODmodes(int(complexity or 300), dim,
                          normalized=dc.normalized,
                          mixed_times=dc.mixed_times,
                          concatenate_re=dc.concatenate_re,
                          few_data=dc.few_data, ntrain_max=ntrain_max)
    if dt.startswith("era5"):
        # era5 / era5temp / era5vorttemp share the loader; the datatype
        # string drives the plotting layout special cases
        # (reference MSGM_higherDim.py:588-637, own_plotting.py:140-163)
        return D.ERA5(dim, variables=dc.era5_variables, season=dc.season,
                      use_deseason=dc.use_deseason,
                      mixed_times=dc.mixed_times)
    if dt == "eof_pressure":
        return D.EOFPressure(dim)
    if dt == "weather_station":
        return D.WeatherStation(dim)
    if dt == "ncar":
        return D.NCARWeatherStation(dim)
    raise ValueError(f"Unknown datatype: {dt}")


def make_model(cfg: ExperimentConfig, dim, premodule, mesh=None):
    """Score-net factory (reference: MSGM_higherDim.py:700-727). `mesh` is
    only consulted for attention_impl="ring" (sequence-parallel attention
    over the mesh's "model" axis)."""
    tc = cfg.train
    if tc.attention_impl == "ring" and mesh is None:
        raise ValueError('attention_impl="ring" requires a driver mesh '
                         "(run.py --tp N)")
    if tc.compute_dtype in ("bfloat16", "bf16"):
        dtype = jnp.bfloat16
    elif tc.compute_dtype in ("float32", "fp32"):
        dtype = jnp.float32
    else:
        raise ValueError(f"Unknown compute_dtype: {tc.compute_dtype}")
    if tc.nn_archi == "MLP":
        return MLP(input_dim=dim, index_dim=1, hidden_dim=128,
                   premodule=premodule, dtype=dtype)
    if tc.nn_archi == "Unet":
        npixelx = int(np.sqrt(dim))
        if dim != npixelx**2:
            raise ValueError(f"Incorrect dim to define square image: {dim}")
        return VorticityUNet(
            base_channels=tc.base_channels,
            channel_mults=tc.channel_mults,
            num_res_blocks=tc.num_res_blocks,
            premodule=premodule,
            in_space=npixelx,
            attention_resolutions=tc.attention_resolutions,
            use_checkpoint=False,
            flatten_order="F",
            attention_impl=tc.attention_impl,
            mesh=mesh if tc.attention_impl == "ring" else None,
            dtype=dtype,
        )
    if tc.nn_archi == "Unet1D":
        return UNet1D(
            input_dim=dim,
            base_channels=tc.base_channels,
            channel_mults=tc.channel_mults,
            num_res_blocks=tc.num_res_blocks,
            premodule=premodule,
            emb_dim=tc.emb_dim,
            dtype=dtype,
        )
    if tc.nn_archi == "DiT":
        from sdeflow_tpu.models import DiT1D

        return DiT1D(
            input_dim=dim,
            patch=tc.dit_patch,
            width=tc.dit_width,
            depth=tc.dit_depth,
            heads=tc.dit_heads,
            premodule=premodule,
            dtype=dtype,
        )
    if tc.nn_archi == "DiT2D":
        from sdeflow_tpu.models import DiT2D

        npixelx = int(np.sqrt(dim))
        if dim != npixelx**2:
            raise ValueError(f"Incorrect dim to define square image: {dim}")
        return DiT2D(
            in_space=npixelx,
            patch=tc.dit_patch,
            width=tc.dit_width,
            depth=tc.dit_depth,
            heads=tc.dit_heads,
            premodule=premodule,
            flatten_order="F",
            dtype=dtype,
        )
    raise ValueError(f"Unknown NN archi: {tc.nn_archi}")


class ExperimentDriver:
    """Runs the full comparison sweep for one ExperimentConfig."""

    def __init__(self, cfg: ExperimentConfig, log_fn=print, make_plots=True,
                 mesh=None):
        self.cfg = cfg
        self.log = log_fn
        self.make_plots = make_plots
        self.results = {}
        self.nll_results = {}
        # optional device mesh ("data", "model"): batches are sharded over
        # "data" (DP) and, when the "model" axis is >1, score-net params are
        # tensor-sharded by the per-architecture TP rules. No reference
        # counterpart (single-device torch, MSGM_higherDim.py:438-446).
        self.mesh = mesh

    def _shard_arm_params(self, gen):
        """Place the score net's params for tensor parallelism when the mesh
        has a non-trivial "model" axis (parallel/sharding.py rules)."""
        if self.mesh is None or self.mesh.shape.get("model", 1) <= 1:
            return gen
        if self.cfg.train.attention_impl == "ring":
            # the "model" axis is the ring's sequence axis — params stay
            # replicated (sequence parallelism, not tensor parallelism)
            return gen
        from sdeflow_tpu.parallel import (
            shard_dit_params,
            shard_mlp_params,
            shard_unet_params,
            shard_unet1d_params,
        )

        shard = {
            "MLP": shard_mlp_params,
            "Unet1D": shard_unet1d_params,
            "DiT": shard_dit_params,
            "DiT2D": shard_dit_params,
        }.get(self.cfg.train.nn_archi, shard_unet_params)
        return gen.replace(a_params=shard(gen.a_params, self.mesh))

    # -- per-arm helpers ----------------------------------------------------
    def _fair_budgets(self, is_msgm, ssm_intT, dim, batch_size_ref,
                      iterations_ref):
        """Fair-comparison scaling (reference: MSGM_higherDim.py:686-696):
        intT shrinks batch by num_steps_forward (same RAM); MSGM shrinks the
        iteration budget by max(1, sqrt(d)·steps/16) (same learning time)."""
        tc, sw = self.cfg.train, self.cfg.sweep
        batch_size = (
            max(1, int(batch_size_ref / tc.num_steps_forward))
            if ssm_intT
            else batch_size_ref
        )
        if sw.fair_comparison and is_msgm:
            ratio_ite = max(1, int(np.sqrt(dim) * tc.num_steps_forward / 16))
            self.log(f"ratio_ite = {ratio_ite}")
            iterations = max(1, int(iterations_ref / ratio_ite))
        else:
            iterations = iterations_ref
        return batch_size, iterations

    def _build_arm(self, key, sampler, dim, is_msgm, premodule,
                   num_samples_init, ssm_intT):
        """Model + SDE + reverse SDE for one sweep arm
        (reference: MSGM_higherDim.py:700-746)."""
        tc = self.cfg.train
        key_model, key_data, key_sde = jax.random.split(key, 3)
        model = make_model(self.cfg, dim, premodule, mesh=self.mesh)
        x_probe = sampler.sample(key_data, min(num_samples_init, 64))
        variables = model.init(
            key_model, x_probe, jnp.zeros((x_probe.shape[0],))
        )
        if is_msgm:
            x_init = sampler.sample(key_data, num_samples_init)
            sde = MSGMSde.create(
                key_sde, x_init,
                beta_min=tc.beta_min, beta_max=tc.beta_max,
                T=tc.T0, t_epsilon=tc.t_eps,
                num_steps_forward=tc.num_steps_forward,
                dense_tensor=tc.dense_tensor,
                norm_sampler=tc.norm_sampler, norm_map=tc.norm_map,
                estimate_norm_constant=False,
            )
        else:
            sde = SGMSde.create(
                beta_min=tc.beta_min_sgm, beta_max=tc.beta_max_sgm,
                T=tc.T0, t_epsilon=tc.t_eps,
                num_steps_forward=tc.num_steps_forward,
            )
        # eps output preconditioning needs the closed-form kernel — SGM only
        # (sde/reverse.py parameterization); MSGM arms stay "direct"
        param = tc.parameterization if not is_msgm else "direct"
        gen = PluginReverseSDE.create(
            sde, model.apply, variables, vtype=tc.vtype, ssm_intT=ssm_intT,
            parameterization=param,
        )
        return model, gen

    # -- the sweep ------------------------------------------------------------
    def run(self, key: Optional[jax.Array] = None, just_load=False):
        cfg = self.cfg
        tc, sw, dc, pc = cfg.train, cfg.sweep, cfg.data, cfg.plots
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)

        complexitys = self._complexitys()
        dims = list(dc.dims)
        shape = (len(dims), len(complexitys), len(sw.num_stepss_backward),
                 len(sw.iterationss), sw.nruns_mmd)
        mmd_sgm = np.zeros(shape)
        mmd_msgm = np.zeros(shape)
        mmd_ref = np.zeros(shape)
        swd_sgm = np.zeros(shape)
        swd_msgm = np.zeros(shape)
        swd_ref = np.zeros(shape)

        folder_results = cfg.results_dir
        os.makedirs(folder_results, exist_ok=True)

        for i_cx, complexity in enumerate(complexitys):
            for i_dim, dim in enumerate(dims):
                for is_msgm in sw.msgms:
                    # arm-specific defaults (reference MSGM_higherDim.py:473-483)
                    if not is_msgm:
                        normalized = dc.normalized
                        ssm_intT = False
                        premodule = None
                    else:
                        normalized = False
                        ssm_intT = sw.ssm_intT_ref
                        premodule = "NormalizeLogRadius"
                    if dc.datatype == "swissroll":
                        normalized = False

                    arm_key = jax.random.PRNGKey(cfg.seed)  # reseed per arm
                    key_sampler, key_test, key_arm = jax.random.split(
                        arm_key, 3
                    )
                    arm_cfg = replace(
                        cfg, data=replace(dc, normalized=normalized)
                    )
                    sampler = make_sampler(arm_cfg, dim, key_sampler,
                                           complexity=complexity)

                    directory = os.path.join(folder_results, sampler.name)
                    os.makedirs(directory, exist_ok=True)

                    xtest = sampler.sampletest(key_test, sw.num_samples)
                    real_dim = int(xtest.shape[1])
                    std_test = jnp.std(xtest, axis=0)
                    std_norm = resolve_std_norm(sampler, normalized, real_dim)
                    if dc.datatype == "cauchy":
                        std_test_plot = jnp.ones_like(std_test) / std_norm
                    else:
                        std_test_plot = std_test

                    dimplot = min(pc.dimplot_max, real_dim)
                    columns_plot = list(
                        range(1 + pc.offset_dimplot,
                              1 + pc.offset_dimplot + dimplot)
                    )

                    if self.make_plots:
                        pairplots_single(
                            xtest, std_norm, std_test_plot, dc.datatype,
                            sampler.name, dimplot=dimplot,
                            offset_dimplot=pc.offset_dimplot,
                            crop_data_plot=pc.crop_data_plot,
                            plot_crop=pc.plot_crop, plot_xlim=pc.plot_xlim,
                            columns_plot=columns_plot, dpi=pc.dpi,
                            height_seaborn=pc.height_seaborn,
                            results_dir=folder_results,
                        )

                    for i_iter, iterations_ref in enumerate(sw.iterationss):
                        for batch_size_ref in sw.batch_sizes:
                            self._run_arm(
                                key_arm, sampler, xtest, std_norm,
                                std_test_plot, dim=real_dim,
                                is_msgm=is_msgm, premodule=premodule,
                                ssm_intT=ssm_intT,
                                iterations_ref=iterations_ref,
                                batch_size_ref=batch_size_ref,
                                complexity=complexity,
                                indices=(i_dim, i_cx, i_iter),
                                mmd_arrays=(mmd_sgm, mmd_msgm, mmd_ref,
                                            swd_sgm, swd_msgm, swd_ref),
                                dimplot=dimplot, columns_plot=columns_plot,
                                just_load=just_load,
                            )

        self.results = dict(mmd_sgm=mmd_sgm, mmd_msgm=mmd_msgm,
                            mmd_ref=mmd_ref,
                            swd_sgm=swd_sgm, swd_msgm=swd_msgm,
                            swd_ref=swd_ref, dims=dims,
                            complexitys=complexitys,
                            nll_bits_per_dim=self.nll_results)
        if sw.eval_mmd:
            self._save_mmd_arrays(folder_results)
            if self.make_plots:
                self._convergence_plots(folder_results)
        return self.results

    def _run_arm(self, key, sampler, xtest, std_norm, std_test_plot, *, dim,
                 is_msgm, premodule, ssm_intT, iterations_ref, batch_size_ref,
                 complexity, indices, mmd_arrays, dimplot, columns_plot,
                 just_load):
        cfg = self.cfg
        tc, sw, dc, pc = cfg.train, cfg.sweep, cfg.data, cfg.plots
        i_dim, i_cx, i_iter = indices
        mmd_sgm, mmd_msgm, mmd_ref, swd_sgm, swd_msgm, swd_ref = mmd_arrays
        folder_results = cfg.results_dir

        batch_size, iterations = self._fair_budgets(
            is_msgm, ssm_intT, dim, batch_size_ref, iterations_ref
        )
        num_samples_init = int(
            min(tc.num_samples_init_max, iterations * batch_size)
        )
        self.log(f"num_samples_init = {num_samples_init}")

        key_build, key_fwd, key_train, key_sample = jax.random.split(key, 4)
        model, gen = self._build_arm(
            key_build, sampler, dim, is_msgm, premodule, num_samples_init,
            ssm_intT,
        )

        self.log(f"data = {sampler.name}")
        self.log(f"name_SDE = {gen.base_sde.name}")
        self.log(f"num_steps_forward = {tc.num_steps_forward}")
        self.log(f"iterations = {iterations} (ref {iterations_ref})")
        self.log(f"batch_size = {batch_size}")
        self.log(f"ssm_intT = {ssm_intT}  fair = {sw.fair_comparison}")
        self.log(f"NNarchi = {tc.nn_archi}  premodule = {premodule}")

        name_root = run_name_root(
            sampler.name, gen.base_sde.name, iterations_ref,
            num_samples_init, batch_size, tc.num_steps_forward,
            tc.beta_min, tc.beta_max, tc.beta_min_sgm, tc.beta_max_sgm,
            is_msgm, nn_archi=tc.nn_archi, premodule=premodule, lr=tc.lr,
            vtype=tc.vtype, ssm_intT=ssm_intT,
            fair_comparison=sw.fair_comparison,
        )

        # forward-SDE noising diagnostics (reference MSGM_higherDim.py:779-788)
        if self.make_plots:
            flow = ForwardFlow(base_sde=gen.base_sde, T=gen.base_sde.T)
            xs_forward = integrate_sde(
                flow, xtest, key_fwd, tc.num_steps_forward, method="rk4",
                keep_all=True, include_t0=True,
                norm_correction=bool(gen.base_sde.norm_correction),
            )
            preprocessing(
                xtest, xs_forward, tc.num_steps_forward, name_root,
                offset_dimplot=pc.offset_dimplot,
                noising_plots=pc.noising_plots,
                folder_results=folder_results, val_hist=pc.val_hist,
                std_norm=std_norm, std_test_plot=std_test_plot,
                log_fn=self.log,
            )

        # train (reference MSGM_higherDim.py:790-850)
        checkpoint_path = (
            os.path.join(folder_results, name_root + "_checkpoint")
            if tc.use_checkpoint else None
        )
        if not just_load:
            gen = self._shard_arm_params(gen)
            trainer = Trainer(
                gen, sampler, lr=tc.lr, batch_size=batch_size,
                optimizer=build_optimizer(
                    tc.lr, grad_clip=tc.grad_clip,
                    weight_decay=tc.weight_decay,
                    lr_warmup_steps=tc.lr_warmup_steps,
                ),
                loss="ssm", print_every=tc.print_every,
                save_every=tc.save_every, checkpoint_path=checkpoint_path,
                log_fn=self.log,
                steps_per_dispatch=min(tc.steps_per_dispatch,
                                       max(1, iterations // 2)),
                mesh=self.mesh,
                print_ram=tc.print_ram,
                ema_rate=tc.ema_rate,
                ema_warmup=tc.ema_warmup,
            )
            state, _ = trainer.run(key_train, iterations,
                                   x_test=xtest[: min(1000, xtest.shape[0])])
            # with TrainConfig.ema_rate set, sample/evaluate with the
            # averaged weights (no reference counterpart — nn_utils'
            # update_ema is dead code there, model/nn_utils.py:117-127)
            gen = trainer.ema_gen_sde if tc.ema_rate else state.gen_sde
            if checkpoint_path:
                delete_checkpoint(checkpoint_path)
                self.log("Training finished successfully, checkpoint removed.")
            save_checkpoint(
                os.path.join(folder_results, name_root + "_checkpoint_final"),
                state, key_train, iterations - 1,
            )
            if sw.eval_nll:
                self._eval_nll(gen, xtest, key_train, name_root)
        elif sw.eval_nll:
            self.log(
                "eval_nll skipped: --just-load restores saved samples, "
                "not a trained model"
            )

        # theoretical pdf overlay for uncorrelated gaussian/cauchy
        # (reference MSGM_higherDim.py:522-558: plot_ref_pdf + pdf_theor)
        pdf_theor, plot_ref_pdf = None, pc.plot_ref_pdf
        if not dc.correlation:
            if dc.datatype == "gaussian":
                pdf_theor = lambda xx: np.exp(-0.5 * xx**2) / np.sqrt(2 * np.pi)
                plot_ref_pdf = True
            elif dc.datatype == "cauchy":
                scale = 1.0 / 50
                pdf_theor = lambda xx: scale / (np.pi * (xx**2 + scale**2))
                plot_ref_pdf = True

        # reverse-sampling sweep (reference MSGM_higherDim.py:852-916)
        x_train_for_mmd = sampler.sample(
            jax.random.fold_in(key_sample, 777), sw.num_samples
        )
        # exponential integrators need the closed-form VP kernel; on mixed
        # SGM/MSGM sweeps degrade the MSGM arms to the stochastic path
        # (loudly) instead of crashing the sweep
        eff_sampler, eff_method = sw.sampler, sw.backward_method
        if eff_sampler == "dpm":
            if not eff_method.startswith(("dpm", "sdpm")):
                # serving._solve_from would silently default to dpm2m;
                # record the method that actually runs in names/logs
                eff_method = "dpm2m"
            if not hasattr(gen.base_sde, "mean_weight"):
                eff_sampler = "sde"
                eff_method = "rk4"
                self.log(
                    f"sampler 'dpm' needs a closed-form forward kernel; "
                    f"{gen.base_sde.name} arm falls back to "
                    f"sampler '{eff_sampler}' / method '{eff_method}'"
                )
        for i_steps, num_steps_backward in enumerate(sw.num_stepss_backward):
            self.log(f"Generation : num_steps_backward = {num_steps_backward}")
            fig_step = max(1, int(num_steps_backward / 8))
            if sw.include_t0_reverse:
                inds = range(0, num_steps_backward + 1, fig_step)
            else:
                inds = range(fig_step - 1, num_steps_backward, fig_step)

            for i_run in range(sw.nruns_mmd):
                name_simu = simulation_name(
                    folder_results, name_root, tc.t_eps,
                    num_steps_backward, sw.include_t0_reverse, i_run,
                    method=eff_method,
                )
                if i_run > 0:
                    os.makedirs(os.path.join("runs", sampler.name),
                                exist_ok=True)
                k_run = jax.random.fold_in(key_sample,
                                           i_steps * 1000 + i_run)
                if just_load:
                    xs = np.load(name_simu + "_traj.npy")
                else:
                    xs = _jit_generate(
                        gen, k_run, sw.num_samples, dim,
                        num_steps_backward, eff_method,
                        sw.include_t0_reverse,
                        bool(gen.base_sde.norm_correction),
                        sampler=eff_sampler,
                        corrector_steps=sw.corrector_steps, snr=sw.snr,
                        dpm_grid=sw.dpm_grid,
                    )
                    if pc.save_results:
                        np.save(name_simu + "_traj.npy", np.asarray(xs))

                if self.make_plots or sw.eval_mmd:
                    out = postprocessing(
                        inds, xs, xtest, std_norm, std_test_plot,
                        dc.datatype, name_simu, dimplot=dimplot,
                        offset_dimplot=pc.offset_dimplot,
                        crop_data_plot=pc.crop_data_plot,
                        plot_crop=pc.plot_crop, plot_xlim=pc.plot_xlim,
                        plot_ref_pdf=plot_ref_pdf, pdf_theor=pdf_theor,
                        log_scale_pdf=pc.log_scale_pdf,
                        columns_plot=columns_plot,
                        scatter_plots=pc.scatter_plots and self.make_plots,
                        denoising_plots=pc.denoising_plots and self.make_plots,
                        include_t0_reverse=sw.include_t0_reverse,
                        dpi=pc.dpi, height_seaborn=pc.height_seaborn,
                        val_hist=pc.val_hist,
                        save_results=pc.save_results and not just_load,
                        first_run=(i_run == 0),
                        mmd_inputs=(
                            (x_train_for_mmd, sw.num_samples)
                            if sw.eval_mmd else None
                        ),
                        log_fn=self.log,
                    )
                    if sw.eval_mmd and out["mmd"] is not None:
                        idx = (i_dim, i_cx, i_steps, i_iter, i_run)
                        mmd_ref[idx] = out["mmd_ref"]
                        swd_ref[idx] = out["swd_ref"]
                        if is_msgm:
                            mmd_msgm[idx] = out["mmd"]
                            swd_msgm[idx] = out["swd"]
                        else:
                            mmd_sgm[idx] = out["mmd"]
                            swd_sgm[idx] = out["swd"]

    def _eval_nll(self, gen, xtest, key, name_root):
        """Exact NLL (bits/dim) of a trained arm via the PF-ODE likelihood
        with the normalized latent prior (eval/nll.py nll_summary — the
        shared measurement protocol). No reference counterpart: the
        reference only prints the ELBO bound (NN.py:123-128), and its MSGM
        latent density is acknowledged-unnormalized (SDEs.py:504-505)."""
        import json

        from sdeflow_tpu.eval.nll import nll_summary

        entry = nll_summary(
            gen, xtest, jax.random.fold_in(key, 999),
            num_steps=self.cfg.sweep.nll_steps,
        )
        self.nll_results[name_root] = entry
        if entry["mean"] is None:
            self.log("NLL: no finite log-density (diverged arm?)")
        else:
            self.log(
                f"NLL = {entry['mean']:.4f} ± {entry['stderr']:.4f} bits/dim "
                f"(exact PF-ODE likelihood, {entry['n']} test points)"
            )
        path = os.path.join(self.cfg.results_dir, "nll_bits_per_dim.json")
        with open(path, "w") as f:
            json.dump(self.nll_results, f, indent=1)

    def _mmd_path(self, folder, arm, metric="MMD"):
        """Single source of truth for the metric result-tensor filenames
        (reference: MSGM_higherDim.py:924-936; metric="SWD" stores the
        sliced-Wasserstein tensors the reference does not compute)."""
        return os.path.join(
            folder,
            f"global{metric}file_{arm}_{self.cfg.sweep.nruns_mmd}runs.npy",
        )

    def _complexitys(self):
        """The sweep's complexity axis: Reynolds numbers for POD, train-set
        sizes otherwise (reference: MSGM_higherDim.py:449-452)."""
        sw, dc = self.cfg.sweep, self.cfg.data
        return list(sw.Res) if dc.datatype == "pod" else list(sw.ntrain_maxs)

    def load_mmd_and_plot(self, folder=None):
        """Reload previously saved MMD result tensors and regenerate the
        convergence plots without re-running the sweep (the reference's
        justLoadmmmd mode, MSGM_higherDim.py:920-930)."""
        folder = folder or self.cfg.results_dir
        self.results = dict(
            mmd_sgm=np.load(self._mmd_path(folder, "SGM")),
            mmd_msgm=np.load(self._mmd_path(folder, "MSGM")),
            mmd_ref=np.load(self._mmd_path(folder, "ref")),
            dims=list(self.cfg.data.dims),
            complexitys=self._complexitys(),
        )
        for arm, res_key in (("SGM", "swd_sgm"), ("MSGM", "swd_msgm"),
                             ("ref", "swd_ref")):
            swd_path = self._mmd_path(folder, arm, metric="SWD")
            if os.path.exists(swd_path):  # absent in pre-SWD result dirs
                self.results[res_key] = np.load(swd_path)
        if self.make_plots:
            self._convergence_plots(folder)
        return self.results

    # -- results persistence + convergence plots -------------------------------
    def _save_mmd_arrays(self, folder):
        """(reference: MSGM_higherDim.py:931-936; + SWD tensors alongside)"""
        np.save(self._mmd_path(folder, "SGM"), self.results["mmd_sgm"])
        np.save(self._mmd_path(folder, "MSGM"), self.results["mmd_msgm"])
        np.save(self._mmd_path(folder, "ref"), self.results["mmd_ref"])
        np.save(self._mmd_path(folder, "SGM", "SWD"), self.results["swd_sgm"])
        np.save(self._mmd_path(folder, "MSGM", "SWD"),
                self.results["swd_msgm"])
        np.save(self._mmd_path(folder, "ref", "SWD"), self.results["swd_ref"])

    def _convergence_plots(self, folder):
        """√MMD convergence plots vs backward steps / iterations / dimension /
        train-set size (reference: MSGM_higherDim.py:938-1176)."""
        import matplotlib.pyplot as plt
        import matplotlib.ticker as mticker

        sw = self.cfg.sweep
        res = self.results
        dims, complexitys = res["dims"], res["complexitys"]

        def stats(arr):
            s = np.sqrt(np.maximum(arr, 0.0))
            return s.mean(axis=4), np.quantile(s, 0.1, axis=4), np.quantile(
                s, 0.9, axis=4
            )

        m_sgm, q10_sgm, q90_sgm = stats(res["mmd_sgm"])
        m_msgm, q10_msgm, q90_msgm = stats(res["mmd_msgm"])
        m_ref, q10_ref, q90_ref = stats(res["mmd_ref"])

        def plot_axis(xvals, slicer, xlabel, fname):
            fig = plt.figure(figsize=(5 * 0.7 * 1.3, 3 * 0.7))
            for label, (m, q10, q90) in [
                ("SGM", (m_sgm, q10_sgm, q90_sgm)),
                ("MSGM", (m_msgm, q10_msgm, q90_msgm)),
                ("train data", (m_ref, q10_ref, q90_ref)),
            ]:
                plt.loglog(xvals, slicer(m), label=label)
                plt.fill_between(xvals, slicer(q10), slicer(q90), alpha=0.2)
            plt.xlabel(xlabel)
            plt.ylabel("MMD")
            ax = plt.gca()
            ax.set_xticks(list(xvals))
            ax.xaxis.set_major_locator(mticker.FixedLocator(list(xvals)))
            plt.tight_layout()
            ax.legend(loc="center left", bbox_to_anchor=(1, 0.5))
            plt.savefig(os.path.join(folder, fname), bbox_inches="tight")
            plt.close(fig)

        for i_dim in range(len(dims)):
            for i_cx in range(len(complexitys)):
                plot_axis(
                    list(sw.num_stepss_backward),
                    lambda m, i=i_dim, c=i_cx: m[i, c, :, 0].flatten(),
                    "nb timesteps in backward SDE",
                    f"MMD_wBckWardSteps_d={dims[i_dim]}"
                    f"_Ntrain={complexitys[i_cx]}.png",
                )
                if len(sw.iterationss) > 1:
                    plot_axis(
                        list(sw.iterationss),
                        lambda m, i=i_dim, c=i_cx: m[i, c, 0, :].flatten(),
                        "effective number of iterations",
                        f"MMD_wIte_d={dims[i_dim]}"
                        f"_Ntrain={complexitys[i_cx]}.png",
                    )
        if len(dims) > 1:
            plot_axis(
                dims, lambda m: m[:, 0, 0, 0].flatten(), "dimension",
                "MMD_wDim.png",
            )
        if len(complexitys) > 1 and np.all(np.isfinite(complexitys)):
            plot_axis(
                complexitys, lambda m: m[0, :, 0, 0].flatten(),
                "Training set size", "MMD_wNtrain.png",
            )

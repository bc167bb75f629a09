"""Typed experiment configuration + named presets.

The reference configures runs through ~120 module-level globals edited
in-file, with commented preset blocks and a `match datatype:` override block
(reference: MSGM_higherDim.py:47-407). Here each regime is a frozen
dataclass tree with named presets reproducing the reference's dataset
blocks; the CLI (`python -m sdeflow_tpu.run --preset <name>`) selects one.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: MSGM_higherDim.py:49-75)."""

    T0: float = 1.0
    beta_min: float = 0.1
    beta_max: float = 20.0
    beta_min_sgm: float = 0.1
    beta_max_sgm: float = 20.0
    t_eps: float = 1e-3
    norm_sampler: str = "ecdf"
    norm_map: Optional[str] = "log"
    dense_tensor: bool = True
    nn_archi: str = "MLP"  # MLP | Unet | Unet1D | DiT | DiT2D
    # score-net compute dtype: "float32" | "bfloat16". bfloat16 is
    # mixed-precision: flax keeps params (and Adam state, and the loss
    # reduction — sde/reverse.py score() casts the net's output back to
    # fp32) in float32 and casts per-op, so the MXU sees bf16 operands.
    # No reference counterpart (the reference trains pure fp32 CUDA).
    compute_dtype: str = "float32"
    # learned-drift output parameterization: "direct" (the reference's,
    # SDEs.py:563-579) | "eps" (net predicts O(1) noise, output rescaled
    # by -g/std — DDPM/EDM-style preconditioning; SGM arms only, MSGM
    # always runs direct). See sde/reverse.py `parameterization`.
    parameterization: str = "direct"
    num_samples_init_max: int = 100_000
    vtype: str = "rademacher"
    lr: float = 1e-3
    # production optimizer knobs (no reference counterpart — the reference
    # is bare Adam, MSGM_higherDim.py:789): global-norm gradient clipping,
    # AdamW decoupled weight decay, linear LR warmup steps. Composed by
    # training.build_optimizer; defaults reproduce the reference exactly.
    grad_clip: Optional[float] = None
    weight_decay: float = 0.0
    lr_warmup_steps: int = 0
    print_every: int = 10_000
    save_every: int = 100_000
    use_checkpoint: bool = False
    # working equivalent of the reference's dormant print_RAM flag
    # (MSGM_higherDim.py:397): log host RSS + device HBM at print cadence
    print_ram: bool = False
    # EMA of the score-net params (Trainer(ema_rate=...)); None = off, the
    # reference's behavior (its update_ema is never called,
    # model/nn_utils.py:117-127). When set, sampling/eval use the averaged
    # weights.
    ema_rate: Optional[float] = None
    # ramp the EMA decay as min(rate, (1+n)/(10+n)) (Song score_sde-style)
    # so short budgets aren't dominated by the random init — measured
    # √MMD≈1.0 at 768 steps with a fixed 0.999 decay
    ema_warmup: bool = True
    num_steps_forward: int = 16
    # U-Net extras (reference MSGM_higherDim.py:704-727)
    base_channels: int = 32
    channel_mults: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (2, 4)
    # attention backend for the U-Net blocks: "auto" (heads==1 blocks run
    # as ONE fused Pallas program on the no-grad TPU path,
    # ops/pallas/attnblock.py) | "unfused" (module composition) | "ring"
    # (sequence-parallel over the driver mesh's "model" axis,
    # parallel/ring.py; needs run.py --tp N / ExperimentDriver(mesh=...))
    attention_impl: str = "auto"
    emb_dim: int = 128
    # DiT extras (models/dit.py — no reference counterpart; MXU-native
    # transformer score net for large-d 1D configs). Defaults are the
    # measured MXU sweet spot: head_dim 128, patch 16 (sec_dit).
    dit_patch: int = 16
    dit_width: int = 512
    dit_depth: int = 6
    dit_heads: int = 4
    # fused multi-step training: >1 runs this many SSM+Adam steps per device
    # dispatch via lax.scan with on-device data sampling (all samplers here
    # are jittable); amortizes host dispatch latency on remote accelerators
    steps_per_dispatch: int = 256


@dataclass(frozen=True)
class SweepConfig:
    """Comparison-regime sweep axes (reference: MSGM_higherDim.py:100-154).

    Defaults mirror the active "Fair comparison more CV" block."""

    msgms: Tuple[int, ...] = (0, 1)  # 0 = SGM arm, 1 = MSGM arm
    ntrain_maxs: Tuple[float, ...] = (np.inf,)
    iterationss: Tuple[int, ...] = (2**20,)
    num_stepss_backward: Tuple[int, ...] = (128,)
    batch_sizes: Tuple[int, ...] = (256,)
    nruns_mmd: int = 1
    fair_comparison: bool = True
    ssm_intT_ref: bool = False
    eval_mmd: bool = False
    # exact-NLL eval of each trained arm via the PF-ODE likelihood
    # (eval/nll.py; no reference counterpart — the reference only has the
    # ELBO bound). Reported in bits/dim and saved to nll_bits_per_dim.json.
    eval_nll: bool = False
    nll_steps: int = 64  # PF-ODE likelihood-solve step count
    num_samples: int = 10_000
    include_t0_reverse: bool = True
    Res: Tuple[int, ...] = (300, 3900)  # POD Reynolds numbers
    # generation integrator: "rk4" (the reference's choice,
    # MSGM_higherDim.py:903) | "heun" | "em"
    backward_method: str = "rk4"
    # "sde" = stochastic reverse SDE (the reference's only path);
    # "ode" = deterministic probability-flow ODE (ops/ode.py);
    # "dpm" = DPM-Solver exponential integrator (ops/expint.py, SGM only;
    #         backward_method then picks dpm1|dpm2|dpm2m, default dpm2m)
    sampler: str = "sde"
    # Langevin corrector MCMC steps after each predictor step (Song et al.
    # 2021 predictor–corrector; 0 = predictor-only, the reference's path)
    # + its SNR step-size knob (ops/integrators.langevin_corrector)
    corrector_steps: int = 0
    snr: float = 0.16
    # dpm time grid: "logsnr" (uniform-λ, the DPM-Solver default) |
    # "time" (uniform-s) | "karras" (EDM ρ=7 noise schedule)
    dpm_grid: str = "logsnr"


@dataclass(frozen=True)
class DataConfig:
    """Dataset selection + per-dataset options
    (reference: MSGM_higherDim.py:156-353, 495-639)."""

    datatype: str = "swissroll"
    dims: Tuple[int, ...] = (2,)
    normalized: bool = True
    mixed_times: bool = False
    correlation: bool = True
    few_data: bool = False
    # PIV
    large_image: bool = False
    smoothing: int = 0
    localized: bool = False
    # Lorenz-96: system size of the simulated L96 used as data source
    # (reference data.py:584 default n_dim_L96=100)
    n_dim_l96: int = 100
    # ERA5
    season: str = "all"
    use_deseason: bool = False
    era5_variables: Optional[Tuple[str, ...]] = None
    # POD
    concatenate_re: bool = False


@dataclass(frozen=True)
class PlotConfig:
    """Plot options (reference: MSGM_higherDim.py:366-400)."""

    scatter_plots: bool = True
    noising_plots: bool = True
    denoising_plots: bool = True
    save_results: bool = True
    plot_xlim: float = 3.0
    val_hist: float = 3.0
    crop_data_plot: bool = False
    plot_crop: float = 3.0
    log_scale_pdf: bool = True
    plot_ref_pdf: bool = False
    dimplot_max: int = 4
    offset_dimplot: int = 0
    dpi: int = 200
    height_seaborn: float = 1.0


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "swissroll"
    train: TrainConfig = field(default_factory=TrainConfig)
    sweep: SweepConfig = field(default_factory=SweepConfig)
    data: DataConfig = field(default_factory=DataConfig)
    plots: PlotConfig = field(default_factory=PlotConfig)
    results_dir: str = "results"
    seed: int = 0

    def debug(self) -> "ExperimentConfig":
        """The reference's dbg preset: shrink everything for a smoke run
        (reference: MSGM_higherDim.py:355-364)."""
        return replace(
            self,
            name=self.name + "_dbg",
            sweep=replace(
                self.sweep,
                iterationss=(16, 8),
                num_stepss_backward=(4, 8),
                num_samples=10,
                nruns_mmd=1,
                ntrain_maxs=(2**2, 2**4),
                batch_sizes=(2,),
            ),
            train=replace(self.train, num_steps_forward=10, print_every=8),
        )


def _swissroll():
    return ExperimentConfig(
        name="swissroll",
        data=DataConfig(datatype="swissroll", dims=(2,), normalized=False),
    )


def _gaussian():
    return ExperimentConfig(
        name="gaussian",
        data=DataConfig(datatype="gaussian", dims=(2, 4, 8, 16, 32)),
        plots=PlotConfig(plot_xlim=4.0, val_hist=8.0),
    )


def _gaussian_cauchy():
    # reference: MSGM_higherDim.py:263-272
    return ExperimentConfig(
        name="gaussianCauchy",
        train=TrainConfig(beta_max=2.0),
        data=DataConfig(datatype="gaussianCauchy", dims=(2,)),
        plots=PlotConfig(
            crop_data_plot=True, plot_xlim=5.0, plot_crop=15.0, val_hist=0.4
        ),
    )


def _cauchy():
    # reference: MSGM_higherDim.py:274-296
    return ExperimentConfig(
        name="cauchy",
        train=TrainConfig(
            beta_max=1.0, beta_min=0.01, t_eps=1e-4, num_steps_forward=128
        ),
        data=DataConfig(datatype="cauchy", dims=(4,), correlation=True),
        plots=PlotConfig(
            crop_data_plot=True, plot_xlim=10.0, plot_crop=30.0, val_hist=10.0
        ),
    )


def _lorenz63():
    # reference: MSGM_higherDim.py:178-202 (dense-tensor d=16 regime)
    ratio = 10.0
    return ExperimentConfig(
        name="lorenz63",
        train=TrainConfig(
            beta_min=0.1 / ratio,
            beta_max=20.0 / ratio,
            beta_min_sgm=0.1 / ratio,
            beta_max_sgm=20.0 / ratio,
            t_eps=1e-3 / ratio,
            num_steps_forward=128,
            use_checkpoint=True,
        ),
        sweep=SweepConfig(fair_comparison=False),
        data=DataConfig(datatype="lorenz63", dims=(16,)),
        plots=PlotConfig(plot_xlim=4.0, val_hist=8.0, offset_dimplot=8),
    )


def _lorenz63_unet1d():
    # reference: MSGM_higherDim.py:186-191 (sparse-tensor d=1000 Unet1D regime)
    base = _lorenz63()
    return replace(
        base,
        name="lorenz63_unet1d",
        train=replace(
            base.train, dense_tensor=False, nn_archi="Unet1D", num_steps_forward=16
        ),
        data=replace(base.data, dims=(1000,)),
    )


def _lorenz63_dit():
    # no reference counterpart: the d=1000 signal regime driven by the
    # MXU-native DiT score net (models/dit.py) instead of UNet1D —
    # measured 47.9% bf16 MFU vs 38.6% (PERF_MEASURED sec_dit) and
    # better SGM-arm quality at equal budget (PARITY "DiT arm").
    base = _lorenz63_unet1d()
    return replace(
        base,
        name="lorenz63_dit",
        train=replace(base.train, nn_archi="DiT"),
    )


def _piv_small():
    # reference: MSGM_higherDim.py:206-220 (4x4 flat mode)
    ratio = 4.0
    return ExperimentConfig(
        name="piv_small",
        train=TrainConfig(
            beta_min=0.1 / ratio,
            beta_max=20.0 / ratio,
            beta_min_sgm=0.1 / ratio,
            beta_max_sgm=20.0 / ratio,
            t_eps=1e-3 / ratio,
        ),
        sweep=SweepConfig(ntrain_maxs=(2**10,)),
        data=DataConfig(
            datatype="piv", dims=(16,), few_data=True, localized=True
        ),
        plots=PlotConfig(plot_xlim=6.0, val_hist=12.0),
    )


def _piv_large(npixel=32):
    # reference: MSGM_higherDim.py:222-259 (16x16 / 32x32 attention U-Net)
    ratio = 1 / 4 if npixel == 16 else 1 / 8
    return ExperimentConfig(
        name=f"piv{npixel}",
        train=TrainConfig(
            beta_min=0.1 / ratio,
            beta_max=20.0 / ratio,
            t_eps=1e-3 / ratio,
            num_steps_forward=int(16 / ratio),
            dense_tensor=False,
            nn_archi="Unet",
            lr=1e-4,
            use_checkpoint=True,
        ),
        sweep=SweepConfig(
            fair_comparison=False,
            iterationss=(100_000,),
            batch_sizes=(128,),
            num_stepss_backward=(2048, 512, 128, 32, 16),
        ),
        data=DataConfig(
            datatype="piv", dims=(npixel**2,), large_image=True, smoothing=2
        ),
        plots=PlotConfig(
            plot_xlim=6.0, val_hist=24.0, offset_dimplot=npixel**2 // 2
        ),
    )


def _grf(npixel=16):
    """The piv16/32 image config on the synthetic SmoothedGRF stand-in —
    same U-Net/SDE hyperparameters as _piv_large (the image-parity
    configuration, tools/parity_image_*.py) but runnable without
    ../MSGM-data."""
    from dataclasses import replace as _replace

    cfg = _piv_large(npixel)
    return _replace(
        cfg, name=f"grf{npixel}",
        data=DataConfig(datatype="grf", dims=(npixel**2,), smoothing=2),
    )


def _grf_dit(npixel=16):
    """The grf16 image config driven by the DiT2D transformer score net
    (models/dit.py) instead of the attention U-Net — the 16×16/c32 conv
    architecture caps near ~35% MFU (README "U-Net roofline"); DiT2D's
    FLOPs are all width-512 dense matmuls. dit_patch=4 → 16 tokens of
    4×4 pixels on 16×16 images."""
    cfg = _grf(npixel)
    return replace(
        cfg, name=f"grf{npixel}_dit",
        train=replace(cfg.train, nn_archi="DiT2D", dit_patch=4),
    )


def _grf_production(npixel=16):
    """The production image preset: every measured-best knob from the
    round-3/4/5 studies composed into ONE config (round-4 review item 7).

    - bf16 compute (fp32 params/Adam/loss; bf16 beats fp32 on the image
      forward after the fused AttentionBlock kernel — PERF_MEASURED.json),
      paired with the eps output parameterization on the SGM arm (SGM +
      bf16 + direct measured ~4x worse on quality,
      BF16_ABLATION_UNET1D.json; the driver keeps MSGM direct — no
      closed-form kernel),
    - parameter EMA 0.999 with warmup (the biggest measured quality lever:
      EMA wins 86-91/93 sampler-grid cells per seed, EMA_ABLATION.json /
      ODE_STUDY_CPU_ema*.json; warmup-on beats raw in 4/4 short-budget
      cells, EMA_WARMUP_*_1k.json),
    - predictor-corrector sampling (em-32 + 1 Langevin corrector step:
      halves the flagship MSGM image √MMD vs the reference rk4-2048 path
      at 3.8x its rate and beats it on SGM in 3/3 seeds,
      parity_image_ours_samplers.json / ODE_STUDY_CPU*.json),
    - the reference's full 100k-iteration budget, fused 256-step dispatch.

    Architecture: the attention U-Net (the full-budget-validated flagship;
    GRF16_PRODUCTION.json carries this preset's measured end-to-end
    quality + throughput). `grf16_production_dit` is the same bundle on
    the DiT2D transformer."""
    cfg = _grf(npixel)
    return replace(
        cfg,
        name=f"grf{npixel}_production",
        train=replace(
            cfg.train,
            compute_dtype="bfloat16",
            ema_rate=0.999,  # ema_warmup=True is the default
            parameterization="eps",  # SGM arm only; MSGM forced direct
        ),
        sweep=replace(
            cfg.sweep,
            sampler="sde",
            backward_method="em",
            corrector_steps=1,
            num_stepss_backward=(32,),
        ),
    )


def _grf_production_dit(npixel=16):
    """grf16_production on the DiT2D score net (58.3% bf16 MFU vs the
    U-Net's ~28% cap; full-budget quality evidence in
    parity_image_ours_dit_full.json)."""
    cfg = _grf_production(npixel)
    return replace(
        cfg,
        name=f"grf{npixel}_production_dit",
        train=replace(cfg.train, nn_archi="DiT2D", dit_patch=4),
    )


def _pod():
    # reference: MSGM_higherDim.py:298-307
    return ExperimentConfig(
        name="pod",
        data=DataConfig(datatype="pod", dims=(16,), mixed_times=True),
        sweep=SweepConfig(Res=(300, 3900)),
        plots=PlotConfig(val_hist=6.0),
    )


def _era5():
    # reference: MSGM_higherDim.py:317-330, 588-602
    return ExperimentConfig(
        name="era5",
        data=DataConfig(
            datatype="era5",
            dims=(30,),
            normalized=False,
            era5_variables=(
                "10m_u_component_of_wind",
                "10m_v_component_of_wind",
                "vorticity",
            ),
        ),
        plots=PlotConfig(plot_xlim=5.0, val_hist=10.0),
    )


def _era5temp():
    return ExperimentConfig(
        name="era5temp",
        data=DataConfig(
            datatype="era5temp",
            dims=(10,),
            normalized=False,
            use_deseason=True,
            era5_variables=("2m_temperature",),
        ),
        plots=PlotConfig(plot_xlim=5.0, val_hist=10.0),
    )


def _era5vorttemp():
    return ExperimentConfig(
        name="era5vorttemp",
        train=TrainConfig(beta_max=5.0, beta_max_sgm=5.0),
        data=DataConfig(
            datatype="era5vorttemp",
            dims=(16,),
            normalized=False,
            season="winter",
            use_deseason=True,
            mixed_times=True,
            era5_variables=("2m_temperature", "vorticity"),
        ),
        plots=PlotConfig(plot_xlim=5.0, val_hist=10.0),
    )


def _lorenz96():
    # reference: MSGM_higherDim.py:309 (override case commented out — no
    # dataset-specific overrides) + driver wiring :580-581; sampler defaults
    # from data.py:583-616 (n_dim_L96=100, dim=8, /10 rescale)
    return ExperimentConfig(
        name="lorenz96",
        data=DataConfig(datatype="lorenz96", dims=(8,)),
        plots=PlotConfig(plot_xlim=4.0, val_hist=8.0),
    )


def _eof_pressure():
    # reference: MSGM_higherDim.py:311 + :582-583; loader defaults
    # data.py:502-531 (dim=8, /250000 rescale, pre-standardized PCs)
    return ExperimentConfig(
        name="eof_pressure",
        data=DataConfig(datatype="eof_pressure", dims=(8,), normalized=False),
        plots=PlotConfig(plot_xlim=5.0, val_hist=10.0),
    )


def _weather_station():
    # reference: MSGM_higherDim.py:313 + :584-585; loader defaults
    # data.py:421-500 (dim=30, polar→cartesian wind, timestamp intersection)
    return ExperimentConfig(
        name="weather_station",
        data=DataConfig(datatype="weather_station", dims=(30,)),
        plots=PlotConfig(plot_xlim=5.0, val_hist=10.0),
    )


def _ncar():
    # reference: MSGM_higherDim.py:315 + :586-587; loader defaults
    # data.py:388-418 (dim=90, per-column standardization in the loader)
    return ExperimentConfig(
        name="ncar",
        data=DataConfig(datatype="ncar", dims=(90,), normalized=False),
        plots=PlotConfig(plot_xlim=5.0, val_hist=10.0),
    )


PRESETS = {
    "swissroll": _swissroll,
    "gaussian": _gaussian,
    "gaussianCauchy": _gaussian_cauchy,
    "cauchy": _cauchy,
    "lorenz63": _lorenz63,
    "lorenz63_unet1d": _lorenz63_unet1d,
    "lorenz63_dit": _lorenz63_dit,
    "piv_small": _piv_small,
    "piv16": lambda: _piv_large(16),
    "piv32": lambda: _piv_large(32),
    "grf16": lambda: _grf(16),
    "grf32": lambda: _grf(32),
    "grf16_dit": lambda: _grf_dit(16),
    "grf16_production": lambda: _grf_production(16),
    "grf16_production_dit": lambda: _grf_production_dit(16),
    "pod": _pod,
    "era5": _era5,
    "era5temp": _era5temp,
    "era5vorttemp": _era5vorttemp,
    "lorenz96": _lorenz96,
    "eof_pressure": _eof_pressure,
    "weather_station": _weather_station,
    "ncar": _ncar,
}


def get_preset(name: str) -> ExperimentConfig:
    """Resolve a preset; a "_dbg" suffix applies the debug shrink."""
    dbg = name.endswith("_dbg")
    base = name[: -len("_dbg")] if dbg else name
    if base not in PRESETS:
        raise KeyError(f"unknown preset {base!r}; available: {sorted(PRESETS)}")
    cfg = PRESETS[base]()
    return cfg.debug() if dbg else cfg

"""Experiment driver: dbg-preset sweep end to end, naming, presets, lowrank."""

import os

import numpy as np
import jax
import pytest

from sdeflow_tpu.configs import get_preset, PRESETS
from sdeflow_tpu.experiments.naming import run_name_root, simulation_name
from sdeflow_tpu.experiments.driver import ExperimentDriver, make_sampler, make_model
from sdeflow_tpu.plotting.lowrank import simulate_block_rotation


def test_presets_resolve():
    for name in PRESETS:
        cfg = get_preset(name)
        assert cfg.name == name
        dbg = get_preset(name + "_dbg")
        assert dbg.sweep.num_samples == 10
    with pytest.raises(KeyError):
        get_preset("nope")


def test_run_name_encoding():
    name = run_name_root(
        "swiss", "MSGMlogNorm", 1024, 512, 256, 16, 0.1, 20.0, 0.1, 20.0,
        is_msgm=True, premodule="NormalizeLogRadius", ssm_intT=True,
        fair_comparison=True,
    )
    assert name.startswith("swiss/MSGMlogNorm_1024iteRefLearning_")
    assert "_intLoss" in name and "_fairComp" in name
    assert "NormalizeLogRadius" in name
    sim = simulation_name("results", name, 1e-3, 128, True, i_run=0)
    assert sim.startswith("results/") and "128stepsBack" in sim
    sim_run = simulation_name("results", name, 1e-3, 128, True, i_run=2)
    assert sim_run.startswith("runs/") and sim_run.endswith("_run2")


def test_fair_comparison_budgets(rng):
    cfg = get_preset("swissroll")
    drv = ExperimentDriver(cfg, log_fn=lambda *_: None, make_plots=False)
    # intT halves RAM by shrinking batch; MSGM shrinks iterations
    b, it = drv._fair_budgets(True, True, 16, 256, 2**16)
    assert b == 256 // cfg.train.num_steps_forward
    assert it == 2**16 // max(1, int(np.sqrt(16) * cfg.train.num_steps_forward / 16))
    b2, it2 = drv._fair_budgets(False, False, 16, 256, 2**16)
    assert (b2, it2) == (256, 2**16)


def test_driver_dbg_sweep(rng, tmp_path, monkeypatch):
    """Full dbg sweep: both arms, training, sampling sweep, MMD tensors,
    result files — the reference driver's end-to-end flow at smoke scale."""
    monkeypatch.chdir(tmp_path)
    cfg = get_preset("swissroll_dbg")
    from dataclasses import replace

    cfg = replace(
        cfg,
        sweep=replace(cfg.sweep, eval_mmd=True, num_samples=64,
                      iterationss=(8,), num_stepss_backward=(4,),
                      ntrain_maxs=(np.inf,)),
        results_dir=str(tmp_path / "results"),
    )
    logs = []
    driver = ExperimentDriver(cfg, log_fn=logs.append, make_plots=False)
    results = driver.run(jax.random.PRNGKey(0))
    assert results["mmd_sgm"].shape == (1, 1, 1, 1, 1)
    assert results["mmd_sgm"][0, 0, 0, 0, 0] > 0
    assert results["mmd_msgm"][0, 0, 0, 0, 0] > 0
    assert results["mmd_ref"][0, 0, 0, 0, 0] > 0
    # sliced Wasserstein recorded alongside (BASELINE.md: "both metrics")
    assert results["swd_sgm"][0, 0, 0, 0, 0] > 0
    assert results["swd_msgm"][0, 0, 0, 0, 0] > 0
    assert results["swd_ref"][0, 0, 0, 0, 0] > 0
    # final checkpoints + sample trajectories persisted
    files = os.listdir(tmp_path / "results")
    assert any("globalMMDfile_SGM" in f for f in files)
    assert any("globalSWDfile_SGM" in f for f in files)
    # justLoadmmd mode reloads the SWD tensors too
    reloaded = driver.load_mmd_and_plot()
    assert np.allclose(reloaded["swd_msgm"], results["swd_msgm"])
    swiss_files = os.listdir(tmp_path / "results" / "swiss")
    assert any(f.endswith("_traj.npy") for f in swiss_files)
    assert any("MSGM" in f for f in swiss_files)


def test_grf16_production_preset_composes_measured_best_knobs():
    """The production preset bundles every separately-measured winner:
    bf16 compute, EMA 0.999 with warmup, predictor-corrector sampling at
    the full reference budget (round-4 review item 7)."""
    cfg = get_preset("grf16_production")
    assert cfg.train.compute_dtype == "bfloat16"
    assert cfg.train.parameterization == "eps"
    assert cfg.train.ema_rate == 0.999 and cfg.train.ema_warmup
    assert cfg.sweep.sampler == "sde"
    assert cfg.sweep.backward_method == "em"
    assert cfg.sweep.corrector_steps == 1
    assert cfg.sweep.iterationss == (100_000,)
    assert cfg.train.nn_archi == "Unet"
    dit = get_preset("grf16_production_dit")
    assert dit.train.nn_archi == "DiT2D" and dit.train.dit_patch == 4
    assert dit.train.compute_dtype == "bfloat16"
    assert dit.sweep.corrector_steps == 1


def test_grf16_production_dbg_sweep(rng, tmp_path, monkeypatch):
    """The full production bundle (bf16 U-Net + EMA + PC sampler) runs end
    to end through the driver at dbg scale and produces finite MMD."""
    monkeypatch.chdir(tmp_path)
    from dataclasses import replace

    cfg = get_preset("grf16_production_dbg")
    cfg = replace(
        cfg,
        train=replace(cfg.train, base_channels=8, channel_mults=(1, 2),
                      num_res_blocks=1, attention_resolutions=(2,),
                      steps_per_dispatch=1),
        # keep the production 32 EM steps: fewer is linearly UNSTABLE at
        # this config's beta_max=80 (stability needs ½·β_max·dt < 2) — the
        # blow-up filter then drops every sample and MMD is NaN
        sweep=replace(cfg.sweep, eval_mmd=True, num_samples=32,
                      iterationss=(4,), num_stepss_backward=(32,),
                      ntrain_maxs=(np.inf,), batch_sizes=(4,)),
        results_dir=str(tmp_path / "results"),
    )
    driver = ExperimentDriver(cfg, log_fn=lambda *_: None, make_plots=False)
    results = driver.run(jax.random.PRNGKey(0))
    # MSGM samples are norm-projected, so even a 4-iteration net yields
    # bounded samples and a finite MMD — the meaningful pipeline probe.
    # The SGM arm's Langevin corrector steps scale as 1/‖score‖², which
    # legitimately diverges on an untrained (zero-init-head) score net, so
    # its cell may be NaN at dbg scale; assert only that the sweep filled it.
    assert np.isfinite(results["mmd_msgm"][0, 0, 0, 0, 0])
    assert results["mmd_sgm"].shape == (1, 1, 1, 1, 1)
    assert np.isfinite(results["mmd_ref"][0, 0, 0, 0, 0])


def test_make_model_archis():
    from dataclasses import replace

    cfg = get_preset("swissroll")
    assert make_model(cfg, 8, None).__class__.__name__ == "MLP"
    cfg_u = replace(cfg, train=replace(cfg.train, nn_archi="Unet1D"))
    assert make_model(cfg_u, 100, None).__class__.__name__ == "UNet1D"
    cfg_2d = replace(cfg, train=replace(cfg.train, nn_archi="Unet"))
    assert make_model(cfg_2d, 256, None).__class__.__name__ == "VorticityUNet"
    with pytest.raises(ValueError):
        make_model(cfg_2d, 255, None)  # not a square image


def test_lowrank_block_rotation_norm_invariant():
    """Each rotation plane preserves its radius — the analytic latent law
    of the low-rank MSGM (reference LowRankTensorPlot.py)."""
    x1, x2, x3, x4 = simulate_block_rotation(N=2000)
    r12 = np.sqrt(x1**2 + x2**2)
    r34 = np.sqrt(x3**2 + x4**2)
    assert np.allclose(r12, np.sqrt(2.0), atol=1e-6)
    assert np.allclose(r34, np.sqrt(2.0), atol=1e-6)
    # kill_dim34 doubles the first plane's energy instead
    y1, y2, y3, y4 = simulate_block_rotation(N=500, kill_dim34=True)
    assert np.allclose(np.sqrt(y1**2 + y2**2), 2.0, atol=1e-6)
    assert np.allclose(y3, 0.0) and np.allclose(y4, 0.0)


def test_driver_piv_fixture_sweep(rng, tmp_path, monkeypatch):
    """Driver end to end on a file-backed, NORMALIZED dataset (PIV small):
    exercises the get_std/std_norm branch, few_data split, and both arms."""
    import numpy as np
    from dataclasses import replace
    from sdeflow_tpu.data import set_data_root, get_data_root

    monkeypatch.chdir(tmp_path)
    root = tmp_path / "MSGM-data"
    folder = root / "newPIV2"
    os.makedirs(folder)
    rs = np.random.RandomState(0)
    for i in range(80):
        np.save(folder / f"Serie_{i:03d}_vortdiv.npy",
                rs.randn(32).astype(np.float64))
    prev = get_data_root()
    set_data_root(str(root))
    try:
        cfg = get_preset("piv_small_dbg")
        cfg = replace(
            cfg,
            sweep=replace(cfg.sweep, eval_mmd=True, num_samples=32,
                          iterationss=(8,), num_stepss_backward=(4,),
                          ntrain_maxs=(32,)),
            results_dir=str(tmp_path / "results"),
        )
        driver = ExperimentDriver(cfg, log_fn=lambda *_: None,
                                  make_plots=False)
        results = driver.run(jax.random.PRNGKey(0))
        assert results["mmd_sgm"][0, 0, 0, 0, 0] > 0
        assert results["mmd_msgm"][0, 0, 0, 0, 0] > 0
        # SGM arm runs normalized (name ..._norm), MSGM arm unnormalized
        piv_files = os.listdir(tmp_path / "results" / "PIV16loc32pts_norm")
        assert any(f.endswith("_traj.npy") for f in piv_files)
        assert os.path.isdir(tmp_path / "results" / "PIV16loc32pts")
    finally:
        set_data_root(prev)


def _write_lorenz96_fixture(root):
    rs = np.random.RandomState(0)
    np.save(root / "L96_n100_data.npy", rs.randn(300, 100) * 10)
    np.save(root / "L96_n100_data_test.npy", rs.randn(120, 100) * 10)


def _write_eof_fixture(root):
    from scipy.io import netcdf_file

    rs = np.random.RandomState(0)
    with netcdf_file(str(root / "pcs2.nc"), "w") as f:
        f.createDimension("time", 90)
        f.createDimension("mode", 12)
        v = f.createVariable("pseudo_pcs", "f8", ("time", "mode"))
        v[:] = rs.randn(90, 12) * 250000


def _write_ncar_fixture(root):
    folder = root / "isfs_m2hats_qc_geo_hr_202309"
    os.makedirs(folder)
    np.save(folder / "subsample_data.npy",
            np.random.RandomState(0).randn(200, 20) * 3 + 1)


def _write_weather_fixture(root):
    folder = root / "weather-data-2022-12-05-to-2023-02-27"
    os.makedirs(folder)
    rs = np.random.RandomState(0)

    def write_station(name):
        lines = ['"h1"', '"h2"', '"h3"', '"h4"']
        times = (
            ['"2022-12-06 23:55:00"', '"2022-12-07 00:00:00"']
            + ['"2022-12-07 00:%02d:00"' % m for m in range(5, 65, 5)]
            + ['"2023-02-26 23:55:00"']
        )
        for t in times:
            lines.append(
                f"{t},{rs.rand():.2f},{rs.rand() * 10:.3f},{rs.rand() * 360:.2f}"
            )
        (folder / f"{name}.dat").write_text("\n".join(lines) + "\n")

    for i in (14, 15):
        write_station(f"CR300-{i}_Mesures_0{i}")
    for i in range(559, 572):
        write_station(f"CR300-{i}_Mesures_{i}")


@pytest.mark.parametrize(
    "preset,builder",
    [
        ("lorenz96", _write_lorenz96_fixture),
        ("eof_pressure", _write_eof_fixture),
        ("weather_station", _write_weather_fixture),
        ("ncar", _write_ncar_fixture),
    ],
)
def test_driver_datatype_fixture_smoke(preset, builder, tmp_path, monkeypatch):
    """The four remaining reference datatypes (MSGM_higherDim.py:580-587)
    drive end to end through their named presets at smoke scale, each against
    a synthetic fixture in the loader's on-disk format."""
    from dataclasses import replace
    from sdeflow_tpu.data import set_data_root, get_data_root

    monkeypatch.chdir(tmp_path)
    root = tmp_path / "MSGM-data"
    root.mkdir()
    builder(root)
    prev = get_data_root()
    set_data_root(str(root))
    try:
        cfg = get_preset(preset + "_dbg")
        cfg = replace(
            cfg,
            data=replace(cfg.data, dims=(4,)),
            sweep=replace(cfg.sweep, eval_mmd=True, num_samples=16,
                          iterationss=(4,), num_stepss_backward=(4,),
                          ntrain_maxs=(np.inf,), batch_sizes=(2,)),
            results_dir=str(tmp_path / "results"),
        )
        driver = ExperimentDriver(cfg, log_fn=lambda *_: None,
                                  make_plots=False)
        results = driver.run(jax.random.PRNGKey(0))
        assert results["mmd_sgm"][0, 0, 0, 0, 0] > 0
        assert results["mmd_msgm"][0, 0, 0, 0, 0] > 0
    finally:
        set_data_root(prev)


def test_driver_ssm_intT_arm(rng, tmp_path, monkeypatch):
    """ssm_intT mode through the full driver: the MSGM arm trains on the
    gridded-time loss with the fair RAM rule (batch / num_steps_forward)
    and the fused trainer."""
    monkeypatch.chdir(tmp_path)
    from dataclasses import replace

    cfg = get_preset("swissroll_dbg")
    cfg = replace(
        cfg,
        sweep=replace(cfg.sweep, eval_mmd=True, num_samples=32,
                      iterationss=(8,), num_stepss_backward=(4,),
                      ntrain_maxs=(np.inf,), batch_sizes=(20,),
                      ssm_intT_ref=True, msgms=(1,)),
        results_dir=str(tmp_path / "results"),
    )
    logs = []
    driver = ExperimentDriver(cfg, log_fn=logs.append, make_plots=False)
    results = driver.run(jax.random.PRNGKey(0))
    assert results["mmd_msgm"][0, 0, 0, 0, 0] > 0
    # fair RAM rule applied: batch 20 / 10 forward steps = 2
    assert any("batch_size = 2" in l for l in logs)
    assert any("ssm_intT = True" in l for l in logs)


def test_simulation_name_tags_nondefault_method():
    base = simulation_name("results", "swiss/SGM_", 1e-3, 128, True)
    em = simulation_name("results", "swiss/SGM_", 1e-3, 128, True, method="em")
    rk4 = simulation_name("results", "swiss/SGM_", 1e-3, 128, True, method="rk4")
    assert base == rk4  # rk4 names stay byte-identical to the reference's
    assert em == base + "_em"


def test_driver_mesh_dp_tp_sweep(rng, tmp_path, monkeypatch):
    """End-to-end sweep with a (data=4, model=2) mesh: batches sharded over
    "data" (grad psum), MLP params tensor-sharded over "model" — the
    distributed path users reach via `run.py --dp 4 --tp 2`. No reference
    counterpart (single-device torch, MSGM_higherDim.py:438-446)."""
    monkeypatch.chdir(tmp_path)
    cfg = get_preset("swissroll_dbg")
    from dataclasses import replace

    from sdeflow_tpu.parallel import make_mesh

    cfg = replace(
        cfg,
        sweep=replace(cfg.sweep, eval_mmd=True, num_samples=64,
                      iterationss=(8,), num_stepss_backward=(4,),
                      batch_sizes=(8,),  # divisible by the 4-way data axis
                      ntrain_maxs=(np.inf,)),
        results_dir=str(tmp_path / "results"),
    )
    mesh = make_mesh(n_data=4, n_model=2)
    driver = ExperimentDriver(cfg, log_fn=lambda *_: None, make_plots=False,
                              mesh=mesh)
    results = driver.run(jax.random.PRNGKey(0))
    assert results["mmd_sgm"][0, 0, 0, 0, 0] > 0
    assert results["mmd_msgm"][0, 0, 0, 0, 0] > 0


def test_resolve_std_norm_capability_gate():
    """Inherited-get_std loaders without a computed std fall back to ones;
    overriding loaders are called; a genuine bug inside a working get_std
    propagates instead of being swallowed (round-2 review item)."""
    import jax.numpy as jnp

    from sdeflow_tpu.data.filebacked import ArraySampler
    from sdeflow_tpu.experiments.driver import resolve_std_norm

    class NoStd(ArraySampler):  # weather_station-style: never sets .std
        def __init__(self):
            pass

    assert np.allclose(resolve_std_norm(NoStd(), True, 3), np.ones(3))

    class WithStd(ArraySampler):
        def __init__(self):
            self.std = jnp.full((3,), 2.0)

    assert np.allclose(resolve_std_norm(WithStd(), True, 3), 2.0)
    # normalized=False never consults the sampler
    assert np.allclose(resolve_std_norm(WithStd(), False, 3), np.ones(3))

    class Delegating:  # GaussianCauchy-style override, no own .std
        def get_std(self):
            return jnp.full((3,), 5.0)

    assert np.allclose(resolve_std_norm(Delegating(), True, 3), 5.0)

    class BuggyOverride:
        def get_std(self):
            return self.missing_attr  # unrelated internal bug

    with pytest.raises(AttributeError):
        resolve_std_norm(BuggyOverride(), True, 3)

    class BuggyWithStd(ArraySampler):  # has std, but get_std overridden buggy
        def __init__(self):
            self.std = jnp.ones((3,))

        def get_std(self):
            raise AttributeError("internal bug")

    with pytest.raises(AttributeError):
        resolve_std_norm(BuggyWithStd(), True, 3)


def test_run_cli_flag_plumbing(monkeypatch, tmp_path):
    """run.py CLI: --ema-rate / --attention-impl / --print-ram land in the
    config; ring without --tp is rejected before any device work."""
    import sdeflow_tpu.run as R

    captured = {}

    class _FakeDriver:
        def __init__(self, cfg, make_plots=True, mesh=None):
            captured["cfg"] = cfg
            captured["mesh"] = mesh

        def run(self, key, **kw):
            return {}

    monkeypatch.setattr("sdeflow_tpu.experiments.driver.ExperimentDriver",
                        _FakeDriver)
    R.main(["--preset", "swissroll_dbg", "--cpu", "--ema-rate", "0.97",
            "--print-ram", "--no-plots",
            "--results-dir", str(tmp_path / "r")])
    cfg = captured["cfg"]
    assert cfg.train.ema_rate == 0.97
    assert cfg.train.print_ram is True

    R.main(["--preset", "swissroll_dbg", "--cpu", "--eval-nll", "--no-plots",
            "--results-dir", str(tmp_path / "r3")])
    assert captured["cfg"].sweep.eval_nll is True

    with pytest.raises(SystemExit):
        R.main(["--preset", "grf16_dbg", "--cpu", "--attention-impl", "ring",
                "--no-plots", "--results-dir", str(tmp_path / "r2")])


def test_driver_eval_nll(rng, tmp_path, monkeypatch):
    """--eval-nll reports each trained arm's exact PF-ODE NLL (bits/dim)
    and persists nll_bits_per_dim.json — the likelihood eval the reference
    does not have (its NN.py:123-128 only prints the ELBO bound)."""
    import json
    from dataclasses import replace

    monkeypatch.chdir(tmp_path)
    cfg = get_preset("swissroll_dbg")
    cfg = replace(
        cfg,
        sweep=replace(cfg.sweep, eval_nll=True, nll_steps=8, num_samples=32,
                      iterationss=(8,), num_stepss_backward=(4,),
                      ntrain_maxs=(np.inf,)),
        results_dir=str(tmp_path / "results"),
    )
    logs = []
    driver = ExperimentDriver(cfg, log_fn=logs.append, make_plots=False)
    results = driver.run(jax.random.PRNGKey(0))
    nll = results["nll_bits_per_dim"]
    assert len(nll) == 2  # one entry per trained arm (SGM + MSGM)
    for v in nll.values():
        assert np.isfinite(v["mean"]) and v["n"] > 0 and v["steps"] == 8
    assert any("bits/dim" in l for l in logs)
    with open(tmp_path / "results" / "nll_bits_per_dim.json") as f:
        assert json.load(f).keys() == nll.keys()

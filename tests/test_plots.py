"""Plot suite smoke tests: every figure family renders to files without a
display (Agg), with the same call patterns the driver uses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdeflow_tpu.plotting.plots import (
    get_2d_histogram_plot,
    plot_selected_inds,
    pairplots,
    pairplots_single,
    preprocessing,
    postprocessing,
    plot_signal,
    plots_vort,
    plot_survival_simple,
)


@pytest.fixture
def toy(rng):
    k1, k2 = jax.random.split(rng)
    xs = jax.random.normal(k1, (5, 200, 3))  # (steps, B, d) trajectory
    xtest = jax.random.normal(k2, (200, 3))
    return xs, xtest


def test_histogram_image(toy):
    xs, _ = toy
    img = get_2d_histogram_plot(np.asarray(xs[0]), val=3)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.dtype == np.uint8


def test_film_strip(toy, tmp_path, monkeypatch):
    import matplotlib.pyplot as plt

    xs, _ = toy
    fig = plot_selected_inds(xs, [0, 2, 4], include_t0=True, backward=False)
    fig.savefig(tmp_path / "strip.png")
    plt.close("all")
    assert (tmp_path / "strip.png").stat().st_size > 0


def test_pairplots_and_single(toy, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    xs, xtest = toy
    ones = jnp.ones(3)
    pairplots(np.asarray(xs[-1]), xtest, ones, ones, "toy",
              str(tmp_path / "pp"), dimplot=3)
    assert (tmp_path / "pp_multDim.png").exists()
    pairplots_single(xtest, ones, ones, "toy", "single", dimplot=3,
                     results_dir=str(tmp_path / "results"))
    assert (tmp_path / "results" / "single.png").exists()


def test_preprocessing_outputs(toy, tmp_path):
    xs, xtest = toy
    stats = preprocessing(
        xtest, xs, num_steps_forward=4, name_simu_root="toy/run",
        folder_results=str(tmp_path), std_norm=jnp.ones(3),
        std_test_plot=jnp.ones(3), log_fn=lambda *_: None,
    )
    assert "energy_ratio" in stats
    assert (tmp_path / "toy" / "run_cov.png").exists()
    assert (tmp_path / "toy" / "run_Forward.png").exists()


def test_postprocessing_full(toy, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    xs, xtest = toy
    out = postprocessing(
        [0, 2, 4], xs, xtest, jnp.ones(3), jnp.ones(3), "toy",
        str(tmp_path / "sim"), dimplot=3,
        mmd_inputs=(xtest, 100), log_fn=lambda *_: None,
    )
    assert out["mmd"] is not None and out["mmd_ref"] is not None
    assert out["nan_count"] == 0
    assert (tmp_path / "sim.npy").exists()
    assert (tmp_path / "sim_survival.png").exists()
    assert (tmp_path / "sim_multDim.png").exists()


def test_plot_signal_timeseries(tmp_path):
    xs = np.random.RandomState(0).randn(3, 4, 100)  # d=100 -> time series
    plot_signal(xs, [0, 2], str(tmp_path / "sig"), time_to_duplicate=None)
    written = list(tmp_path.glob("sig_timeserieAtt*_.png"))
    assert len(written) == 2  # one per selected step index


def test_plots_vort_figure():
    import matplotlib.pyplot as plt

    fig = plots_vort(np.random.RandomState(0).randn(16, 16))
    assert fig is not None
    plt.close("all")


def test_survival_plot_file(toy, tmp_path):
    xs, xtest = toy
    surv = plot_survival_simple(x=np.asarray(xs[-1]), x_ref=np.asarray(xtest),
                                prefix_save=str(tmp_path / "s"))
    assert (tmp_path / "s_survival.png").exists()
    assert surv["generated"]["N"] == 200

"""Data samplers: synthetic distributions + file-backed loaders against
synthetic fixture files (the real ../MSGM-data/ is not bundled, matching
the reference's environment; reference: data.py:17)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdeflow_tpu.data import (
    SwissRoll,
    Gaussian,
    Cauchy,
    GaussianCauchy,
    ERA5,
    PIV,
    Lorenz63,
    Lorenz96,
    PODmodes,
    set_data_root,
    get_data_root,
)


@pytest.fixture
def data_root(tmp_path, monkeypatch):
    root = tmp_path / "MSGM-data"
    root.mkdir()
    prev = get_data_root()
    set_data_root(str(root))
    yield root
    set_data_root(prev)


# -- synthetic ---------------------------------------------------------------


def test_swissroll_statistics(rng):
    x = SwissRoll().sample(rng, 20_000)
    assert x.shape == (20_000, 2)
    r = np.linalg.norm(np.asarray(x), axis=1)
    # the roll lives in an annulus of radius ~[0.9, 3] after /5
    assert 0.3 < np.median(r) < 3.0
    assert float(jnp.abs(x).max()) < 5.0


def test_gaussian_covariance(rng):
    g = Gaussian(rng, dim=3, correlation=True)
    x = np.asarray(g.sample(jax.random.fold_in(rng, 1), 100_000))
    emp = np.cov(x.T)
    A = np.asarray(g.A)
    assert np.allclose(emp, A @ A.T, atol=0.15 * np.abs(A @ A.T).max() + 0.05)
    assert np.allclose(np.asarray(g.get_std()), np.sqrt(np.diag(A @ A.T)))


def test_cauchy_heavy_tails(rng):
    c = Cauchy(rng, dim=2)
    x = np.asarray(c.sample(jax.random.fold_in(rng, 1), 100_000))
    # scale 1/50: median |x| small, extreme quantiles huge relative to it
    med = np.median(np.abs(x))
    assert med < 0.1
    assert np.abs(x).max() > 50 * med


def test_gaussian_cauchy_shared_scalar(rng):
    gc = GaussianCauchy(rng, dim=2)
    x = np.asarray(gc.sample(jax.random.fold_in(rng, 1), 10_000))
    # one shared Cauchy scalar per batch: different keys give different
    # overall batch scales
    y = np.asarray(gc.sample(jax.random.fold_in(rng, 2), 10_000))
    assert not np.isclose(np.abs(x).std(), np.abs(y).std(), rtol=1e-3)


# -- file-backed -------------------------------------------------------------


def test_missing_file_error_names_path(data_root):
    with pytest.raises(FileNotFoundError, match="SDEFLOW_DATA_ROOT"):
        Lorenz63(dim=4)


def test_lorenz63_loader(data_root, rng):
    os.makedirs(data_root / "L63")
    np.save(data_root / "L63" / "L63_data_X.npy",
            np.random.RandomState(0).randn(16, 900).astype(np.float64) * 10)
    s = Lorenz63(dim=8)
    assert s.dim == 8
    x = s.sample(rng, 32)
    assert x.shape == (32, 8)
    # /10 scaling + centering applied
    assert abs(float(jnp.mean(s.npdata))) < 0.2


def test_lorenz96_loader(data_root, rng):
    np.save(data_root / "L96_n40_data.npy",
            np.random.RandomState(0).randn(500, 40) * 10)
    np.save(data_root / "L96_n40_data_test.npy",
            np.random.RandomState(1).randn(200, 40) * 10)
    s = Lorenz96(n_dim_l96=40, dim=8)
    assert s.sample(rng, 16).shape == (16, 8)
    assert s.sampletest(rng, 16).shape == (16, 8)


def test_pod_loader_mixed_times(data_root, rng):
    for re_val in (300,):
        base = data_root / "tempPODModes" / f"LES_Re{re_val}"
        os.makedirs(base / "temporalModes_16modes")
        os.makedirs(base / "temporalModes_16modes_test")
        np.save(base / "temporalModes_16modes" / "U.npy",
                np.random.RandomState(0).randn(300, 16))
        np.save(base / "temporalModes_16modes_test" / "U.npy",
                np.random.RandomState(1).randn(100, 16))
    s = PODmodes(Re=300, dim=8, mixed_times=True)
    assert "mix" in s.name
    assert s.sample(rng, 8).shape == (8, 8)
    assert s.max_nsamples + s.max_nsamplestest <= 400


def test_piv_small_loader(data_root, rng):
    folder = data_root / "newPIV2"
    os.makedirs(folder)
    rs = np.random.RandomState(0)
    for i in range(60):
        np.save(folder / f"Serie_{i:03d}_vortdiv.npy", rs.randn(32).astype(np.float64))
    s = PIV(dim=4, localized=True)
    assert s.sample(rng, 8).shape == (8, 4)
    assert "loc" in s.name


def test_piv_large_image_loader(data_root, rng):
    folder = data_root / "largerImage"
    os.makedirs(folder)
    rs = np.random.RandomState(0)
    for i in range(30):
        np.save(folder / f"Serie_{i:03d}_vortdiv.npy",
                rs.randn(2 * 64 * 64).astype(np.float64))
    s = PIV(dim=16 * 16, large_image=True, smoothing=2)
    assert s.sample(rng, 4).shape == (4, 256)
    assert "superSmooth" in s.name


def test_era5_loader_deseason_winter(data_root, rng):
    folder = data_root / "ERA5-cities"
    os.makedirs(folder)
    rs = np.random.RandomState(0)
    T = 6 * 365 * 4 // 4  # ~1.5 years of 6-hourly steps
    cities = ["Paris", "Berlin"]
    for city in cities:
        arr = rs.randn(T) * 7 + 280
        np.save(folder / f"{city}_2m_temperature_2010_2020.npy", arr)
        vort = rs.randn(T) * 3e-5
        vort[5] = np.nan  # exercise the NaN time mask
        np.save(folder / f"{city}_vorticity_2010_2020.npy", vort)
    s = ERA5(dim=4, variables=("2m_temperature", "vorticity"), cities=cities,
             season="winter", use_deseason=True)
    assert "deseason" in s.name and "DJF" in s.name
    x = s.sample(rng, 16)
    assert x.shape == (16, 4)
    # NaN time dropped and columns centered (pre-winter-filter centering)
    assert bool(jnp.isfinite(x).all())


def test_ncar_loader(data_root, rng):
    folder = data_root / "isfs_m2hats_qc_geo_hr_202309"
    os.makedirs(folder)
    np.save(folder / "subsample_data.npy",
            np.random.RandomState(0).randn(400, 100) * 3 + 1)
    from sdeflow_tpu.data import NCARWeatherStation

    s = NCARWeatherStation(dim=10)
    x = s.sample(rng, 8)
    assert x.shape == (8, 10)
    # standardized columns
    assert abs(float(jnp.mean(s.npdata))) < 0.2
    assert abs(float(jnp.std(s.npdata)) - 1.0) < 0.2


def test_weather_station_loader(data_root, rng):
    """CR300 .dat parsing: header skip, NAN handling, timestamp windowing,
    polar->cartesian wind conversion, cross-station timestamp intersection
    (reference: data.py:421-500)."""
    folder = data_root / "weather-data-2022-12-05-to-2023-02-27"
    os.makedirs(folder)
    rs = np.random.RandomState(0)

    def write_station(name, n_extra):
        lines = ['"h1"', '"h2"', '"h3"', '"h4"']  # 4 metadata lines
        times = ['"2022-12-06 23:55:00"', '"2022-12-07 00:00:00"',
                 '"2022-12-07 00:05:00"', '"2023-02-26 23:55:00"']
        times = times[:2] + ['"2022-12-07 00:0%d:00"' % i for i in range(1, 3 + n_extra)] + times[3:]
        for t in times:
            rec = rs.rand()  # record number column
            speed = rs.rand() * 10
            direction = rs.rand() * 360
            lines.append(f"{t},{rec:.2f},{speed:.3f},{direction:.2f}")
        (folder / f"{name}.dat").write_text("\n".join(lines) + "\n")

    for i in (14, 15):
        write_station(f"CR300-{i}_Mesures_0{i}", n_extra=0)
    for i in range(559, 572):
        write_station(f"CR300-{i}_Mesures_{i}", n_extra=0)

    from sdeflow_tpu.data import WeatherStation

    s = WeatherStation(dim=8)
    x = s.sample(rng, 4)
    assert x.shape == (4, 8)
    assert bool(jnp.isfinite(x).all())


def test_eof_pressure_loader_netcdf3(data_root, rng):
    """EOFPressure reads NetCDF via netCDF4 when installed, else scipy's
    NetCDF3 reader — exercised here with a scipy-written pcs2.nc fixture."""
    from scipy.io import netcdf_file

    from sdeflow_tpu.data import EOFPressure

    rs = np.random.RandomState(0)
    with netcdf_file(str(data_root / "pcs2.nc"), "w") as f:
        f.createDimension("time", 90)
        f.createDimension("mode", 12)
        v = f.createVariable("pseudo_pcs", "f8", ("time", "mode"))
        v[:] = rs.randn(90, 12) * 250000
    s = EOFPressure(dim=4)
    x = s.sample(rng, 8)
    assert x.shape == (8, 4)
    # /250000 rescale applied
    assert float(jnp.abs(s.npdata).max()) < 50.0


def test_smoothed_grf_statistics(rng):
    """SmoothedGRF: unit pixel variance, strong short-range correlation that
    decays with distance, and the numpy twin (used to feed the torch
    reference in the image parity study) matches the analytic covariance."""
    from sdeflow_tpu.data import SmoothedGRF, grf_spectral_filter

    s = SmoothedGRF(npixel=16, ell=2.0)
    x = s.sample(rng, 4096)
    assert x.shape == (4096, 256)
    assert abs(float(x.std()) - 1.0) < 0.05
    assert abs(float(x.mean())) < 0.05

    # analytic covariance: Cov(x_0, x_r) = irfft2(filt^2)/norm^2
    filt, norm = grf_spectral_filter(16, 2.0)
    cov_map = np.fft.irfft2(filt**2, s=(16, 16)) / norm**2
    # flat index 0 is pixel (0,0); F-order flat index r is pixel (r, 0) for
    # r < 16 (column-major: fastest index runs down a column)
    emp = np.asarray(x.T @ x[:, :1]).ravel() / x.shape[0]
    for r in (1, 2, 4, 8):
        assert abs(emp[r] - cov_map[r, 0]) < 0.08, (r, emp[r], cov_map[r, 0])
    assert cov_map[1, 0] > 0.5  # smoothing correlates neighbours
    assert cov_map[8, 0] < cov_map[2, 0]  # ...and decays with distance

    # test stream differs from train stream
    xt = s.sampletest(rng, 4)
    assert not np.allclose(np.asarray(xt), np.asarray(s.sample(rng, 4)))

"""File-backed dataset samplers (geophysical / fluid / chaotic workloads).

TPU-native counterparts of the reference's file-backed samplers
(reference: data.py:19-700). All classes share the `ArraySampler` base:
arrays are loaded/preprocessed once on host (numpy/pandas), moved to device
as a single constant, and batches are drawn with `jax.random.randint`
index gathers — so `.sample` can be called inside jitted programs.

The data root (the reference's hardcoded '../MSGM-data/', data.py:17) is a
module-level flag: `set_data_root(path)` or the SDEFLOW_DATA_ROOT env var.
Missing files raise a clear FileNotFoundError naming the expected path.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

_DATA_ROOT = os.environ.get("SDEFLOW_DATA_ROOT", "../MSGM-data/")


def set_data_root(path):
    global _DATA_ROOT
    _DATA_ROOT = str(path)


def get_data_root():
    return _DATA_ROOT


def _require(path):
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Dataset file not found: {path}. Set the data root with "
            "sdeflow_tpu.data.set_data_root(...) or SDEFLOW_DATA_ROOT "
            "(reference expects '../MSGM-data/', data.py:17)."
        )
    return path


class ArraySampler:
    """Uniform random-index resampling from in-memory arrays, float32
    (the reference's .sample pattern, data.py:197-203)."""

    def __init__(self, npdata, npdatatest, dim, name):
        self.npdata = jnp.asarray(np.asarray(npdata, np.float32))
        self.npdatatest = jnp.asarray(np.asarray(npdatatest, np.float32))
        self.dim = dim
        self.name = name
        self.max_nsamples = int(self.npdata.shape[0])
        self.max_nsamplestest = int(self.npdatatest.shape[0])

    def sample(self, key, n):
        idx = jax.random.randint(key, (n,), 0, self.npdata.shape[0])
        return self.npdata[idx]

    def sampletest(self, key, n):
        idx = jax.random.randint(key, (n,), 0, self.npdatatest.shape[0])
        return self.npdatatest[idx]

    def _set_std(self, npdata, normalized):
        self.std = jnp.asarray(np.asarray(npdata, np.float32).std(axis=0))
        return self.std

    def get_std(self):
        return self.std


def _split_train_test(npdata, few_data=False, ntrain_max=np.inf):
    """Sequential 2:1 train/test split (reference: data.py:359-366)."""
    if few_data:
        n_train = int(min(2 * npdata.shape[0] // 3, ntrain_max))
        n_test = npdata.shape[0] - n_train
    else:
        n_test = npdata.shape[0] // 3
    return npdata[:-n_test], npdata[-n_test:-1]


def _mixed_split(npdata, n_test, seed=0):
    """Random train/test split (the reference uses python random.sample,
    data.py:185-189; we use a seeded numpy permutation)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(npdata.shape[0])
    return npdata[perm[n_test:]], npdata[perm[:n_test]]


class ERA5(ArraySampler):
    """ERA5 cities×variables 6-hourly series 2010–2020
    (reference: data.py:19-247): per-variable scaling, NaN-in-vorticity time
    masking, Fortran-order (T, V·C) packing, optional deseasonalization
    (day-of-year + hour-of-day means), optional winter (DJF) filter,
    column centering, 2:1 sequential or mixed split."""

    VAR_SCALES = {
        "vorticity": 0.00003,
        "10m_u_component_of_wind": 3.0,
        "10m_v_component_of_wind": 3.0,
        "2m_temperature": 7.0,
    }
    DEFAULT_CITIES = [
        "Paris", "Warsaw", "Berlin", "Vienna", "Amsterdam",
        "Stockholm", "Athens", "London", "Madrid", "Rome",
    ]
    DEFAULT_VARIABLES = [
        "10m_u_component_of_wind", "10m_v_component_of_wind",
        "2m_temperature", "vorticity",
    ]

    def __init__(
        self,
        dim=40,
        variables: Optional[Sequence[str]] = None,
        cities: Optional[Sequence[str]] = None,
        season="all",
        start_date="2010-01-01T00",
        use_deseason=False,
        mixed_times=False,
    ):
        variables = list(variables or self.DEFAULT_VARIABLES)
        cities = list(cities or self.DEFAULT_CITIES)
        dim = min(dim, len(variables) * len(cities))
        name = "ERA5"
        if len(variables) < 4:
            name += f"{len(variables)}vars"
        if len(cities) < 10:
            name += f"{len(cities)}cities"
        name += str(dim)
        if use_deseason:
            name += "_deseason"
        if season == "winter":
            name += "_DJF"
        if mixed_times:
            name += "mix"

        folder = os.path.join(get_data_root(), "ERA5-cities")
        series = {}
        for city in cities:
            for var in variables:
                path = _require(
                    os.path.join(folder, f"{city}_{var}_2010_2020.npy")
                )
                arr = np.load(path)
                if var == "vorticity" and arr.ndim == 2 and arr.shape[1] > 1:
                    arr = arr[:, 0]
                arr = arr / self.VAR_SCALES.get(var, 1.0)
                series[(city, var)] = arr.astype(np.float64, copy=False)

        T_len = series[(cities[0], variables[0])].shape[0]
        t0 = np.datetime64(start_date)
        times = np.arange(
            t0, t0 + np.timedelta64(T_len * 6, "h"), np.timedelta64(6, "h")
        )

        # mask times with NaN vorticity in any city (reference data.py:85-98)
        valid = np.ones(T_len, dtype=bool)
        if "vorticity" in variables:
            for city in cities:
                valid &= ~np.isnan(series[(city, "vorticity")])
        for k in series:
            series[k] = series[k][valid]
        times = times[valid]
        T_len = int(valid.sum())

        # pack (C, V, T) -> (T, V, C) -> Fortran-order (T, V·C)
        data_array = np.zeros((len(cities), len(variables), T_len))
        for i, city in enumerate(cities):
            for j, var in enumerate(variables):
                data_array[i, j] = series[(city, var)]
        X = np.reshape(
            np.transpose(data_array, (2, 1, 0)),
            (T_len, len(variables) * len(cities)),
            order="F",
        )

        if use_deseason:
            X = self.deseasonalize(X, times)

        if season == "winter":
            months = (times.astype("datetime64[M]").astype(int) % 12) + 1
            djf = (months == 12) | (months == 1) | (months == 2)
            X, times = X[djf], times[djf]

        X = X - X.mean(axis=0)
        X = X[:, :dim]
        n_test = X.shape[0] // 3
        if mixed_times:
            train, test = _mixed_split(X, n_test)
        else:
            train, test = X[:-n_test], X[-n_test:-1]
        super().__init__(train, test, dim, name)

    @staticmethod
    def deseasonalize(X, times):
        """Remove annual (day-of-year mean) then diurnal (hour-of-day mean)
        cycles (reference: data.py:205-225)."""
        import pandas as pd

        ts = pd.to_datetime(times)
        df = pd.DataFrame(index=ts, data=X)
        doy = ts.dayofyear
        X_ann = df.values - df.groupby(doy).mean().reindex(doy).values
        df_ann = pd.DataFrame(index=ts, data=X_ann)
        hours = ts.hour
        return X_ann - df_ann.groupby(hours).mean().reindex(hours).values


class PIV(ArraySampler):
    """PIV vorticity/divergence fields (reference: data.py:249-385):
    flat 4×4 mode or largeImage 64×64 → Gaussian smooth → subsample to
    npixel², Fortran-order flatten, /2.5 scaling, centering."""

    def __init__(
        self,
        dim=2,
        normalized=False,
        localized=False,
        large_image=False,
        smoothing=0,
        few_data=False,
        ntrain_max=np.inf,
    ):
        name = f"PIV{dim}"
        if large_image:
            name += "largeIm"
            if smoothing == 1:
                name += "smooth"
            elif smoothing == 2:
                name += "superSmooth"
            localized = True
            npixelx = int(np.sqrt(dim))
        elif localized:
            name += "loc"
        if few_data:
            name += f"{ntrain_max}pts"
        if normalized:
            name += "_norm"

        sub = "largerImage" if large_image else (
            "newPIV2" if localized else "newPIV"
        )
        folder = Path(os.path.join(get_data_root(), sub))
        _require(str(folder))

        npixelx_max = 64 if large_image else 4
        dmax = 2 * npixelx_max**2
        cols = []
        for file in sorted(folder.glob("Serie_*_vortdiv.npy")):
            cols.append(np.load(file).reshape(-1, 1))
        if not cols:
            raise FileNotFoundError(f"no Serie_*_vortdiv.npy files in {folder}")
        npdata = np.concatenate(cols, axis=1).T / 2.5
        assert npdata.shape[1] == dmax, (npdata.shape, dmax)
        npdata = npdata - npdata.mean(axis=0)

        if large_image:
            if dim != npixelx**2:
                raise ValueError(f"Incorrect dim to subsample: {dim}")
            npdata = npdata.reshape(
                (npdata.shape[0], npixelx_max, npixelx_max, 2), order="F"
            )
            npdata = npdata[:, :, :, 0]  # keep vorticity only
            if smoothing > 0:
                from scipy.ndimage import gaussian_filter

                if smoothing == 1:
                    sigmax = npdata.shape[1] // (3 * npixelx)
                else:
                    sigmax = npdata.shape[1] // npixelx
                    npdata = npdata * 4
                npdata = np.stack(
                    [gaussian_filter(img, sigma=sigmax) for img in npdata]
                )
            ix = np.linspace(0, npdata.shape[1] - 1, npixelx, dtype=int)
            iy = np.linspace(0, npdata.shape[2] - 1, npixelx, dtype=int)
            npdata = npdata[:, ix][:, :, iy]
            npdata = npdata.reshape((npdata.shape[0], dim), order="F")
        else:
            npdata = npdata[:, :dim]

        train, test = _split_train_test(npdata, few_data, ntrain_max)
        super().__init__(train, test, dim, name)
        self._set_std(npdata, normalized)
        if normalized:
            std = np.asarray(self.std)
            self.npdata = self.npdata / std
            self.npdatatest = self.npdatatest / std


class Lorenz63(ArraySampler):
    """Delay-embedded Lorenz-63 X coordinate (reference: data.py:533-581)."""

    def __init__(self, dim=1000, normalized=False, few_data=False,
                 ntrain_max=np.inf):
        name = f"L63_{dim}"
        if normalized:
            name += "_norm"
        path = _require(os.path.join(get_data_root(), "L63", "L63_data_X.npy"))
        npdata = np.load(path) / 10.0
        npdata = npdata.T
        if dim < npdata.shape[1]:
            times = range(0, npdata.shape[1] - 1, npdata.shape[1] // dim)
            npdata = npdata[:, times]
        npdata = npdata[:, :dim]
        npdata = npdata - npdata.mean(axis=0)
        train, test = _split_train_test(npdata, few_data, ntrain_max)
        super().__init__(train, test, dim, name)
        self._set_std(npdata, normalized)
        if normalized:
            std = np.asarray(self.std)
            self.npdata = self.npdata / std
            self.npdatatest = self.npdatatest / std


class Lorenz96(ArraySampler):
    """Lorenz-96 snapshots (reference: data.py:583-616)."""

    def __init__(self, n_dim_l96=100, dim=8, normalized=False):
        name = f"L96_n{n_dim_l96}{dim}"
        base = os.path.join(get_data_root(), f"L96_n{n_dim_l96}_data")
        npdata = np.load(_require(base + ".npy")) / 10.0
        npdatatest = np.load(_require(base + "_test.npy")) / 10.0
        if normalized:
            std = npdata.std(axis=0)
            npdata, npdatatest = npdata / std, npdatatest / std
        super().__init__(npdata[:, :dim], npdatatest[:, :dim], dim, name)
        self._set_std(npdata[:, :dim], normalized)


class PODmodes(ArraySampler):
    """LES temporal POD modes at Reynolds 300/3900, optional Re
    concatenation and mixed split (reference: data.py:618-700)."""

    def __init__(self, Re=300, dim=8, normalized=False, mixed_times=False,
                 concatenate_re=False, few_data=False, ntrain_max=np.inf):
        if concatenate_re:
            re_name = "300-3900"
        else:
            re_name = str(Re)
        name = f"POD{re_name}{dim}"
        if few_data:
            mixed_times = True
            name += f"{ntrain_max}pts"
        if mixed_times:
            name += "mix"
        if normalized:
            name += "_norm"

        def load_pod(re_val):
            base = os.path.join(
                get_data_root(), "tempPODModes", f"LES_Re{re_val}",
                "temporalModes_16modes",
            )
            return (
                np.load(_require(os.path.join(base, "U.npy"))),
                np.load(_require(base + "_test/U.npy")),
            )

        if concatenate_re:
            d1, t1 = load_pod(300)
            d2, t2 = load_pod(3900)
            npdata = np.concatenate((d1, (3900 / 300) * d2), axis=0)
            npdatatest = np.concatenate((t1, (3900 / 300) * t2), axis=0)
        else:
            npdata, npdatatest = load_pod(int(Re))

        if mixed_times:
            alldata = np.concatenate((npdata, npdatatest), axis=0)
            if few_data:
                n_train = int(min(2 * alldata.shape[0] // 3, ntrain_max))
                n_test = alldata.shape[0] - n_train
            else:
                n_test = alldata.shape[0] // 3
            npdata, npdatatest = _mixed_split(alldata, n_test)

        npdata, npdatatest = npdata / 10.0, npdatatest / 10.0
        npdata, npdatatest = npdata[:, :dim], npdatatest[:, :dim]
        super().__init__(npdata, npdatatest, dim, name)
        self.mean = jnp.asarray(npdata.mean(axis=0).astype(np.float32))
        self._set_std(npdata, normalized)
        if normalized:
            std = np.asarray(self.std)
            self.npdata = self.npdata / std
            self.npdatatest = self.npdatatest / std


class NCARWeatherStation(ArraySampler):
    """NCAR M2HATS station subsample (reference: data.py:388-418)."""

    def __init__(self, dim=90):
        path = _require(
            os.path.join(
                get_data_root(), "isfs_m2hats_qc_geo_hr_202309",
                "subsample_data.npy",
            )
        )
        npdata = np.load(path)
        npdata = (npdata - npdata.mean(axis=0)) / npdata.std(axis=0)
        npdata = npdata[:-1, :dim]
        n_test = npdata.shape[0] // 3
        super().__init__(
            npdata[:-n_test], npdata[-n_test:-1], dim, f"ncar_weather{dim}"
        )


class WeatherStation(ArraySampler):
    """Campbell CR300 station logs: .dat parsing, timestamp intersection,
    polar→cartesian wind (reference: data.py:421-500)."""

    def __init__(self, dim=30):
        folder = os.path.join(
            get_data_root(), "weather-data-2022-12-05-to-2023-02-27"
        )
        _require(folder)
        file_names = [f"CR300-{i}_Mesures_0{i}" for i in range(14, 16)] + [
            f"CR300-{i}_Mesures_{i}" for i in range(559, 572)
        ]
        begin_time, last_time = '"2022-12-07 00:00:00"', '"2023-02-26 23:55:00"'
        npdata_all, timestamps_keep = None, None
        for file in file_names:
            path = _require(os.path.join(folder, file + ".dat"))
            data = np.genfromtxt(
                path, delimiter=",", skip_header=4, dtype=None,
                encoding="utf-8", missing_values='"NAN"', filling_values=np.nan,
            )
            timestamps = data["f0"]
            vals = np.array([list(row)[1:] for row in data], dtype=float)
            b = np.where(timestamps == begin_time)[0][0]
            e = np.where(timestamps == last_time)[0][0]
            timestamps, vals = timestamps[b : e + 1], vals[b : e + 1, 1:3]
            v0 = vals.copy()
            vals[:, 0] = v0[:, 0] * np.cos((np.pi / 180.0) * v0[:, 1])
            vals[:, 1] = v0[:, 0] * np.sin((np.pi / 180.0) * v0[:, 1])
            if npdata_all is None:
                timestamps_keep, npdata_all = timestamps, vals.copy()
            else:
                prev = timestamps_keep
                timestamps_keep = np.intersect1d(timestamps_keep, timestamps)
                i1 = np.where(np.isin(timestamps, timestamps_keep))[0]
                i2 = np.where(np.isin(prev, timestamps_keep))[0]
                npdata_all = np.concatenate(
                    (npdata_all[i2], vals[i1].copy()), axis=1
                )
        npdata = (npdata_all - npdata_all.mean(axis=0)) / npdata_all.std(axis=0)
        npdata = npdata[:-1, :dim]
        n_test = npdata.shape[0] // 3
        super().__init__(
            npdata[:-n_test], npdata[-n_test:-1], dim, f"weather{dim}"
        )


def _read_netcdf_var(path, varname):
    """Read one variable from a netCDF file: netCDF4 when installed (handles
    NetCDF4/HDF5), otherwise scipy's netcdf_file (NetCDF3 classic). Raises
    ImportError naming both options only when neither reader can open it."""
    try:
        from netCDF4 import Dataset
    except ImportError:
        Dataset = None
    if Dataset is not None:
        return np.array(Dataset(path, "r").variables[varname][:])
    try:
        from scipy.io import netcdf_file
    except ImportError as e:
        raise ImportError(
            "reading netCDF requires the optional netCDF4 package (any "
            "format) or scipy (NetCDF3 classic)"
        ) from e
    with netcdf_file(path, "r", mmap=False) as ds:
        return np.array(ds.variables[varname][:])


class EOFPressure(ArraySampler):
    """North-Atlantic pressure pseudo-PCs from netCDF
    (reference: data.py:502-531)."""

    def __init__(self, dim=8):
        path = _require(os.path.join(get_data_root(), "pcs2.nc"))
        npdata = _read_netcdf_var(path, "pseudo_pcs")
        npdata = npdata[:-1, :dim] / 250000
        n_test = npdata.shape[0] // 3
        super().__init__(
            npdata[:-n_test], npdata[-n_test:-1], dim, f"eof_pressure_NA{dim}"
        )

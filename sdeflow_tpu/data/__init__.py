from sdeflow_tpu.data.synthetic import SwissRoll, Gaussian, Cauchy, GaussianCauchy
from sdeflow_tpu.data.filebacked import (
    ArraySampler,
    ERA5,
    PIV,
    Lorenz63,
    Lorenz96,
    PODmodes,
    NCARWeatherStation,
    WeatherStation,
    EOFPressure,
    set_data_root,
    get_data_root,
)

__all__ = [
    "SwissRoll",
    "Gaussian",
    "Cauchy",
    "GaussianCauchy",
    "ArraySampler",
    "ERA5",
    "PIV",
    "Lorenz63",
    "Lorenz96",
    "PODmodes",
    "NCARWeatherStation",
    "WeatherStation",
    "EOFPressure",
    "set_data_root",
    "get_data_root",
]

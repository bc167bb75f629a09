from sdeflow_tpu.ops.integrators import (
    euler_maruyama_sampler,
    heun_sampler,
    rk4_stratonovich_sampler,
    integrate_sde,
    integrate_select,
)
from sdeflow_tpu.ops.gapply import (
    make_dense_G,
    dense_ito_tensor,
    dense_sigma_apply,
    circulant_sigma_apply,
    circulant_ijk,
    CIRCULANT_COEF,
)
from sdeflow_tpu.ops.hutchinson import (
    sample_rademacher,
    sample_gaussian,
    randu_on_sphere,
    sample_v,
    hutchinson_div,
)
from sdeflow_tpu.ops.kde import gaussian_kde_logpdf, gaussian_kde_sample
from sdeflow_tpu.ops.ode import (encode_ode, integrate_ode,
                                 probability_flow_sampler)
from sdeflow_tpu.ops.expint import integrate_dpm

__all__ = [
    "euler_maruyama_sampler",
    "heun_sampler",
    "rk4_stratonovich_sampler",
    "integrate_sde",
    "integrate_select",
    "make_dense_G",
    "dense_ito_tensor",
    "dense_sigma_apply",
    "circulant_sigma_apply",
    "circulant_ijk",
    "CIRCULANT_COEF",
    "sample_rademacher",
    "sample_gaussian",
    "randu_on_sphere",
    "sample_v",
    "hutchinson_div",
    "gaussian_kde_logpdf",
    "gaussian_kde_sample",
    "encode_ode",
    "integrate_ode",
    "probability_flow_sampler",
    "integrate_dpm",
]

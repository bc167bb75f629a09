"""Runtime numerical diagnostics promoted from the reference's print-based
checks (reference: own_plotting.py:333-422, 507-515).

All statistics are computed on device in one jitted pass; only the scalar
summary leaves the accelerator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def forward_convergence_stats(x_test, x_forward):
    """Forward-SDE convergence metrics (reference: own_plotting.py:339-394):

    - distance of cov(x_test) and cov(x_forward) to the isotropic stationary
      law var̄·I (tr(cov) = E‖X‖² is conserved for MSGM),
    - distance of cov(x_forward) to a weak-white-noise law with its own
      variance,
    - energy conservation ratio E‖x_fwd‖²/E‖x_test‖².
    Returns a dict of scalars.
    """

    def cov(a):
        a = a - a.mean(axis=0, keepdims=True)
        return (a.T @ a) / (a.shape[0] - 1)

    d = x_test.shape[1]
    cov_test = cov(x_test)
    cov_fwd = cov(x_forward)
    var_test_mean = jnp.var(x_test, axis=0).mean()
    var_fwd_mean = jnp.var(x_forward, axis=0).mean()
    eye = jnp.eye(d, dtype=x_test.dtype)

    def dist_to(c, target):
        return jnp.linalg.norm(c - target) / jnp.sqrt(d * jnp.trace(target**2))

    converged = var_test_mean * eye
    wwn = var_fwd_mean * eye
    energy_test = jnp.sum(x_test**2, axis=1).mean()
    energy_fwd = jnp.sum(x_forward**2, axis=1).mean()
    return dict(
        d_cov_test_to_converged=dist_to(cov_test, converged),
        d_cov_forward_to_converged=dist_to(cov_fwd, converged),
        d_cov_forward_to_wwn=dist_to(cov_fwd, wwn),
        energy_test=energy_test,
        energy_forward=energy_fwd,
        energy_ratio=energy_fwd / energy_test,
    )


def filter_blowups(x, threshold=1e3):
    """Drop rows with NaNs or |x| > threshold before metrics
    (reference: own_plotting.py:507-515). Host-side (data-dependent shape);
    returns (filtered array, number of dropped rows)."""
    import numpy as np

    x = np.asarray(x)
    bad = (~np.isfinite(x)).any(axis=1) | (np.abs(x) > threshold).any(axis=1)
    return x[~bad], int(bad.sum())

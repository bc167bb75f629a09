"""Empirical survival curves S(R) = P(‖x‖ > R) and log-log tail fits.

Rewrite of the reference's survival analysis (reference:
own_plotting.py:605-860): same log-spaced shared R grid, same empirical
survival via sorted-norm search, same OLS tail-exponent fit on
(log R, log S) with tail selection by top-k order statistics. Norm
computation is on device; the small fitting problem runs in numpy on host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp


def _norms(x, std_norm=None):
    x = jnp.asarray(x)
    if std_norm is not None:
        x = x * jnp.asarray(std_norm, x.dtype)
    return np.asarray(jnp.linalg.norm(x, axis=1))


def common_r_grid(norms_list, n_points=200):
    """Shared log-spaced grid (reference: own_plotting.py:605-621)."""
    mins, maxs = [], []
    for arr in norms_list:
        if arr is None or len(arr) == 0:
            continue
        pos = arr[arr > 0]
        if pos.size > 0:
            mins.append(pos.min())
        maxs.append(arr.max())
    if not maxs:
        raise ValueError("No data provided to build R grid.")
    min_pos = min(mins) if mins else 1e-12
    upper = max(maxs) if max(maxs) > min_pos else min_pos * 10.0
    return np.logspace(np.log10(min_pos * 0.9), np.log10(upper), num=n_points)


def survival_curve(norms, r_grid):
    """Empirical S(R) on the grid (reference: own_plotting.py:624-629)."""
    norms_sorted = np.sort(norms)
    idx = np.searchsorted(norms_sorted, r_grid, side="right")
    counts = norms.size - idx
    s = counts.astype(float) / float(norms.size) if norms.size else np.zeros_like(r_grid)
    return s, counts


def tail_fit_loglog(r_grid, s_vals, norms, tail_frac=0.05, tail_k=None):
    """OLS fit log S = a + b log R on the top-k tail; alpha = −b
    (reference: own_plotting.py:642-685). Returns (alpha, k_used, S_fit)."""
    n = norms.size
    if n < 10:
        return None, None, None
    sorted_norms = np.sort(norms)
    if tail_k is None:
        k = max(10, int(np.clip(np.ceil(n * tail_frac), 10, n - 1)))
    else:
        k = int(max(1, tail_k))
    # clamp so the (n-k-1)-th order statistic exists (the reference's
    # max(10, ...) can exceed n-1 for n == 10 and would IndexError there)
    k = min(k, n - 1)
    threshold = sorted_norms[-k - 1]
    mask = r_grid >= threshold
    if not np.any(mask):
        return None, k, None
    r_tail, s_tail = r_grid[mask], s_vals[mask]
    positive = s_tail > 0
    if np.sum(positive) < 3:
        return None, k, None
    b, a = np.polyfit(np.log(r_tail[positive]), np.log(s_tail[positive]), 1)
    return float(-b), int(k), np.exp(a) * (r_grid**b)


def survival_analysis(
    x=None, x_ref=None, std_norm=None, n_points=200, tail_frac=0.05, tail_k=None
):
    """Full survival summary for generated vs reference samples
    (reference plot_survival_simple without the plotting,
    own_plotting.py:688-860). Returns the same survival dict the reference's
    return_survival=True produces."""
    if x is None and x_ref is None:
        raise ValueError("At least one of x or x_ref must be provided.")
    norms_ref = _norms(x_ref, std_norm) if x_ref is not None else None
    norms_gen = _norms(x, std_norm) if x is not None else None
    r_grid = common_r_grid([norms_ref, norms_gen], n_points=n_points)

    out = {"R_grid": r_grid, "fits": {}}
    for tag, norms in (("reference", norms_ref), ("generated", norms_gen)):
        if norms is None:
            out[tag] = {"S": None, "counts": None, "N": 0}
            out["fits"][tag] = {"alpha": None, "k": None}
            continue
        s, counts = survival_curve(norms, r_grid)
        alpha, k, _ = tail_fit_loglog(
            r_grid, s, norms, tail_frac=tail_frac, tail_k=tail_k
        )
        out[tag] = {"S": s, "counts": counts, "N": norms.size}
        out["fits"][tag] = {"alpha": alpha, "k": k}
    return out

"""Deterministic Lorenz-63 dataset in the reference's on-disk format.

../MSGM-data (the measured trajectories) is absent on this machine, so the
signal-config parity study integrates the Lorenz-63 ODE itself (sigma=10,
rho=28, beta=8/3 — the classical parameters) and writes delay windows of
the X coordinate as `<root>/L63/L63_data_X.npy` with shape
(window_len, n_windows): exactly the layout both the reference loader
(reference: data.py:533-549, which transposes and /10-scales it) and
sdeflow_tpu.data.Lorenz63 consume. Both frameworks therefore see the
identical distribution through their own full data pipelines.
"""

import os

import numpy as np

PARAMS = dict(sigma=10.0, rho=28.0, beta=8.0 / 3.0)


def _l63_rhs(state):
    x, y, z = state[..., 0], state[..., 1], state[..., 2]
    return np.stack(
        [
            PARAMS["sigma"] * (y - x),
            x * (PARAMS["rho"] - z) - y,
            x * y - PARAMS["beta"] * z,
        ],
        axis=-1,
    )


def integrate_l63(n_steps, dt=0.01, seed=0, burn_in=2000):
    """RK4-integrate one Lorenz-63 trajectory; returns X(t) of length n_steps."""
    rng = np.random.default_rng(seed)
    state = rng.standard_normal(3) * 5.0 + np.array([0.0, 0.0, 25.0])
    xs = np.empty(n_steps, np.float64)
    for i in range(burn_in + n_steps):
        k1 = _l63_rhs(state)
        k2 = _l63_rhs(state + 0.5 * dt * k1)
        k3 = _l63_rhs(state + 0.5 * dt * k2)
        k4 = _l63_rhs(state + dt * k3)
        state = state + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        if i >= burn_in:
            xs[i - burn_in] = state[0]
    return xs


def ensure_fixture(root, window_len=1000, n_windows=6000, stride=73, seed=0):
    """Generate `<root>/L63/L63_data_X.npy` once; return the root."""
    path = os.path.join(root, "L63", "L63_data_X.npy")
    if os.path.exists(path):
        return root
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n_steps = window_len + stride * (n_windows - 1)
    xs = integrate_l63(n_steps, seed=seed)
    idx = np.arange(n_windows)[:, None] * stride + np.arange(window_len)[None, :]
    windows = xs[idx]  # (n_windows, window_len)
    np.save(path, windows.T.astype(np.float64))  # (window_len, n_windows)
    return root


if __name__ == "__main__":
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/l63_parity_data"
    ensure_fixture(root)
    print("fixture at", os.path.join(root, "L63", "L63_data_X.npy"))

"""Measure the PyTorch reference's performance on this machine.

The reference publishes no numbers (BASELINE.md), so the baseline for
bench.py is measured by RUNNING the reference implementation (imported
read-only from /root/reference — not copied) on its CPU-runnable config #1:
swissroll-scale data, MLP score net, SGM VP-SDE, RK4-Stratonovich reverse
sampling. Writes BASELINE_MEASURED.json at the repo root.

Usage: python tools/measure_baseline.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import matplotlib

matplotlib.use("Agg")

REFERENCE = os.environ.get("SDEFLOW_REFERENCE", "/root/reference")
sys.path.insert(0, REFERENCE)

import numpy as np
import torch
import torch.nn as nn


def build_mlp(d, hidden=128):
    """Same architecture as the reference MLP (NN.py:73-120): 4 linear
    layers, hidden 128, Swish, input concat(x, t)."""

    class Swish(nn.Module):
        def forward(self, x):
            return torch.sigmoid(x) * x

    class RefMLP(nn.Module):
        def __init__(self):
            super().__init__()
            self.main = nn.Sequential(
                nn.Linear(d + 1, hidden), Swish(),
                nn.Linear(hidden, hidden), Swish(),
                nn.Linear(hidden, hidden), Swish(),
                nn.Linear(hidden, d),
            )

        def forward(self, x, t):
            t = t.reshape(-1, 1).float()
            if t.shape[0] == 1:
                t = t.expand(x.shape[0], 1)
            return self.main(torch.cat([x, t], dim=1))

    return RefMLP()


def measure_reverse_sampling(num_samples, num_steps, d=2, repeats=3):
    """Reverse-SDE RK4 sampling throughput of the reference (the
    throughput-critical path, MSGM_higherDim.py:902-906)."""
    from SDEs import SGMsde, PluginReverseSDE
    from sde_scheme import rk4_stratonovich_sampler

    torch.manual_seed(0)
    T = torch.nn.Parameter(torch.FloatTensor([1.0]), requires_grad=False)
    drift = build_mlp(d)
    inf_sde = SGMsde(beta_min=0.1, beta_max=20.0, t_epsilon=1e-3, T=T,
                     num_steps_forward=16, device="cpu")
    gen_sde = PluginReverseSDE(inf_sde, drift, T, vtype="rademacher",
                               debias=False, deviceReverseSDE="cpu")

    x0 = gen_sde.latent_sample(num_samples, d)
    # warmup
    rk4_stratonovich_sampler(gen_sde, x0[: min(256, num_samples)], 4,
                             keep_all_samples=False)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        xs = rk4_stratonovich_sampler(gen_sde, x0, num_steps,
                                      keep_all_samples=False)
        times.append(time.perf_counter() - t0)
        del xs
    best = min(times)
    return num_samples / best, best


def measure_train_step(batch_size, d=2, iters=50):
    """SSM train-step throughput of the reference
    (MSGM_higherDim.py:803-809)."""
    from SDEs import SGMsde, PluginReverseSDE

    torch.manual_seed(0)
    T = torch.nn.Parameter(torch.FloatTensor([1.0]), requires_grad=False)
    drift = build_mlp(d)
    inf_sde = SGMsde(beta_min=0.1, beta_max=20.0, t_epsilon=1e-3, T=T,
                     num_steps_forward=16, device="cpu")
    gen_sde = PluginReverseSDE(inf_sde, drift, T, vtype="rademacher",
                               debias=False, deviceReverseSDE="cpu")
    optim = torch.optim.Adam(gen_sde.parameters(), lr=1e-3)
    x = torch.randn(batch_size, d)
    for _ in range(5):  # warmup
        optim.zero_grad(); loss = gen_sde.ssm(x).mean(); loss.backward(); optim.step()
    t0 = time.perf_counter()
    for _ in range(iters):
        optim.zero_grad()
        loss = gen_sde.ssm(x).mean()
        loss.backward()
        optim.step()
    dt = time.perf_counter() - t0
    return iters / dt, dt / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    num_samples = 2000 if args.quick else 10_000
    num_steps = 32 if args.quick else 128

    sps, secs = measure_reverse_sampling(num_samples, num_steps)
    steps_per_sec, ms = measure_train_step(256, iters=10 if args.quick else 50)

    result = {
        "machine": "cpu (torch reference)",
        "torch_version": torch.__version__,
        "config": {
            "model": "MLP d=2 hidden=128 (NN.py:73-120)",
            "sde": "SGM VP beta=[0.1,20]",
            "sampler": "rk4_stratonovich (sde_scheme.py:174-269)",
            "num_samples": num_samples,
            "num_steps_backward": num_steps,
            "train_batch": 256,
        },
        "reverse_samples_per_sec": sps,
        "reverse_wall_s": secs,
        "ssm_train_steps_per_sec": steps_per_sec,
        "ssm_train_ms_per_step": ms,
    }
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

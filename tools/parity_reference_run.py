"""Run the PyTorch reference's swissroll SGM/MSGM arms for quality parity.

Imports the reference read-only from /root/reference and drives it with the
same semantics as its own driver (MSGM_higherDim.py): SSM training with
Adam(1e-3), RK4 reverse sampling, Gaussian-kernel MMD. Writes
parity_reference.json.

Usage: python tools/parity_reference_run.py [--iters 16384] [--samples 10000]
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


def build_mlp(d, premodule=None, hidden=128):
    """Reference-architecture MLP (NN.py:73-120), built here to avoid the
    reference's plotting-import chain (NN.py imports own_plotting which
    needs torchvision)."""

    class Swish(nn.Module):
        def forward(self, x):
            return torch.sigmoid(x) * x

    class RefMLP(nn.Module):
        def __init__(self):
            super().__init__()
            in_dim = d + 1 + (1 if premodule else 0)
            self.main = nn.Sequential(
                nn.Linear(in_dim, hidden), Swish(),
                nn.Linear(hidden, hidden), Swish(),
                nn.Linear(hidden, hidden), Swish(),
                nn.Linear(hidden, d),
            )

        def forward(self, x, t):
            t = t.reshape(-1, 1).float()
            if t.shape[0] == 1:
                t = t.expand(x.shape[0], 1)
            if premodule:
                norm = torch.norm(x, dim=-1, keepdim=True) + 1e-6
                x = torch.cat([x / norm, torch.log(norm)], dim=-1)
            return self.main(torch.cat([x, t], dim=1))

    return RefMLP()


def swissroll_sample(n, noise=0.5):
    from sklearn.datasets import make_swiss_roll

    return torch.from_numpy(
        make_swiss_roll(n, noise=noise)[0][:, [0, 2]].astype("float32") / 5.0
    )


def compute_mmd(x, y):
    """Gaussian-kernel MMD², k(a,b) = exp(−‖a−b‖²/d²) — same kernel as the
    reference's quantitative_comparison.py (whose module-level torchvision
    import is unavailable here)."""

    def kmean(a, b):
        d = a.shape[1]
        sq = torch.cdist(a, b) ** 2 / (d * d)
        return torch.exp(-sq).mean()

    return kmean(x, x) + kmean(y, y) - 2 * kmean(x, y)


def run_arm(is_msgm, iters, batch, num_samples, steps_back, seed=0):
    from SDEs import SGMsde, MSGMsde, PluginReverseSDE
    from sde_scheme import rk4_stratonovich_sampler

    torch.manual_seed(seed)
    np.random.seed(seed)
    T = torch.nn.Parameter(torch.FloatTensor([1.0]), requires_grad=False)
    d = 2
    drift = build_mlp(d, premodule="NormalizeLogRadius" if is_msgm else None)
    if is_msgm:
        x_init = swissroll_sample(min(100_000, iters * batch))
        inf_sde = MSGMsde(
            x_init, beta_min=0.1, beta_max=20.0, t_epsilon=1e-3, T=T,
            num_steps_forward=16, device="cpu",
            estim_cst_norm_dens_r_T=False, norm_sampler="ecdf",
            norm_map="log", denseTensor=True,
        )
    else:
        inf_sde = SGMsde(beta_min=0.1, beta_max=20.0, t_epsilon=1e-3, T=T,
                         num_steps_forward=16, device="cpu")
    gen_sde = PluginReverseSDE(inf_sde, drift, T, vtype="rademacher",
                               debias=False, deviceReverseSDE="cpu")
    optim = torch.optim.Adam(gen_sde.parameters(), lr=1e-3)

    t_train0 = time.perf_counter()
    for i in range(iters):
        optim.zero_grad()
        with torch.no_grad():
            x = swissroll_sample(batch)
        loss = gen_sde.ssm(x).mean()
        loss.backward()
        optim.step()
    train_s = time.perf_counter() - t_train0

    with torch.no_grad():
        x0 = gen_sde.latent_sample(num_samples, d)
        t_s0 = time.perf_counter()
        xs = rk4_stratonovich_sampler(gen_sde, x0, steps_back,
                                      keep_all_samples=False,
                                      norm_correction=bool(is_msgm))
        sample_s = time.perf_counter() - t_s0
        xgen = xs
        bad = (torch.isnan(xgen) | (xgen.abs() > 1e3)).any(dim=1)
        xgen = xgen[~bad]
        xtest = swissroll_sample(num_samples)
        xtrain = swissroll_sample(num_samples)
        n = min(xgen.shape[0], num_samples)
        mmd = float(compute_mmd(xgen[:n], xtest[:n]))
        mmd_floor = float(compute_mmd(xtrain[:n], xtest[:n]))
    return dict(
        arm="MSGM" if is_msgm else "SGM",
        iters=iters, batch=batch, steps_back=steps_back,
        train_s=train_s, ms_per_step=train_s / iters * 1000,
        sample_s=sample_s, samples_per_s=num_samples / sample_s,
        sqrt_mmd=mmd ** 0.5, sqrt_mmd_floor=mmd_floor ** 0.5,
        dropped=int(bad.sum()), final_loss=float(loss),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--samples", type=int, default=10_000)
    ap.add_argument("--steps-back", type=int, default=128)
    ap.add_argument("--out", default="parity_reference.json")
    args = ap.parse_args()

    results = []
    for is_msgm in (False, True):
        print(f"running {'MSGM' if is_msgm else 'SGM'} arm...", flush=True)
        res = run_arm(is_msgm, args.iters, args.batch, args.samples,
                      args.steps_back)
        print(json.dumps(res), flush=True)
        results.append(res)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

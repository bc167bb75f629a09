"""Image-config quality parity: drive the PyTorch reference's attention
U-Net arm on a synthetic 16x16 smoothed-GRF field.

../MSGM-data (the real PIV measurements) is not available on this machine,
so this uses the stand-in distribution defined by
sdeflow_tpu.data.synthetic.grf_spectral_filter — the same spectral filter
the jax sampler uses, fed here through numpy+torch so both frameworks see
the identical distribution. The arm mirrors the reference's 16x16 PIV
configuration (MSGM_higherDim.py:222-259, 703-716): VorticityUNet with
base 32, mults (1,2,4), 2 res blocks, attention at 8x8/4x4, order-F
flattening; MSGM uses beta in [0.4, 80], t_eps 4e-3, 64 forward steps,
circulant (denseTensor=False) G, ecdf/log norm sampling, premodule
NormalizeLogRadius; lr 1e-4. Budget is reduced (identically in both
frameworks) because the reference needs multiple seconds per step on this
CPU. Writes parity_image_reference.json.
"""

import argparse
import json
import os
import sys
import time
import types

import matplotlib

matplotlib.use("Agg")

REFERENCE = os.environ.get("SDEFLOW_REFERENCE", "/root/reference")
sys.path.insert(0, REFERENCE)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The reference's U-Net import chain pulls in torchvision (absent here) only
# for MNIST helpers we never call — stub it.
for _name in ("torchvision", "torchvision.datasets", "torchvision.transforms",
              "torchvision.utils"):
    _m = types.ModuleType(_name)
    if _name == "torchvision":
        _m.__path__ = []
    sys.modules[_name] = _m
sys.modules["torchvision.utils"].save_image = lambda *a, **k: None

import numpy as np
import torch

from sdeflow_tpu.data.synthetic import grf_spectral_filter


class NumpyGRF:
    """numpy/torch twin of sdeflow_tpu.data.SmoothedGRF (same distribution)."""

    def __init__(self, npixel=16, ell=2.0, seed=0):
        self.npixel = npixel
        self.dim = npixel * npixel
        filt, norm = grf_spectral_filter(npixel, ell)
        self.filt, self.norm = filt, norm
        self.rng = np.random.default_rng(seed)

    def sample(self, n):
        w = self.rng.standard_normal((n, self.npixel, self.npixel))
        x = np.fft.irfft2(np.fft.rfft2(w) * self.filt,
                          s=(self.npixel, self.npixel)) / self.norm
        flat = np.transpose(x, (0, 2, 1)).reshape(n, self.dim)
        return torch.from_numpy(flat.astype("float32"))


def compute_mmd(x, y):
    """Gaussian-kernel MMD^2, k(a,b)=exp(-|a-b|^2/d^2) — the reference's
    quantitative_comparison.py:32 kernel."""

    def kmean(a, b):
        d = a.shape[1]
        sq = torch.cdist(a, b) ** 2 / (d * d)
        return torch.exp(-sq).mean()

    return kmean(x, x) + kmean(y, y) - 2 * kmean(x, y)


def run_arm(is_msgm, iters, batch, num_samples, steps_back, seed=0):
    from SDEs import SGMsde, MSGMsde, PluginReverseSDE
    from sde_scheme import rk4_stratonovich_sampler
    from NNUnet import VorticityUNet

    torch.manual_seed(seed)
    np.random.seed(seed)
    grf = NumpyGRF(seed=seed)
    d = grf.dim
    premodule = "NormalizeLogRadius" if is_msgm else None
    net = VorticityUNet(
        base_channels=32, channel_mults=(1, 2, 4), num_res_blocks=2,
        premodule=premodule, in_space=grf.npixel,
        attention_resolutions=(2, 4), flatten_order="F",
    )
    T = torch.nn.Parameter(torch.FloatTensor([1.0]), requires_grad=False)
    # 16x16 PIV hyperparameters: ratio=1/4 (MSGM_higherDim.py:228-233)
    beta_min, beta_max, t_eps, steps_fwd = 0.4, 80.0, 4e-3, 64
    if is_msgm:
        x_init = grf.sample(min(100_000, iters * batch))
        inf_sde = MSGMsde(
            x_init, beta_min=beta_min, beta_max=beta_max, t_epsilon=t_eps,
            T=T, num_steps_forward=steps_fwd, device="cpu",
            estim_cst_norm_dens_r_T=False, norm_sampler="ecdf",
            norm_map="log", denseTensor=False,
        )
    else:
        # SGM keeps the default betas (the reference's ratio-divide for SGM is
        # commented out at MSGM_higherDim.py:245-247) but shares t_eps.
        inf_sde = SGMsde(beta_min=0.1, beta_max=20.0, t_epsilon=t_eps, T=T,
                         num_steps_forward=steps_fwd, device="cpu")
    gen_sde = PluginReverseSDE(inf_sde, net, T, vtype="rademacher",
                               debias=False, deviceReverseSDE="cpu")
    optim = torch.optim.Adam(gen_sde.parameters(), lr=1e-4)

    t0 = time.perf_counter()
    for i in range(iters):
        optim.zero_grad()
        with torch.no_grad():
            x = grf.sample(batch)
        loss = gen_sde.ssm(x).mean()
        loss.backward()
        optim.step()
        if i % max(1, iters // 8) == 0:
            print(f"iter {i}/{iters} loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    train_s = time.perf_counter() - t0

    with torch.no_grad():
        x0 = gen_sde.latent_sample(num_samples, d)
        t0 = time.perf_counter()
        xgen = rk4_stratonovich_sampler(gen_sde, x0, steps_back,
                                        keep_all_samples=False,
                                        norm_correction=bool(is_msgm))
        sample_s = time.perf_counter() - t0
        bad = (torch.isnan(xgen) | (xgen.abs() > 1e3)).any(dim=1)
        xgen = xgen[~bad]
        xtest = grf.sample(num_samples)
        xtrain = grf.sample(num_samples)
        n = min(xgen.shape[0], num_samples)
        mmd = float(compute_mmd(xgen[:n], xtest[:n]))
        mmd_floor = float(compute_mmd(xtrain[:n], xtest[:n]))
    return dict(
        arm="MSGM" if is_msgm else "SGM", config="grf16_unet_attention",
        iters=iters, batch=batch, steps_back=steps_back,
        train_s=train_s, ms_per_step=train_s / iters * 1000,
        sample_s=sample_s, samples_per_s=num_samples / sample_s,
        sqrt_mmd=mmd ** 0.5, sqrt_mmd_floor=mmd_floor ** 0.5,
        dropped=int(bad.sum()), final_loss=float(loss),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=768)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--steps-back", type=int, default=64)
    ap.add_argument("--arms", default="sgm,msgm")
    ap.add_argument("--out", default="parity_image_reference.json")
    args = ap.parse_args()

    arms = [a.strip().lower() for a in args.arms.split(",")]
    results = []
    for is_msgm in (False, True):
        name = "MSGM" if is_msgm else "SGM"
        if name.lower() not in arms:
            continue
        print(f"running {name} image arm...", flush=True)
        res = run_arm(is_msgm, args.iters, args.batch, args.samples,
                      args.steps_back)
        print(json.dumps(res), flush=True)
        results.append(res)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

"""Latent-space interpolation through the PF-ODE encoder — a workflow the
reference cannot express (it has no deterministic transport; only the
stochastic sde_scheme.py solvers).

Trains the swissroll SGM parity arm (small budget), encodes two held-out
points with `ops.encode_ode`, spherically interpolates between their
latents (slerp stays on the Gaussian prior's typical shell), decodes every
interpolant with `ops.integrate_ode`, and renders data + path to
results/latent_interp.png. Endpoint decode(encode(x)) errors are printed —
the round-trip identity needs no trained score, but on a trained arm the
path between the endpoints is what becomes meaningful.

Usage: python tools/latent_interp.py [--iters 4096] [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--n-interp", type=int, default=9)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/latent_interp.png")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdeflow_tpu.data import SwissRoll
    from sdeflow_tpu.models import MLP
    from sdeflow_tpu.ops.ode import encode_ode, integrate_ode
    from sdeflow_tpu.sde import PluginReverseSDE, SGMSde
    from sdeflow_tpu.training import Trainer

    key = jax.random.PRNGKey(0)
    sampler = SwissRoll()
    model = MLP(input_dim=2)
    variables = model.init(key, sampler.sample(key, 8), jnp.zeros((8,)))
    sde = SGMSde.create(beta_min=0.1, beta_max=20.0, t_epsilon=1e-3,
                        num_steps_forward=16)
    gen0 = PluginReverseSDE.create(sde, model.apply, variables)
    trainer = Trainer(gen0, sampler, lr=1e-3, batch_size=256,
                      print_every=max(1, args.iters // 2))
    state, _ = trainer.run(jax.random.fold_in(key, 1), args.iters)
    gen = state.gen_sde

    # two far-apart held-out points: opposite ends of the roll
    xtest = sampler.sampletest(jax.random.fold_in(key, 2), 4096)
    norms = jnp.linalg.norm(xtest, axis=1)
    xa = xtest[jnp.argmin(norms)][None]   # innermost point
    xb = xtest[jnp.argmax(norms)][None]   # outermost point
    ends = jnp.concatenate([xa, xb])

    z = encode_ode(gen, ends, args.steps)
    x_rec = integrate_ode(gen, z, args.steps)
    err = jnp.abs(x_rec - ends).max(axis=1)
    print(f"endpoint round-trip |decode(encode(x)) - x|_inf: "
          f"{float(err[0]):.2e}, {float(err[1]):.2e}")

    # slerp between the two latents (stays on the prior's typical shell)
    za, zb = z[0], z[1]
    cos = jnp.dot(za, zb) / (jnp.linalg.norm(za) * jnp.linalg.norm(zb))
    omega = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    alphas = jnp.linspace(0.0, 1.0, args.n_interp)
    zs = (jnp.sin((1 - alphas)[:, None] * omega) * za[None]
          + jnp.sin(alphas[:, None] * omega) * zb[None]) / jnp.sin(omega)
    path = integrate_ode(gen, zs, args.steps)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import LinearSegmentedColormap

    # sequential single-hue ramp (light→dark blue; dataviz color formula)
    cmap = LinearSegmentedColormap.from_list(
        "seqblue", ["#c4dbf5", "#2a78d6", "#123a6b"])
    fig, ax = plt.subplots(figsize=(5.6, 5.0), dpi=160, facecolor="#fcfcfb")
    ax.set_facecolor("#fcfcfb")
    data = np.asarray(sampler.sample(jax.random.fold_in(key, 3), 4000))
    ax.scatter(data[:, 0], data[:, 1], s=4, color="#b9b8b3", alpha=0.5,
               lw=0, label="data")
    p = np.asarray(path)
    ax.plot(p[:, 0], p[:, 1], color="#52514e", lw=1.0, zorder=2)
    ax.scatter(p[:, 0], p[:, 1], c=np.asarray(alphas), cmap=cmap, s=46,
               zorder=3, edgecolors="#fcfcfb", linewidths=1.2)
    for pt, lab in ((np.asarray(xa)[0], "x_a"), (np.asarray(xb)[0], "x_b")):
        ax.annotate(lab, pt, xytext=(6, 6), textcoords="offset points",
                    fontsize=9, color="#0b0b0b")
    ax.set_title("PF-ODE latent slerp: decode(slerp(encode(x_a), "
                 "encode(x_b)))", fontsize=9, color="#0b0b0b")
    ax.tick_params(colors="#52514e", labelsize=8)
    for s_ in ax.spines.values():
        s_.set_color("#e5e4e0")
    ax.grid(True, color="#e5e4e0", lw=0.5)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, facecolor=fig.get_facecolor())
    print("wrote", args.out)


if __name__ == "__main__":
    main()

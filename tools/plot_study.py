"""Render the sampler study (quality vs NFE) to results/ode_study.png.

Two panels (SGM / MSGM arm), x = score-net evaluations per sample (NFE,
log2), y = √MMD against a held-out test set (log). Lines are the median
across the 3 retrain seeds (`ODE_STUDY_CPU{,_s1,_s2}.json`), bands the
min-max spread; the gray dashed line is the median √MMD(train, test)
floor. The adaptive dopri solve (no fixed NFE) is drawn as a marker at
the right edge at its median √MMD.

The reference generates only through the 128-step RK4 reverse SDE
(/root/reference/MSGM_higherDim.py:903, NFE 512) — the rightmost point
of the "reverse SDE (rk4)" series.

Usage: python tools/plot_study.py [--out results/ode_study.png]
"""

import argparse
import json
import os

import numpy as np

SEED_FILES = ("ODE_STUDY_CPU.json", "ODE_STUDY_CPU_s1.json",
              "ODE_STUDY_CPU_s2.json")

# (sampler, method, corrector_steps) -> display label; fixed slot order =
# fixed categorical hue order (color follows the entity across panels)
SERIES = (
    (("sde", "rk4", 0), "reverse SDE (rk4) — reference path"),
    (("sde", "em", 0), "reverse SDE (em)"),
    (("sde", "em", 1), "predictor–corrector (em + 1 Langevin)"),
    (("ode", "rk4", 0), "probability-flow ODE (rk4)"),
    (("dpm", "dpm2m", 0), "DPM-Solver++ 2M"),
    (("dpm", "sdpm1", 0), "stochastic exponential (sdpm1)"),
)

# validated reference categorical palette (light mode, fixed order;
# dataviz skill references/palette.md — adjacent-pair CVD ΔE ≥ 8)
COLORS = ("#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300")
TEXT, TEXT2, GRID = "#0b0b0b", "#52514e", "#e5e4e0"


def _load():
    data = []
    for f in SEED_FILES:
        with open(f) as fh:
            data.append(json.load(fh))
    return data


def _series(data, arm, key):
    """median + (lo, hi) of sqrt_mmd across seeds, per NFE."""
    samp, meth, corr = key
    per_seed = []
    for d in data:
        rows = {
            r["nfe"]: r["sqrt_mmd"] for r in d["rows"]
            if (r["arm"], r["sampler"], r["method"],
                r["corrector_steps"]) == (arm, samp, meth, corr)
            and r["nfe"] is not None
        }
        per_seed.append(rows)
    nfes = sorted(set.intersection(*(set(p) for p in per_seed)))
    med = [float(np.median([p[n] for p in per_seed])) for n in nfes]
    lo = [min(p[n] for p in per_seed) for n in nfes]
    hi = [max(p[n] for p in per_seed) for n in nfes]
    return nfes, med, lo, hi


def _dopri(data, arm):
    vals = []
    for d in data:
        for r in d["rows"]:
            if r["arm"] == arm and r["method"] == "dopri":
                vals.append(r["sqrt_mmd"])
    return float(np.median(vals)) if vals else None


def _floor(data, arm):
    vals = [r["sqrt_mmd_floor"] for d in data for r in d["rows"]
            if r["arm"] == arm]
    return float(np.median(vals))


def main():
    global SEED_FILES
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/ode_study.png")
    ap.add_argument("--seed-files", default=",".join(SEED_FILES),
                    help="comma list of per-seed study JSONs (e.g. the "
                         "ODE_STUDY_CPU_ema*.json EMA-head runs)")
    ap.add_argument("--no-direct-labels", action="store_true",
                    help="legend only — for variants (e.g. the EMA head) "
                         "where converged series collapse onto the floor "
                         "and direct labels would overlap")
    ap.add_argument("--suptitle", default=None,
                    help="override the figure suptitle (the default "
                         "describes the raw-head seed files)")
    args = ap.parse_args()
    SEED_FILES = tuple(f.strip() for f in args.seed_files.split(","))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = _load()
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2), dpi=160,
                             facecolor="#fcfcfb")
    # direct-label only the load-bearing series (≤4); legend carries all
    direct = set() if args.no_direct_labels else {
        "predictor–corrector (em + 1 Langevin)", "DPM-Solver++ 2M",
        "reverse SDE (rk4) — reference path"}

    for ax, arm in zip(axes, ("SGM", "MSGM")):
        ax.set_facecolor("#fcfcfb")
        for (key, label), color in zip(SERIES, COLORS):
            if arm == "MSGM" and key[0] == "dpm":
                continue  # exponential integrators need the SGM kernel
            nfes, med, lo, hi = _series(data, arm, key)
            if not nfes:
                continue
            ax.fill_between(nfes, lo, hi, color=color, alpha=0.12, lw=0)
            ax.plot(nfes, med, color=color, lw=1.8, marker="o", ms=3.5,
                    label=label)
            if label in direct:
                dy = {"reverse SDE (rk4) — reference path": 7}.get(label, -9)
                ax.annotate(
                    label.split(" — ")[0], (nfes[-1], med[-1]),
                    xytext=(-2, dy), textcoords="offset points",
                    fontsize=7, color=TEXT2, va="center", ha="right",
                )
        dop = _dopri(data, arm)
        if dop is not None:
            ax.plot([900], [dop], marker="D", ms=5, color=TEXT2, ls="none")
            ax.annotate("dopri (adaptive)", (900, dop), xytext=(0, 8),
                        textcoords="offset points", fontsize=7,
                        color=TEXT2, ha="center")
        fl = _floor(data, arm)
        ax.axhline(fl, color=TEXT2, lw=1.0, ls=(0, (4, 3)))
        ax.annotate("√MMD(train, test) floor", (2 ** 5, fl), xytext=(0, 3),
                    textcoords="offset points", fontsize=7, color=TEXT2)
        ax.set_xscale("log", base=2)
        ax.set_xlim(right=2 ** 10.6)
        ax.set_yscale("log")
        ax.set_xlabel("score-net evaluations per sample (NFE)", fontsize=9,
                      color=TEXT)
        ax.set_title(f"{arm} arm", fontsize=10, color=TEXT)
        ax.grid(True, which="major", color=GRID, lw=0.6)
        ax.tick_params(colors=TEXT2, labelsize=8)
        for s in ax.spines.values():
            s.set_color(GRID)
    axes[0].set_ylabel("√MMD vs held-out test set (lower is better)",
                       fontsize=9, color=TEXT)
    axes[0].legend(fontsize=7, loc="lower left", framealpha=0.9,
                   edgecolor=GRID)
    fig.suptitle(
        args.suptitle
        or "Sampler families on the trained swissroll parity arms — median "
           "of 3 retrain seeds, min-max band (ODE_STUDY_CPU*.json)",
        fontsize=10, color=TEXT,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, facecolor=fig.get_facecolor())
    print("wrote", args.out)


if __name__ == "__main__":
    main()

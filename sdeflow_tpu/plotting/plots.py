"""Plot & diagnostics suite (matplotlib/seaborn on host).

Port of the reference's `own_plotting.py` with the same figure vocabulary:
2D log-scale histogram heatmaps, noising/denoising film strips, seaborn
corner pairplots with per-dimension axis scaling, forward-convergence
covariance panels, per-step signal/image plots, survival curves, and the
post-generation pipeline. Everything upstream of the figures (covariances,
norms, MMD) is computed on device via `sdeflow_tpu.eval` and transferred
once; the reference instead mixes torch host ops into the plotting layer.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.ticker as mticker

from sdeflow_tpu.eval.diagnostics import forward_convergence_stats, filter_blowups
from sdeflow_tpu.eval.survival import survival_analysis


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# 2D histogram heat maps + film strips (reference: own_plotting.py:23-126)
# ---------------------------------------------------------------------------


def get_2d_histogram_plot(data, val=3, offset_dimplot=0, num=64, vmin=0,
                          vmax=10, use_grid=False, origin="lower",
                          logscale=True):
    """Render one 2D log-density heat map to an RGB array."""
    data = _np(data)
    x = data[:, offset_dimplot]
    if (offset_dimplot + data.shape[1]) < 3:
        y = data[:, offset_dimplot + 1]
    else:
        y = data[:, offset_dimplot + 2]
        val = val / 2

    heatmap, xedges, yedges = np.histogram2d(
        x, y, range=[[-val, val], [-val, val]], bins=num
    )
    if logscale:
        if (heatmap > heatmap.min()).any():
            vmin = heatmap[heatmap > heatmap.min()].min() / 2
        heatmap = np.log(heatmap + 1e-10)
        vmin = np.log(vmin) if vmin > 0 else heatmap.min()
        vmax = heatmap.max()
    extent = [xedges[0], xedges[-1], yedges[0], yedges[-1]]

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(heatmap.T, extent=extent, origin=origin, vmin=vmin, vmax=vmax)
    ax.grid(False)
    if use_grid:
        plt.xticks(np.arange(-val, val + 1, step=1))
        plt.yticks(np.arange(-val, val + 1, step=1))
    else:
        plt.xticks([])
        plt.yticks([])
    plt.tight_layout()
    fig.canvas.draw()
    image = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    image = image.reshape((h, w, 4))[:, :, :3]
    plt.close(fig)
    return image


def plot_selected_inds(xs, inds, use_xticks=True, use_yticks=True, lmbd=0.0,
                       offset_dimplot=0, include_t0=False, backward=True,
                       val=3):
    """Film strip of 2D histograms at selected trajectory steps; returns the
    figure (reference: own_plotting.py:83-126)."""
    xs = _np(xs)
    inds = list(inds)
    l_inds = len(inds)
    iter_inds = list(reversed(inds)) if backward else inds
    imgs = [
        get_2d_histogram_plot(xs[ind], val, offset_dimplot=offset_dimplot)
        for ind in iter_inds
    ]
    img = np.concatenate(imgs, axis=1)

    height, width, _ = img.shape
    height_per_img = width_per_img = height
    figwidth, fontsize = 25, 15
    if use_xticks:
        xticks = [0.5 * width_per_img + width_per_img * i for i in range(l_inds)]
        offset = 0 if include_t0 else 1
        xticklabels = [rf"$i={ind + offset:d}$" for ind in iter_inds]
    else:
        xticks, xticklabels = [], []
    if use_yticks:
        yticks = [0.5 * height_per_img]
        yticklabels = [rf"$\lambda={lmbd:.2g}$"]
    else:
        yticks, yticklabels = [], []

    fig = plt.figure(figsize=(figwidth, figwidth * height / width))
    ax = fig.add_subplot(111)
    ax.imshow(img)
    for spine in ax.spines.values():
        spine.set_color("white")
    ax.tick_params(axis="x", colors="white")
    ax.tick_params(axis="y", colors="white")
    plt.xticks(xticks, xticklabels, color="black", fontsize=fontsize)
    plt.yticks(yticks, yticklabels, color="black", fontsize=fontsize)
    return fig


# ---------------------------------------------------------------------------
# Pairplots (reference: own_plotting.py:129-330)
# ---------------------------------------------------------------------------


def def_pd(xgen, std_norm, std_test_plot, datatype, dimplot=2,
           offset_dimplot=0, crop_data_plot=False, plot_crop=3,
           columns_plot=None):
    """Build the plotting DataFrame with the reference's scaling/cropping and
    its era5 column-reordering special cases (own_plotting.py:129-167)."""
    import pandas as pd

    xgen = _np(xgen)
    std_norm = _np(std_norm)
    xgen_plot = std_norm * xgen
    if crop_data_plot:
        limit = plot_crop * std_norm * _np(std_test_plot)
        mask = (np.abs(xgen_plot) < limit).all(axis=1)
        frac_out = 100.0 * (1 - mask.mean())
        print(f"{frac_out} % of samples outside plot limits")
        xgen_plot = xgen_plot[mask]

    if datatype == "era5" and xgen.shape[1] >= 9 and dimplot in (3, 6):
        if dimplot == 6:
            xgen_plot = np.concatenate(
                (xgen_plot[:, 6:9], xgen_plot[:, 0:3]), axis=1
            )
        else:
            xgen_plot = xgen_plot[:, 6:9]
        return pd.DataFrame(xgen_plot, columns=columns_plot)
    if datatype == "era5vorttemp" and xgen.shape[1] >= 6 and dimplot in (2, 4):
        if dimplot == 4:
            xgen_plot = np.concatenate(
                (xgen_plot[:, 4:6], xgen_plot[:, 0:2]), axis=1
            )
        else:
            xgen_plot = xgen_plot[:, 4:6]
        return pd.DataFrame(xgen_plot, columns=columns_plot)
    return pd.DataFrame(
        xgen_plot[:, offset_dimplot : offset_dimplot + dimplot],
        columns=columns_plot,
    )


def pairplots(xgen, xtest, std_norm, std_test_plot, datatype, name_simu,
              dimplot=2, offset_dimplot=0, crop_data_plot=False, plot_crop=3,
              plot_xlim=3, plot_ref_pdf=False, pdf_theor=None,
              log_scale_pdf=False, columns_plot=None, dpi=200,
              height_seaborn=2.5, ssize=10):
    """Corner PairGrid: gen-vs-test scatters, test histogram + gen KDE on the
    diagonal, per-dimension axis limits (reference: own_plotting.py:170-298).
    Saves `<name_simu>_multDim.png`."""
    import pandas as pd
    import seaborn as sns

    std_norm = _np(std_norm)
    std_test_plot = _np(std_test_plot)
    kw = dict(dimplot=dimplot, offset_dimplot=offset_dimplot,
              crop_data_plot=crop_data_plot, plot_crop=plot_crop,
              columns_plot=columns_plot)
    pddatatest = def_pd(xtest, std_norm, std_test_plot, datatype, **kw)
    pddatagen = def_pd(xgen, std_norm, std_test_plot, datatype, **kw)
    pddata = pd.concat(
        [pddatatest.assign(samples="test"), pddatagen.assign(samples="gen.")]
    )

    palette = {"test": sns.color_palette()[0], "gen.": sns.color_palette()[1]}
    plot_kws = {"alpha": 0.1, "s": ssize, "edgecolor": "none",
                "rasterized": True}

    g = sns.PairGrid(pddata, hue="samples", corner=True, height=height_seaborn,
                     aspect=1, palette=palette, diag_sharey=False)
    g.map_lower(sns.scatterplot, **plot_kws)

    def diag_plot(x, color=None, label=None, **kws):
        ax = plt.gca()
        if label == "test":
            x_np = np.asarray(x, dtype=np.float64)
            x_np = x_np[np.isfinite(x_np)]
            counts, _ = np.histogram(x_np, bins=80, density=True)
            ymax = float(counts.max()) if counts.size else 0.0
            sns.histplot(x=x, bins=80, stat="density", element="step",
                         fill=True, alpha=0.25, color=palette["test"], **kws)
            if log_scale_pdf and (counts > 0).any():
                ymin = counts[counts > 0].min()
            else:
                ymin = 0
            if ymax > 0:
                ax.set_ylim(ymin, 1.05 * ymax)
        elif label == "gen.":
            sns.kdeplot(x=x, color=palette["gen."], lw=1.5, **kws)
        if plot_ref_pdf and pdf_theor is not None:
            lim = plot_xlim * std_norm[offset_dimplot] * std_test_plot[offset_dimplot]
            xx = np.linspace(-lim, lim, 2000)
            pdf = pdf_theor(xx)
            pdf = pdf / (pdf.sum() * (xx[1] - xx[0]))
            plt.plot(xx, pdf, color=palette["test"], linestyle=":", lw=1.5)
        if log_scale_pdf:
            ax.set_yscale("log")

    g.map_diag(diag_plot)

    handles = [
        plt.Line2D([], [], marker="o", linestyle="", color=palette[k],
                   markersize=8, alpha=0.6)
        for k in ["test", "gen."]
    ]
    g.figure.legend(handles=handles, labels=["test", "gen."],
                    loc="upper right", markerscale=ssize)

    for i, row in enumerate(g.axes):
        ylim = plot_xlim * std_norm[offset_dimplot + i] * std_test_plot[offset_dimplot + i]
        for j, ax in enumerate(row):
            if ax is None:
                continue
            xlim = plot_xlim * std_norm[offset_dimplot + j] * std_test_plot[offset_dimplot + j]
            if j < i:
                ax.set_xlim((-xlim, xlim))
                ax.set_ylim((-ylim, ylim))
    for i in range(len(g.diag_vars)):
        ax = g.axes[i, i]
        if ax is None:
            continue
        xlim = plot_xlim * std_norm[offset_dimplot + i] * std_test_plot[offset_dimplot + i]
        ax.set_xlim((-xlim, xlim))

    def fmt_tick(val, pos):
        if abs(val) < 1e-8:
            return ""
        return f"{val:g}"

    for row in g.axes:
        for ax in row:
            if ax is None:
                continue
            ax.xaxis.set_major_locator(mticker.MaxNLocator(nbins=2))
            ax.yaxis.set_major_locator(mticker.MaxNLocator(nbins=2))
            ax.xaxis.set_major_formatter(mticker.FuncFormatter(fmt_tick))
            ax.yaxis.set_major_formatter(mticker.FuncFormatter(fmt_tick))

    plt.tight_layout()
    plt.savefig(name_simu + "_multDim.png", dpi=dpi)
    plt.close("all")


def pairplots_single(xtest, std_norm, std_test_plot, datatype, name_simu,
                     dimplot=2, offset_dimplot=0, crop_data_plot=False,
                     plot_crop=3, plot_xlim=3, log_scale_pdf=False,
                     columns_plot=None, dpi=200, height_seaborn=2.5, ssize=10,
                     results_dir="results"):
    """Single-dataset corner pairplot (reference: own_plotting.py:301-330)."""
    import seaborn as sns

    std_norm = _np(std_norm)
    std_test_plot = _np(std_test_plot)
    pddatatest = def_pd(xtest, std_norm, std_test_plot, datatype,
                        dimplot=dimplot, offset_dimplot=offset_dimplot,
                        crop_data_plot=crop_data_plot, plot_crop=plot_crop,
                        columns_plot=columns_plot)
    scatter = sns.pairplot(pddatatest, aspect=1, height=height_seaborn,
                           corner=True, plot_kws={"s": ssize})
    for i, row in enumerate(scatter.axes):
        ylim = plot_xlim * std_norm[offset_dimplot + i] * std_test_plot[offset_dimplot + i]
        for j, ax in enumerate(row):
            if ax is None:
                continue
            xlim = plot_xlim * std_norm[offset_dimplot + j] * std_test_plot[offset_dimplot + j]
            if i == j or j < i:
                ax.set_xlim((-xlim, xlim))
            if j < i:
                ax.set_ylim((-ylim, ylim))
    plt.tight_layout()
    os.makedirs(results_dir, exist_ok=True)
    plt.savefig(os.path.join(results_dir, name_simu + ".png"), dpi=dpi)
    plt.close("all")


# ---------------------------------------------------------------------------
# Forward-noising diagnostics (reference: own_plotting.py:333-422)
# ---------------------------------------------------------------------------


def preprocessing(xtest, xs_forward, num_steps_forward, name_simu_root,
                  offset_dimplot=0, noising_plots=True,
                  folder_results="results", val_hist=3.0, std_norm=None,
                  std_test_plot=None, log_fn=print):
    """Forward-SDE convergence report + covariance panels + noising strip.

    Returns the on-device convergence stats dict."""
    xs_forward = _np(xs_forward)
    xtest_np = _np(xtest)
    xgen_forward = xs_forward[-1]

    stats = {k: float(v) for k, v in
             forward_convergence_stats(xtest, xs_forward[-1]).items()}
    log_fn("dist cov_xtest to cov converged (dist to weak white noise) = "
           f"{stats['d_cov_test_to_converged']}")
    log_fn("dist cov_xgen_forward to cov converged = "
           f"{stats['d_cov_forward_to_converged']}")
    log_fn("dist cov_xgen_forward to weak white noise (w. same var.) = "
           f"{stats['d_cov_forward_to_wwn']}")
    log_fn(f"energy_xtest = {stats['energy_test']}")
    log_fn(f"energy_xgen_forward = {stats['energy_forward']}")
    log_fn(f"energy ratio = {stats['energy_ratio']}")

    # covariance panels
    def cov(a):
        return np.cov(a.T)

    cov_t, cov_f = cov(xtest_np), cov(xgen_forward)
    cov_conv = xtest_np.var(axis=0).mean() * np.eye(xtest_np.shape[1])
    vmin = min(cov_t.min(), cov_f.min(), cov_conv.min())
    vmax = max(cov_t.max(), cov_f.max(), cov_conv.max())
    fig, axs = plt.subplots(1, 4, figsize=(20, 5))
    for ax, (mat, title) in zip(axs, [
        (cov_t, "Cov(xtest)"),
        (cov_f, "Cov(xgen_forward)"),
        (cov_conv, "Cov(converged)"),
        (cov_conv - cov_f, "Cov(converged - forward)"),
    ]):
        im = ax.imshow(mat, cmap="viridis", vmin=vmin, vmax=vmax)
        ax.set_title(title)
        ax.set_xlabel("Dimension")
    fig.colorbar(im, ax=axs).set_label("Covariance value")
    os.makedirs(folder_results, exist_ok=True)
    name_fig = os.path.join(folder_results, name_simu_root + "_cov.png")
    os.makedirs(os.path.dirname(name_fig), exist_ok=True)
    plt.savefig(name_fig)
    plt.close("all")

    if noising_plots:
        fig_step = max(1, int(num_steps_forward / 8))
        inds_forward = range(0, num_steps_forward + 1, fig_step)
        stp = _np(std_test_plot)[offset_dimplot] if std_test_plot is not None else 1.0
        fig = plot_selected_inds(
            xs_forward, inds_forward, use_xticks=True, use_yticks=False,
            offset_dimplot=offset_dimplot, include_t0=True, backward=False,
            val=val_hist * stp,
        )
        plt.savefig(os.path.join(folder_results, name_simu_root + "_Forward.png"))
        plt.close("all")
        prefix = os.path.join(folder_results, name_simu_root + "_Forward")
        plot_signal(xs_forward, inds_forward, prefix, std_norm=std_norm,
                    std_test_plot=std_test_plot, time_to_duplicate=0)
    return stats


# ---------------------------------------------------------------------------
# Per-step signal / image plots (reference: own_plotting.py:425-492)
# ---------------------------------------------------------------------------


def plots_vort(U, vmin=-2, vmax=2):
    """Vorticity pcolormesh panel; returns the figure
    (reference: own_plotting.py:484-492)."""
    fig, axs = plt.subplots(1, 1, figsize=(6, 5), constrained_layout=True)
    pcm = axs.pcolormesh(U[-1:0:-1, :], shading="auto", vmin=vmin, vmax=vmax)
    axs.set_title("vorticity (1/s)")
    axs.set_aspect("equal")
    fig.colorbar(pcm, ax=axs)
    return fig


def plot_signal(xs, inds, prefix_save, std_norm=None, std_test_plot=None,
                time_to_duplicate=None):
    """Per-step image (if d is a >=16² square) or time-series plots
    (reference: own_plotting.py:425-481)."""
    xs = _np(xs)
    dim = xs[-1].shape[1]
    std_norm = _np(std_norm) if std_norm is not None else np.ones(dim)
    std_test_plot = _np(std_test_plot) if std_test_plot is not None else np.ones(dim)
    nb_samples = 10 if time_to_duplicate is not None else 1
    nb_samples = min(nb_samples, xs.shape[1])
    if time_to_duplicate == -1:
        time_to_duplicate = xs.shape[0] - 1
    npixelx = int(np.sqrt(dim))
    factor_caxis = (std_norm * std_test_plot).max()
    if dim <= 4**2:
        return
    is_image = (dim == npixelx**2) and (npixelx >= 16)
    for ind in inds:
        n_loc = nb_samples if ind == time_to_duplicate else 1
        for i in range(n_loc):
            series = std_norm * xs[ind, i].squeeze()
            if is_image:
                img = series.reshape((npixelx, npixelx), order="F")
                plots_vort(img, -factor_caxis, factor_caxis)
                plt.savefig(f"{prefix_save}_imageAtt{ind}_sample{i}_.png")
            else:
                fig, ax = plt.subplots(figsize=(10, 5))
                ax.plot(np.arange(dim), series)
                ax.set_title(f"Noisy sample at step {ind}")
                ax.set_xlabel("time")
                ax.set_ylabel("Value")
                ax.set_ylim(-2 * factor_caxis, 2 * factor_caxis)
                plt.tight_layout()
                plt.savefig(f"{prefix_save}_timeserieAtt{ind}_sample{i}_.png")
            plt.close("all")


# ---------------------------------------------------------------------------
# Post-generation pipeline (reference: own_plotting.py:494-566)
# ---------------------------------------------------------------------------


def plot_survival_simple(x=None, x_ref=None, std_norm=None, prefix_save="surv",
                         figsize=(3, 2), n_points=200, tail_frac=0.05,
                         tail_k=None, colors=("#1f77b4", "#ff7f0e"),
                         ylim=(1e-3, 1.1), save_png=True, dpi=300):
    """Survival plot S(R) for test vs generated, log-log, with tail fits
    computed by eval.survival (reference: own_plotting.py:688-860)."""
    surv = survival_analysis(x=x, x_ref=x_ref, std_norm=std_norm,
                             n_points=n_points, tail_frac=tail_frac,
                             tail_k=tail_k)
    r = surv["R_grid"]
    fig, ax = plt.subplots(figsize=figsize)
    handles, labels = [], []
    if surv["reference"]["S"] is not None:
        (lr_,) = ax.plot(r, surv["reference"]["S"], "-", color=colors[0])
        handles.append(lr_); labels.append("test")
    if surv["generated"]["S"] is not None:
        (lg_,) = ax.plot(r, surv["generated"]["S"], "-", color=colors[1])
        handles.append(lg_); labels.append("gen.")
    ax.set_xscale("log")
    ax.set_yscale("log")
    if surv["reference"]["S"] is not None and surv["reference"]["N"]:
        norms_ref_max = r[np.argmax(surv["reference"]["S"] <= 0)] if (
            surv["reference"]["S"] <= 0).any() else r[-1]
        ax.set_xlim(max(r[0], 1e-12), min(norms_ref_max, 1e2))
    ax.set_xlabel("R")
    ax.set_ylabel(r"$S(R)=\mathbb{P}\left(\|\mathbf{x}\|>R\right)$")
    ax.grid(True, which="both", linestyle=":", linewidth=0.5, alpha=0.6)
    ax.set_ylim(max(ylim[0], 1e-300), ylim[1])
    if handles:
        ax.legend(handles, labels, frameon=False, loc="lower left", fontsize=7)
    plt.tight_layout()
    if save_png:
        fig.savefig(f"{prefix_save}_survival.png", bbox_inches="tight", dpi=dpi)
    plt.close(fig)
    return surv


def postprocessing(inds, xs, xtest, std_norm, std_test_plot, datatype,
                   name_simu, dimplot=2, offset_dimplot=0,
                   crop_data_plot=False, plot_crop=3, plot_xlim=3,
                   plot_ref_pdf=False, pdf_theor=None, log_scale_pdf=False,
                   columns_plot=None, scatter_plots=True,
                   denoising_plots=True, include_t0_reverse=True,
                   dpi=200, height_seaborn=1.0, ssize=1.0, lmbd=0.0,
                   val_hist=3.0, save_results=True, first_run=True,
                   mmd_inputs=None, log_fn=print):
    """Save samples, filter blow-ups, pairplots, survival plot, denoising
    strip, per-step plots, and (optionally) MMD computation.

    mmd_inputs: optional (x_train, max_num_samples) to also compute
      mmd(gen, test) and the mmd(train, test) floor (reference:
      own_plotting.py:551-566). Returns dict with nan_count, survival stats
      and mmd values (None if not requested).
    """
    xs = _np(xs)
    xgen = xs[-1]
    if save_results:
        np.save(name_simu + ".npy", xgen)

    xgen, nan_count = filter_blowups(xgen)
    if nan_count > 0:
        log_fn(f"Number of rows with NaN or large value: {nan_count}")

    if scatter_plots and first_run:
        pairplots(xgen, xtest, std_norm, std_test_plot, datatype, name_simu,
                  dimplot=dimplot, offset_dimplot=offset_dimplot,
                  crop_data_plot=crop_data_plot, plot_crop=plot_crop,
                  plot_xlim=plot_xlim, plot_ref_pdf=plot_ref_pdf,
                  pdf_theor=pdf_theor, log_scale_pdf=log_scale_pdf,
                  columns_plot=columns_plot, dpi=dpi,
                  height_seaborn=height_seaborn, ssize=ssize)

    surv = plot_survival_simple(x=xgen, x_ref=_np(xtest), std_norm=None,
                                prefix_save=name_simu, figsize=(3, 2),
                                tail_frac=0.05)

    if denoising_plots and first_run:
        stp = _np(std_test_plot)[offset_dimplot]
        fig = plot_selected_inds(xs, inds, True, False, lmbd,
                                 offset_dimplot=offset_dimplot,
                                 include_t0=include_t0_reverse,
                                 val=val_hist * stp)
        plt.savefig(name_simu + ".png")
        plt.close("all")

    plot_signal(xs, inds, name_simu + "_Gen", std_norm=std_norm,
                std_test_plot=std_test_plot, time_to_duplicate=-1)

    result = dict(nan_count=nan_count, survival=surv, mmd=None, mmd_ref=None,
                  swd=None, swd_ref=None)
    if mmd_inputs is not None:
        import jax
        import jax.numpy as jnp
        from sdeflow_tpu.eval import compute_mmd, sliced_wasserstein

        x_train, max_n = mmd_inputs
        n = min(_np(xtest).shape[0], max_n)
        n = min(n, xgen.shape[0] + 1, _np(x_train).shape[0] + 1)
        xt = jnp.asarray(_np(xtest)[: n - 1])
        xg = jnp.asarray(xgen[: n - 1])
        xtr = jnp.asarray(_np(x_train)[: n - 1])
        sn = jnp.asarray(_np(std_norm), xt.dtype)
        dist_ref = float(compute_mmd(sn * xtr, sn * xt))
        dist = float(compute_mmd(sn * xg, sn * xt))
        log_fn(f"MMD train to test = {dist_ref ** 0.5}")
        log_fn(f"MMD gen. to test = {dist ** 0.5}")
        result["mmd"] = dist
        result["mmd_ref"] = dist_ref
        # sliced Wasserstein alongside (BASELINE.md: "the rebuild will
        # report both"; reference computes MMD only,
        # quantitative_comparison.py:38-46). Fixed projection key so every
        # arm of a sweep is measured against the same direction set.
        swd_key = jax.random.PRNGKey(0)
        result["swd_ref"] = float(
            sliced_wasserstein(swd_key, sn * xtr, sn * xt)
        )
        result["swd"] = float(sliced_wasserstein(swd_key, sn * xg, sn * xt))
        log_fn(f"SWD train to test = {result['swd_ref']}")
        log_fn(f"SWD gen. to test = {result['swd']}")
    return result

from sdeflow_tpu.eval.mmd import compute_mmd, compute_kernel_mean, sliced_wasserstein
from sdeflow_tpu.eval.elbo import evaluate
from sdeflow_tpu.eval.diagnostics import forward_convergence_stats, filter_blowups
from sdeflow_tpu.eval.survival import survival_curve, tail_fit_loglog, survival_analysis
from sdeflow_tpu.eval.nll import exact_logp, nll_bits_per_dim

__all__ = [
    "compute_mmd",
    "compute_kernel_mean",
    "sliced_wasserstein",
    "evaluate",
    "forward_convergence_stats",
    "filter_blowups",
    "survival_curve",
    "tail_fit_loglog",
    "survival_analysis",
    "exact_logp",
    "nll_bits_per_dim",
]

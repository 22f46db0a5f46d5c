"""Cross-chain convergence diagnostics (Gelman-Rubin split-R̂).

No reference analog; required by BASELINE.json config 4 ("4 parallel chains,
R-hat on φ").  Operates on per-chain scalar traces (e.g. log-likelihood per
sweep, or a φ entry per save), shape ``[n_chains, n_draws]``.
"""

from __future__ import annotations

import numpy as np


def r_hat(traces: np.ndarray) -> float:
    """Split-R̂ of Gelman et al. (BDA3): values near 1.0 indicate convergence.

    ``traces``: [n_chains, n_draws]; each chain is split in half, so the
    effective chain count is 2·n_chains.
    """
    x = np.asarray(traces, dtype=np.float64)
    if x.ndim != 2:
        raise ValueError("traces must be [n_chains, n_draws]")
    n = x.shape[1] // 2
    if n < 2:
        return float("nan")
    halves = np.concatenate([x[:, :n], x[:, n : 2 * n]], axis=0)  # [2C, n]
    chain_means = halves.mean(axis=1)
    chain_vars = halves.var(axis=1, ddof=1)
    w = chain_vars.mean()                       # within-chain variance
    b = n * chain_means.var(ddof=1)             # between-chain variance
    if w <= 0:
        return 1.0 if b <= 0 else float("inf")
    var_plus = (n - 1) / n * w + b / n
    return float(np.sqrt(var_plus / w))

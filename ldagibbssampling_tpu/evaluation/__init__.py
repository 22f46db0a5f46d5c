"""Evaluation: likelihood/perplexity metrics and cross-chain diagnostics.

The reference computes **no** metrics at all (SURVEY.md §5 — its only signal is
the artifact dump); these are new obligations from BASELINE.json (held-out
perplexity, R-hat).
"""

from ldagibbssampling_tpu.evaluation.metrics import (
    heldout_perplexity,
    log_likelihood,
    perplexity,
)
from ldagibbssampling_tpu.evaluation.diagnostics import r_hat

__all__ = ["log_likelihood", "perplexity", "heldout_perplexity", "r_hat"]

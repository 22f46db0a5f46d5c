"""Inference backends behind one protocol (SURVEY.md §7 L4).

The reference implements exactly one algorithm — serial collapsed Gibbs
(``LdaModel.inferenceModel``).  The BASELINE.json north star adds stochastic
CVB0, SVI, and SMC backends; all satisfy :class:`InferenceBackend` and are
constructed via :func:`make_backend` from ``config.backend``.
"""

from ldagibbssampling_tpu.backends.base import InferenceBackend, make_backend
from ldagibbssampling_tpu.backends.cvb0 import Cvb0Model
from ldagibbssampling_tpu.backends.svi import SviModel
from ldagibbssampling_tpu.backends.smc import SmcModel
from ldagibbssampling_tpu.backends.warp import WarpModel

__all__ = [
    "InferenceBackend", "make_backend",
    "Cvb0Model", "SviModel", "SmcModel", "WarpModel",
]

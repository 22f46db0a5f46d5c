"""Device-side log-likelihood on the mesh runtimes (round-3 verdict item 5).

``--ll-every`` on a mesh run must do constant host-memory work: each runtime
exposes ``device_log_likelihood`` (shard-local chunked reductions,
``evaluation/device_metrics.shard_ll_chunks``), and the value must equal the
host ``metrics.log_likelihood`` of the same point estimates.
"""

import jax
import numpy as np
from jax.sharding import Mesh

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.evaluation.metrics import log_likelihood
from ldagibbssampling_tpu.parallel.adlda import ShardedLda
from ldagibbssampling_tpu.parallel.grid import GridLda
from ldagibbssampling_tpu.parallel.tokenshard import TokenShardedLda


def _corpus(num_docs=40, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    ragged = [
        [int(x) for x in rng.integers(0, vocab, size=int(rng.integers(10, 50)))]
        for _ in range(num_docs)
    ]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def _cfg(**kw):
    base = dict(topic_num=12, block_size=64, seed=1, use_pallas=False)
    base.update(kw)
    return LdaConfig(**base)


def _check(model, corpus):
    host = log_likelihood(model.phi(), model.theta(), corpus)
    dev = model.device_log_likelihood()
    assert abs(dev - host) / abs(host) < 1e-5
    # second call reuses the cached jitted fn and stays consistent
    assert abs(model.device_log_likelihood() - dev) < 1e-9


def test_sharded_device_ll_matches_host():
    fc = _corpus(seed=2)
    model = ShardedLda(_cfg(), fc, num_shards=4)
    model.sweep(3)
    _check(model, fc)


def test_grid_device_ll_matches_host():
    fc = _corpus(seed=3)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "vocab"))
    model = GridLda(_cfg(seed=5), fc, mesh=mesh)
    model.sweep(3)
    _check(model, fc)


def test_tokenshard_device_ll_matches_host():
    fc = _corpus(seed=4)
    model = TokenShardedLda(_cfg(seed=7), fc, num_shards=4)
    model.sweep(3)
    _check(model, fc)


def test_runner_uses_device_ll_on_mesh(tmp_path):
    # runner.py's --ll-every path must pick the device fast path (the backend
    # exposes device_log_likelihood) and log a finite LL + perplexity
    import json

    from ldagibbssampling_tpu.evaluation.tracing import MetricsLog
    from ldagibbssampling_tpu.runner import run_inference

    fc = _corpus(seed=6)
    cfg = _cfg(iteration=4, begin_save_iters=3, save_step=1)
    model = ShardedLda(cfg, fc, num_shards=2)
    mpath = tmp_path / "metrics.jsonl"
    with MetricsLog(mpath) as metrics:
        run_inference(model, cfg, fc, None, metrics=metrics, ll_every=2)
    rows = [json.loads(line) for line in mpath.read_text().splitlines()]
    lls = [r["log_likelihood"] for r in rows if "log_likelihood" in r]
    assert lls and all(np.isfinite(v) for v in lls)
    host = log_likelihood(model.phi(), model.theta(), fc)
    assert abs(lls[-1] - host) / abs(host) < 1e-5

"""Observability subsystem tests: timers, metrics log, runner/CLI wiring."""

import json

import numpy as np

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.evaluation.tracing import (
    MetricsLog,
    SweepTimer,
    read_metrics,
)


def _corpus(seed=0, docs=12, vocab=25):
    rng = np.random.default_rng(seed)
    ragged = [[int(x) for x in rng.integers(0, vocab, size=15)] for _ in range(docs)]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def test_sweep_timer_counts_and_rate():
    t = SweepTimer(num_tokens=1000)
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["sweeps"] == 3
    assert s["tokens_per_s"] > 0
    assert t.last_tokens_per_s > 0


def test_metrics_log_roundtrip(tmp_path):
    p = tmp_path / "m.jsonl"
    with MetricsLog(p) as log:
        log.log(0, tokens_per_s=123.0, note="hi", skipme=None)
        log.log(1, log_likelihood=-42.5)
    recs = read_metrics(p)
    assert [r["sweep"] for r in recs] == [0, 1]
    assert recs[0]["tokens_per_s"] == 123.0
    assert "skipme" not in recs[0]
    assert recs[1]["log_likelihood"] == -42.5


def test_read_metrics_skips_garbage(tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text('{"sweep": 0}\nnot json\n\n{"sweep": 1}\n')
    assert len(read_metrics(p)) == 2


def test_runner_emits_metrics_and_optimizes_hyper(tmp_path):
    from ldagibbssampling_tpu.models.lda import LdaModel
    from ldagibbssampling_tpu.runner import run_inference

    corpus = _corpus()
    cfg = LdaConfig(topic_num=4, iteration=6, begin_save_iters=5, save_step=1,
                    seed=0, block_size=32)
    model = LdaModel(cfg, corpus)
    a0, b0 = model.alpha, model.beta
    p = tmp_path / "metrics.jsonl"
    with MetricsLog(p) as metrics:
        run_inference(model, cfg, corpus, result_dir=None, metrics=metrics,
                      ll_every=2, optimize_hyper_every=3)
    recs = read_metrics(p)
    # one header row (effective kernel tier) + one row per sweep
    assert len(recs) == 7
    assert recs[0]["requested_tier"] == "deferred"
    assert recs[0]["kernel_tier"] in ("xla", "fused", "deferred")
    recs = recs[1:]
    assert all("tokens_per_s" in r for r in recs)
    # LL logged on sweeps 2, 4, 6 (1-indexed) -> records 1, 3, 5
    assert "log_likelihood" in recs[1] and "perplexity" in recs[1]
    assert "log_likelihood" not in recs[0]
    # Minka moved the hyperparameters off their initial values
    assert (model.alpha, model.beta) != (a0, b0)
    assert model.alpha > 0 and model.beta > 0
    # live values are what metrics recorded
    assert recs[-1]["alpha"] == model.alpha


def test_cli_metrics_flag(tmp_path):
    from ldagibbssampling_tpu.cli import main
    from ldagibbssampling_tpu.data import write_minicorpus

    docs = tmp_path / "docs"
    write_minicorpus(docs, num_docs=8)
    mfile = tmp_path / "metrics.jsonl"
    rc = main([
        "--docs", str(docs), "--no-save", "-k", "3", "--iterations", "4",
        "--metrics-file", str(mfile), "--ll-every", "2", "--seed", "1",
    ])
    assert rc == 0
    recs = read_metrics(mfile)
    assert len(recs) == 5  # tier header + one row per sweep
    recs = recs[1:]
    assert "log_likelihood" in recs[1]


def test_hyper_optimization_reasonable_on_skewed_corpus():
    """α should shrink when documents are single-topic-concentrated."""
    from ldagibbssampling_tpu.models.lda import LdaModel

    rng = np.random.default_rng(7)
    # each doc uses words from a narrow band -> concentrated topics
    ragged = []
    for m in range(16):
        base = (m % 4) * 10
        ragged.append([int(base + x) for x in rng.integers(0, 10, size=30)])
    corpus = FlatCorpus.from_ragged(ragged, vocab_size=40)
    cfg = LdaConfig(topic_num=4, seed=0, block_size=64, alpha=5.0)
    model = LdaModel(cfg, corpus)
    model.sweep(20)
    a, b = model.optimize_hyperparameters()
    assert a < 5.0  # concentrated docs pull alpha down from a large start

"""chains×data composition from the product surface (round-3 verdict item 7).

``--mesh chain=2,data=4 --chains 2`` must run from the CLI on the virtual
CPU mesh, with R̂ diagnostics in the metrics log and Minka/checkpoint hooks
working like the sibling mesh runtimes.
"""

import json

import numpy as np

from ldagibbssampling_tpu.backends import make_backend
from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.parallel.chaingrid import ShardedChainModel


def _corpus(num_docs=24, vocab=40, seed=0):
    rng = np.random.default_rng(seed)
    ragged = [
        [int(x) for x in rng.integers(0, vocab, size=int(rng.integers(8, 30)))]
        for _ in range(num_docs)
    ]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def test_mesh_backend_routes_chain_data():
    cfg = LdaConfig(topic_num=6, block_size=32, chains=2, use_pallas=False,
                    mesh={"chain": 2, "data": 4})
    model = make_backend(cfg, _corpus())
    assert isinstance(model, ShardedChainModel)
    model.sweep(2)
    assert model.sweeps_done == 2
    model.check_counts_consistent()
    np.testing.assert_allclose(model.phi().sum(axis=1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(model.theta().sum(axis=1), 1.0, rtol=1e-6)
    # z export is in corpus order (tassign contract)
    z = model.z()
    assert z.shape == (model.corpus.num_tokens,)


def test_chain_mesh_minka_and_checkpoint(tmp_path):
    fc = _corpus(seed=5)
    cfg = LdaConfig(topic_num=6, block_size=32, chains=2, use_pallas=False,
                    mesh={"chain": 2, "data": 2})
    model = make_backend(cfg, fc)
    model.sweep(2)
    a, b = model.optimize_hyperparameters()
    assert 0 < a < 10 and 0 < b < 10
    assert (a, b) != (cfg.alpha, cfg.beta)
    model.save_checkpoint(tmp_path)
    model.sweep(1)
    z_after = model.z().copy()

    m2 = make_backend(cfg, fc)
    assert m2.restore_checkpoint(tmp_path) == 2
    m2.chains.alpha, m2.chains.beta = a, b
    m2.sweep(1)
    np.testing.assert_array_equal(m2.z(), z_after)


def test_chain_mesh_cli_end_to_end(tmp_path):
    from ldagibbssampling_tpu.cli import main as cli_main
    from ldagibbssampling_tpu.data import write_minicorpus

    docs = tmp_path / "docs"
    write_minicorpus(docs, num_docs=12)
    metrics = tmp_path / "metrics.jsonl"
    rc = cli_main([
        "--docs", str(docs), "--results", str(tmp_path / "out"),
        "--topics", "5", "--iterations", "8", "--begin-save-iters", "6",
        "--save-step", "2", "--block-size", "32", "--pallas", "0",
        "--chains", "2", "--mesh", "chain=2,data=4",
        "--metrics-file", str(metrics), "--ll-every", "2",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "lda_8.twords").exists()
    rows = [json.loads(x) for x in metrics.read_text().splitlines()]
    assert any("r_hat" in r for r in rows)


def test_chain_mesh_conflicting_chain_count():
    import pytest

    cfg = LdaConfig(topic_num=6, block_size=32, chains=3, use_pallas=False,
                    mesh={"chain": 2, "data": 2})
    with pytest.raises(ValueError, match="conflicts"):
        make_backend(cfg, _corpus())


def test_chain_mesh_metrics_log_rhat_phi(tmp_path):
    # runner logs the topic-aligned R-hat(phi) p99 on the --ll-every cadence
    import json

    from ldagibbssampling_tpu.evaluation.tracing import MetricsLog
    from ldagibbssampling_tpu.runner import run_inference

    fc = _corpus(seed=23)
    cfg = LdaConfig(topic_num=5, block_size=32, chains=2, use_pallas=False,
                    iteration=10, begin_save_iters=9, save_step=1,
                    mesh={"chain": 2, "data": 4})
    model = make_backend(cfg, fc)
    mpath = tmp_path / "m.jsonl"
    with MetricsLog(mpath) as metrics:
        run_inference(model, cfg, fc, None, metrics=metrics, ll_every=2)
    rows = [json.loads(x) for x in mpath.read_text().splitlines()]
    assert any("r_hat_phi_p99" in r for r in rows)

"""Multi-host topology helpers + multi-chain backend/CLI wiring tests."""

import jax
import numpy as np
import pytest

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.parallel.multihost import (
    HostTopology,
    initialize_distributed,
    make_mesh,
    mesh_from_config,
)


def _corpus(seed=0):
    rng = np.random.default_rng(seed)
    ragged = [[int(x) for x in rng.integers(0, 30, size=18)] for _ in range(12)]
    return FlatCorpus.from_ragged(ragged, vocab_size=30)


# ---------------------------------------------------------------- multihost


def test_initialize_distributed_single_host_noop():
    topo = initialize_distributed()
    assert isinstance(topo, HostTopology)
    assert topo.process_count == 1
    assert topo.global_device_count == len(jax.devices())


def test_make_mesh_explicit_and_wildcard():
    n = len(jax.devices())
    if n < 8:
        pytest.skip("need 8 devices")
    mesh = make_mesh({"data": 4, "vocab": 2})
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "vocab")
    mesh = make_mesh({"data": -1, "vocab": 2})
    assert mesh.devices.shape == (4, 2)


def test_make_mesh_errors():
    with pytest.raises(ValueError):
        make_mesh({"a": -1, "b": -1})
    with pytest.raises(ValueError):
        make_mesh({"a": 3, "b": 5})  # 15 != 8 devices


def test_mesh_from_config():
    cfg = LdaConfig(mesh={"data": -1})
    mesh = mesh_from_config(cfg)
    assert mesh.devices.size == len(jax.devices())
    cfg2 = LdaConfig()
    mesh2 = mesh_from_config(cfg2)
    assert mesh2.axis_names == ("data",)


# ---------------------------------------------------------------- chains


def test_make_backend_selects_multichain():
    from ldagibbssampling_tpu.backends import make_backend
    from ldagibbssampling_tpu.models.chains import MultiChainModel

    corpus = _corpus()
    model = make_backend(LdaConfig(topic_num=4, chains=3, block_size=32), corpus)
    assert isinstance(model, MultiChainModel)
    model.sweep(5)
    assert model.sweeps_done == 5
    assert np.isfinite(model.r_hat())
    phi, theta = model.phi(), model.theta()
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, rtol=1e-5)
    assert model.z().shape == (corpus.num_tokens,)


def test_cli_chains_logs_rhat(tmp_path, monkeypatch):
    from ldagibbssampling_tpu.cli import main
    from ldagibbssampling_tpu.data import write_minicorpus
    from ldagibbssampling_tpu.evaluation.tracing import read_metrics

    monkeypatch.chdir(tmp_path)
    write_minicorpus("docs", num_docs=8)
    rc = main(["--docs", "docs", "--no-save", "-k", "3", "--iterations", "6",
               "--chains", "3", "--metrics-file", "m.jsonl", "--seed", "2"])
    assert rc == 0
    recs = read_metrics("m.jsonl")
    assert len(recs) == 7  # tier header + one row per sweep
    assert recs[0]["kernel_tier"] == "xla"  # multi-chain runs the XLA vmap
    recs = recs[1:]
    assert any("r_hat" in r for r in recs)  # needs >=4 recorded sweeps

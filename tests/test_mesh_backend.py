"""config.mesh-driven runtime selection + chunked-sweep schedule equivalence.

The mesh knob maps onto the parallel runtimes (``backends/base._mesh_backend``)
so the CLI can drive multi-device runs; the runner batches sweeps between
schedule boundaries into one dispatch (SURVEY.md §2.3 / the ~300ms-per-
shard_map-dispatch platform note in parallel/adlda.py).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ldagibbssampling_tpu.backends import make_backend  # noqa: E402
from ldagibbssampling_tpu.config import LdaConfig  # noqa: E402
from ldagibbssampling_tpu.corpus.flat import FlatCorpus  # noqa: E402
from ldagibbssampling_tpu.models.lda import LdaModel  # noqa: E402
from ldagibbssampling_tpu.parallel.adlda import ShardedLda  # noqa: E402
from ldagibbssampling_tpu.parallel.grid import GridLda  # noqa: E402
from ldagibbssampling_tpu.parallel.tokenshard import TokenShardedLda  # noqa: E402


def _corpus(num_docs=32, vocab=48, seed=0):
    rng = np.random.default_rng(seed)
    ragged = [
        [int(x) for x in rng.integers(0, vocab, size=int(rng.integers(5, 30)))]
        for _ in range(num_docs)
    ]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def test_mesh_selects_adlda():
    m = make_backend(LdaConfig(topic_num=5, block_size=16,
                               mesh={"data": 4}), _corpus())
    assert isinstance(m, ShardedLda)
    m.sweep(2)
    m.check_counts_consistent()
    assert m.sweeps_done == 2


def test_mesh_selects_grid():
    m = make_backend(LdaConfig(topic_num=5, block_size=16,
                               mesh={"data": 2, "vocab": 2}), _corpus())
    assert isinstance(m, GridLda)
    m.sweep(1)
    m.check_counts_consistent()


def test_mesh_selects_tokenshard():
    m = make_backend(LdaConfig(topic_num=5, block_size=16,
                               mesh={"token": 4}), _corpus())
    assert isinstance(m, TokenShardedLda)
    m.sweep(1)
    m.check_counts_consistent()


def test_mesh_wildcard_uses_all_devices():
    m = make_backend(LdaConfig(topic_num=5, block_size=16,
                               mesh={"data": -1}), _corpus())
    assert isinstance(m, ShardedLda)
    assert m.mesh.devices.size == len(jax.devices())


def test_mesh_unknown_axes_rejected():
    with pytest.raises(ValueError, match="unsupported mesh"):
        make_backend(LdaConfig(topic_num=5, mesh={"pipeline": 2}), _corpus())


def test_empty_mesh_is_single_device():
    m = make_backend(LdaConfig(topic_num=5, block_size=16), _corpus())
    assert isinstance(m, LdaModel)


def test_cli_mesh_flag_parses():
    from ldagibbssampling_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args(["--mesh", "data=2,vocab=2"])
    cfg = config_from_args(args)
    assert cfg.mesh == {"data": 2, "vocab": 2}


def test_chunked_runner_matches_per_sweep_schedule(tmp_path):
    """Batched dispatch must produce the identical artifact set and identical
    chains as the per-sweep loop (same seed, same save schedule)."""
    from ldagibbssampling_tpu.runner import run_inference

    fc = _corpus(seed=3)
    cfg = LdaConfig(topic_num=5, block_size=64, seed=7, iteration=12,
                    save_step=4, begin_save_iters=4, use_pallas=False)

    out_a = tmp_path / "chunked"
    backend = make_backend(cfg, fc)
    lines = []
    run_inference(backend, cfg, fc, out_a, progress=lines.append)
    # stdout parity: one progress call per iteration despite batching
    assert lines == list(range(12))
    # loop-top schedule (reference inferenceModel): saves fire at i = 4, 8
    saves = sorted(p.name for p in out_a.glob("lda_*.phi"))
    assert saves == ["lda_4.phi", "lda_8.phi"]

    # same chain as stepping manually sweep-by-sweep
    manual = make_backend(cfg, fc)
    for _ in range(12):
        manual.sweep(1)
    np.testing.assert_array_equal(backend.z(), manual.z())

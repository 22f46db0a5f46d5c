"""Parallel runtime: document-sharded AD-LDA over a device mesh.

The reference is single-threaded (SURVEY.md §2.3 — no parallelism of any
kind); this package is the new-framework obligation: docs shard across chips,
each shard sweeps against a stale replica of the global word-topic table, and
per-sweep deltas reconcile via ``psum`` over the mesh (AD-LDA).
"""

from ldagibbssampling_tpu.parallel.sharding import CorpusShards, shard_corpus
from ldagibbssampling_tpu.parallel.adlda import ShardedLda, make_sharded_sweep_fn

__all__ = ["CorpusShards", "shard_corpus", "ShardedLda", "make_sharded_sweep_fn"]

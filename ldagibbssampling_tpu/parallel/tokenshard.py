"""Token-sharded collapsed Gibbs — the sequence-parallel analog (SURVEY.md §2.3 SP).

AD-LDA (``parallel/adlda.py``) assigns documents whole, so one multi-million-
token document pins a shard.  Here the flat token stream is split EVENLY
across the ``data`` axis regardless of document boundaries: a giant document's
tokens land on many chips and its ``ndk`` row becomes a psum-reduced partial.
Cheap because LDA's counts are sufficient statistics — there is no sequential
dependence between a document's tokens beyond the count tables themselves.

Layout: token ids keep GLOBAL doc ids; both ``ndk [M, K]`` and ``nwk [V, K]``
are per-shard replicas reconciled with one ``psum`` of deltas per sweep (the
same staleness approximation as AD-LDA, on both tables).  Perfect token
balance by construction — the trade is ndk replica memory + an M·K psum.

Reference anchor for preserved semantics: ``LdaModel.sampleTopicZ``
(SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.models.state import SamplerState
from ldagibbssampling_tpu.ops.gibbs import gibbs_sweep

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def split_tokens(corpus: FlatCorpus, num_shards: int, block_size: int = 1):
    """Even contiguous split of the token stream, each shard block-padded.

    Returns int32 arrays ``token_word/token_doc/token_mask [P, T_s]`` with
    GLOBAL doc ids.  Contiguous ranges keep the reference's systematic scan
    order within each shard.
    """
    t = corpus.num_tokens
    per = -(-max(t, 1) // num_shards)  # ceil
    t_s = ((per + block_size - 1) // block_size) * block_size
    tw = np.zeros((num_shards, t_s), dtype=np.int32)
    td = np.zeros((num_shards, t_s), dtype=np.int32)
    tm = np.zeros((num_shards, t_s), dtype=np.int32)
    for p in range(num_shards):
        lo = min(p * per, t)
        hi = min(lo + per, t)
        n = hi - lo
        tw[p, :n] = corpus.token_word[lo:hi]
        td[p, :n] = corpus.token_doc[lo:hi]
        tm[p, :n] = 1
    return tw, td, tm


class TokenShardedLda:
    """Token-stream-sharded Gibbs over a 1D ``data`` mesh (giant-doc mode)."""

    def __init__(
        self,
        config: LdaConfig,
        corpus: FlatCorpus,
        mesh: Optional[Mesh] = None,
        num_shards: Optional[int] = None,
        axis: str = "data",
    ) -> None:
        if mesh is None:
            devs = jax.devices()
            n = num_shards or len(devs)
            mesh = Mesh(np.array(devs[:n]), (axis,))
        self.mesh = mesh
        self.axis = axis
        self.config = config
        self.corpus = corpus
        p = mesh.devices.size
        block = max(1, config.block_size)
        tw, td, tm = split_tokens(corpus, p, block_size=block)
        block = min(block, tw.shape[1])
        self.block_size = block
        self._sorted = bool(getattr(config, "sort_blocks", False)) and block > 1
        if self._sorted:
            from ldagibbssampling_tpu.parallel.sharding import sort_blocks_inplace

            sort_blocks_inplace(tw, td, tm, block_size=block)
        self._tw, self._td, self._tm = tw, td, tm
        self.doc_lengths = corpus.doc_lengths()

        k = config.topic_num
        v = corpus.vocab_size
        m = corpus.num_docs
        root = jax.random.PRNGKey(config.seed)
        init_key, self._key = jax.random.split(root)
        z = np.asarray(jax.random.randint(init_key, tw.shape, 0, k, jnp.int32))
        mask = tm.astype(bool)
        ndk = np.zeros((m, k), dtype=np.int32)
        nwk = np.zeros((v, k), dtype=np.int32)
        np.add.at(ndk, (td[mask], z[mask]), 1)
        np.add.at(nwk, (tw[mask], z[mask]), 1)
        nk = nwk.sum(axis=0, dtype=np.int32)

        shard = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        self.z = jax.device_put(jnp.asarray(z), shard)
        self.ndk = jax.device_put(jnp.asarray(ndk), repl)
        self.nwk = jax.device_put(jnp.asarray(nwk), repl)
        self.nk = jax.device_put(jnp.asarray(nk), repl)
        self.sweep_idx = jnp.int32(0)

        shard_sh = NamedSharding(mesh, P(axis))
        repl_sh = NamedSharding(mesh, P())
        dl = jax.device_put(jnp.asarray(self.doc_lengths), repl_sh)
        twj = jax.device_put(jnp.asarray(tw), shard_sh)
        tdj = jax.device_put(jnp.asarray(td), shard_sh)
        tmj = jax.device_put(jnp.asarray(tm), shard_sh)
        alpha, beta = config.alpha, config.beta
        draw = config.draw_method
        bsz = block
        sorted_flag = self._sorted

        def local_sweep(tw, td, dlr, tm, z, ndk, nwk, nk, key, sweep, n_sweeps,
                        alpha_t, beta_t):
            tw, td, tm = tw[0], td[0], tm[0]
            shard_key = jax.random.fold_in(key, lax.axis_index(axis))

            def one(_, carry):
                z, ndk, nwk, nk, sweep = carry
                state = SamplerState(z=z, ndk=ndk, nwk=nwk, nk=nk,
                                     key=shard_key, sweep=sweep)
                new = gibbs_sweep(
                    state, tw, td, tm, dlr,
                    alpha=alpha_t, beta=beta_t, block_size=bsz, draw_method=draw,
                    sorted_words=sorted_flag,
                )
                # both tables are replicas here: psum deltas for each
                dndk = lax.psum(new.ndk - ndk, axis)
                dnwk = lax.psum(new.nwk - nwk, axis)
                dnk = lax.psum(new.nk - nk, axis)
                return new.z, ndk + dndk, nwk + dnwk, nk + dnk, new.sweep

            # traced bound: one dispatch per batch of sweeps (see adlda.py)
            z, ndk, nwk, nk, sweep = lax.fori_loop(
                0, n_sweeps, one, (z[0], ndk, nwk, nk, sweep)
            )
            return z[None], ndk, nwk, nk, sweep

        fn = shard_map(
            local_sweep,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(axis),
                      P(axis), P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(axis), P(), P(), P(), P()),
            check_vma=False,
        )

        run_impl = jax.jit(fn)
        # live hyperparameters (Minka optimization moves them; traced scalars
        # so updates never recompile)
        self.alpha = float(config.alpha)
        self.beta = float(config.beta)

        def run(z, ndk, nwk, nk, key, sweep, n_sweeps=1, alpha_v=None, beta_v=None):
            a = jnp.float32(self.alpha if alpha_v is None else alpha_v)
            b = jnp.float32(self.beta if beta_v is None else beta_v)
            return run_impl(twj, tdj, dl, tmj, z, ndk, nwk, nk, key, sweep,
                            jnp.int32(n_sweeps), a, b)

        self._sweep_fn = run

    # ------------------------------------------------------------------
    def sweep(self, n: int = 1) -> None:
        # one dispatch for the whole batch (traced fori bound)
        self.z, self.ndk, self.nwk, self.nk, self.sweep_idx = self._sweep_fn(
            self.z, self.ndk, self.nwk, self.nk, self._key, self.sweep_idx,
            n_sweeps=n, alpha_v=self.alpha, beta_v=self.beta,
        )

    def optimize_hyperparameters(self, iters: int = 5) -> tuple[float, float]:
        """Minka (α, β); both tables are replicated in this runtime, so the
        single-chip fixed-point updates apply directly (no collectives)."""
        from ldagibbssampling_tpu.models.hyper import optimize_alpha, optimize_beta

        self.alpha = float(optimize_alpha(
            self.ndk, jnp.asarray(self.doc_lengths), self.alpha, iters=iters))
        self.beta = float(optimize_beta(self.nwk, self.nk, self.beta, iters=iters))
        return self.alpha, self.beta

    # ------------------------------------------------------------------
    def device_log_likelihood(self) -> float:
        """Training LL with shard-local chunked device passes; tokens keep
        GLOBAL doc ids here and both tables are replicas, so each shard
        reduces its contiguous token range directly (host f64 sum of the
        per-shard chunk partials)."""
        if not hasattr(self, "_ll_fn"):
            from ldagibbssampling_tpu.evaluation.device_metrics import (
                shard_ll_chunks)

            shard_sh = NamedSharding(self.mesh, P(self.axis))
            repl_sh = NamedSharding(self.mesh, P())
            tw = jax.device_put(jnp.asarray(self._tw), shard_sh)
            td = jax.device_put(jnp.asarray(self._td), shard_sh)
            tm = jax.device_put(jnp.asarray(self._tm), shard_sh)
            dl = jax.device_put(jnp.asarray(self.doc_lengths), repl_sh)

            def local(tw, td, tm, dl, ndk, nwk, nk, a, b):
                chunks = shard_ll_chunks(
                    ndk, nwk, nk, tw[0], td[0], tm[0], dl, a, b)
                return chunks[None]

            fn = shard_map(
                local, mesh=self.mesh,
                in_specs=(P(self.axis),) * 3 + (P(), P(), P(), P(), P(), P()),
                out_specs=P(self.axis),
                check_vma=False,
            )
            impl = jax.jit(fn)
            self._ll_fn = lambda ndk, nwk, nk, a, b: impl(
                tw, td, tm, dl, ndk, nwk, nk, a, b)
        chunks = self._ll_fn(
            self.ndk, self.nwk, self.nk,
            jnp.float32(self.alpha), jnp.float32(self.beta))
        return float(np.asarray(chunks, np.float64).sum())

    # ------------------------------------------------------------------
    def _ckpt_arrays(self) -> dict:
        return {"z": self.z, "ndk": self.ndk, "nwk": self.nwk, "nk": self.nk,
                "key": self._key, "sweep": self.sweep_idx}

    def save_checkpoint(self, directory) -> int:
        """Orbax checkpoint of the token-sharded run."""
        from ldagibbssampling_tpu.lda_io.checkpoint import save_mesh_run

        return save_mesh_run(directory, self._ckpt_arrays(), self.alpha,
                             self.beta, int(self.sweep_idx))

    def restore_checkpoint(self, directory) -> int:
        """Resume from the latest checkpoint (same mesh topology)."""
        from ldagibbssampling_tpu.lda_io.checkpoint import restore_mesh_run

        arrays, self.alpha, self.beta = restore_mesh_run(
            directory, self._ckpt_arrays())
        self.z, self.ndk, self.nwk, self.nk = (
            arrays["z"], arrays["ndk"], arrays["nwk"], arrays["nk"])
        # orbax restores unsharded leaves committed to one device; re-place
        # them replicated on the mesh so they compose with sharded args
        repl = NamedSharding(self.mesh, P())
        self._key = jax.device_put(arrays["key"], repl)
        self.sweep_idx = jax.device_put(arrays["sweep"], repl)
        return int(self.sweep_idx)

    @property
    def sweeps_done(self) -> int:
        return int(self.sweep_idx)

    # ------------------------------------------------------------------
    def phi(self) -> np.ndarray:
        nwk = np.asarray(self.nwk, dtype=np.float64)
        nk = np.asarray(self.nk, dtype=np.float64)
        v = nwk.shape[0]
        return ((nwk + self.beta) / (nk + v * self.beta)).T

    def theta(self) -> np.ndarray:
        ndk = np.asarray(self.ndk, dtype=np.float64)
        k = ndk.shape[1]
        return (ndk + self.alpha) / (
            self.doc_lengths[:, None] + k * self.alpha
        )

    # ------------------------------------------------------------------
    def check_counts_consistent(self) -> None:
        """Recompute all tables serially from ``z`` and compare."""
        z = np.asarray(self.z)
        mask = self._tm.astype(bool)
        k = self.config.topic_num
        ndk_ref = np.zeros((self.corpus.num_docs, k), dtype=np.int64)
        nwk_ref = np.zeros((self.corpus.vocab_size, k), dtype=np.int64)
        np.add.at(ndk_ref, (self._td[mask], z[mask]), 1)
        np.add.at(nwk_ref, (self._tw[mask], z[mask]), 1)
        np.testing.assert_array_equal(np.asarray(self.ndk), ndk_ref)
        np.testing.assert_array_equal(np.asarray(self.nwk), nwk_ref)
        np.testing.assert_array_equal(np.asarray(self.nk), nwk_ref.sum(axis=0))

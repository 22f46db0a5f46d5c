"""Chains × data composition: independent Gibbs chains, each doc-sharded.

Proves the composition row of docs/PARALLELISM.md (SURVEY.md §2.3 chain row):
a 2D ``('chain', 'data')`` mesh where the chain axis is embarrassingly
parallel (zero collectives between chains) and, WITHIN each chain, documents
are sharded AD-LDA style with the usual per-sweep ``psum`` of word-topic
deltas over the ``data`` axis only.  One ``shard_map`` program covers both
axes; XLA compiles the data-axis psum so it never crosses chain boundaries.

Reference anchor for the preserved semantics: ``LdaModel.sampleTopicZ``
(SURVEY.md §3.3); convergence diagnostics per BASELINE config 4.
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
from ldagibbssampling_tpu.parallel.sharding import shard_corpus

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


class ShardedChainSet:
    """``num_chains`` independent AD-LDA runs on a ('chain', 'data') mesh."""

    def __init__(
        self,
        config: LdaConfig,
        corpus: FlatCorpus,
        num_chains: int = 2,
        num_shards: Optional[int] = None,
        mesh: Optional[Mesh] = None,
    ) -> None:
        if mesh is None:
            devs = jax.devices()
            p = num_shards or max(1, len(devs) // num_chains)
            if num_chains * p > len(devs):
                raise ValueError(
                    f"{num_chains} chains x {p} shards > {len(devs)} devices"
                )
            mesh = Mesh(
                np.array(devs[: num_chains * p]).reshape(num_chains, p),
                ("chain", "data"),
            )
        self.mesh = mesh
        c, p = mesh.devices.shape
        self.num_chains = c
        self.config = config
        self.corpus = corpus
        block = max(1, config.block_size)
        self.shards = shard_corpus(corpus, p, block_size=block)
        block = min(block, self.shards.tokens_per_shard)
        self.block_size = block

        # kernel tier: the deferred-nwk fast path re-lays out each shard's
        # token stream (stripe-aligned blocks), so it must be resolved BEFORE
        # state init — same contract as parallel/adlda.ShardedLda
        from ldagibbssampling_tpu.ops.gibbs import warn_tier_downgrade
        from ldagibbssampling_tpu.parallel.adlda import deferred_shard_layout

        use_pallas = getattr(config, "use_pallas", False)
        interpret = bool(getattr(config, "pallas_interpret", False))
        self._interpret = interpret
        if use_pallas == "fused":
            use_pallas = "deferred"  # chain runtime has no separate fused tier
        elif use_pallas is True:
            warn_tier_downgrade(
                True, False,
                "chain runtime supports tiers {0, deferred}; v1 draw kernel "
                "not wired here")
            use_pallas = False
        if use_pallas == "deferred" and config.draw_method != "gumbel":
            warn_tier_downgrade(
                use_pallas, False,
                f"draw_method {config.draw_method!r} needs the XLA sweep")
            use_pallas = False
        if use_pallas and jax.default_backend() != "tpu" and not interpret:
            warn_tier_downgrade(
                use_pallas, False,
                f"platform is {jax.default_backend()!r}, not tpu")
            use_pallas = False
        if use_pallas and block < 128:
            warn_tier_downgrade(
                use_pallas, False, f"block_size {block} < 128 (no Mosaic tile)")
            use_pallas = False
        self._dlayout = None
        if use_pallas == "deferred":
            layout, reason = deferred_shard_layout(
                self.shards, block, config.topic_num)
            if layout is None:
                warn_tier_downgrade("deferred", False, reason)
                use_pallas = False
            else:
                self.shards, self._dlayout = layout
        self._use_pallas = use_pallas

        k = config.topic_num
        v = corpus.vocab_size
        m_s = self.shards.docs_per_shard
        t_s = self.shards.tokens_per_shard
        mask = self.shards.token_mask.astype(bool)

        root = jax.random.PRNGKey(config.seed)
        self._key = jax.random.fold_in(root, 1)
        z = np.empty((c, p, t_s), np.int32)
        ndk = np.zeros((c, p, m_s, k), np.int32)
        nwk = np.zeros((c, v, k), np.int32)
        from ldagibbssampling_tpu.models.state import host_randint

        for ci in range(c):
            zc = host_randint(jax.random.fold_in(root, 1000 + ci),
                              self.shards.token_word.shape, k)
            z[ci] = zc
            for s in range(p):
                np.add.at(ndk[ci, s],
                          (self.shards.token_doc[s][mask[s]], zc[s][mask[s]]), 1)
                np.add.at(nwk[ci],
                          (self.shards.token_word[s][mask[s]], zc[s][mask[s]]), 1)
        nk = nwk.sum(axis=1, dtype=np.int32)

        spec = lambda *ax: NamedSharding(mesh, P(*ax))  # noqa: E731
        self.z = jax.device_put(jnp.asarray(z), spec("chain", "data"))
        self.ndk = jax.device_put(jnp.asarray(ndk), spec("chain", "data"))
        self.nwk = jax.device_put(jnp.asarray(nwk), spec("chain"))
        self.nk = jax.device_put(jnp.asarray(nk), spec("chain"))
        # committed replicated scalar (matches the pinned output sharding)
        self.sweep_idx = jax.device_put(jnp.int32(0), spec())

        # tokens replicated over 'chain', sharded over 'data'
        tok = spec("data")
        tw = jax.device_put(jnp.asarray(self.shards.token_word), tok)
        td = jax.device_put(jnp.asarray(self.shards.token_doc), tok)
        tm = jax.device_put(jnp.asarray(self.shards.token_mask), tok)
        dl = jax.device_put(jnp.asarray(self.shards.doc_lengths), tok)
        self._dl_sharded = dl
        # live hyperparameters (Minka moves them; sweeps trace them)
        self.alpha = float(config.alpha)
        self.beta = float(config.beta)

        if self._dlayout is not None:
            # deferred-nwk tier: each (chain, shard) cell samples against its
            # chain's sweep-stale replica snapshot, rebuilds its LOCAL
            # word-topic table on the MXU (ops/count_kernel.build_nwk), and
            # the chain's global table is one psum of the local tables over
            # 'data' ONLY — zero collectives between chains (same
            # reconciliation contract as adlda._make_deferred_sharded_sweep_fn)
            from ldagibbssampling_tpu.ops.count_kernel import replicate_rows
            from ldagibbssampling_tpu.ops.gibbs import deferred_local_counts

            lay = self._dlayout
            nt, tile = lay["num_tiles"], lay["tile"]
            d_loc, row_tile = lay["d_loc"], lay["row_tile"]
            v_loc, v_pad = lay["v_loc"], lay["v_pad"]
            slab_split = lay["slab_split"]
            noise_mode = "external" if interpret else "internal"
            tdl = jax.device_put(jnp.asarray(lay["d_local"]), tok)
            jd0 = jax.device_put(jnp.asarray(lay["d0"]), tok)
            jrg = jax.device_put(jnp.asarray(lay["row_gather_idx"]), tok)
            jwl = jax.device_put(
                jnp.asarray(lay["w_local"].reshape(p, nt, tile)), tok)
            jts = jax.device_put(jnp.asarray(lay["tile_stripe"]), tok)

            def local_def(tw, tm, tdl, jd0, jrg, jwl, jts, z, ndk, nwk, nk,
                          key, sweep, n_sweeps, alpha_t, beta_t):
                tw, tm, tdl = tw[0], tm[0], tdl[0]
                d0_, rg_, ts_ = jd0[0], jrg[0], jts[0]
                wl8 = replicate_rows(jwl[0])  # lane-major, built on device
                ci = lax.axis_index("chain")
                si = lax.axis_index("data")
                cell_key = jax.random.fold_in(jax.random.fold_in(key, ci), si)

                def one(_, carry):
                    z, ndk, nwk, nk, sweep = carry
                    st = SamplerState(z=z, ndk=ndk, nwk=nwk, nk=nk,
                                      key=cell_key, sweep=sweep)
                    z2, ndk2, local_counts, _, _ = deferred_local_counts(
                        st, tw, tdl, tm, d0_, rg_, wl8, ts_, alpha_t, beta_t,
                        block_size=block, d_loc=d_loc, row_tile=row_tile,
                        noise_mode=noise_mode, pallas_interpret=interpret,
                        vocab_size=None, v_loc=v_loc, v_pad=v_pad, tile=tile,
                        slab_split=slab_split,
                    )
                    # chain-global counts = psum of shard-local tables
                    nwk2 = lax.psum(local_counts, "data").astype(nwk.dtype)
                    nk2 = jnp.sum(nwk2, axis=0)
                    return z2, ndk2, nwk2, nk2, sweep + 1

                z, ndk, nwk, nk, sweep = lax.fori_loop(
                    0, n_sweeps, one, (z[0, 0], ndk[0, 0], nwk[0], nk[0], sweep)
                )
                return z[None, None], ndk[None, None], nwk[None], nk[None], sweep

            fn = shard_map(
                local_def, mesh=mesh,
                in_specs=(P("data"),) * 7 + (
                    P("chain", "data"), P("chain", "data"),
                    P("chain"), P("chain"), P(), P(), P(), P(), P()),
                out_specs=(P("chain", "data"), P("chain", "data"),
                           P("chain"), P("chain"), P()),
                check_vma=False,
            )
            run_impl = jax.jit(fn, out_shardings=(
                spec("chain", "data"), spec("chain", "data"),
                spec("chain"), spec("chain"), spec()))

            def run(z, ndk, nwk, nk, key, sweep, n_sweeps=1, alpha_v=None,
                    beta_v=None):
                a = jnp.float32(self.alpha if alpha_v is None else alpha_v)
                b = jnp.float32(self.beta if beta_v is None else beta_v)
                return run_impl(tw, tm, tdl, jd0, jrg, jwl, jts,
                                z, ndk, nwk, nk, key, sweep,
                                jnp.int32(n_sweeps), a, b)

            self._sweep_fn = run
            self.kernel_tier = "deferred"
        else:
            def local(tw, td, tm, dl, z, ndk, nwk, nk, key, sweep, n_sweeps,
                      alpha_t, beta_t):
                tw, td, tm, dl = tw[0], td[0], tm[0], dl[0]
                ci = lax.axis_index("chain")
                si = lax.axis_index("data")
                cell_key = jax.random.fold_in(jax.random.fold_in(key, ci), si)

                def one(_, carry):
                    z, ndk, nwk, nk, sweep = carry
                    st = SamplerState(z=z, ndk=ndk, nwk=nwk, nk=nk,
                                      key=cell_key, sweep=sweep)
                    new = gibbs_sweep(
                        st, tw, td, tm, dl,
                        alpha=alpha_t, beta=beta_t, block_size=block,
                        draw_method=config.draw_method,
                    )
                    # AD-LDA reconciliation within the chain ONLY: psum over 'data'
                    nwk = nwk + lax.psum(new.nwk - nwk, "data")
                    nk = nk + lax.psum(new.nk - nk, "data")
                    return new.z, new.ndk, nwk, nk, new.sweep

                z, ndk, nwk, nk, sweep = lax.fori_loop(
                    0, n_sweeps, one, (z[0, 0], ndk[0, 0], nwk[0], nk[0], sweep)
                )
                return z[None, None], ndk[None, None], nwk[None], nk[None], sweep

            fn = shard_map(
                local, mesh=mesh,
                in_specs=(P("data"), P("data"), P("data"), P("data"),
                          P("chain", "data"), P("chain", "data"),
                          P("chain"), P("chain"), P(), P(), P(), P(), P()),
                out_specs=(P("chain", "data"), P("chain", "data"),
                           P("chain"), P("chain"), P()),
                check_vma=False,
            )
            # out_shardings pinned (see parallel/adlda.py: feeding outputs back
            # as inputs must not change the input sharding signature)
            run_impl = jax.jit(fn, out_shardings=(
                spec("chain", "data"), spec("chain", "data"),
                spec("chain"), spec("chain"), spec()))

            def run(z, ndk, nwk, nk, key, sweep, n_sweeps=1, alpha_v=None,
                    beta_v=None):
                a = jnp.float32(self.alpha if alpha_v is None else alpha_v)
                b = jnp.float32(self.beta if beta_v is None else beta_v)
                return run_impl(tw, td, tm, dl, z, ndk, nwk, nk, key, sweep,
                                jnp.int32(n_sweeps), a, b)

            self._sweep_fn = run
            self.kernel_tier = "xla"
        self.ll_trace: list[np.ndarray] = []
        self.phi_trace: list[np.ndarray] = []

    # ------------------------------------------------------------------
    def sweep(self, n: int = 1, record_ll: bool = False,
              record_phi: bool = False) -> None:
        from ldagibbssampling_tpu.evaluation.metrics import log_likelihood

        if not (record_ll or record_phi):
            # unrecorded batch: ONE dispatch (traced fori bound) — per-call
            # dispatch of a shard_map executable costs ~300 ms remote
            self.z, self.ndk, self.nwk, self.nk, self.sweep_idx = self._sweep_fn(
                self.z, self.ndk, self.nwk, self.nk, self._key, self.sweep_idx,
                n_sweeps=n,
            )
            return
        for _ in range(n):
            self.z, self.ndk, self.nwk, self.nk, self.sweep_idx = self._sweep_fn(
                self.z, self.ndk, self.nwk, self.nk, self._key, self.sweep_idx,
            )
            if record_ll or record_phi:
                phis = [self.chain_phi(ci) for ci in range(self.num_chains)]
                if record_phi:
                    self.phi_trace.append(np.stack(phis))
                if record_ll:
                    thetas = [self.chain_theta(ci) for ci in range(self.num_chains)]
                    self.ll_trace.append(np.asarray([
                        log_likelihood(phis[ci], thetas[ci], self.corpus)
                        / max(self.corpus.num_tokens, 1)
                        for ci in range(self.num_chains)
                    ]))

    @property
    def sweeps_done(self) -> int:
        return int(self.sweep_idx)

    def optimize_hyperparameters(self, iters: int = 5) -> tuple[float, float]:
        """Minka (α, β) on the ('chain','data') mesh: per-chain fixed points
        (ndk digamma sums psum'd over 'data'; β from the chain's replicated
        ``nwk``) are AVERAGED over the chain axis — all chains must target
        the same posterior for split-R̂ to be meaningful, so they share one
        (α, β) trajectory (BASELINE config 4)."""
        from ldagibbssampling_tpu.models.hyper import (
            optimize_beta, sharded_alpha_update)

        a0, b0 = jnp.float32(self.alpha), jnp.float32(self.beta)

        def body(nd, dlr, nwk, nk):
            a = sharded_alpha_update(nd[0, 0], dlr[0], a0, "data", iters=iters)
            b = optimize_beta(nwk[0], nk[0], b0, iters=iters)
            return lax.pmean(a, "chain"), lax.pmean(b, "chain")

        fn = jax.jit(shard_map(
            body, mesh=self.mesh,
            in_specs=(P("chain", "data"), P("data"), P("chain"), P("chain")),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        a, b = fn(self.ndk, self._dl_sharded, self.nwk, self.nk)
        self.alpha, self.beta = float(a), float(b)
        return self.alpha, self.beta

    # ------------------------------------------------------------------
    def _ckpt_arrays(self) -> dict:
        return {"z": self.z, "ndk": self.ndk, "nwk": self.nwk, "nk": self.nk,
                "key": self._key, "sweep": self.sweep_idx}

    def save_checkpoint(self, directory) -> int:
        """Orbax checkpoint of all chains (arrays keep their shardings)."""
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
        repl = NamedSharding(self.mesh, P())
        self._key = jax.device_put(arrays["key"], repl)
        self.sweep_idx = jax.device_put(arrays["sweep"], repl)
        return int(self.sweep_idx)

    # ------------------------------------------------------------------
    def chain_phi(self, ci: int) -> np.ndarray:
        nwk = np.asarray(self.nwk)[ci]
        nk = np.asarray(self.nk)[ci]
        v = nwk.shape[0]
        b = self.beta
        return ((nwk + b) / (nk + v * b)).T

    def chain_theta(self, ci: int) -> np.ndarray:
        ndk = np.asarray(self.ndk)[ci]
        k = ndk.shape[-1]
        m = self.corpus.num_docs
        out = np.zeros((m, k), np.float64)
        lengths = self.corpus.doc_lengths()
        for s in range(self.shards.num_shards):
            for local, g in enumerate(self.shards.doc_map[s]):
                if g >= 0:
                    out[g] = ndk[s, local]
        a = self.alpha
        return (out + a) / (lengths[:, None] + k * a)

    def chain_z(self, ci: int) -> np.ndarray:
        """Chain ``ci``'s topic assignments in ORIGINAL corpus token order
        (for ``.tassign`` export — the reference's output contract)."""
        z = np.asarray(self.z)[ci]
        doc_ptr = self.corpus.doc_ptr
        out = np.empty(self.corpus.num_tokens, z.dtype)
        for s in range(self.shards.num_shards):
            zs = z[s]
            if self._dlayout is not None:
                # deferred layout: slot i holds the shard's compacted-stream
                # token perm[s, i] (-1 = pad); undo the stripe permutation to
                # recover the doc-ordered front-packed stream
                perm = self._dlayout["perm"][s]
                valid = perm >= 0
                buf = np.empty(int(valid.sum()), zs.dtype)
                buf[perm[valid]] = zs[valid]
                zs = buf
            pos = 0
            for local, g in enumerate(self.shards.doc_map[s]):
                if g < 0:
                    continue
                lo, hi = int(doc_ptr[g]), int(doc_ptr[g + 1])
                n = hi - lo
                out[lo:hi] = zs[pos:pos + n]
                pos += n
        return out

    def r_hat_ll(self) -> float:
        from ldagibbssampling_tpu.evaluation.diagnostics import r_hat

        if len(self.ll_trace) < 4:
            return float("nan")
        return r_hat(np.stack(self.ll_trace, axis=1))

    def record_phi(self, half: int) -> None:
        """Fold current per-chain φ into the running split-R̂ accumulator
        (O(C·K·V) memory; see ``models/chains.ChainSet.record_phi``)."""
        from ldagibbssampling_tpu.evaluation.diagnostics import (
            PhiRhatAccumulator)

        if getattr(self, "phi_accum", None) is None:
            self.phi_accum = PhiRhatAccumulator(
                self.num_chains, self.config.topic_num,
                self.corpus.vocab_size)
        phis = np.stack(
            [self.chain_phi(ci) for ci in range(self.num_chains)])
        self.phi_accum.add(phis, half)

    def record_phi_auto(self) -> None:
        """Pair-safe doubling-window recording — the product-path variant
        (see ``models/chains.ChainSet.record_phi_auto``): never raises at odd
        draw counts, and re-windows so the init transient is burn-in."""
        from ldagibbssampling_tpu.evaluation.diagnostics import (
            PhiRhatWindowedAccumulator)

        if getattr(self, "phi_window", None) is None:
            self.phi_window = PhiRhatWindowedAccumulator(
                self.num_chains, self.config.topic_num,
                self.corpus.vocab_size)
        phis = np.stack(
            [self.chain_phi(ci) for ci in range(self.num_chains)])
        self.phi_window.add(phis)

    def r_hat_phi(self) -> dict:
        from ldagibbssampling_tpu.evaluation.diagnostics import r_hat_phi

        if len(self.phi_trace) >= 4:
            return r_hat_phi(np.stack(self.phi_trace, axis=1))
        if getattr(self, "phi_window", None) is not None:
            return self.phi_window.result()
        if getattr(self, "phi_accum", None) is not None:
            return self.phi_accum.result()
        return {"max": float("nan"), "p99": float("nan"),
                "frac_gt_1_1": float("nan"), "n_cells": 0, "perms": []}

    # ------------------------------------------------------------------
    def check_counts_consistent(self) -> None:
        """Per-chain serial recount vs the psum-reconciled device tables."""
        z = np.asarray(self.z)
        mask = self.shards.token_mask.astype(bool)
        k = self.config.topic_num
        v = self.corpus.vocab_size
        p = self.shards.num_shards
        for ci in range(self.num_chains):
            nwk_ref = np.zeros((v, k), np.int64)
            ndk_ref = np.zeros((p, self.shards.docs_per_shard, k), np.int64)
            for s in range(p):
                np.add.at(ndk_ref[s],
                          (self.shards.token_doc[s][mask[s]], z[ci, s][mask[s]]), 1)
                np.add.at(nwk_ref,
                          (self.shards.token_word[s][mask[s]], z[ci, s][mask[s]]), 1)
            np.testing.assert_array_equal(np.asarray(self.nwk)[ci], nwk_ref)
            np.testing.assert_array_equal(np.asarray(self.ndk)[ci], ndk_ref)
            np.testing.assert_array_equal(np.asarray(self.nk)[ci],
                                          nwk_ref.sum(axis=0))


class ShardedChainModel:
    """InferenceBackend adapter over :class:`ShardedChainSet` — the CLI's
    ``--mesh chain=C,data=P`` runtime (BASELINE config 4: "multi-host,
    4 chains" with each chain doc-sharded).

    Artifacts (φ, θ, z) come from chain 0 (the reference's single-chain
    output contract); all chains advance for the R̂ diagnostics, which the
    runner logs when ``--metrics-file`` is set.  φ draws for R̂(φ) fold into
    the O(C·K·V) doubling-window accumulator (pair-safe; early windows become
    burn-in — ``evaluation.diagnostics.PhiRhatWindowedAccumulator``).
    """

    def __init__(self, config: LdaConfig, corpus: FlatCorpus,
                 num_chains: int = 2, num_shards: Optional[int] = None,
                 mesh: Optional[Mesh] = None) -> None:
        self.config = config
        self.corpus = corpus
        self.chains = ShardedChainSet(
            config, corpus, num_chains=num_chains, num_shards=num_shards,
            mesh=mesh)

    def sweep(self, n: int = 1) -> None:
        self.chains.sweep(n, record_ll=True)
        # pair-safe doubling-window recording: valid at every horizon (odd
        # draw counts included), init transient re-windowed into burn-in
        self.chains.record_phi_auto()

    @property
    def sweeps_done(self) -> int:
        return self.chains.sweeps_done

    @property
    def kernel_tier(self) -> str:
        return self.chains.kernel_tier

    @property
    def alpha(self) -> float:
        return self.chains.alpha

    @property
    def beta(self) -> float:
        return self.chains.beta

    def optimize_hyperparameters(self, iters: int = 5) -> tuple[float, float]:
        return self.chains.optimize_hyperparameters(iters=iters)

    def save_checkpoint(self, directory) -> int:
        return self.chains.save_checkpoint(directory)

    def restore_checkpoint(self, directory) -> int:
        return self.chains.restore_checkpoint(directory)

    def phi(self) -> np.ndarray:
        return self.chains.chain_phi(0)

    def theta(self) -> np.ndarray:
        return self.chains.chain_theta(0)

    def z(self) -> np.ndarray:
        return self.chains.chain_z(0)

    def r_hat(self) -> float:
        return self.chains.r_hat_ll()

    def r_hat_phi(self) -> dict:
        return self.chains.r_hat_phi()

    def check_counts_consistent(self) -> None:
        self.chains.check_counts_consistent()

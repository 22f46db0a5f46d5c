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


def deferred_token_layout(
    tw: np.ndarray, td: np.ndarray, tm: np.ndarray,
    vocab_size: int, num_docs: int, block_size: int, num_topics: int = 512,
):
    """Per-shard ``DeferredPlan``s for the token-sharded runtime.

    Same contract as ``adlda.deferred_shard_layout`` but over raw ``[P, T_s]``
    token arrays with GLOBAL doc ids (shards are contiguous corpus ranges, so
    each shard's stream is doc-major and the fused kernel's doc-slab layout
    applies directly).  Returns ``((tw2, td2, tm2, layout), None)`` or
    ``(None, reason)``.
    """
    from ldagibbssampling_tpu.corpus.flat import PaddedCorpus
    from ldagibbssampling_tpu.ops.count_kernel import plan_deferred, stack_plans
    from ldagibbssampling_tpu.ops.gibbs import _pick_row_tile

    row_tile = _pick_row_tile(block_size, num_topics)
    if row_tile == 0:
        return None, f"no Mosaic-legal row tile for block_size {block_size}"
    p = tw.shape[0]
    plans = []
    global_freq = np.zeros(max(vocab_size, 1), np.int64)
    for s in range(p):
        real = tm[s] > 0
        global_freq += np.bincount(tw[s][real], minlength=vocab_size)
        try:
            plans.append(plan_deferred(tw[s][real], td[s][real],
                                       vocab_size, block_size))
        except ValueError as e:
            return None, str(e)
    if global_freq.size and int(global_freq.max()) >= (1 << 24):
        return None, (
            f"max global word frequency {int(global_freq.max())} >= 2^24 "
            "would round the psum'd f32 count tables"
        )
    stacked = stack_plans(plans)
    tw2, td2, tm2 = (stacked["token_word"], stacked["token_doc"],
                     stacked["token_mask"])

    def slabs(s, mult):
        pc = PaddedCorpus(
            token_word=tw2[s], token_doc=td2[s], token_mask=tm2[s],
            num_real_tokens=int(tm2[s].sum()),
            vocab_size=vocab_size, num_docs=num_docs,
        )
        return pc.doc_slabs(block_size, d_loc_multiple=128 if mult is None else mult)

    d_loc = max(slabs(s, None)[2] for s in range(p))
    per = [slabs(s, d_loc) for s in range(p)]
    stacked["d_local"] = np.stack([x[0] for x in per])
    stacked["d0"] = np.stack([x[1] for x in per])
    stacked["d_loc"] = d_loc
    stacked["row_tile"] = row_tile
    lengths = np.bincount(td2.reshape(-1)[tm2.reshape(-1) > 0],
                          minlength=max(num_docs, 1))
    stacked["slab_split"] = bool(lengths.size and int(lengths.max()) > 256)
    return (tw2, td2, tm2, stacked), None


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


def _make_deferred_token_sweep_fn(model, mesh, layout, *, twj, tdj, tmj,
                                  shard_sh, axis, interpret):
    """Deferred-``nwk`` tier for the token-sharded runtime.

    Per shard: the fused kernel sweeps the shard's contiguous token range
    against sweep-stale replicas, the local word-topic table is rebuilt on
    the MXU, and reconciliation is ``nwk = psum(local_counts)`` plus a psum
    of ``ndk`` deltas (a straddling document's partial rows add correctly).
    Exact topic totals come from int32 column sums of the reconciled table.
    """
    from ldagibbssampling_tpu.models.state import SamplerState
    from ldagibbssampling_tpu.ops.count_kernel import replicate_rows
    from ldagibbssampling_tpu.ops.gibbs import deferred_local_counts

    p = twj.shape[0]
    nt, tile = layout["num_tiles"], layout["tile"]
    block_size = layout["block_size"]
    d_loc, row_tile = layout["d_loc"], layout["row_tile"]
    v_loc, v_pad = layout["v_loc"], layout["v_pad"]
    slab_split = layout["slab_split"]
    noise_mode = "external" if interpret else "internal"

    tdl = jax.device_put(jnp.asarray(layout["d_local"]), shard_sh)
    jd0 = jax.device_put(jnp.asarray(layout["d0"]), shard_sh)
    jrg = jax.device_put(jnp.asarray(layout["row_gather_idx"]), shard_sh)
    jwl = jax.device_put(
        jnp.asarray(layout["w_local"].reshape(p, nt, tile)), shard_sh)
    jts = jax.device_put(jnp.asarray(layout["tile_stripe"]), shard_sh)

    def local_sweeps(tw, tm, tdl, jd0, jrg, jwl, jts, z, ndk, nwk, nk,
                     key, sweep, n_sweeps, alpha_t, beta_t):
        tw, tm, tdl = tw[0], tm[0], tdl[0]
        d0_, rg_, ts_ = jd0[0], jrg[0], jts[0]
        wl8 = replicate_rows(jwl[0])
        shard_key = jax.random.fold_in(key, lax.axis_index(axis))

        def one(_, carry):
            z, ndk, nwk, nk, sweep = carry
            state = SamplerState(z=z, ndk=ndk, nwk=nwk, nk=nk,
                                 key=shard_key, sweep=sweep)
            z2, ndk_local, local_counts, _, _ = deferred_local_counts(
                state, tw, tdl, tm, d0_, rg_, wl8, ts_, alpha_t, beta_t,
                block_size=block_size, d_loc=d_loc, row_tile=row_tile,
                noise_mode=noise_mode, pallas_interpret=interpret,
                vocab_size=None, v_loc=v_loc, v_pad=v_pad, tile=tile,
                slab_split=slab_split,
            )
            nwk2 = lax.psum(local_counts, axis).astype(nwk.dtype)
            ndk2 = ndk + lax.psum(ndk_local - ndk, axis)
            nk2 = jnp.sum(nwk2, axis=0)
            return z2, ndk2, nwk2, nk2, sweep + 1

        z, ndk, nwk, nk, sweep = lax.fori_loop(
            0, n_sweeps, one, (z[0], ndk, nwk, nk, sweep)
        )
        return z[None], ndk, nwk, nk, sweep

    sharded = P(axis)
    repl = P()
    fn = shard_map(
        local_sweeps, mesh=mesh,
        in_specs=(sharded,) * 7 + (sharded, repl, repl, repl, repl, repl,
                                   repl, repl, repl),
        out_specs=(sharded, repl, repl, repl, repl),
        check_vma=False,
    )
    # out_shardings pinned: feeding outputs back as inputs must not change
    # the input sharding signature (one-time ~20 s respecialization
    # otherwise — see parallel/adlda.py)
    repl_sh = NamedSharding(mesh, P())
    run_impl = jax.jit(
        fn, out_shardings=(shard_sh, repl_sh, repl_sh, repl_sh, repl_sh))

    def run(z, ndk, nwk, nk, key, sweep, n_sweeps=1, alpha_v=None, beta_v=None):
        a = jnp.float32(model.alpha if alpha_v is None else alpha_v)
        b = jnp.float32(model.beta if beta_v is None else beta_v)
        return run_impl(twj, tmj, tdl, jd0, jrg, jwl, jts, z, ndk, nwk, nk,
                        key, sweep, jnp.int32(n_sweeps), a, b)

    run.kernel_tier = "deferred"
    return run


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

        # kernel-tier resolution (mirrors parallel/adlda.py); this runtime
        # has no fused-delta tier, so deferred falls straight to XLA
        from ldagibbssampling_tpu.ops.gibbs import warn_tier_downgrade

        use_pallas = getattr(config, "use_pallas", False)
        interpret = bool(getattr(config, "pallas_interpret", False))
        self._interpret = interpret
        if use_pallas in ("fused", "deferred") and config.draw_method != "gumbel":
            warn_tier_downgrade(
                use_pallas, False,
                f"draw_method {config.draw_method!r} needs the XLA sweep")
            use_pallas = False
        if use_pallas and jax.default_backend() != "tpu" and not interpret:
            warn_tier_downgrade(
                use_pallas, False,
                f"platform is {jax.default_backend()!r}, not tpu")
            use_pallas = False
        if use_pallas in ("fused", "deferred") and block < 128:
            warn_tier_downgrade(
                use_pallas, False, f"block_size {block} < 128 (no Mosaic tile)")
            use_pallas = False
        if use_pallas == "fused":
            warn_tier_downgrade(
                "fused", False,
                "token-sharded runtime has no fused-delta tier "
                "(use deferred or the XLA sweep)")
            use_pallas = False
        self._dlayout = None
        if use_pallas == "deferred":
            layout, reason = deferred_token_layout(
                tw, td, tm, corpus.vocab_size, corpus.num_docs, block,
                config.topic_num)
            if layout is None:
                warn_tier_downgrade("deferred", False, reason)
                use_pallas = False
            else:
                tw, td, tm, self._dlayout = layout
        self._use_pallas = use_pallas

        self._sorted = (
            bool(getattr(config, "sort_blocks", False))
            and block > 1 and self._dlayout is None
        )
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
        from ldagibbssampling_tpu.models.state import host_randint

        z = host_randint(init_key, tw.shape, k)
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
        # committed replicated scalar: matches the sweep fn's pinned output
        # sharding so the input signature never changes across dispatches
        self.sweep_idx = jax.device_put(jnp.int32(0), repl)

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
        # live hyperparameters (Minka optimization moves them; traced scalars
        # so updates never recompile)
        self.alpha = float(config.alpha)
        self.beta = float(config.beta)

        if self._dlayout is not None:
            self._sweep_fn = _make_deferred_token_sweep_fn(
                self, mesh, self._dlayout, twj=twj, tdj=tdj, tmj=tmj,
                shard_sh=shard_sh, axis=axis, interpret=self._interpret,
            )
            self.kernel_tier = "deferred"
            return

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

        # out_shardings pinned (see the deferred tier above / parallel/adlda.py)
        run_impl = jax.jit(fn, out_shardings=(
            NamedSharding(mesh, P(axis)), NamedSharding(mesh, P()),
            NamedSharding(mesh, P()), NamedSharding(mesh, P()),
            NamedSharding(mesh, P())))

        def run(z, ndk, nwk, nk, key, sweep, n_sweeps=1, alpha_v=None, beta_v=None):
            a = jnp.float32(self.alpha if alpha_v is None else alpha_v)
            b = jnp.float32(self.beta if beta_v is None else beta_v)
            return run_impl(twj, tdj, dl, tmj, z, ndk, nwk, nk, key, sweep,
                            jnp.int32(n_sweeps), a, b)

        self._sweep_fn = run
        self.kernel_tier = "xla"

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

"""AD-LDA: document-sharded collapsed Gibbs over a device mesh.

Reference anchor: the serial chain of ``LdaModel.sampleTopicZ`` (SURVEY.md
§3.3) — statistically preserved, mechanically parallelized.  Each device owns a
document shard plus a *replica* of the global word-topic table ``nwk``; within
a sweep every shard runs the blocked-Gibbs update against its (increasingly
stale) replica, and at sweep end the per-shard deltas are reconciled with one
``psum`` over the ``data`` mesh axis (Newman et al.'s AD-LDA scheme, the [B]
north-star design).  The collective is XLA-compiled from ``shard_map`` — on
real hardware it rides ICI.

Doc-topic counts ``ndk`` never need reconciliation: a document lives on exactly
one shard.
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
from ldagibbssampling_tpu.parallel.sharding import CorpusShards, shard_corpus

try:  # jax >= 0.9 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _fused_shard_plan(shards: CorpusShards, block_size: int, num_topics: int = 512):
    """Host-side doc-slab layout per shard for the fused kernel.

    Returns ``(d_local [P, T_s], d0 [P, nb], d_loc, row_tile, slab_split)`` or
    ``None`` when the fused path is not applicable (no Mosaic-legal tile, or
    counts would overflow the kernel's float32 tracking).  The f32-exactness
    guards are per-CELL bounds — word frequency for ``nwk`` rows (each shard's
    working cell <= global count + local increments < 2·max_freq) and document
    length for ``ndk`` — not round-2's per-corpus 2^24-token ceiling; the
    kernel's f32 running ``nk`` is a sampling normalizer only (the runtime
    recomputes exact totals from the reconciled int table each sweep).
    """
    from ldagibbssampling_tpu.corpus.flat import PaddedCorpus
    from ldagibbssampling_tpu.ops.gibbs import _pick_row_tile

    freq = np.zeros(max(shards.vocab_size, 1), np.int64)
    for s in range(shards.num_shards):
        real = shards.token_mask[s] > 0
        freq += np.bincount(shards.token_word[s][real],
                            minlength=shards.vocab_size)
    if freq.size and int(freq.max()) >= (1 << 23):
        return None  # working f32 cells could exceed 2^24 mid-sweep
    max_doc_len = int(shards.doc_lengths.max()) if shards.doc_lengths.size else 0
    if max_doc_len >= (1 << 24):
        return None
    row_tile = _pick_row_tile(block_size, num_topics)
    if row_tile == 0:
        if block_size > 2048:
            return None
        row_tile = block_size  # single tile: block == array shape is exempt

    p = shards.num_shards
    per = []
    for s in range(p):
        pcs = PaddedCorpus(
            token_word=shards.token_word[s], token_doc=shards.token_doc[s],
            token_mask=shards.token_mask[s],
            num_real_tokens=int(shards.token_mask[s].sum()),
            vocab_size=shards.vocab_size, num_docs=shards.docs_per_shard,
        )
        per.append(pcs.doc_slabs(block_size, d_loc_multiple=128))
    d_loc = max(pl[2] for pl in per)
    if per and any(pl[2] != d_loc for pl in per):
        # recompute with the uniform (max) slab height so the shard_map'd
        # program has one static shape
        per = []
        for s in range(p):
            pcs = PaddedCorpus(
                token_word=shards.token_word[s], token_doc=shards.token_doc[s],
                token_mask=shards.token_mask[s],
                num_real_tokens=int(shards.token_mask[s].sum()),
                vocab_size=shards.vocab_size, num_docs=shards.docs_per_shard,
            )
            per.append(pcs.doc_slabs(block_size, d_loc_multiple=d_loc))
    d_local = np.stack([pl[0] for pl in per])
    d0 = np.stack([pl[1] for pl in per])
    return d_local, d0, d_loc, row_tile, max_doc_len > 256


def deferred_shard_layout(
    shards: CorpusShards, block_size: int, num_topics: int = 512,
) -> tuple[Optional[tuple[CorpusShards, dict]], Optional[str]]:
    """Per-shard ``DeferredPlan``s, uniformized and stacked (``stack_plans``).

    Returns ``((new_shards, stacked), None)`` where ``new_shards`` carries the
    plans' stripe-aligned token arrays (same local doc ids), or ``(None,
    reason)`` when the deferred path is not applicable.  The f32-exactness
    guard is per GLOBAL word frequency — the psum of shard-local count tables
    must stay exact.
    """
    from ldagibbssampling_tpu.corpus.flat import PaddedCorpus
    from ldagibbssampling_tpu.ops.count_kernel import plan_deferred, stack_plans
    from ldagibbssampling_tpu.ops.gibbs import _pick_row_tile

    row_tile = _pick_row_tile(block_size, num_topics)
    if row_tile == 0:
        return None, f"no Mosaic-legal row tile for block_size {block_size}"
    plans = []
    global_freq = np.zeros(shards.vocab_size, np.int64)
    for s in range(shards.num_shards):
        real = shards.token_mask[s] > 0
        tw, td = shards.token_word[s][real], shards.token_doc[s][real]
        global_freq += np.bincount(tw, minlength=shards.vocab_size)
        try:
            plans.append(plan_deferred(tw, td, shards.vocab_size, block_size))
        except ValueError as e:  # e.g. no multiple-of-8 tile for this block
            return None, str(e)
    if global_freq.size and int(global_freq.max()) >= (1 << 24):
        return None, (
            f"max global word frequency {int(global_freq.max())} >= 2^24 "
            "would round the psum'd f32 count tables"
        )
    stacked = stack_plans(plans)
    new_shards = CorpusShards(
        token_word=stacked["token_word"],
        token_doc=stacked["token_doc"],
        token_mask=stacked["token_mask"],
        doc_lengths=shards.doc_lengths, doc_map=shards.doc_map,
        num_shards=shards.num_shards, vocab_size=shards.vocab_size,
        num_real_tokens=shards.num_real_tokens,
    )
    # uniform doc-slab layout on the new arrays
    per = []
    for s in range(new_shards.num_shards):
        pcs = PaddedCorpus(
            token_word=new_shards.token_word[s],
            token_doc=new_shards.token_doc[s],
            token_mask=new_shards.token_mask[s],
            num_real_tokens=int(new_shards.token_mask[s].sum()),
            vocab_size=new_shards.vocab_size,
            num_docs=new_shards.docs_per_shard,
        )
        per.append(pcs.doc_slabs(block_size, d_loc_multiple=128))
    d_loc = max(pl[2] for pl in per)
    if any(pl[2] != d_loc for pl in per):
        per = []
        for s in range(new_shards.num_shards):
            pcs = PaddedCorpus(
                token_word=new_shards.token_word[s],
                token_doc=new_shards.token_doc[s],
                token_mask=new_shards.token_mask[s],
                num_real_tokens=int(new_shards.token_mask[s].sum()),
                vocab_size=new_shards.vocab_size,
                num_docs=new_shards.docs_per_shard,
            )
            per.append(pcs.doc_slabs(block_size, d_loc_multiple=d_loc))
    stacked["d_local"] = np.stack([pl[0] for pl in per])
    stacked["d0"] = np.stack([pl[1] for pl in per])
    stacked["d_loc"] = d_loc
    stacked["row_tile"] = row_tile
    stacked["slab_split"] = (
        int(shards.doc_lengths.max()) > 256 if shards.doc_lengths.size else False
    )
    return (new_shards, stacked), None


def make_sharded_sweep_fn(
    shards: CorpusShards,
    mesh: Mesh,
    *,
    alpha: float,
    beta: float,
    block_size: int,
    draw_method: str = "gumbel",
    num_sweeps: int = 1,
    axis: str = "data",
    sorted_words: bool = False,
    use_pallas: bool | str = False,
    pallas_interpret: bool = False,
    num_topics: int = 512,
    deferred_layout: Optional[dict] = None,
):
    """Build a jitted AD-LDA sweep: ``(z, ndk, nwk, nk, key, sweep) -> same``.

    ``z``/``ndk`` are sharded on ``axis`` (leading dim = shard); ``nwk``/``nk``
    are replicated.  Runs ``num_sweeps`` full sweeps, reconciling ``nwk`` after
    every sweep.

    Kernel tiers (the returned fn carries the effective one as
    ``run.kernel_tier``):

    - ``deferred_layout`` (from :func:`deferred_shard_layout`; ``shards`` must
      be the layout's stripe-aligned ``new_shards``): each shard runs the
      deferred-``nwk`` sweep (``ops/gibbs.deferred_local_counts``) and the
      global table is reconciled as ``nwk = psum(local_counts, 'data')`` —
      global counts are the sum of shard-local count tables, no delta
      bookkeeping.  The fastest tier and the only one without a per-shard
      token ceiling.
    - ``use_pallas="fused"``: each shard's local sweep through the fused block
      kernel, psum of deltas unchanged.
    - otherwise: the pure-XLA blocked sweep.
    """
    from ldagibbssampling_tpu.ops.gibbs import warn_tier_downgrade

    # Token arrays are passed as device-committed ARGUMENTS, not closures:
    # under shard_map, closure-captured arrays lower to HLO constants that
    # (on remote-execution platforms) are re-shipped on every call — measured
    # 6.5x slower on the NYT-shaped rung.
    shard_sh = NamedSharding(mesh, P(axis))
    tw = jax.device_put(jnp.asarray(shards.token_word), shard_sh)
    td = jax.device_put(jnp.asarray(shards.token_doc), shard_sh)
    tm = jax.device_put(jnp.asarray(shards.token_mask), shard_sh)
    dl = jax.device_put(jnp.asarray(shards.doc_lengths), shard_sh)

    if use_pallas and jax.default_backend() != "tpu" and not pallas_interpret:
        warn_tier_downgrade(
            use_pallas, False, f"platform is {jax.default_backend()!r}, not tpu")
        use_pallas = False
        deferred_layout = None

    if deferred_layout is not None:
        return _make_deferred_sharded_sweep_fn(
            shards, mesh, deferred_layout,
            alpha=alpha, beta=beta, num_sweeps=num_sweeps, axis=axis,
            pallas_interpret=pallas_interpret,
            tw=tw, tm=tm, shard_sh=shard_sh,
        )

    plan = None
    if use_pallas == "deferred":
        # mesh callers build the layout in their constructor (the token
        # arrays and z must be re-laid out together); reaching here means
        # they didn't — run the next tier down
        warn_tier_downgrade(
            "deferred", "fused",
            "no deferred_layout supplied (see deferred_shard_layout)")
        use_pallas = "fused"
    if use_pallas == "fused" and draw_method == "gumbel" and block_size >= 128:
        plan = _fused_shard_plan(shards, block_size, num_topics)
        if plan is None:
            warn_tier_downgrade(
                "fused", False,
                "no fused shard plan (f32 cell-exactness guard or no "
                "Mosaic-legal tile)")
    elif use_pallas == "fused":
        warn_tier_downgrade(
            "fused", False,
            f"draw_method {draw_method!r} / block_size {block_size} "
            "unsupported by the fused kernel")

    if plan is not None:
        from ldagibbssampling_tpu.ops.gibbs import fused_gibbs_sweep

        d_local, d0, d_loc, row_tile, slab_split = plan
        tdl = jax.device_put(jnp.asarray(d_local), shard_sh)
        jd0 = jax.device_put(jnp.asarray(d0), shard_sh)
        noise_mode = "external" if pallas_interpret else "internal"
    else:
        tdl = jd0 = None

    def local_sweeps(tw, td, tm, dl, tdl, jd0, z, ndk, nwk, nk, key, sweep,
                     n_sweeps, alpha_t, beta_t):
        # inside shard_map every sharded arg has leading dim P/p == 1
        tw, td, tm, dl = tw[0], td[0], tm[0], dl[0]
        shard_key = jax.random.fold_in(key, lax.axis_index(axis))

        def one_sweep(_, carry):
            z, ndk, nwk, nk, sweep = carry
            state = SamplerState(z=z, ndk=ndk, nwk=nwk, nk=nk,
                                 key=shard_key, sweep=sweep)
            if plan is not None:
                new = fused_gibbs_sweep(
                    state, tw, tdl[0], tm, jd0[0],
                    alpha=alpha_t, beta=beta_t, block_size=block_size,
                    d_loc=d_loc, row_tile=row_tile, sorted_words=sorted_words,
                    noise_mode=noise_mode, pallas_interpret=pallas_interpret,
                    slab_split=slab_split,
                )
                # AD-LDA reconciliation: one psum of the word-topic deltas.
                # Topic totals are recomputed from the reconciled int table —
                # the kernel's running f32 nk is a sampling normalizer only
                # (can round above 2^24; the table cells cannot, guarded).
                nwk2 = nwk + lax.psum(new.nwk - nwk, axis)
                nk2 = jnp.sum(nwk2, axis=0)
                return new.z, new.ndk, nwk2, nk2, new.sweep
            new = gibbs_sweep(
                state, tw, td, tm, dl,
                alpha=alpha_t, beta=beta_t, block_size=block_size,
                draw_method=draw_method, sorted_words=sorted_words,
            )
            # AD-LDA reconciliation: one psum of the word-topic deltas
            dnwk = lax.psum(new.nwk - nwk, axis)
            dnk = lax.psum(new.nk - nk, axis)
            return new.z, new.ndk, nwk + dnwk, nk + dnk, new.sweep

        # n_sweeps is a TRACED bound: one dispatch runs the whole batch.
        # (Per-call dispatch of a shard_map executable costs ~300 ms on the
        # remote-TPU platform; batching restores single-chip throughput.)
        z, ndk, nwk, nk, sweep = lax.fori_loop(
            0, n_sweeps, one_sweep, (z[0], ndk[0], nwk, nk, sweep)
        )
        return z[None], ndk[None], nwk, nk, sweep

    sharded = P(axis)
    repl = P()
    fn = shard_map(
        local_sweeps,
        mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, sharded, sharded,
                  sharded, sharded, repl, repl, repl, repl, repl, repl, repl),
        out_specs=(sharded, sharded, repl, repl, repl),
        check_vma=False,
    )

    if plan is None:
        # dummy per-shard placeholders keep one shard_map signature
        tdl = jax.device_put(jnp.zeros_like(tm), shard_sh)
        jd0 = jax.device_put(
            jnp.zeros((shards.num_shards, 1), jnp.int32), shard_sh)

    # Pin output shardings to the canonical in_spec shardings.  Without
    # this, GSPMD on a 1-device mesh may canonicalize an output's sharding
    # to a content-equivalent but DIFFERENT NamedSharding (P() vs P(axis)),
    # so feeding outputs back as inputs respecializes the executable — a
    # measured one-time ~20 s recompile on the second dispatch.
    repl_sh = NamedSharding(mesh, P())
    run_impl = jax.jit(
        fn, out_shardings=(shard_sh, shard_sh, repl_sh, repl_sh, repl_sh))

    def run(z, ndk, nwk, nk, key, sweep, n_sweeps=None, alpha_v=None, beta_v=None):
        # α/β are traced scalars so Minka updates never recompile
        n = jnp.int32(num_sweeps if n_sweeps is None else n_sweeps)
        a = jnp.float32(alpha if alpha_v is None else alpha_v)
        b = jnp.float32(beta if beta_v is None else beta_v)
        return run_impl(tw, td, tm, dl, tdl, jd0, z, ndk, nwk, nk, key, sweep,
                        n, a, b)

    run.kernel_tier = "fused" if plan is not None else "xla"
    return run


def _make_deferred_sharded_sweep_fn(
    shards: CorpusShards,
    mesh: Mesh,
    layout: dict,
    *,
    alpha: float,
    beta: float,
    num_sweeps: int,
    axis: str,
    pallas_interpret: bool,
    tw, tm, shard_sh,
):
    """The deferred-``nwk`` AD-LDA sweep (see ``make_sharded_sweep_fn``).

    Per sweep, each shard samples against its sweep-stale replica snapshot,
    rebuilds its LOCAL word-topic count table on the MXU
    (``ops/count_kernel.build_nwk``) and the global table is one psum of the
    local tables over the data axis — the reconciliation contract specified in
    ``ops/gibbs.deferred_local_counts``.  Exactness: every psum'd f32 cell is
    bounded by the global word frequency (< 2^24, guarded by
    ``deferred_shard_layout``); topic totals are an int32 column sum of the
    reconciled table.
    """
    from ldagibbssampling_tpu.ops.count_kernel import replicate_rows
    from ldagibbssampling_tpu.ops.gibbs import deferred_local_counts

    p = shards.num_shards
    nt, tile = layout["num_tiles"], layout["tile"]
    block_size = layout["block_size"]
    d_loc, row_tile = layout["d_loc"], layout["row_tile"]
    v_loc, v_pad = layout["v_loc"], layout["v_pad"]
    slab_split = layout["slab_split"]
    noise_mode = "external" if pallas_interpret else "internal"

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
        wl8 = replicate_rows(jwl[0])  # lane-major layout, built on device
        shard_key = jax.random.fold_in(key, lax.axis_index(axis))

        def one_sweep(_, carry):
            z, ndk, nwk, nk, sweep = carry
            state = SamplerState(z=z, ndk=ndk, nwk=nwk, nk=nk,
                                 key=shard_key, sweep=sweep)
            z2, ndk2, local_counts, _, _ = deferred_local_counts(
                state, tw, tdl, tm, d0_, rg_, wl8, ts_, alpha_t, beta_t,
                block_size=block_size, d_loc=d_loc, row_tile=row_tile,
                noise_mode=noise_mode, pallas_interpret=pallas_interpret,
                vocab_size=None, v_loc=v_loc, v_pad=v_pad, tile=tile,
                slab_split=slab_split,
            )
            # global counts = sum of shard-local tables (one psum, no deltas)
            nwk2 = lax.psum(local_counts, axis).astype(nwk.dtype)
            nk2 = jnp.sum(nwk2, axis=0)
            return z2, ndk2, nwk2, nk2, sweep + 1

        z, ndk, nwk, nk, sweep = lax.fori_loop(
            0, n_sweeps, one_sweep, (z[0], ndk[0], nwk, nk, sweep)
        )
        return z[None], ndk[None], nwk, nk, sweep

    sharded = P(axis)
    repl = P()
    fn = shard_map(
        local_sweeps,
        mesh=mesh,
        in_specs=(sharded,) * 7 + (sharded, sharded, repl, repl, repl, repl,
                                   repl, repl, repl),
        out_specs=(sharded, sharded, repl, repl, repl),
        check_vma=False,
    )
    # out_shardings pinned: see make_sharded_sweep_fn (avoids the one-time
    # second-dispatch respecialization when outputs feed back as inputs)
    repl_sh = NamedSharding(mesh, P())
    run_impl = jax.jit(
        fn, out_shardings=(shard_sh, shard_sh, repl_sh, repl_sh, repl_sh))

    def run(z, ndk, nwk, nk, key, sweep, n_sweeps=None, alpha_v=None, beta_v=None):
        n = jnp.int32(num_sweeps if n_sweeps is None else n_sweeps)
        a = jnp.float32(alpha if alpha_v is None else alpha_v)
        b = jnp.float32(beta if beta_v is None else beta_v)
        return run_impl(tw, tm, tdl, jd0, jrg, jwl, jts, z, ndk, nwk, nk,
                        key, sweep, n, a, b)

    run.kernel_tier = "deferred"
    return run


class ShardedLda:
    """Multi-device AD-LDA model (single host; mesh may be real or virtual)."""

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
        self.shards = shard_corpus(corpus, p, block_size=block)
        # block size never exceeds a shard's token stream
        block = min(block, self.shards.tokens_per_shard)
        self.block_size = block

        # Resolve the kernel tier BEFORE state init: the deferred tier re-lays
        # out the token stream (stripe-aligned blocks), so z/ndk/nwk must be
        # initialized on the layout's arrays.
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
        self._dlayout = None
        if use_pallas == "deferred":
            layout, reason = deferred_shard_layout(
                self.shards, block, config.topic_num)
            if layout is None:
                warn_tier_downgrade("deferred", "fused", reason)
                use_pallas = "fused"
            else:
                self.shards, self._dlayout = layout
        self._use_pallas = use_pallas

        self._sorted = (
            bool(getattr(config, "sort_blocks", False))
            and block > 1 and self._dlayout is None
        )
        if self._sorted:
            from ldagibbssampling_tpu.parallel.sharding import sort_blocks_inplace

            sort_blocks_inplace(
                self.shards.token_word, self.shards.token_doc,
                self.shards.token_mask, block_size=block,
            )

        k = config.topic_num
        v = corpus.vocab_size
        root = jax.random.PRNGKey(config.seed)
        init_key, self._key = jax.random.split(root)
        from ldagibbssampling_tpu.models.state import host_randint

        z = host_randint(init_key, self.shards.token_word.shape, k)
        mask = self.shards.token_mask.astype(bool)
        ndk = np.zeros((p, self.shards.docs_per_shard, k), dtype=np.int32)
        nwk = np.zeros((v, k), dtype=np.int32)
        for s in range(p):
            np.add.at(ndk[s], (self.shards.token_doc[s][mask[s]], z[s][mask[s]]), 1)
            np.add.at(nwk, (self.shards.token_word[s][mask[s]], z[s][mask[s]]), 1)
        nk = nwk.sum(axis=0, dtype=np.int32)

        shard_sharding = NamedSharding(mesh, P(axis))
        repl_sharding = NamedSharding(mesh, P())
        self.z = jax.device_put(jnp.asarray(z), shard_sharding)
        self.ndk = jax.device_put(jnp.asarray(ndk), shard_sharding)
        self.nwk = jax.device_put(jnp.asarray(nwk), repl_sharding)
        self.nk = jax.device_put(jnp.asarray(nk), repl_sharding)
        # committed replicated scalar: the sweep fn returns it with this
        # sharding, so the input sharding never changes across dispatches
        self.sweep_idx = jax.device_put(jnp.int32(0), repl_sharding)
        # live hyperparameters (Minka optimization moves them; sweeps trace them)
        self.alpha = float(config.alpha)
        self.beta = float(config.beta)

        self._sweep_fn = make_sharded_sweep_fn(
            self.shards, mesh,
            alpha=config.alpha, beta=config.beta, block_size=block,
            draw_method=config.draw_method, num_sweeps=1, axis=axis,
            sorted_words=self._sorted,
            use_pallas=self._use_pallas,
            pallas_interpret=self._interpret,
            num_topics=config.topic_num,
            deferred_layout=self._dlayout,
        )
        self.kernel_tier = getattr(self._sweep_fn, "kernel_tier", "xla")

    # ------------------------------------------------------------------
    def sweep(self, n: int = 1) -> None:
        # one dispatch for the whole batch (traced fori bound)
        self.z, self.ndk, self.nwk, self.nk, self.sweep_idx = self._sweep_fn(
            self.z, self.ndk, self.nwk, self.nk, self._key, self.sweep_idx,
            n_sweeps=n, alpha_v=self.alpha, beta_v=self.beta,
        )

    def optimize_hyperparameters(self, iters: int = 5) -> tuple[float, float]:
        """Minka (α, β) via collectives (BASELINE config 4).

        α reconciles per-shard ``ndk`` digamma sums with a psum over the data
        axis (``models/hyper.sharded_alpha_update``); β needs no collective
        here — ``nwk`` is replicated in AD-LDA.  The new values flow into
        subsequent sweeps as traced scalars (no recompile).
        """
        from ldagibbssampling_tpu.models.hyper import (
            optimize_beta, sharded_alpha_update)

        dl_sh = jax.device_put(
            jnp.asarray(self.shards.doc_lengths),
            NamedSharding(self.mesh, P(self.axis)),
        )
        fn = jax.jit(shard_map(
            lambda nd, dlr: sharded_alpha_update(
                nd[0], dlr[0], jnp.float32(self.alpha), self.axis, iters=iters
            ),
            mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis)),
            out_specs=P(),
            check_vma=False,
        ))
        self.alpha = float(fn(self.ndk, dl_sh))
        self.beta = float(optimize_beta(self.nwk, self.nk, self.beta, iters=iters))
        return self.alpha, self.beta

    # ------------------------------------------------------------------
    def device_log_likelihood(self) -> float:
        """Training LL with shard-local chunked device passes (SURVEY.md §5
        metrics row): each shard reduces its own token stream against its
        exact ``ndk`` and the replicated ``nwk``/``nk`` in O(chunk·K) device
        memory; the host sums the per-shard chunk partials in float64.  No
        ``[T, K]`` host materialization — usable at rung-3+ token counts."""
        if not hasattr(self, "_ll_fn"):
            from ldagibbssampling_tpu.evaluation.device_metrics import (
                shard_ll_chunks)

            shard_sh = NamedSharding(self.mesh, P(self.axis))
            tw = jax.device_put(jnp.asarray(self.shards.token_word), shard_sh)
            td = jax.device_put(jnp.asarray(self.shards.token_doc), shard_sh)
            tm = jax.device_put(jnp.asarray(self.shards.token_mask), shard_sh)
            dl = jax.device_put(jnp.asarray(self.shards.doc_lengths), shard_sh)
            axis = self.axis

            def local(tw, td, tm, dl, ndk, nwk, nk, a, b):
                chunks = shard_ll_chunks(
                    ndk[0], nwk, nk, tw[0], td[0], tm[0], dl[0], a, b)
                return chunks[None]

            fn = shard_map(
                local, mesh=self.mesh,
                in_specs=(P(self.axis),) * 5 + (P(), P(), P(), P()),
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
        """Orbax checkpoint of the sharded run (arrays keep their shardings)."""
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
        nwk = np.asarray(self.nwk)
        nk = np.asarray(self.nk)
        v = nwk.shape[0]
        return ((nwk + self.beta) / (nk + v * self.beta)).T

    def theta(self) -> np.ndarray:
        """Gather sharded ndk back to global doc order via doc_map."""
        ndk = np.asarray(self.ndk)
        k = ndk.shape[-1]
        m = self.corpus.num_docs
        out = np.zeros((m, k), dtype=np.float64)
        lengths = self.corpus.doc_lengths()
        for s in range(self.shards.num_shards):
            for local, g in enumerate(self.shards.doc_map[s]):
                if g >= 0:
                    out[g] = ndk[s, local]
        out = (out + self.alpha) / (
            lengths[:, None] + k * self.alpha
        )
        return out

    # ------------------------------------------------------------------
    def check_counts_consistent(self) -> None:
        """Debug mode (SURVEY.md §5 race-detection analog): recompute every
        count table serially from ``z`` and compare with the psum-reconciled
        device tables.  Raises AssertionError on any divergence."""
        z = np.asarray(self.z)
        mask = self.shards.token_mask.astype(bool)
        k = self.config.topic_num
        v = self.corpus.vocab_size
        p = self.shards.num_shards
        nwk_ref = np.zeros((v, k), dtype=np.int64)
        ndk_ref = np.zeros((p, self.shards.docs_per_shard, k), dtype=np.int64)
        for s in range(p):
            np.add.at(ndk_ref[s], (self.shards.token_doc[s][mask[s]], z[s][mask[s]]), 1)
            np.add.at(nwk_ref, (self.shards.token_word[s][mask[s]], z[s][mask[s]]), 1)
        np.testing.assert_array_equal(np.asarray(self.nwk), nwk_ref)
        np.testing.assert_array_equal(np.asarray(self.ndk), ndk_ref)
        np.testing.assert_array_equal(np.asarray(self.nk), nwk_ref.sum(axis=0))

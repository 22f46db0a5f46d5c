"""2D grid-parallel collapsed Gibbs: doc-sharding × vocab-sharding.

The TP row of SURVEY.md §2.3: when ``V·K`` exceeds a chip's HBM (e.g. PubMed
V≈140k × K=1000), the word-topic table ``nwk`` must be sharded, not
replicated.  This runtime composes both parallelism axes on one mesh
``('data', 'vocab')``:

- ``data`` axis: documents are sharded AD-LDA style (as ``parallel/adlda.py``);
  each row of the grid owns a doc shard and its exact ``ndk``.
- ``vocab`` axis: the vocabulary is split into contiguous, token-frequency-
  balanced ranges; each column owns ``nwk`` rows for its range only —
  per-device footprint ``V/p_v × K``.

Device ``(i, j)`` sweeps the tokens of doc-shard ``i`` whose words fall in
vocab-range ``j``, against its *exact-local* ``nwk`` slab and a replica of doc
shard ``i``'s ``ndk``.  End-of-sweep reconciliation (XLA collectives over ICI):

    Δnwk_j  = psum over 'data'   (each slab is updated by every doc shard)
    Δndk_i  = psum over 'vocab'  (each doc's tokens are split across columns)
    Δnk     = psum over both axes

Chain semantics: same blocked/AD-LDA approximation family as the 1D runtime —
counts are stale within a sweep by at most one sweep's deltas; validated by the
statistical-parity harness, with exactness of the count tables themselves
guaranteed (they are pure functions of ``z``, checked by
``check_counts_consistent``).  Reference anchor for the preserved semantics:
``LdaModel.sampleTopicZ`` (SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
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
from ldagibbssampling_tpu.parallel.sharding import assign_docs

try:  # jax >= 0.9 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def partition_vocab(corpus: FlatCorpus, num_parts: int) -> np.ndarray:
    """Contiguous vocab boundaries balanced by token frequency.

    Returns ``bounds[num_parts + 1]`` with part j owning word ids
    ``[bounds[j], bounds[j+1])``.  Contiguity keeps local ids a subtraction
    (``w - bounds[j]``) instead of a lookup table.
    """
    v = corpus.vocab_size
    freq = np.bincount(corpus.token_word, minlength=v).astype(np.int64)
    cum = np.cumsum(freq)
    total = int(cum[-1]) if v else 0
    bounds = np.zeros(num_parts + 1, dtype=np.int32)
    bounds[num_parts] = v
    for j in range(1, num_parts):
        # first word index where cumulative frequency reaches j/num_parts
        target = total * j // num_parts
        bounds[j] = int(np.searchsorted(cum, target, side="left"))
    # enforce monotonicity for degenerate distributions (one huge word)
    for j in range(1, num_parts + 1):
        bounds[j] = max(bounds[j], bounds[j - 1])
    return bounds


@dataclasses.dataclass(frozen=True)
class GridShards:
    """Per-cell token arrays, stacked ``[Pd, Pv, ...]``.

    Word ids are LOCAL to the cell's vocab range; doc ids are LOCAL to the
    cell's doc shard.  ``doc_map[Pd, M_s]`` recovers global doc ids (−1 pad);
    ``vocab_bounds[Pv+1]`` recovers global word ids.
    """

    token_word: np.ndarray   # int32 [Pd, Pv, T_c] — local word ids
    token_doc: np.ndarray    # int32 [Pd, Pv, T_c] — local doc ids
    token_mask: np.ndarray   # int32 [Pd, Pv, T_c]
    doc_lengths: np.ndarray  # int32 [Pd, M_s] — FULL doc lengths (0 = pad doc)
    doc_map: np.ndarray      # int32 [Pd, M_s]
    vocab_bounds: np.ndarray  # int32 [Pv + 1]
    p_data: int
    p_vocab: int
    vocab_size: int
    num_real_tokens: int

    @property
    def tokens_per_cell(self) -> int:
        return int(self.token_word.shape[2])

    @property
    def docs_per_shard(self) -> int:
        return int(self.doc_lengths.shape[1])

    @property
    def vocab_per_shard(self) -> int:
        return int(np.max(np.diff(self.vocab_bounds))) if self.p_vocab else 0


def shard_corpus_grid(
    corpus: FlatCorpus, p_data: int, p_vocab: int, block_size: int = 1
) -> GridShards:
    """Partition tokens onto a ``p_data × p_vocab`` grid, padded uniformly.

    Fully vectorized: a single stable sort by (doc-shard, vocab-part) buckets
    all tokens at once — no per-token Python (round 2 did; at rung-3 scale,
    10^8 tokens, that loop was hours of host time; this is seconds).
    """
    lengths = corpus.doc_lengths()
    shard_docs = assign_docs(lengths, p_data)
    bounds = partition_vocab(corpus, p_vocab)
    # all vocab slabs padded to the same local size for uniform stacking
    v_s = max(1, int(np.max(np.diff(bounds))))

    m_s = max(1, max(len(s) for s in shard_docs))
    num_docs = corpus.num_docs
    shard_of_doc = np.zeros(max(num_docs, 1), np.int32)
    local_of_doc = np.zeros(max(num_docs, 1), np.int32)
    dl = np.zeros((p_data, m_s), dtype=np.int32)
    dmap = np.full((p_data, m_s), -1, dtype=np.int32)
    for i, docs in enumerate(shard_docs):
        idx = np.asarray(docs, np.int64)
        shard_of_doc[idx] = i
        local_of_doc[idx] = np.arange(len(docs), dtype=np.int32)
        dl[i, : len(docs)] = lengths[idx]
        dmap[i, : len(docs)] = idx

    word_part = (
        np.searchsorted(bounds, corpus.token_word, side="right") - 1
    ).astype(np.int64)
    sd = shard_of_doc[corpus.token_doc].astype(np.int64)
    group = sd * p_vocab + word_part
    num_groups = p_data * p_vocab
    counts = np.bincount(group, minlength=num_groups)
    t_raw = max(1, int(counts.max()))
    t_c = ((t_raw + block_size - 1) // block_size) * block_size

    # destination slot per token: group*t_c + stable rank within group.
    # num_groups is small (the device grid), so per-group mask passes beat an
    # O(T log T) argsort by ~3x at 10^8 tokens; one packed int64 scatter
    # replaces three int32 scatters (scattered writes dominate at this scale)
    idx_dt = np.int32 if num_groups * t_c < (1 << 31) else np.int64
    flat = np.empty(group.shape[0], idx_dt)
    for g in range(num_groups):
        m = group == g
        flat[m] = np.arange(
            g * t_c, g * t_c + int(counts[g]), dtype=idx_dt
        )
    w_local = (corpus.token_word - bounds[word_part]).astype(np.int64)
    packed = np.zeros(num_groups * t_c, dtype=np.int64)  # (d_local << 32) | w+1
    packed[flat] = (
        local_of_doc[corpus.token_doc].astype(np.int64) << 32
    ) | (w_local + 1)
    tm = (packed & 0xFFFFFFFF).astype(np.int32)
    tw = (tm - 1).clip(min=0)
    tm = (tm > 0).astype(np.int32)
    tw = np.where(tm > 0, tw, 0).reshape(p_data, p_vocab, t_c)
    td = (packed >> 32).astype(np.int32).reshape(p_data, p_vocab, t_c)
    tm = tm.reshape(p_data, p_vocab, t_c)

    return GridShards(
        token_word=tw, token_doc=td, token_mask=tm,
        doc_lengths=dl, doc_map=dmap, vocab_bounds=bounds,
        p_data=p_data, p_vocab=p_vocab,
        vocab_size=corpus.vocab_size, num_real_tokens=corpus.num_tokens,
    )


def _grid_word_freq(shards: GridShards, v_slab: int) -> np.ndarray:
    """Global per-word frequencies as ``[Pv, v_slab]`` (local-id indexed)."""
    freq = np.zeros((shards.p_vocab, max(v_slab, 1)), np.int64)
    for i in range(shards.p_data):
        for j in range(shards.p_vocab):
            real = shards.token_mask[i, j] > 0
            freq[j] += np.bincount(
                shards.token_word[i, j][real], minlength=max(v_slab, 1))
    return freq


def _fused_grid_plan(shards: GridShards, block_size: int, num_topics: int = 512):
    """Per-cell doc-slab layout for the fused kernel (uniform d_loc/row_tile).

    Returns ``(d_local [Pd, Pv, T_c], d0 [Pd, Pv, nb], d_loc, row_tile,
    slab_split)`` or ``None`` when the fused path is not applicable.  Guards
    are per-CELL f32-exactness bounds (word frequency, doc length), not
    round-2's per-corpus 2^24-token ceiling; exact topic totals are
    recomputed from the reconciled int tables each sweep.
    """
    from ldagibbssampling_tpu.corpus.flat import PaddedCorpus
    from ldagibbssampling_tpu.ops.gibbs import _pick_row_tile

    freq = _grid_word_freq(shards, shards.vocab_per_shard)
    if freq.size and int(freq.max()) >= (1 << 23):
        return None  # working f32 cells could exceed 2^24 mid-sweep
    max_doc_len = int(shards.doc_lengths.max()) if shards.doc_lengths.size else 0
    if max_doc_len >= (1 << 24):
        return None
    row_tile = _pick_row_tile(block_size, num_topics)
    if row_tile == 0:
        if block_size > 2048:
            return None
        row_tile = block_size

    def cell(i, j, mult):
        pcs = PaddedCorpus(
            token_word=shards.token_word[i, j], token_doc=shards.token_doc[i, j],
            token_mask=shards.token_mask[i, j],
            num_real_tokens=int(shards.token_mask[i, j].sum()),
            vocab_size=shards.vocab_size, num_docs=shards.docs_per_shard,
        )
        return pcs.doc_slabs(block_size, d_loc_multiple=mult)

    spans = [
        cell(i, j, 128)[2]
        for i in range(shards.p_data) for j in range(shards.p_vocab)
    ]
    d_loc = max(spans)
    d_local = np.zeros(shards.token_doc.shape, np.int32)
    d0 = None
    for i in range(shards.p_data):
        row = []
        for j in range(shards.p_vocab):
            dl_c, d0_c, _ = cell(i, j, d_loc)
            d_local[i, j] = dl_c
            row.append(d0_c)
        row = np.stack(row)
        d0 = row[None] if d0 is None else np.concatenate([d0, row[None]])
    return d_local, d0, d_loc, row_tile, max_doc_len > 256


def deferred_grid_layout(
    shards: GridShards, block_size: int, num_topics: int = 512,
    v_slab: int = 0,
) -> tuple[Optional[tuple[GridShards, dict]], Optional[str]]:
    """Per-cell ``DeferredPlan``s for the 2D grid, stacked ``[Pd, Pv, ...]``.

    Same contract as ``adlda.deferred_shard_layout``: returns
    ``((new_shards, layout), None)`` with the plans' stripe-aligned token
    arrays (word ids stay LOCAL to the cell's vocab slab), or ``(None,
    reason)``.  Per-cell rebuilds cover the cell's ``v_slab``-high slab; the
    psum over 'data' of local slab tables is f32-exact while every GLOBAL
    word frequency stays below 2^24.
    """
    from ldagibbssampling_tpu.corpus.flat import PaddedCorpus
    from ldagibbssampling_tpu.ops.count_kernel import plan_deferred, stack_plans
    from ldagibbssampling_tpu.ops.gibbs import _pick_row_tile

    row_tile = _pick_row_tile(block_size, num_topics)
    if row_tile == 0:
        return None, f"no Mosaic-legal row tile for block_size {block_size}"
    v_slab = v_slab or shards.vocab_per_shard
    freq = _grid_word_freq(shards, v_slab)
    if freq.size and int(freq.max()) >= (1 << 24):
        return None, (
            f"max global word frequency {int(freq.max())} >= 2^24 "
            "would round the psum'd f32 count tables"
        )
    plans = []
    for i in range(shards.p_data):
        for j in range(shards.p_vocab):
            real = shards.token_mask[i, j] > 0
            try:
                plans.append(plan_deferred(
                    shards.token_word[i, j][real],
                    shards.token_doc[i, j][real],
                    v_slab, block_size,
                ))
            except ValueError as e:  # e.g. no multiple-of-8 tile
                return None, str(e)
    stacked = stack_plans(plans)
    pd, pv = shards.p_data, shards.p_vocab

    def grid3(name):
        a = stacked[name]
        return a.reshape((pd, pv) + a.shape[1:])

    new_shards = GridShards(
        token_word=grid3("token_word"), token_doc=grid3("token_doc"),
        token_mask=grid3("token_mask"),
        doc_lengths=shards.doc_lengths, doc_map=shards.doc_map,
        vocab_bounds=shards.vocab_bounds,
        p_data=pd, p_vocab=pv, vocab_size=shards.vocab_size,
        num_real_tokens=shards.num_real_tokens,
    )
    # uniform doc-slab layout on the new arrays
    def cell(i, j, mult):
        pcs = PaddedCorpus(
            token_word=new_shards.token_word[i, j],
            token_doc=new_shards.token_doc[i, j],
            token_mask=new_shards.token_mask[i, j],
            num_real_tokens=int(new_shards.token_mask[i, j].sum()),
            vocab_size=v_slab, num_docs=new_shards.docs_per_shard,
        )
        return pcs.doc_slabs(block_size, d_loc_multiple=mult)

    d_loc = max(cell(i, j, 128)[2] for i in range(pd) for j in range(pv))
    d_local = np.zeros(new_shards.token_doc.shape, np.int32)
    d0_rows = []
    for i in range(pd):
        row = []
        for j in range(pv):
            dl_c, d0_c, _ = cell(i, j, d_loc)
            d_local[i, j] = dl_c
            row.append(d0_c)
        d0_rows.append(np.stack(row))
    layout = {
        "row_gather_idx": grid3("row_gather_idx"),
        "w_local": grid3("w_local"),
        "tile_stripe": grid3("tile_stripe"),
        "v_loc": stacked["v_loc"], "v_pad": stacked["v_pad"],
        "tile": stacked["tile"], "block_size": stacked["block_size"],
        "num_tiles": stacked["num_tiles"],
        "d_local": d_local, "d0": np.stack(d0_rows), "d_loc": d_loc,
        "row_tile": row_tile,
        "slab_split": (
            int(shards.doc_lengths.max()) > 256
            if shards.doc_lengths.size else False
        ),
    }
    return (new_shards, layout), None


def make_grid_sweep_fn(
    shards: GridShards,
    mesh: Mesh,
    *,
    alpha: float,
    beta: float,
    block_size: int,
    draw_method: str = "gumbel",
    num_sweeps: int = 1,
    sorted_words: bool = False,
    use_pallas: bool | str = False,
    pallas_interpret: bool = False,
    num_topics: int = 512,
    deferred_layout: Optional[dict] = None,
):
    """Jitted grid sweep ``(z, ndk, nwk, nk, key, sweep) -> same``.

    Shapes (host view): ``z [Pd, Pv, T_c]`` sharded ('data','vocab');
    ``ndk [Pd, M_s, K]`` sharded ('data'); ``nwk [Pv, V_s, K]`` sharded
    ('vocab'); ``nk [K]`` replicated.  The conditional needs the GLOBAL V·β
    smoothing mass, so ``vocab_size`` (not the slab height) fixes ``Vβ`` —
    ``gibbs_sweep`` derives V from the table, hence slabs are padded and the
    β-term corrected via the ``vbeta_override`` contract below.

    With ``deferred_layout`` (from :func:`deferred_grid_layout`; ``shards``
    must be its ``new_shards``) each cell runs the deferred-``nwk`` sweep and
    its slab is reconciled as ``psum(local_counts, 'data')`` — stripe-local
    MXU rebuild per vocab slab, no per-block scatter and no token ceiling.
    The returned fn carries the effective tier as ``run.kernel_tier``.
    """
    from ldagibbssampling_tpu.ops.gibbs import warn_tier_downgrade

    # device-committed ARGUMENTS, not closures (closure constants are
    # re-shipped per call under shard_map on remote platforms; see adlda.py)
    grid_sh = NamedSharding(mesh, P("data", "vocab"))
    data_sh = NamedSharding(mesh, P("data"))
    tw = jax.device_put(jnp.asarray(shards.token_word), grid_sh)
    td = jax.device_put(jnp.asarray(shards.token_doc), grid_sh)
    tm = jax.device_put(jnp.asarray(shards.token_mask), grid_sh)
    dl = jax.device_put(jnp.asarray(shards.doc_lengths), data_sh)
    v_global = shards.vocab_size

    if use_pallas and jax.default_backend() != "tpu" and not pallas_interpret:
        warn_tier_downgrade(
            use_pallas, False, f"platform is {jax.default_backend()!r}, not tpu")
        use_pallas = False
        deferred_layout = None

    if deferred_layout is not None:
        return _make_deferred_grid_sweep_fn(
            shards, mesh, deferred_layout,
            alpha=alpha, beta=beta, num_sweeps=num_sweeps,
            pallas_interpret=pallas_interpret,
            tw=tw, tm=tm, grid_sh=grid_sh, v_global=v_global,
        )

    plan = None
    if use_pallas == "deferred":
        warn_tier_downgrade(
            "deferred", "fused",
            "no deferred_layout supplied (see deferred_grid_layout)")
        use_pallas = "fused"
    if use_pallas == "fused" and draw_method == "gumbel" and block_size >= 128:
        plan = _fused_grid_plan(shards, block_size, num_topics)
        if plan is None:
            warn_tier_downgrade(
                "fused", False,
                "no fused grid plan (f32 cell-exactness guard or no "
                "Mosaic-legal tile)")
    elif use_pallas == "fused":
        warn_tier_downgrade(
            "fused", False,
            f"draw_method {draw_method!r} / block_size {block_size} "
            "unsupported by the fused kernel")
    if plan is not None:
        from ldagibbssampling_tpu.ops.gibbs import fused_gibbs_sweep

        d_local, d0, d_loc, row_tile, slab_split = plan
        tdl = jax.device_put(jnp.asarray(d_local), grid_sh)
        jd0 = jax.device_put(jnp.asarray(d0), grid_sh)
        noise_mode = "external" if pallas_interpret else "internal"
    else:
        tdl = jax.device_put(jnp.zeros_like(tm), grid_sh)
        jd0 = jax.device_put(
            jnp.zeros((shards.p_data, shards.p_vocab, 1), jnp.int32), grid_sh)

    def local_sweeps(tw, td, tm, dl, tdl, jd0, z, ndk, nwk, nk, key, sweep,
                     n_sweeps, alpha_t, beta_t):
        tw, td, tm = tw[0, 0], td[0, 0], tm[0, 0]
        dl = dl[0]
        i = lax.axis_index("data")
        j = lax.axis_index("vocab")
        cell_key = jax.random.fold_in(
            jax.random.fold_in(key, i), j + (1 << 16)
        )

        def one_sweep(_, carry):
            z, ndk, nwk, nk, sweep = carry
            state = SamplerState(z=z, ndk=ndk, nwk=nwk, nk=nk,
                                 key=cell_key, sweep=sweep)
            if plan is not None:
                new = fused_gibbs_sweep(
                    state, tw, tdl[0, 0], tm, jd0[0, 0],
                    alpha=alpha_t, beta=beta_t, block_size=block_size,
                    d_loc=d_loc, row_tile=row_tile, sorted_words=sorted_words,
                    noise_mode=noise_mode, pallas_interpret=pallas_interpret,
                    vocab_size=v_global, slab_split=slab_split,
                )
                # deltas reconcile as usual; exact topic totals come from the
                # reconciled int slabs (kernel's f32 nk is a normalizer only)
                nwk2 = nwk + lax.psum(new.nwk - nwk, "data")
                ndk2 = ndk + lax.psum(new.ndk - ndk, "vocab")
                nk2 = lax.psum(jnp.sum(nwk2, axis=0), "vocab")
                return new.z, ndk2, nwk2, nk2, new.sweep
            new = gibbs_sweep(
                state, tw, td, tm, dl,
                alpha=alpha_t, beta=beta_t, block_size=block_size,
                draw_method=draw_method, vocab_size=v_global,
                sorted_words=sorted_words,
            )
            dnwk = lax.psum(new.nwk - nwk, "data")
            dndk = lax.psum(new.ndk - ndk, "vocab")
            dnk = lax.psum(new.nk - nk, ("data", "vocab"))
            return new.z, ndk + dndk, nwk + dnwk, nk + dnk, new.sweep

        # traced bound: one dispatch per batch of sweeps (see adlda.py)
        z, ndk, nwk, nk, sweep = lax.fori_loop(
            0, n_sweeps, one_sweep, (z[0, 0], ndk[0], nwk[0], nk, sweep)
        )
        return z[None, None], ndk[None], nwk[None], nk, sweep

    fn = shard_map(
        local_sweeps,
        mesh=mesh,
        in_specs=(
            P("data", "vocab"), P("data", "vocab"), P("data", "vocab"),  # tw td tm
            P("data"),                                                    # dl
            P("data", "vocab"), P("data", "vocab"),                       # tdl jd0
            P("data", "vocab"), P("data"), P("vocab"), P(), P(), P(),     # z ndk nwk nk key sweep
            P(), P(), P(),                                                # n_sweeps alpha beta
        ),
        out_specs=(P("data", "vocab"), P("data"), P("vocab"), P(), P()),
        check_vma=False,
    )

    # out_shardings pinned to the out_specs' NamedShardings: without this,
    # GSPMD on small meshes may canonicalize an output's sharding to a
    # content-equivalent but different one, and feeding outputs back as
    # inputs respecializes the executable (one-time ~20 s recompile on the
    # second dispatch — see parallel/adlda.py).
    run_impl = jax.jit(fn, out_shardings=(
        NamedSharding(mesh, P("data", "vocab")),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("vocab")),
        NamedSharding(mesh, P()),
        NamedSharding(mesh, P()),
    ))

    def run(z, ndk, nwk, nk, key, sweep, n_sweeps=None, alpha_v=None, beta_v=None):
        # α/β are traced scalars so Minka updates never recompile
        n = jnp.int32(num_sweeps if n_sweeps is None else n_sweeps)
        a = jnp.float32(alpha if alpha_v is None else alpha_v)
        b = jnp.float32(beta if beta_v is None else beta_v)
        return run_impl(tw, td, tm, dl, tdl, jd0, z, ndk, nwk, nk, key, sweep,
                        n, a, b)

    run.kernel_tier = "fused" if plan is not None else "xla"
    return run


def _make_deferred_grid_sweep_fn(
    shards: GridShards,
    mesh: Mesh,
    layout: dict,
    *,
    alpha: float,
    beta: float,
    num_sweeps: int,
    pallas_interpret: bool,
    tw, tm, grid_sh, v_global: int,
):
    """Deferred-``nwk`` grid sweep (see ``make_grid_sweep_fn``)."""
    from ldagibbssampling_tpu.ops.count_kernel import replicate_rows
    from ldagibbssampling_tpu.ops.gibbs import deferred_local_counts

    pd, pv = shards.p_data, shards.p_vocab
    nt, tile = layout["num_tiles"], layout["tile"]
    block_size = layout["block_size"]
    d_loc, row_tile = layout["d_loc"], layout["row_tile"]
    v_loc, v_pad = layout["v_loc"], layout["v_pad"]
    slab_split = layout["slab_split"]
    noise_mode = "external" if pallas_interpret else "internal"

    tdl = jax.device_put(jnp.asarray(layout["d_local"]), grid_sh)
    jd0 = jax.device_put(jnp.asarray(layout["d0"]), grid_sh)
    jrg = jax.device_put(jnp.asarray(layout["row_gather_idx"]), grid_sh)
    jwl = jax.device_put(
        jnp.asarray(layout["w_local"].reshape(pd, pv, nt, tile)), grid_sh)
    jts = jax.device_put(jnp.asarray(layout["tile_stripe"]), grid_sh)

    def local_sweeps(tw, tm, tdl, jd0, jrg, jwl, jts, z, ndk, nwk, nk,
                     key, sweep, n_sweeps, alpha_t, beta_t):
        tw, tm, tdl = tw[0, 0], tm[0, 0], tdl[0, 0]
        d0_, rg_, ts_ = jd0[0, 0], jrg[0, 0], jts[0, 0]
        wl8 = replicate_rows(jwl[0, 0])
        i = lax.axis_index("data")
        j = lax.axis_index("vocab")
        cell_key = jax.random.fold_in(
            jax.random.fold_in(key, i), j + (1 << 16)
        )

        def one_sweep(_, carry):
            z, ndk, nwk, nk, sweep = carry
            state = SamplerState(z=z, ndk=ndk, nwk=nwk, nk=nk,
                                 key=cell_key, sweep=sweep)
            z2, ndk_cell, local_counts, _, _ = deferred_local_counts(
                state, tw, tdl, tm, d0_, rg_, wl8, ts_, alpha_t, beta_t,
                block_size=block_size, d_loc=d_loc, row_tile=row_tile,
                noise_mode=noise_mode, pallas_interpret=pallas_interpret,
                vocab_size=v_global, v_loc=v_loc, v_pad=v_pad, tile=tile,
                slab_split=slab_split,
            )
            # slab counts = sum of the column's per-row local tables; doc
            # counts reconcile across the row's vocab split as deltas
            nwk2 = lax.psum(local_counts, "data").astype(nwk.dtype)
            ndk2 = ndk + lax.psum(ndk_cell - ndk, "vocab")
            nk2 = lax.psum(jnp.sum(nwk2, axis=0), "vocab")
            return z2, ndk2, nwk2, nk2, sweep + 1

        z, ndk, nwk, nk, sweep = lax.fori_loop(
            0, n_sweeps, one_sweep, (z[0, 0], ndk[0], nwk[0], nk, sweep)
        )
        return z[None, None], ndk[None], nwk[None], nk, sweep

    g = P("data", "vocab")
    fn = shard_map(
        local_sweeps,
        mesh=mesh,
        in_specs=(g, g, g, g, g, g, g,
                  g, P("data"), P("vocab"), P(), P(), P(), P(), P(), P()),
        out_specs=(g, P("data"), P("vocab"), P(), P()),
        check_vma=False,
    )
    # out_shardings pinned: see make_grid_sweep_fn (avoids the one-time
    # second-dispatch respecialization when outputs feed back as inputs)
    run_impl = jax.jit(fn, out_shardings=(
        NamedSharding(mesh, g),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("vocab")),
        NamedSharding(mesh, P()),
        NamedSharding(mesh, P()),
    ))

    def run(z, ndk, nwk, nk, key, sweep, n_sweeps=None, alpha_v=None, beta_v=None):
        n = jnp.int32(num_sweeps if n_sweeps is None else n_sweeps)
        a = jnp.float32(alpha if alpha_v is None else alpha_v)
        b = jnp.float32(beta if beta_v is None else beta_v)
        return run_impl(tw, tm, tdl, jd0, jrg, jwl, jts, z, ndk, nwk, nk,
                        key, sweep, n, a, b)

    run.kernel_tier = "deferred"
    return run


class GridLda:
    """DP×TP collapsed-Gibbs LDA over a 2D ('data', 'vocab') mesh."""

    def __init__(
        self,
        config: LdaConfig,
        corpus: FlatCorpus,
        mesh: Optional[Mesh] = None,
        p_data: Optional[int] = None,
        p_vocab: Optional[int] = None,
    ) -> None:
        if mesh is None:
            devs = jax.devices()
            pd = p_data or max(1, len(devs) // (p_vocab or 2))
            pv = p_vocab or max(1, len(devs) // pd)
            mesh = Mesh(
                np.array(devs[: pd * pv]).reshape(pd, pv), ("data", "vocab")
            )
        self.mesh = mesh
        pd, pv = mesh.devices.shape
        self.config = config
        self.corpus = corpus
        block = max(1, config.block_size)
        self.shards = shard_corpus_grid(corpus, pd, pv, block_size=block)
        block = min(block, self.shards.tokens_per_cell)
        self.block_size = block

        k = config.topic_num
        v_s = max(
            1,
            ((self.shards.vocab_per_shard + 127) // 128) * 128,
        )  # lane-aligned slab height
        self._v_s = v_s

        # kernel-tier resolution BEFORE state init (the deferred tier re-lays
        # out each cell's token stream — see parallel/adlda.py)
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
            layout, reason = deferred_grid_layout(
                self.shards, block, config.topic_num, v_slab=v_s)
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
        root = jax.random.PRNGKey(config.seed)
        init_key, self._key = jax.random.split(root)
        from ldagibbssampling_tpu.models.state import host_randint

        z = host_randint(init_key, self.shards.token_word.shape, k)
        mask = self.shards.token_mask.astype(bool)
        bounds = self.shards.vocab_bounds
        ndk = np.zeros((pd, self.shards.docs_per_shard, k), dtype=np.int32)
        nwk = np.zeros((pv, v_s, k), dtype=np.int32)
        for i in range(pd):
            for j in range(pv):
                sel = mask[i, j]
                np.add.at(ndk[i], (self.shards.token_doc[i, j][sel], z[i, j][sel]), 1)
                np.add.at(nwk[j], (self.shards.token_word[i, j][sel], z[i, j][sel]), 1)
        nk = nwk.sum(axis=(0, 1), dtype=np.int32)

        spec = lambda *axes: NamedSharding(mesh, P(*axes))  # noqa: E731
        self.z = jax.device_put(jnp.asarray(z), spec("data", "vocab"))
        self.ndk = jax.device_put(jnp.asarray(ndk), spec("data"))
        self.nwk = jax.device_put(jnp.asarray(nwk), spec("vocab"))
        self.nk = jax.device_put(jnp.asarray(nk), spec())
        # committed replicated scalar: matches the sweep fn's pinned output
        # sharding so the input signature never changes across dispatches
        self.sweep_idx = jax.device_put(jnp.int32(0), spec())
        # live hyperparameters (Minka optimization moves them; sweeps trace them)
        self.alpha = float(config.alpha)
        self.beta = float(config.beta)

        self._sweep_fn = make_grid_sweep_fn(
            self.shards, mesh,
            alpha=config.alpha, beta=config.beta, block_size=block,
            draw_method=config.draw_method, num_sweeps=1,
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
        """Minka (α, β) via collectives on the 2D mesh (BASELINE config 4).

        α: ``ndk`` digamma sums psum'd over 'data'; β: vocab-sharded ``nwk``
        slab sums psum'd over 'vocab' (``models/hyper.sharded_beta_update``) —
        pad rows contribute Ψ(β)−Ψ(β)=0.  Both run as one shard_map on the
        grid mesh; updated values flow into sweeps as traced scalars.
        """
        from ldagibbssampling_tpu.models.hyper import (
            sharded_alpha_update, sharded_beta_update)

        dl_sh = jax.device_put(
            jnp.asarray(self.shards.doc_lengths),
            NamedSharding(self.mesh, P("data")),
        )
        v_global = self.corpus.vocab_size

        def body(nd, dlr, nwk, nk):
            a = sharded_alpha_update(
                nd[0], dlr[0], jnp.float32(self.alpha), "data", iters=iters)
            b = sharded_beta_update(
                nwk[0], nk, jnp.float32(self.beta), "vocab", v_global,
                iters=iters)
            return a, b

        fn = jax.jit(shard_map(
            body, mesh=self.mesh,
            in_specs=(P("data"), P("data"), P("vocab"), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        a, b = fn(self.ndk, dl_sh, self.nwk, self.nk)
        self.alpha, self.beta = float(a), float(b)
        return self.alpha, self.beta

    # ------------------------------------------------------------------
    def device_log_likelihood(self) -> float:
        """Training LL on the grid: each cell reduces its own tokens against
        its exact-local ``nwk`` slab and its row's ``ndk`` replica (every
        token lives in exactly one cell, so the cell partials are disjoint);
        the host sums all cells' chunk partials in float64.  The V·β mass
        uses the GLOBAL vocabulary size, as in the sweep."""
        if not hasattr(self, "_ll_fn"):
            from ldagibbssampling_tpu.evaluation.device_metrics import (
                shard_ll_chunks)

            g = P("data", "vocab")
            grid_sh = NamedSharding(self.mesh, g)
            data_sh = NamedSharding(self.mesh, P("data"))
            tw = jax.device_put(jnp.asarray(self.shards.token_word), grid_sh)
            td = jax.device_put(jnp.asarray(self.shards.token_doc), grid_sh)
            tm = jax.device_put(jnp.asarray(self.shards.token_mask), grid_sh)
            dl = jax.device_put(jnp.asarray(self.shards.doc_lengths), data_sh)
            v_global = self.corpus.vocab_size

            def local(tw, td, tm, dl, ndk, nwk, nk, a, b):
                chunks = shard_ll_chunks(
                    ndk[0], nwk[0], nk, tw[0, 0], td[0, 0], tm[0, 0], dl[0],
                    a, b, vocab_size=v_global)
                return chunks[None, None]

            fn = shard_map(
                local, mesh=self.mesh,
                in_specs=(g, g, g, P("data"), P("data"), P("vocab"),
                          P(), P(), P()),
                out_specs=g,
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
        """Orbax checkpoint of the grid run (arrays keep their shardings)."""
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
    def global_nwk(self) -> np.ndarray:
        """Reassemble the global ``[V, K]`` word-topic table from the slabs."""
        slabs = np.asarray(self.nwk)
        bounds = self.shards.vocab_bounds
        v = self.corpus.vocab_size
        k = slabs.shape[-1]
        out = np.zeros((v, k), dtype=slabs.dtype)
        for j in range(self.shards.p_vocab):
            lo, hi = int(bounds[j]), int(bounds[j + 1])
            out[lo:hi] = slabs[j, : hi - lo]
        return out

    def phi(self) -> np.ndarray:
        nwk = self.global_nwk().astype(np.float64)
        nk = np.asarray(self.nk, dtype=np.float64)
        v = nwk.shape[0]
        return ((nwk + self.beta) / (nk + v * self.beta)).T

    def theta(self) -> np.ndarray:
        ndk = np.asarray(self.ndk)
        k = ndk.shape[-1]
        m = self.corpus.num_docs
        out = np.zeros((m, k), dtype=np.float64)
        lengths = self.corpus.doc_lengths()
        for i in range(self.shards.p_data):
            for local, g in enumerate(self.shards.doc_map[i]):
                if g >= 0:
                    out[g] = ndk[i, local]
        return (out + self.alpha) / (lengths[:, None] + k * self.alpha)

    # ------------------------------------------------------------------
    def check_counts_consistent(self) -> None:
        """Debug cross-check: recompute every table from ``z`` serially."""
        z = np.asarray(self.z)
        mask = self.shards.token_mask.astype(bool)
        k = self.config.topic_num
        pd, pv = self.shards.p_data, self.shards.p_vocab
        ndk_ref = np.zeros((pd, self.shards.docs_per_shard, k), dtype=np.int64)
        nwk_ref = np.zeros((pv, self._v_s, k), dtype=np.int64)
        for i in range(pd):
            for j in range(pv):
                sel = mask[i, j]
                np.add.at(ndk_ref[i], (self.shards.token_doc[i, j][sel], z[i, j][sel]), 1)
                np.add.at(nwk_ref[j], (self.shards.token_word[i, j][sel], z[i, j][sel]), 1)
        np.testing.assert_array_equal(np.asarray(self.ndk), ndk_ref)
        np.testing.assert_array_equal(np.asarray(self.nwk), nwk_ref)
        np.testing.assert_array_equal(
            np.asarray(self.nk), nwk_ref.sum(axis=(0, 1))
        )

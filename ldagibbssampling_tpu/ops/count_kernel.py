"""Deferred word-topic updates: layout planner + MXU count-rebuild kernel.

This module is what makes the *deferred* ``nwk`` mode of the fused sweep
(``ops/gibbs.py``, ``use_pallas="deferred"``) pay.  Round 2's remaining bound
was the per-block XLA gather + scatter over the ``[V, K]`` word-topic table
(~22 ms of a 38 ms sweep at T=1M, K=500): the reference's per-token ``nkt``
increment (``LdaModel.sampleTopicZ`` step 5) amortized into dense ``[B, K]``
row scatters.  Measured on a v5e, both halves are **row-count-bound** (~14 ns
per gathered/scattered row regardless of f32 vs bf16), so shrinking bytes
doesn't help — the scatter has to go.  In deferred mode:

- blocks sample against a sweep-stale ``nwk`` snapshot (exactly the AD-LDA
  staleness already accepted *across* shards — Newman et al.; validated by the
  statistical-parity harness), so no per-block scatter is needed;
- the table is rebuilt ONCE per sweep from the final assignments as MXU
  matmuls:  ``nwk[stripe] = Σ_tiles onehot_w^T @ onehot_z``  over word-sorted
  tokens bucketed into contiguous vocab stripes of ``v_loc`` ids;
- the word-sorted view of ``z`` is produced by a **row gather**: each
  (block, stripe) run is 8-slot-aligned in the sweep layout, so reordering
  1M+ assignments is ~1 ms of ``[T/8, 8]`` row-takes instead of a ~20 ms
  scalar gather.

Count cells accumulate in float32 — exact while every cell (one word's count
in one topic) stays below 2^24, a per-*word-frequency* bound that replaces
round 2's per-*corpus* 2^24-token fused-path ceiling.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_ALIGN = 8  # row-gather granularity: (block, stripe) runs start/end on 8-slot edges


@dataclasses.dataclass(frozen=True)
class DeferredPlan:
    """Static token layout for the deferred-``nwk`` fused sweep.

    The sweep arrays (``token_word/doc/mask``) are doc-major across blocks and
    word-sorted within each block, with every (block, vocab-stripe) run padded
    to a multiple of 8 slots; padding slots copy their run's last word/doc so
    block word order stays non-decreasing (the gather's ``indices_are_sorted``
    hint).  ``perm[i]`` is the source index of slot ``i`` in the caller's real
    token stream (-1 for padding).

    The rebuild stream is the word-sorted concatenation, per vocab stripe, of
    those runs: ``row_gather_idx`` indexes ``z.reshape(-1, 8)`` rows,
    ``w_local`` carries stripe-relative word ids (-1 neutralizes padding), and
    ``tile_stripe`` maps each ``tile``-token kernel step to its output stripe.
    """

    # sweep layout
    token_word: np.ndarray   # int32 [T_pad]
    token_doc: np.ndarray    # int32 [T_pad]
    token_mask: np.ndarray   # int32 [T_pad]
    perm: np.ndarray         # int64 [T_pad]; source real-token index, -1 = pad
    block_size: int
    # rebuild layout
    row_gather_idx: np.ndarray  # int32 [T2 // 8] — rows of z.reshape(-1, 8)
    w_local: np.ndarray         # int32 [T2]; -1 for padding slots
    tile_stripe: np.ndarray     # int32 [T2 // tile]
    v_loc: int
    v_pad: int
    tile: int
    # guards (f32 exactness bounds; see module docstring)
    max_word_freq: int

    @property
    def num_tokens(self) -> int:
        return int(self.token_word.shape[0])


def plan_deferred(
    token_word: np.ndarray,
    token_doc: np.ndarray,
    vocab_size: int,
    block_size: int,
    *,
    v_loc: int = 128,
    tile: int = 2048,
) -> DeferredPlan:
    """Host-side, one-off layout for the deferred sweep (see ``DeferredPlan``).

    ``token_word/doc`` are the REAL (unpadded) doc-major token stream; blocks
    are filled greedily so that, after per-stripe 8-slot alignment padding,
    each block holds exactly ``block_size`` slots (~1–2% padding at Zipf word
    statistics).
    """
    token_word = np.asarray(token_word, np.int32)
    token_doc = np.asarray(token_doc, np.int32)
    t_real = int(token_word.shape[0])
    # largest multiple-of-8 divisor of block_size within the requested tile
    tile = min(tile, block_size)
    while tile >= _ALIGN and block_size % tile:
        tile -= _ALIGN
    if tile < _ALIGN or block_size % tile or tile % _ALIGN:
        raise ValueError(f"block_size {block_size} has no multiple-of-8 tile <= requested")
    v_pad = max(_round_up(max(vocab_size, 1), v_loc), v_loc)
    num_stripes = v_pad // v_loc

    # ---- pass 1: greedy block fill (real tokens per block, incl. alignment)
    blocks: list[tuple[int, int]] = []  # (start, n_real)
    pos = 0
    while pos < t_real:
        n = min(block_size, t_real - pos)
        while True:
            stripes = token_word[pos : pos + n] // v_loc
            runs = np.bincount(stripes, minlength=1)
            padded = int(((runs + _ALIGN - 1) // _ALIGN * _ALIGN).sum())
            if padded <= block_size:
                break
            n -= (padded - block_size)
            if n <= 0:
                raise ValueError("block_size too small for stripe alignment")
        blocks.append((pos, n))
        pos += n
    if not blocks:
        blocks = [(0, 0)]
    nb = len(blocks)
    t_pad = nb * block_size

    out_word = np.zeros(t_pad, np.int32)
    out_doc = np.zeros(t_pad, np.int32)
    out_mask = np.zeros(t_pad, np.int32)
    out_perm = np.full(t_pad, -1, np.int64)
    # (stripe, block) -> (slot_start, n_real, n_slots); filled in pass 2
    run_start = np.zeros((num_stripes, nb), np.int64)
    run_slots = np.zeros((num_stripes, nb), np.int64)
    run_real = np.zeros((num_stripes, nb), np.int64)

    for b, (start, n) in enumerate(blocks):
        w = token_word[start : start + n]
        order = np.argsort(w, kind="stable")
        w_sorted = w[order]
        src = start + order
        stripes_present = np.unique(w_sorted // v_loc) if n else np.array([], np.int64)
        cursor = b * block_size
        lo = 0
        for s in stripes_present:
            hi = int(np.searchsorted(w_sorted, (int(s) + 1) * v_loc, side="left"))
            rn = hi - lo
            slots = _round_up(rn, _ALIGN)
            sl = slice(cursor, cursor + rn)
            out_word[sl] = w_sorted[lo:hi]
            out_doc[sl] = token_doc[src[lo:hi]]
            out_mask[sl] = 1
            out_perm[sl] = src[lo:hi]
            if slots > rn:  # alignment pads copy the run's last word/doc
                out_word[cursor + rn : cursor + slots] = w_sorted[hi - 1]
                out_doc[cursor + rn : cursor + slots] = token_doc[src[hi - 1]]
            run_start[s, b] = cursor
            run_slots[s, b] = slots
            run_real[s, b] = rn
            cursor += slots
            lo = hi
        if cursor < (b + 1) * block_size and n:
            # block-tail pads keep the last word so the block stays sorted
            out_word[cursor : (b + 1) * block_size] = out_word[cursor - 1]
            out_doc[cursor : (b + 1) * block_size] = out_doc[cursor - 1]

    # ---- pass 2: rebuild stream (stripe-major concatenation of runs)
    stripe_slots = run_slots.sum(axis=1)
    stripe_padded = np.maximum(
        (stripe_slots + tile - 1) // tile * tile, tile
    )  # >=1 tile so every output stripe block is initialized
    t2 = int(stripe_padded.sum())
    row_gather_idx = np.zeros(t2 // _ALIGN, np.int32)
    w_local = np.full(t2, -1, np.int32)
    tile_stripe = np.empty(t2 // tile, np.int32)
    out = 0
    for s in range(num_stripes):
        seg_start = out
        for b in range(nb):
            slots = int(run_slots[s, b])
            if not slots:
                continue
            st = int(run_start[s, b])
            rn = int(run_real[s, b])
            row_gather_idx[out // _ALIGN : (out + slots) // _ALIGN] = (
                st // _ALIGN + np.arange(slots // _ALIGN, dtype=np.int32)
            )
            w_local[out : out + rn] = out_word[st : st + rn] - s * v_loc
            out += slots
        out = seg_start + int(stripe_padded[s])
        tile_stripe[seg_start // tile : out // tile] = s

    max_word_freq = (
        int(np.bincount(token_word, minlength=1).max()) if t_real else 0
    )
    return DeferredPlan(
        token_word=out_word, token_doc=out_doc, token_mask=out_mask,
        perm=out_perm, block_size=block_size,
        row_gather_idx=row_gather_idx, w_local=w_local,
        tile_stripe=tile_stripe, v_loc=v_loc, v_pad=v_pad, tile=tile,
        max_word_freq=max_word_freq,
    )


def _count_kernel(stripe_ref, w_local_ref, z_ref, out_ref, nk_ref,
                  mirror_ref=None):
    tile = w_local_ref.shape[1]
    v_loc, k_pad = out_ref.shape
    i = pl.program_id(0)

    # zero the stripe's accumulator on its first tile (consecutive revisits
    # keep the block resident in VMEM — the standard accumulate pattern)
    first = jnp.logical_or(
        i == 0, stripe_ref[jnp.maximum(i, 1) - 1] != stripe_ref[i]
    )

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(i == 0)
    def _():
        nk_ref[:] = jnp.zeros_like(nk_ref)

    # LANE-major one-hots: token ids arrive as [8, tile] blocks (row 0 is the
    # data; the 8x row replication exists because an [N, 1] column array gets
    # the T(8,128) tiled HBM layout — lanes pad 1 -> 128, a 128x memory blowup
    # at rung-3+ token counts).  Contraction on lanes of both operands maps
    # onto the MXU; MAC cost scales with v_loc (measured sweeps on v5e, K=500,
    # T=1M: v_loc 128/256/512 -> 19.3/19.8/24.7 ms — 128 is the default).
    wrows = jax.lax.broadcasted_iota(jnp.int32, (v_loc, tile), dimension=0)
    zrows = jax.lax.broadcasted_iota(jnp.int32, (k_pad, tile), dimension=0)
    oh_wT = (wrows == w_local_ref[0:1, :]).astype(jnp.bfloat16)  # pads (-1): zero
    oh_zT = (zrows == z_ref[0:1, :]).astype(jnp.bfloat16)
    # [v_loc, K] += onehot_w^T @ onehot_z — 0/1 bf16 inputs, exact f32 accumulate
    out_ref[:] += jax.lax.dot_general(
        oh_wT, oh_zT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # topic totals ride along: per-tile masked column counts of onehot_z
    # (pads have w_local == -1).  Replaces a separate [V_pad, K] column-sum
    # pass over the rebuilt table (measured 1.5 ms/sweep at V=50k on v5e).
    real = (w_local_ref[0:1, :] >= 0).astype(jnp.float32)
    nk_ref[0:1, :] += jnp.sum(
        oh_zT.astype(jnp.float32) * real, axis=1
    )[None, :]
    if mirror_ref is not None:
        # bf16 snapshot of the stripe's accumulator, rewritten every tile so
        # the stripe's LAST tile leaves the finished counts behind (the output
        # block stays VMEM-resident across the stripe's consecutive tiles and
        # is flushed to HBM once, when the block index changes).  This is the
        # next sweep's gather mirror — emitting it here removes the separate
        # per-sweep [V, K] int32 -> bf16 pad+cast pass (measured ~2 ms at
        # V=50k, K=500 on v5e).
        mirror_ref[:] = out_ref[:].astype(mirror_ref.dtype)


def replicate_rows(x2d: jax.Array) -> jax.Array:
    """[nt, tile] -> [nt*8, tile] row replication (see _count_kernel)."""
    nt, tile = x2d.shape
    return jnp.broadcast_to(x2d[:, None, :], (nt, 8, tile)).reshape(nt * 8, tile)


@functools.partial(
    jax.jit,
    static_argnames=(
        "v_loc", "v_pad", "k_pad", "tile", "interpret", "emit_mirror",
    ),
)
def build_nwk(
    z: jax.Array,               # int32 [T_pad] — assignments in sweep-layout order
    row_gather_idx: jax.Array,  # int32 [T2 // 8]
    w_local8: jax.Array,        # int32 [(T2 // tile) * 8, tile] — replicated rows
    tile_stripe: jax.Array,     # int32 [T2 // tile]
    *,
    v_loc: int,
    v_pad: int,
    k_pad: int,
    tile: int,
    interpret: bool = False,
    emit_mirror: bool = False,
):
    """Rebuild the padded word-topic table from ``z``.

    Returns ``(nwk [v_pad, k_pad] f32, nk [k_pad] f32)`` — the topic totals
    are accumulated inside the same kernel pass (integer-exact below 2^24).
    With ``emit_mirror=True`` a third output rides along: the bf16 cast of the
    rebuilt table (``[v_pad, k_pad]``), which the next deferred sweep uses as
    its gather snapshot without a separate pad+cast pass.
    """
    nt = tile_stripe.shape[0]
    t2 = nt * tile
    if w_local8.shape != (nt * 8, tile) or v_pad % v_loc or z.shape[0] % _ALIGN:
        raise ValueError(
            f"layout misaligned: w_local8 {w_local8.shape}, nt={nt}, "
            f"tile={tile}, v_pad={v_pad}, T={z.shape[0]}"
        )
    # word-sorted view of z as a ROW gather (runs are 8-slot aligned)
    z_rows = jnp.take(z.reshape(-1, _ALIGN), row_gather_idx, axis=0)
    z8 = replicate_rows(z_rows.reshape(nt, tile).astype(jnp.int32))

    out_specs = [
        pl.BlockSpec(
            (v_loc, k_pad), lambda i, s: (s[i], 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((8, k_pad), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((v_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((8, k_pad), jnp.float32),
    ]
    if emit_mirror:
        out_specs.append(
            pl.BlockSpec(
                (v_loc, k_pad), lambda i, s: (s[i], 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((v_pad, k_pad), jnp.bfloat16)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        _count_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_stripe, w_local8, z8)
    if emit_mirror:
        nwk, nk, mirror = outs
        return nwk, nk[0], mirror
    nwk, nk = outs
    return nwk, nk[0]


def stack_plans(plans: list["DeferredPlan"]) -> dict:
    """Uniformize per-shard plans to one static shape and stack ``[P, ...]``.

    The shard_map'd AD-LDA program needs identical shapes on every shard:
    shorter shards get all-pad trailing blocks (mask 0, last word/doc repeated
    so block word order stays non-decreasing) and all-pad trailing rebuild
    tiles (``w_local == -1`` rows assigned to the LAST stripe, which every
    plan visits — tile stripes stay non-decreasing and every output stripe
    stays initialized).
    """
    if not plans:
        raise ValueError("no plans to stack")
    p0 = plans[0]
    if any((q.v_loc, q.v_pad, q.tile, q.block_size)
           != (p0.v_loc, p0.v_pad, p0.tile, p0.block_size) for q in plans):
        raise ValueError("plans disagree on static layout parameters")
    block, tile = p0.block_size, p0.tile
    t_pad = max(q.num_tokens for q in plans)
    nt = max(q.tile_stripe.shape[0] for q in plans)
    last_stripe = p0.v_pad // p0.v_loc - 1

    def pad_sweep(q: "DeferredPlan"):
        n = q.num_tokens
        tw = np.full(t_pad, q.token_word[-1] if n else 0, np.int32)
        td = np.full(t_pad, q.token_doc[-1] if n else 0, np.int32)
        tm = np.zeros(t_pad, np.int32)
        pm = np.full(t_pad, -1, np.int64)
        tw[:n], td[:n], tm[:n], pm[:n] = (
            q.token_word, q.token_doc, q.token_mask, q.perm)
        return tw, td, tm, pm

    def pad_rebuild(q: "DeferredPlan"):
        qt = q.tile_stripe.shape[0]
        ts = np.full(nt, last_stripe, np.int32)
        wl = np.full(nt * tile, -1, np.int32)
        rg = np.zeros(nt * tile // _ALIGN, np.int32)
        ts[:qt] = q.tile_stripe
        wl[: qt * tile] = q.w_local
        rg[: qt * tile // _ALIGN] = q.row_gather_idx
        return ts, wl, rg

    sw = [pad_sweep(q) for q in plans]
    rb = [pad_rebuild(q) for q in plans]
    return {
        "token_word": np.stack([s[0] for s in sw]),
        "token_doc": np.stack([s[1] for s in sw]),
        "token_mask": np.stack([s[2] for s in sw]),
        "perm": np.stack([s[3] for s in sw]),
        "tile_stripe": np.stack([r[0] for r in rb]),
        "w_local": np.stack([r[1] for r in rb]),
        "row_gather_idx": np.stack([r[2] for r in rb]),
        "v_loc": p0.v_loc, "v_pad": p0.v_pad, "tile": tile,
        "block_size": block, "num_tiles": nt,
        "max_word_freq": max(q.max_word_freq for q in plans),
    }

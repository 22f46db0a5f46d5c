"""Fused Pallas TPU kernel for the per-token categorical draw.

This is the framework's native tier (SURVEY.md §2.2): the reference's hot loop
(``LdaModel.sampleTopicZ``) fused into one VMEM-resident pass.  For a block of
B tokens with gathered count rows, one kernel program per B-tile computes

    self-exclusion  (cols == z_old)                       — no one-hot in HBM
    conditional     log(nwk−e+β) + log(ndk−e+α) − log(nk−e+Vβ)
    noise           on-core PRNG bits → Gumbel            — never hits HBM
    draw            argmax over K

so the only HBM traffic is the two gathered [B,K] count tiles in and B topic
ids out — the jnp path additionally materializes the one-hot, three excluded
matrices, and a [B,K] Gumbel tensor.

Noise modes (static):
- internal (default): ``pltpu.prng_seed`` + ``prng_random_bits`` on-core —
  the production TPU path (unsupported by the CPU interpreter, which returns
  zero bits);
- external: caller passes uniform(0,1) noise ``[B,K]`` — used by the CPU
  distribution tests (chi-square vs the analytic conditional);
- deterministic: no noise — pure argmax of the conditional, the exact
  kernel-vs-jnp equality hook.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# v2: fused block kernel — the whole per-block body except the nwk scatter.
#
# The v1 kernel (below) fuses only the draw; XLA still gathers/scatters the
# doc-topic table and materializes a [B,K] Gumbel tensor per block.  Measured
# on TPU v5e at K=500 those pieces cost ~17 ms (ndk scatter), ~11 ms (threefry
# RNG) and ~4 ms (ndk gather) of a 64 ms sweep.  v2 removes all three: the
# block's doc-topic rows live in VMEM as a [D_LOC, K] slab (doc ids are
# contiguous within a block because the token stream is doc-major), gathered
# and updated with tiny one-hot matmuls on the MXU, noise comes from the
# on-core PRNG, and the only HBM traffic is the gathered word-topic rows in
# and (znew, delta) out.  The delta goes to XLA's sorted-row scatter, which
# remains the fastest word-topic update primitive (measured: scalar scatters
# are 2-6x slower, one-hot matmuls through HBM are worse still).
# ---------------------------------------------------------------------------


def _fused_kernel(
    seed_ref, hyper_ref, zold_ref, dloc_ref, msk_ref, nwk_ref,
    ndk_init_ref, nk_init_ref, noise_ref,
    *out_refs, k_real: int, noise_mode: str, emit_delta: bool = True,
    slab_split: bool = True, compute_dtype: str = "float32",
):
    if emit_delta:
        znew_ref, delta_ref, ndk_ref, nk_ref = out_refs
    else:
        # deferred-nwk mode (ops/count_kernel.py): the word-topic table is
        # rebuilt once per sweep, so no dense [B, K] delta leaves the kernel
        znew_ref, ndk_ref, nk_ref = out_refs
        delta_ref = None
    bt, k_pad = nwk_ref.shape
    d_loc = ndk_ref.shape[0]
    i = pl.program_id(0)
    # [B, K] elementwise chain dtype.  bf16 runs the VPU at ~1.5x the f32
    # rate on v5e IN ISOLATION (scripts/vpu_dtype_probe.py: 20.0 vs 13.4
    # Tops/s; bf16_chain_bench.py: 2.70 vs 4.11 ms standalone kernel) but
    # LOSES ~10% in the full deferred sweep (measured r5: 49.5-51.3M vs
    # 55.4-55.8M tok/s f32, 3 runs each, T=1M K=500) — in context the
    # kernel overlaps the row gather/rebuild, so a faster VPU body exposes
    # them while packed-bf16 relayouts at the kernel boundary add cost.
    # f32 stays the default; the knob remains for other shapes.  Numerics
    # when enabled: 2^-8 relative error sits below the draw's
    # approx-reciprocal + 24-bit-uniform noise; every count that must stay
    # exact (doc slab, topic totals, deltas) remains f32.
    # "bfloat16" = whole chain incl. score/argmax input; "bf16p" = only the
    # conditional product in bf16, score/argmax stay f32 (isolates the cost
    # of the packed-score relayout); "float32" = everything f32
    cdt = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16p") else jnp.float32
    sdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    # first tile: seed the VMEM-resident accumulators (constant index_map
    # keeps these output blocks resident across the whole grid)
    @pl.when(i == 0)
    def _():
        ndk_ref[:] = ndk_init_ref[:]
        nk_ref[:] = nk_init_ref[:]

    alpha = hyper_ref[0]
    beta = hyper_ref[1]
    vbeta = hyper_ref[2]

    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, k_pad), dimension=1)
    mskf = (msk_ref[:] > 0).astype(jnp.float32)           # [bt, 1]
    excl = (cols == zold_ref[:]).astype(jnp.float32) * mskf

    # gather the tile's doc rows from the VMEM slab by one-hot matmul (no
    # dynamic vector indexing needed; [bt, D_LOC] @ [D_LOC, K] on the MXU).
    # All matmuls run in bfloat16 (the MXU's native rate; f32 matmuls cost
    # ~6x): the one-hot is 0/1-exact in bf16, and the count slab is split
    # hi/lo so each half is a bf16-exact integer < 256 (exact for doc
    # lengths < 65536), recombined in the f32 accumulator type.
    drange = jax.lax.broadcasted_iota(jnp.int32, (bt, d_loc), dimension=1)
    ohd = ((drange == dloc_ref[:]) & (msk_ref[:] > 0)).astype(jnp.bfloat16)
    slab = ndk_ref[:]
    if slab_split:
        slab_hi = jnp.floor(slab * (1.0 / 256.0))
        slab_lo = slab - slab_hi * 256.0
        ndk_rows = (
            jnp.dot(ohd, slab_hi.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * 256.0
            + jnp.dot(ohd, slab_lo.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        )
    else:
        # caller guarantees every slab cell <= 256 (max doc length bound):
        # such integers are bf16-exact, so one matmul replaces the hi/lo pair.
        # The slab gather is the kernel's dominant MXU cost (∝ d_loc), so this
        # is a ~1/3 cut of kernel time on short-doc corpora.
        ndk_rows = jnp.dot(ohd, slab.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

    # Exponential-race draw in product space: argmax_k p_k / E_k with
    # E_k ~ Exp(1) iid is an exact categorical(p) sample, and costs ONE
    # transcendental (log u) instead of the five of log-space Gumbel
    # (3 conditional logs + log(-log u)).  The kernel is compute-bound on
    # the VPU, so transcendental count is the sweep's critical path.
    # rows may arrive bf16 (the deferred mode's snapshot gather — counts are
    # read-only there and 0.4% relative error is below the draw's own
    # approx-reciprocal noise); the chain runs in `cdt`
    excl_c = excl.astype(cdt)
    nwk_rows = nwk_ref[:].astype(cdt)
    ndk_rows_c = ndk_rows.astype(cdt)
    # the nk reciprocal is row-invariant: hoist it to one [1, K] pass and
    # fold the self-exclusion back in to first order —
    # 1/(x - e) = r/(1 - e·r) ≈ r + e·r²  for e ∈ {0, 1}; the dropped term is
    # r³ ≤ (1/Vβ)³ — orders below the approx-reciprocal's own 2^-12 noise.
    # Saves a full [bt, K] reciprocal + two adds per element (VPU-bound body).
    r32 = pl.reciprocal(nk_ref[:] + vbeta, approx=True)
    r = r32.astype(cdt)
    rr = (r32 * r32).astype(cdt)
    p = (
        (nwk_rows - excl_c + beta.astype(cdt))
        * (ndk_rows_c - excl_c + alpha.astype(cdt))
        * (r + excl_c * rr)
    )
    # the uniform→exponential leg stays f32 (24-bit uniforms + log precision
    # are the draw's quality floor); one [bt, K] cast folds it into the chain
    if noise_mode == "internal":
        pltpu.prng_seed(seed_ref[0] + i)
        bits = pltpu.bitcast(pltpu.prng_random_bits((bt, k_pad)), jnp.int32)
        u = (bits & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24)) + (
            0.5 / (1 << 24)
        )
        score = p.astype(sdt) * pl.reciprocal(-jnp.log(u), approx=True).astype(sdt)
    elif noise_mode == "external":
        score = p.astype(sdt) * pl.reciprocal(
            -jnp.log(noise_ref[:]), approx=True).astype(sdt)
    else:
        # "deterministic": pure argmax of the conditional — identical to the
        # log-space argmax (monotone map), the kernel-vs-jnp equality hook
        score = p

    score = jnp.where(cols < k_real, score, score.dtype.type(-1.0))
    # Mosaic's cross-lane argmax lowers f32 only: one cast at the boundary
    # (a no-op in the f32 chain; bf16->f32 is exact so the draw is unchanged)
    znew = jnp.argmax(score.astype(jnp.float32), axis=1,
                      keepdims=True).astype(jnp.int32)
    znew = jnp.where(msk_ref[:] > 0, znew, zold_ref[:])
    znew_ref[:] = znew

    # delta values are exactly representable in either dtype ({-1, 0, 1});
    # sums/accumulations happen in f32
    delta = (cols == znew).astype(cdt) * mskf.astype(cdt) - excl_c
    if emit_delta:
        delta_ref[:] = delta.astype(jnp.float32)
    # in-VMEM count updates: later tiles of the block see fresh doc counts
    # (bf16 matmul is exact: one-hot 0/1 against ±1 deltas, f32 accumulate)
    ndk_ref[:] += jax.lax.dot_general(
        ohd, delta.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    nk_ref[:] += jnp.sum(delta.astype(jnp.float32), axis=0, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_real", "noise_mode", "interpret", "row_tile", "emit_delta",
        "slab_split", "compute_dtype",
    ),
)
def pallas_fused_block(
    nwk_rows: jax.Array,   # [B, Kp] f32 (or bf16 in deferred mode) — gathered word-topic rows
    ndk_slab: jax.Array,   # [D_LOC, Kp] f32 — the block's doc-topic slab
    nk: jax.Array,         # [1, Kp] f32 — topic totals
    zold: jax.Array,       # [B] int32
    d_local: jax.Array,    # [B] int32 — doc id relative to the slab origin
    msk: jax.Array,        # [B] int32 — 1 real, 0 padding
    seed: jax.Array,       # [] int32
    noise: Optional[jax.Array] = None,  # [B, Kp] uniforms for noise_mode="external"
    *,
    alpha,
    beta,
    vbeta,
    k_real: int,
    noise_mode: str = "internal",
    interpret: bool = False,
    row_tile: int = 512,
    emit_delta: bool = True,
    slab_split: bool = True,
    compute_dtype: str = "float32",
):
    """Fused block step: draw + doc-slab/nk updates in VMEM.

    Returns ``(znew [B] int32, delta [B, Kp] f32, ndk_slab' [D_LOC, Kp] f32,
    nk' [1, Kp] f32)``.  The caller applies ``delta`` to the word-topic table
    (sorted-row scatter) and writes the slab back with a dynamic update slice.
    With ``emit_delta=False`` (deferred-nwk mode) the delta never leaves VMEM
    and the return is ``(znew, ndk_slab', nk')`` — the word-topic table is
    rebuilt per sweep by ``ops/count_kernel.build_nwk`` instead, and
    ``nwk_rows`` may be a bfloat16 snapshot gather.
    Shapes must be pre-padded: ``Kp % 128 == 0``, ``B % row_tile == 0``,
    ``D_LOC % 8 == 0``.
    """
    if noise_mode not in ("internal", "external", "deterministic"):
        raise ValueError(f"unknown noise_mode {noise_mode!r}")
    b, k_pad = nwk_rows.shape
    d_loc = ndk_slab.shape[0]
    if k_pad % 128 or b % row_tile or d_loc % 8:
        raise ValueError(
            f"pre-padded shapes required: B={b} (row_tile {row_tile}), "
            f"Kp={k_pad}, D_LOC={d_loc}"
        )
    bt = row_tile
    seed_arr = jnp.asarray(seed, jnp.int32)[None]
    hyper_arr = jnp.stack([
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(beta, jnp.float32),
        jnp.asarray(vbeta, jnp.float32),
    ])
    if noise_mode == "external":
        if noise is None:
            raise ValueError("noise_mode='external' requires a noise array")
        noise_in = noise.astype(jnp.float32)
        noise_index = lambda i: (i, 0)  # noqa: E731
        noise_block = bt
    else:
        noise_in = jnp.full((8, k_pad), 0.5, jnp.float32)  # never read
        noise_index = lambda i: (0, 0)  # noqa: E731
        noise_block = 8

    grid = (b // bt,)
    out_specs = [
        pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d_loc, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((d_loc, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
    ]
    if not emit_delta:
        del out_specs[1], out_shape[1]
    rows_in = nwk_rows if nwk_rows.dtype == jnp.bfloat16 else nwk_rows.astype(jnp.float32)
    outs = pl.pallas_call(
        functools.partial(
            _fused_kernel, k_real=k_real, noise_mode=noise_mode,
            emit_delta=emit_delta, slab_split=slab_split,
            compute_dtype=compute_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                        # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),                        # (α, β, Vβ)
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_loc, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((noise_block, k_pad), noise_index, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(
        seed_arr, hyper_arr, zold[:, None], d_local[:, None], msk[:, None],
        rows_in, ndk_slab.astype(jnp.float32),
        nk.astype(jnp.float32), noise_in,
    )
    if emit_delta:
        znew, delta, ndk_out, nk_out = outs
        return znew[:, 0], delta, ndk_out, nk_out
    znew, ndk_out, nk_out = outs
    return znew[:, 0], ndk_out, nk_out


def _sample_kernel(
    seed_ref, hyper_ref, zold_ref, nwk_ref, ndk_ref, nk_ref, noise_ref, out_ref,
    *, k_real: int, noise_mode: str,
):
    bt, k_pad = nwk_ref.shape
    alpha = hyper_ref[0]   # SMEM scalars: traced hyperparameters (Minka updates
    beta = hyper_ref[1]    # change their values without recompiling the kernel)
    vbeta = hyper_ref[2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, k_pad), dimension=1)
    excl = (cols == zold_ref[:]).astype(jnp.float32)

    nwk = nwk_ref[:] - excl
    ndk = ndk_ref[:] - excl
    nk = nk_ref[:] - excl  # nk_ref broadcasts [1, K_pad] over rows

    score = (
        jnp.log(nwk + beta)
        + jnp.log(ndk + alpha)
        - jnp.log(nk + vbeta)
    )
    if noise_mode == "internal":
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        # int32 (Mosaic can't cast uint32->f32); low 24 bits -> uniform (0, 1)
        bits = pltpu.bitcast(pltpu.prng_random_bits((bt, k_pad)), jnp.int32)
        u = (bits & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
        score = score + (-jnp.log(-jnp.log(u)))
    elif noise_mode == "external":
        score = score + (-jnp.log(-jnp.log(noise_ref[:])))
    # else "deterministic": no noise
    # mask K padding
    score = jnp.where(cols < k_real, score, -1e30)
    out_ref[:] = jnp.argmax(score, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("k_real", "noise_mode", "interpret", "row_tile"),
)
def pallas_sample_block(
    nwk_rows: jax.Array,   # [B, K] float32 — gathered word-topic rows (raw, incl. self)
    ndk_rows: jax.Array,   # [B, K] float32 — gathered doc-topic rows (raw)
    nk: jax.Array,         # [K]    float32 — topic totals (raw)
    zold: jax.Array,       # [B]    int32
    seed: jax.Array,       # []     int32
    noise: Optional[jax.Array] = None,  # [B, K] uniforms, only for noise_mode="external"
    *,
    alpha,                 # [] f32 (or float) — traced hyperparameters
    beta,
    vbeta,
    k_real: int,
    noise_mode: str = "internal",
    interpret: bool = False,
    row_tile: int = 256,
) -> jax.Array:
    """Fused exclusion→conditional→Gumbel→argmax; returns znew [B] int32."""
    if noise_mode not in ("internal", "external", "deterministic"):
        raise ValueError(f"unknown noise_mode {noise_mode!r}")
    b, k = nwk_rows.shape
    k_pad = _round_up(k, 128)
    bt = min(row_tile, b)
    b_pad = _round_up(b, bt)

    def pad(x, rows, cols_to, value=0.0):
        return jnp.pad(
            x, ((0, rows - x.shape[0]), (0, cols_to - x.shape[1])),
            constant_values=value,
        )

    nwk_p = pad(nwk_rows.astype(jnp.float32), b_pad, k_pad)
    ndk_p = pad(ndk_rows.astype(jnp.float32), b_pad, k_pad)
    nk_p = jnp.pad(nk.astype(jnp.float32), (0, k_pad - k))[None, :]
    zold_p = jnp.pad(zold.astype(jnp.int32), (0, b_pad - b))[:, None]
    seed_arr = jnp.asarray(seed, jnp.int32)[None]
    hyper_arr = jnp.stack([
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(beta, jnp.float32),
        jnp.asarray(vbeta, jnp.float32),
    ])
    if noise_mode == "external":
        if noise is None:
            raise ValueError("noise_mode='external' requires a noise array")
        noise_p = pad(noise.astype(jnp.float32), b_pad, k_pad, value=0.5)
    else:
        # dummy 1-tile placeholder; never read by the kernel
        noise_p = jnp.full((bt, k_pad), 0.5, jnp.float32)

    grid = (b_pad // bt,)
    noise_index = (lambda i: (i, 0)) if noise_mode == "external" else (lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(
            _sample_kernel, k_real=k_real, noise_mode=noise_mode,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # (α, β, Vβ)
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k_pad), noise_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
        interpret=interpret,
    )(seed_arr, hyper_arr, zold_p, nwk_p, ndk_p, nk_p, noise_p)
    return out[:b, 0]

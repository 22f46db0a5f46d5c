"""Piece-timing breakdown of the deferred-nwk sweep (VERDICT r3 items 3/4).

Times each component of ``ops/gibbs._deferred_sweep_impl`` in isolation on the
real device, at the bench shape (T=1M, K=500, V=50k, block=65536), so the
published BASELINE.md table attributes the sweep wall-clock to real causes
instead of the round-3 guesswork.

Usage: python scripts/profile_deferred.py [tokens] [topics]
"""

from __future__ import annotations

import sys
import time

import numpy as np

NUM_TOKENS = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
NUM_TOPICS = int(sys.argv[2]) if len(sys.argv) > 2 else 500
VOCAB = 50_000
NUM_DOCS = 4_096
BLOCK = 65_536
REPS = 20


def timeit(label, fn, *args, reps=REPS):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:46s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import synth_corpus

    from ldagibbssampling_tpu.models.state import init_state
    from ldagibbssampling_tpu.ops.count_kernel import (
        build_nwk, plan_deferred, replicate_rows)
    from ldagibbssampling_tpu.ops.gibbs import (
        _deferred_sweep_impl, _pick_row_tile, _round_up)
    from ldagibbssampling_tpu.ops.pallas_gibbs import pallas_fused_block

    t = (NUM_TOKENS // BLOCK) * BLOCK
    tw, td, dl = synth_corpus(t, VOCAB, NUM_DOCS)
    plan = plan_deferred(tw, td, VOCAB, BLOCK)
    k = NUM_TOPICS
    k_pad = _round_up(k, 128)

    state = init_state(
        plan.token_word, plan.token_doc, plan.token_mask,
        num_docs=NUM_DOCS, vocab_size=VOCAB, num_topics=k, seed=0,
    )

    from ldagibbssampling_tpu.corpus.flat import PaddedCorpus
    pc = PaddedCorpus(
        token_word=plan.token_word, token_doc=plan.token_doc,
        token_mask=plan.token_mask, num_real_tokens=int(plan.token_mask.sum()),
        vocab_size=VOCAB, num_docs=NUM_DOCS,
    )
    d_local, d0, d_loc = pc.doc_slabs(BLOCK, d_loc_multiple=128)
    row_tile = _pick_row_tile(BLOCK, k)
    nt = plan.tile_stripe.shape[0]

    jtw = jax.device_put(jnp.asarray(plan.token_word))
    jtd = jax.device_put(jnp.asarray(d_local))
    jtm = jax.device_put(jnp.asarray(plan.token_mask))
    jd0 = jax.device_put(jnp.asarray(d0))
    jrg = jax.device_put(jnp.asarray(plan.row_gather_idx))
    jwl = jax.device_put(jax.jit(replicate_rows)(
        jnp.asarray(plan.w_local.reshape(nt, plan.tile))))
    jts = jax.device_put(jnp.asarray(plan.tile_stripe))
    a = jnp.float32(0.5)
    b = jnp.float32(0.1)

    print(f"# T={t} K={k} V={VOCAB} block={BLOCK} row_tile={row_tile} "
          f"d_loc={d_loc} nt={nt} tile={plan.tile} v_loc={plan.v_loc} "
          f"v_pad={plan.v_pad} device={jax.devices()[0]}")

    # --- full sweep (cold = first sweep of a dispatch: pays the mirror cast;
    # steady = later sweeps: the rebuild kernel's ride-along bf16 mirror)
    def full(state, mirror=None):
        return _deferred_sweep_impl(
            state, jtw, jtd, jtm, jd0, jrg, jwl, jts, a, b,
            block_size=BLOCK, d_loc=d_loc, row_tile=row_tile,
            noise_mode="internal", pallas_interpret=False,
            vocab_size=None, v_loc=plan.v_loc, v_pad=plan.v_pad,
            tile=plan.tile, mirror=mirror,
        )
    timeit("full deferred sweep (cold: mirror cast)", full, state)
    _, mirror0 = jax.block_until_ready(full(state))
    t_full = timeit(
        "full deferred sweep (steady: carried mirror)", full, state, mirror0
    )

    # --- mirror prep: pad + bf16 cast
    @jax.jit
    def prep(nwk):
        return jnp.pad(nwk, ((0, 0), (0, k_pad - k))).astype(jnp.bfloat16)
    mirror = prep(state.nwk)
    timeit("mirror pad+cast bf16", prep, state.nwk)

    # --- mirror row-gather, all blocks (the round-3 prime suspect)
    @jax.jit
    def gather_all(mirror, tw):
        def body(i, acc):
            w = jax.lax.dynamic_slice(tw, (i * BLOCK,), (BLOCK,))
            rows = mirror.at[w].get(indices_are_sorted=True,
                                    mode="promise_in_bounds")
            return acc + rows.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, t // BLOCK, body, jnp.float32(0))
    timeit("mirror row-gather (all blocks, bf16)", gather_all, mirror, jtw)

    @jax.jit
    def gather_f32(nwk, tw):
        mir = jnp.pad(nwk, ((0, 0), (0, k_pad - k))).astype(jnp.float32)
        def body(i, acc):
            w = jax.lax.dynamic_slice(tw, (i * BLOCK,), (BLOCK,))
            rows = mir.at[w].get(indices_are_sorted=True,
                                 mode="promise_in_bounds")
            return acc + rows.sum()
        return jax.lax.fori_loop(0, t // BLOCK, body, jnp.float32(0))
    timeit("mirror row-gather (all blocks, f32)", gather_f32, state.nwk, jtw)

    # --- fused kernel alone (pre-gathered rows for one block, looped)
    w0 = jnp.asarray(plan.token_word[:BLOCK])
    rows0 = jax.jit(lambda m: m.at[w0].get(indices_are_sorted=True))(mirror)
    ndk_p = jnp.pad(jnp.zeros((max(NUM_DOCS, d_loc), k), jnp.float32),
                    ((0, 0), (0, k_pad - k)))
    slab0 = ndk_p[:d_loc]
    nk0 = jnp.zeros((1, k_pad), jnp.float32)
    z0 = jnp.asarray(state.z[:BLOCK])
    dl0 = jnp.asarray(d_local[:BLOCK])
    m0 = jnp.asarray(plan.token_mask[:BLOCK])

    @jax.jit
    def kern(rows, slab, nk, z):
        def body(i, carry):
            slab, nk, acc = carry
            znew, slab, nk = pallas_fused_block(
                rows, slab, nk, z, dl0, m0, jnp.int32(i), None,
                alpha=a, beta=b, vbeta=VOCAB * 0.1, k_real=k,
                noise_mode="internal", row_tile=row_tile, emit_delta=False,
            )
            return slab, nk, acc + znew.sum()
        return jax.lax.fori_loop(0, t // BLOCK, body,
                                 (slab, nk, jnp.int32(0)))
    timeit("fused kernel x nb (pre-gathered rows)", kern, rows0, slab0, nk0, z0)

    # --- z row-gather (rebuild input reorder)
    @jax.jit
    def zgather(z):
        return jnp.take(z.reshape(-1, 8), jrg, axis=0)
    timeit("z row-gather [T/8,8]", zgather, state.z)

    # --- count rebuild kernel
    z8 = jax.jit(lambda z: replicate_rows(
        jnp.take(z.reshape(-1, 8), jrg, axis=0).reshape(nt, plan.tile)
    ))(state.z)
    @jax.jit
    def rebuild(z):
        return build_nwk(z, jrg, jwl, jts, v_loc=plan.v_loc,
                         v_pad=plan.v_pad, k_pad=k_pad, tile=plan.tile)
    timeit("build_nwk (z-gather + MXU rebuild + nk)", rebuild, state.z)

    # --- nk int sum from rebuilt table (the >=2^24-token fallback)
    lc, _ = rebuild(state.z)
    @jax.jit
    def nksum(lc):
        return jnp.sum(lc[:VOCAB, :k].astype(jnp.int32), axis=0)
    timeit("nk int32 column-sum of [V,K]", nksum, lc)

    print(f"\n# full sweep = {t_full*1e3:.2f} ms  "
          f"-> {t / t_full / 1e6:.1f}M tok/s")


if __name__ == "__main__":
    main()

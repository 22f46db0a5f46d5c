"""Perf playground: sweep variants on the real chip (not part of the library).

Measures where the blocked-Gibbs sweep time goes and tests scatter-free
count-update formulations:

  base        — current production path (within-block word sort + sorted scatter)
  no_ndk      — ndk update removed (timing only, statistically wrong)
  no_nwk      — nwk update removed
  no_scatter  — both removed (upper bound: gather + conditional + draw only)
  ndk_matmul  — ndk delta via doc-local one-hot matmul + dynamic_update_slice
                (doc ids are contiguous per block, so the block's doc span is a
                 small static slab)
  both_matmul — ndk matmul + nwk via word-slab matmul over a globally
                word-sorted token stream (blocks bounded to <= S vocab rows)

Run: python scripts/perf_playground.py [variant ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

NUM_TOKENS = 1 << 20
NUM_TOPICS = 500
VOCAB = 50_000
NUM_DOCS = 4_096
BLOCK = 32_768
SWEEPS = 10


def synth(t, v, m, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.zipf(1.1, size=t).astype(np.int64)
    tw = ((raw - 1) % v).astype(np.int32)
    td = (np.arange(t, dtype=np.int64) * m // t).astype(np.int32)
    return tw, td


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ldagibbssampling_tpu.models.state import init_state

    want = sys.argv[1:] or [
        "base", "no_ndk", "no_nwk", "no_scatter", "ndk_matmul", "both_matmul",
    ]
    if want and want[0] == "rbg":
        # hardware-accelerated PRNG instead of threefry for all key ops
        jax.config.update("jax_default_prng_impl", "rbg")
        want = want[1:] or ["base", "no_scatter", "ndk_slab", "nwk_slab"]

    t = (NUM_TOKENS // BLOCK) * BLOCK
    tw0, td0 = synth(t, VOCAB, NUM_DOCS)
    tm = np.ones(t, dtype=np.int32)

    # ---- doc-major layout with within-block word sort (base/ndk_matmul) ----
    tw = tw0.copy()
    td = td0.copy()
    for s in range(0, t, BLOCK):
        perm = np.argsort(tw[s : s + BLOCK], kind="stable")
        tw[s : s + BLOCK] = tw[s : s + BLOCK][perm]
        td[s : s + BLOCK] = td[s : s + BLOCK][perm]
    # per-block doc-range slabs
    nblocks = t // BLOCK
    d0 = np.zeros(nblocks, dtype=np.int32)
    dspan = 0
    for i in range(nblocks):
        blk = td[i * BLOCK : (i + 1) * BLOCK]
        d0[i] = blk.min()
        dspan = max(dspan, int(blk.max()) - int(blk.min()) + 1)
    D_LOC = int(-(-dspan // 8) * 8)
    d0 = np.minimum(d0, NUM_DOCS - D_LOC).clip(0)

    # ---- word-major layout (both_matmul): global word sort, blocks bounded
    # to BLOCK tokens AND <= W_LOC vocab rows ----
    W_LOC = 4096
    perm = np.argsort(tw0, kind="stable")
    sw, sd = tw0[perm], td0[perm]
    blocks = []
    i = 0
    while i < len(sw):
        j = min(i + BLOCK, len(sw))
        w_lo = sw[i]
        # shrink j until the block spans <= W_LOC rows
        while sw[j - 1] - w_lo >= W_LOC:
            # find first index where row span exceeds
            j = int(np.searchsorted(sw[i:j], w_lo + W_LOC, side="left")) + i
        blocks.append((i, j))
        i = j
    nb2 = len(blocks)
    tw2 = np.zeros(nb2 * BLOCK, np.int32)
    td2 = np.zeros(nb2 * BLOCK, np.int32)
    tm2 = np.zeros(nb2 * BLOCK, np.int32)
    w0 = np.zeros(nb2, np.int32)
    for bi, (a, b) in enumerate(blocks):
        n = b - a
        tw2[bi * BLOCK : bi * BLOCK + n] = sw[a:b]
        td2[bi * BLOCK : bi * BLOCK + n] = sd[a:b]
        tm2[bi * BLOCK : bi * BLOCK + n] = 1
        w0[bi] = min(sw[a], VOCAB - W_LOC)
        # padding tokens: point at the slab start so gathers stay in range
        tw2[bi * BLOCK + n : (bi + 1) * BLOCK] = w0[bi]
    print(f"# word-major: {nb2} blocks (vs {nblocks} doc-major), "
          f"pad {nb2 * BLOCK - t} tokens, D_LOC={D_LOC}", file=sys.stderr)

    alpha, beta = 0.5, 0.1
    k = NUM_TOPICS

    def make_fused_run(variant):
        """fused / fused_no_scatter / fused_no_gather ablations."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        from ldagibbssampling_tpu.corpus.flat import PaddedCorpus
        from ldagibbssampling_tpu.ops.pallas_gibbs import pallas_fused_block

        pc = PaddedCorpus(tw, td, tm, int(tm.sum()), VOCAB, NUM_DOCS)
        d_local, pd0, d_loc = pc.doc_slabs(BLOCK)
        kp = 512
        jtw = jnp.asarray(tw)
        jdl = jnp.asarray(d_local)
        jtm = jnp.asarray(tm)
        jd0 = jnp.asarray(pd0)

        def body(i, carry):
            z, ndk, nwk, nk, seed = carry
            start = i * BLOCK
            w = lax.dynamic_slice(jtw, (start,), (BLOCK,))
            dloc = lax.dynamic_slice(jdl, (start,), (BLOCK,))
            msk = lax.dynamic_slice(jtm, (start,), (BLOCK,))
            zold = lax.dynamic_slice(z, (start,), (BLOCK,))
            if variant in ("fused_no_gather", "fused_no_both"):
                rows = jnp.broadcast_to(nwk[0][None, :], (BLOCK, kp))
            else:
                rows = nwk[w]
            slab = lax.dynamic_slice(ndk, (jd0[i], 0), (d_loc, kp))
            if variant == "fused_stub":
                # no pallas: trivial compute keeping gather+scatter shapes
                znew = (zold + 1) % k
                delta = rows * 1e-9
                slab2 = slab
                nk2 = nk
            else:
                znew, delta, slab2, nk2 = pallas_fused_block(
                    rows, slab, nk, zold, dloc, msk, seed + i,
                    alpha=0.5, beta=0.1, vbeta=VOCAB * 0.1, k_real=k,
                    noise_mode="internal", row_tile=512,
                )
            ndk = lax.dynamic_update_slice(ndk, slab2, (jd0[i], 0))
            if variant not in ("fused_no_scatter", "fused_no_both"):
                nwk = nwk.at[w].add(delta, indices_are_sorted=True)
            z = lax.dynamic_update_slice(z, znew, (start,))
            return z, ndk, nwk, nk2, seed

        @jax.jit
        def run(st):
            return lax.fori_loop(0, nblocks, body, st)

        state = init_state(tw, td, tm, num_docs=NUM_DOCS, vocab_size=VOCAB,
                           num_topics=k, seed=0)
        nwk_p = jnp.pad(state.nwk, ((0, 0), (0, kp - k))).astype(jnp.float32)
        mp = max(NUM_DOCS, d_loc)
        ndk_p = jnp.pad(state.ndk, ((0, mp - NUM_DOCS), (0, kp - k))).astype(jnp.float32)
        nk_p = jnp.pad(state.nk, (0, kp - k)).astype(jnp.float32)[None, :]
        st = (state.z, ndk_p, nwk_p, nk_p, jnp.int32(1234))
        return run, st

    def make_run(variant):
        if variant.startswith("fused"):
            return make_fused_run(variant)
        if variant in ("both_matmul", "nwk_slab"):
            vtw, vtd, vtm, nb = tw2, td2, tm2, nb2
        else:
            vtw, vtd, vtm, nb = tw, td, tm, nblocks
        jtw = jnp.asarray(vtw)
        jtd = jnp.asarray(vtd)
        jtm = jnp.asarray(vtm)
        jd0 = jnp.asarray(d0)
        jw0 = jnp.asarray(w0)
        vbeta = jnp.float32(VOCAB * beta)
        ac = jnp.float32(alpha)
        bc = jnp.float32(beta)

        def body(i, carry):
            z, ndk, nwk, nk, key = carry
            start = i * BLOCK
            w = lax.dynamic_slice(jtw, (start,), (BLOCK,))
            d = lax.dynamic_slice(jtd, (start,), (BLOCK,))
            msk = lax.dynamic_slice(jtm, (start,), (BLOCK,))
            zold = lax.dynamic_slice(z, (start,), (BLOCK,))
            oh_old = jax.nn.one_hot(zold, k, dtype=jnp.int32) * msk[:, None]

            if variant in ("both_matmul", "nwk_slab"):
                wlo = jw0[i]
                slab = lax.dynamic_slice(nwk, (wlo, 0), (W_LOC, k))
                nwk_rows = slab[w - wlo]
            else:
                nwk_rows = nwk[w]
            nwk_ex = (nwk_rows - oh_old).astype(jnp.float32)
            ndk_ex = (ndk[d] - oh_old).astype(jnp.float32)
            nk_ex = (nk[None, :] - oh_old).astype(jnp.float32)
            if variant == "no_ndk_gather":
                ndk_ex = jnp.float32(1.0)
            if variant == "no_nwk_gather":
                nwk_ex = nk_ex * 0.01
            logp = (
                jnp.log(nwk_ex + bc) + jnp.log(ndk_ex + ac) - jnp.log(nk_ex + vbeta)
            )
            if variant == "no_rng":
                g = jnp.float32(0.0)
            else:
                g = jax.random.gumbel(jax.random.fold_in(key, i), (BLOCK, k), jnp.float32)
            znew = jnp.argmax(logp + g, axis=-1).astype(zold.dtype)
            znew = jnp.where(msk.astype(bool), znew, zold)

            if variant in ("scalar_scatter", "scalar_sorted"):
                ones = msk
                if variant == "scalar_scatter":
                    nwk = nwk.at[w, znew].add(ones)
                    nwk = nwk.at[w, zold].add(-ones)
                    ndk = ndk.at[d, znew].add(ones)
                    ndk = ndk.at[d, zold].add(-ones)
                else:
                    # flat 1D ids, sorted on device, scatter with sorted hint
                    fw = jnp.concatenate([w * k + znew, w * k + zold])
                    fv = jnp.concatenate([ones, -ones])
                    order = jnp.argsort(fw)
                    nwk = nwk.reshape(-1).at[fw[order]].add(
                        fv[order], indices_are_sorted=True).reshape(VOCAB, k)
                    fd = jnp.concatenate([d * k + znew, d * k + zold])
                    order = jnp.argsort(fd)
                    ndk = ndk.reshape(-1).at[fd[order]].add(
                        fv[order], indices_are_sorted=True).reshape(NUM_DOCS, k)
                nk = nk.at[znew].add(ones).at[zold].add(-ones)
                z = lax.dynamic_update_slice(z, znew, (start,))
                return z, ndk, nwk, nk, key

            oh_new = jax.nn.one_hot(znew, k, dtype=jnp.int32) * msk[:, None]
            delta = oh_new - oh_old

            # --- ndk update ---
            if variant == "ndk_slab":
                # scatter into the block's small doc slab instead of the full
                # table: same update volume, far smaller target array
                dlo = jd0[i]
                cur = lax.dynamic_slice(ndk, (dlo, 0), (D_LOC, k))
                cur = cur.at[d - dlo].add(delta)
                ndk = lax.dynamic_update_slice(ndk, cur, (dlo, 0))
            elif variant in ("ndk_matmul", "both_matmul"):
                if variant == "both_matmul":
                    ohd = jax.nn.one_hot(d, NUM_DOCS, dtype=jnp.bfloat16)
                    seg = jax.lax.dot_general(
                        ohd, delta.astype(jnp.bfloat16),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    ndk = ndk + seg.astype(jnp.int32)
                else:
                    dlo = jd0[i]
                    ohd = jax.nn.one_hot(d - dlo, D_LOC, dtype=jnp.bfloat16)
                    seg = jax.lax.dot_general(
                        ohd, delta.astype(jnp.bfloat16),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    cur = lax.dynamic_slice(ndk, (dlo, 0), (D_LOC, k))
                    ndk = lax.dynamic_update_slice(
                        ndk, cur + seg.astype(jnp.int32), (dlo, 0))
            elif variant != "no_ndk" and variant != "no_scatter":
                ndk = ndk.at[d].add(delta)

            # --- nwk update ---
            if variant == "nwk_slab":
                slab = slab.at[w - wlo].add(delta, indices_are_sorted=True)
                nwk = lax.dynamic_update_slice(nwk, slab, (wlo, 0))
            elif variant == "both_matmul":
                ohw = jax.nn.one_hot(w - wlo, W_LOC, dtype=jnp.bfloat16)
                segw = jax.lax.dot_general(
                    ohw, delta.astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                nwk = lax.dynamic_update_slice(
                    nwk, slab + segw.astype(jnp.int32), (wlo, 0))
            elif variant not in ("no_nwk", "no_scatter"):
                nwk = nwk.at[w].add(delta, indices_are_sorted=True)

            nk = nk + delta.sum(axis=0, dtype=jnp.int32)
            z = lax.dynamic_update_slice(z, znew, (start,))
            return z, ndk, nwk, nk, key

        @jax.jit
        def run(state_tuple):
            out = lax.fori_loop(0, nb, body, state_tuple)
            return out

        state = init_state(vtw, vtd, vtm, num_docs=NUM_DOCS, vocab_size=VOCAB,
                           num_topics=k, seed=0)
        st = (state.z, state.ndk, state.nwk, state.nk, state.key)
        return run, st

    import jax

    for variant in want:
        run, st = make_run(variant)
        st = run(st)
        jax.block_until_ready(st[0])
        t0 = time.perf_counter()
        cur = st
        for _ in range(SWEEPS):
            cur = run(cur)
        jax.block_until_ready(cur[0])
        dt = (time.perf_counter() - t0) / SWEEPS
        # consistency: nk must equal column sums of both tables
        nk_w = np.asarray(cur[2]).sum(axis=0).ravel()[:k]
        nk_d = np.asarray(cur[1]).sum(axis=0).ravel()[:k]
        nk_c = np.asarray(cur[3]).ravel()[:k]
        ok = bool((nk_w == nk_c).all() and (nk_d == nk_c).all())
        print(f"{variant:12s}  {dt * 1e3:7.2f} ms/sweep   {t / dt / 1e6:7.2f} Mtok/s   counts_ok={ok}")


if __name__ == "__main__":
    main()

"""Tests for the v2 fused Pallas block kernel (``ops/pallas_gibbs.pallas_fused_block``)
and its sweep wrapper (``ops/gibbs.fused_gibbs_sweep``).

CPU CI runs the kernel in Pallas interpret mode; the same code path compiles
with Mosaic on a real TPU (exercised by ``bench.py`` / ``scripts/tpu_smoke.py``).

Reference semantics anchor: ``LdaModel.sampleTopicZ``
(``src/liuyang/nlp/lda/main/LdaModel.java``, SURVEY.md §3.3) — the kernel is
the whole inner loop except the word-topic scatter.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ldagibbssampling_tpu.corpus.flat import FlatCorpus, PaddedCorpus  # noqa: E402
from ldagibbssampling_tpu.models.state import init_state  # noqa: E402
from ldagibbssampling_tpu.ops.gibbs import _pick_row_tile, make_sweep_fn  # noqa: E402
from ldagibbssampling_tpu.ops.pallas_gibbs import pallas_fused_block  # noqa: E402

K = 7
V = 64
BLOCK = 128


def _corpus(seed=0, num_docs=40, vocab=V):
    rng = np.random.default_rng(seed)
    ragged = [
        [int(x) for x in rng.integers(0, vocab, size=int(rng.integers(5, 40)))]
        for _ in range(num_docs)
    ]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def _recount(pc, z):
    real = pc.token_mask.astype(bool)
    ndk = np.zeros((pc.num_docs, K), np.int64)
    nwk = np.zeros((pc.vocab_size, K), np.int64)
    np.add.at(ndk, (pc.token_doc[real], z[real]), 1)
    np.add.at(nwk, (pc.token_word[real], z[real]), 1)
    return ndk, nwk


# ---------------------------------------------------------------------------
# doc_slabs layout helper
# ---------------------------------------------------------------------------


def test_doc_slabs_layout():
    pc = _corpus().pad_to(BLOCK)
    d_local, d0, d_loc = pc.doc_slabs(BLOCK)
    nb = pc.num_tokens // BLOCK
    assert d0.shape == (nb,) and d_local.shape == (pc.num_tokens,)
    assert d_loc % 8 == 0
    # every real token's local id reconstructs its doc id inside the slab
    for i in range(nb):
        s = slice(i * BLOCK, (i + 1) * BLOCK)
        real = pc.token_mask[s] > 0
        np.testing.assert_array_equal(
            d_local[s][real] + d0[i], pc.token_doc[s][real]
        )
        assert d_local[s].max(initial=0) < d_loc
    # padding tokens always map to slot 0
    assert (d_local[pc.token_mask == 0] == 0).all()


def test_doc_slabs_clamped_at_corpus_end():
    # last block's docs sit at the end: d0 must clamp so d0 + d_loc <= M
    pc = _corpus(num_docs=200).pad_to(64)
    d_local, d0, d_loc = pc.doc_slabs(64)
    if pc.num_docs >= d_loc:
        assert (d0 + d_loc <= pc.num_docs).all()
    assert (d_local < d_loc).all()


def test_pick_row_tile():
    assert _pick_row_tile(32768) == 512
    assert _pick_row_tile(512) == 512
    assert _pick_row_tile(128) == 128
    # largest multiple-of-8 divisor <= 512
    assert _pick_row_tile(600) == 200
    assert 600 % _pick_row_tile(600) == 0
    # no multiple-of-8 divisor at all (2*647) -> 0 (single-tile/XLA fallback)
    assert _pick_row_tile(1294) == 0


# ---------------------------------------------------------------------------
# kernel-level (interpret mode)
# ---------------------------------------------------------------------------


def _kernel_inputs(seed=0, b=128, k_pad=128, d_loc=8):
    rng = np.random.default_rng(seed)
    nwk_rows = np.zeros((b, k_pad), np.float32)
    nwk_rows[:, :K] = rng.integers(0, 50, (b, K))
    ndk_slab = np.zeros((d_loc, k_pad), np.float32)
    ndk_slab[:, :K] = rng.integers(0, 20, (d_loc, K))
    nk = np.zeros((1, k_pad), np.float32)
    nk[0, :K] = ndk_slab[:, :K].sum() + rng.integers(100, 200, K)
    zold = rng.integers(0, K, b).astype(np.int32)
    d_local = np.sort(rng.integers(0, d_loc, b)).astype(np.int32)
    msk = np.ones(b, np.int32)
    msk[-7:] = 0
    # keep tables consistent with zold so exclusion never goes negative
    return (jnp.asarray(nwk_rows), jnp.asarray(ndk_slab), jnp.asarray(nk),
            jnp.asarray(zold), jnp.asarray(d_local), jnp.asarray(msk))


def test_fused_kernel_deterministic_matches_reference_argmax():
    nwk_rows, ndk_slab, nk, zold, d_local, msk = _kernel_inputs()
    alpha, beta = 0.5, 0.1
    vbeta = V * beta
    znew, delta, slab_out, nk_out = pallas_fused_block(
        nwk_rows, ndk_slab, nk, zold, d_local, msk, jnp.int32(3),
        alpha=alpha, beta=beta, vbeta=vbeta, k_real=K,
        noise_mode="deterministic", interpret=True, row_tile=64,
    )
    znew = np.asarray(znew)
    # plain-numpy reference of the same (snapshot + self-exclusion) argmax
    b = nwk_rows.shape[0]
    oh = np.zeros((b, nwk_rows.shape[1]), np.float32)
    oh[np.arange(b), np.asarray(zold)] = np.asarray(msk)
    rows_d = np.asarray(ndk_slab)[np.asarray(d_local)]
    # the kernel updates the slab/nk tile by tile: recompute tile-locally
    bt = 64
    expect = np.zeros(b, np.int32)
    slab = np.asarray(ndk_slab).copy()
    nkv = np.asarray(nk).copy()
    for s in range(0, b, bt):
        sl = slice(s, s + bt)
        rows_d = slab[np.asarray(d_local)[sl]]
        p = (
            (np.asarray(nwk_rows)[sl] - oh[sl] + beta)
            * (rows_d - oh[sl] + alpha)
            / (nkv - oh[sl] + vbeta)
        )
        p[:, K:] = -1.0
        e = np.argmax(p, axis=1).astype(np.int32)
        e = np.where(np.asarray(msk)[sl] > 0, e, np.asarray(zold)[sl])
        expect[sl] = e
        dlt = np.zeros_like(p)
        dlt[np.arange(bt), e] = np.asarray(msk)[sl]
        dlt -= oh[sl]
        np.add.at(slab, np.asarray(d_local)[sl], dlt)
        nkv = nkv + dlt.sum(axis=0)
    np.testing.assert_array_equal(znew, expect)
    # count bookkeeping matches the host replay
    np.testing.assert_allclose(np.asarray(slab_out), slab, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nk_out), nkv, atol=1e-4)


def test_fused_kernel_masked_tokens_are_inert():
    nwk_rows, ndk_slab, nk, zold, d_local, msk = _kernel_inputs()
    znew, delta, slab_out, nk_out = pallas_fused_block(
        nwk_rows, ndk_slab, nk, zold, d_local, msk, jnp.int32(3),
        alpha=0.5, beta=0.1, vbeta=V * 0.1, k_real=K,
        noise_mode="deterministic", interpret=True, row_tile=64,
    )
    pad = np.asarray(msk) == 0
    np.testing.assert_array_equal(np.asarray(znew)[pad], np.asarray(zold)[pad])
    np.testing.assert_array_equal(np.asarray(delta)[pad], 0.0)


def test_fused_kernel_never_samples_padded_topics():
    nwk_rows, ndk_slab, nk, zold, d_local, msk = _kernel_inputs()
    noise = jnp.asarray(
        np.random.default_rng(7).uniform(1e-6, 1 - 1e-6,
                                         (nwk_rows.shape[0], nwk_rows.shape[1]))
        .astype(np.float32)
    )
    znew, *_ = pallas_fused_block(
        nwk_rows, ndk_slab, nk, zold, d_local, msk, jnp.int32(3), noise,
        alpha=0.5, beta=0.1, vbeta=V * 0.1, k_real=K,
        noise_mode="external", interpret=True, row_tile=64,
    )
    assert np.asarray(znew).max() < K


def test_fused_kernel_exprace_draw_distribution():
    """The exponential-race draw (argmax p/E) must sample categorical(p).

    One tile, identical conditionals for every row → the znew histogram is
    multinomial(p); chi-square should not reject at α=1e-3.
    """
    b, k_pad, d_loc = 512, 128, 8
    nwk_rows = np.tile(
        np.array([5, 1, 9, 3, 0, 2, 7], np.float32), (b, 1)
    )
    nwk_rows = np.pad(nwk_rows, ((0, 0), (0, k_pad - K)))
    ndk_slab = np.zeros((d_loc, k_pad), np.float32)
    ndk_slab[0, :K] = np.array([2, 4, 1, 0, 3, 1, 2], np.float32)
    nk = np.zeros((1, k_pad), np.float32)
    nk[0, :K] = 100.0
    zold = np.full(b, 2, np.int32)  # same exclusion for every row
    d_local = np.zeros(b, np.int32)
    msk = np.ones(b, np.int32)
    alpha, beta = 0.5, 0.1
    vbeta = V * beta

    oh = np.zeros(k_pad, np.float32)
    oh[2] = 1.0
    p = (
        (nwk_rows[0] - oh + beta)
        * (ndk_slab[0] - oh + alpha)
        / (nk[0] - oh + vbeta)
    )[:K]
    p = p / p.sum()

    counts = np.zeros(K)
    trials = 0
    rng = np.random.default_rng(11)
    for rep in range(8):
        noise = rng.uniform(1e-6, 1 - 1e-6, (b, k_pad)).astype(np.float32)
        znew, *_ = pallas_fused_block(
            jnp.asarray(nwk_rows), jnp.asarray(ndk_slab), jnp.asarray(nk),
            jnp.asarray(zold), jnp.asarray(d_local), jnp.asarray(msk),
            jnp.int32(rep), jnp.asarray(noise),
            alpha=alpha, beta=beta, vbeta=vbeta, k_real=K,
            noise_mode="external", interpret=True, row_tile=b,
        )
        # only the FIRST row of the tile is an unperturbed draw from p (the
        # kernel updates the slab after the tile, not within), but with one
        # tile per call every row shares the same snapshot -> all are iid
        counts += np.bincount(np.asarray(znew), minlength=K)[:K]
        trials += b
    expected = p * trials
    chi2 = float(((counts - expected) ** 2 / np.maximum(expected, 1e-9)).sum())
    # dof = K-1 = 6; critical value at alpha=1e-3 is 22.46
    assert chi2 < 22.46, (chi2, counts, expected)


# ---------------------------------------------------------------------------
# sweep-level (interpret mode through make_sweep_fn)
# ---------------------------------------------------------------------------


def test_fused_sweep_count_invariants():
    fc = _corpus()
    pc = fc.pad_to(BLOCK)
    pc, _ = pc.sort_within_blocks(BLOCK)
    state = init_state(
        pc.token_word, pc.token_doc, pc.token_mask,
        num_docs=pc.num_docs, vocab_size=pc.vocab_size, num_topics=K, seed=3,
    )
    run = make_sweep_fn(
        pc.token_word, pc.token_doc, pc.token_mask, fc.doc_lengths(),
        alpha=0.5, beta=0.1, block_size=BLOCK, num_sweeps=3,
        use_pallas="fused", pallas_interpret=True, sorted_words=True,
    )
    out = run(state)
    z = np.asarray(out.z)
    ndk, nwk = _recount(pc, z)
    np.testing.assert_array_equal(np.asarray(out.ndk), ndk)
    np.testing.assert_array_equal(np.asarray(out.nwk), nwk)
    np.testing.assert_array_equal(np.asarray(out.nk), nwk.sum(axis=0))
    assert int(out.sweep) == 3
    # padding untouched, real tokens mixed
    real = pc.token_mask.astype(bool)
    assert (z[~real] == np.asarray(state.z)[~real]).all()
    assert (z[real] != np.asarray(state.z)[real]).any()


def test_fused_sweep_seeded_determinism():
    fc = _corpus(seed=5)
    pc = fc.pad_to(BLOCK)
    state = init_state(
        pc.token_word, pc.token_doc, pc.token_mask,
        num_docs=pc.num_docs, vocab_size=pc.vocab_size, num_topics=K, seed=9,
    )
    run = make_sweep_fn(
        pc.token_word, pc.token_doc, pc.token_mask, fc.doc_lengths(),
        alpha=0.5, beta=0.1, block_size=BLOCK, num_sweeps=2,
        use_pallas="fused", pallas_interpret=True,
    )
    a = run(state)
    b = run(state)
    np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))


def test_fused_guard_downgrades_giant_f32_unsafe_corpora(caplog):
    # the fused path tracks counts in f32 — exact only below 2^24 tokens;
    # the guard must downgrade LOUDLY to the exact XLA sweep rather than
    # silently lose counts (checked via a fake mask sum since 16M real
    # tokens is too big for a unit test)
    import logging

    fc = _corpus()
    pc = fc.pad_to(BLOCK)
    big_mask = pc.token_mask.astype(np.int64) * (
        (1 << 24) // max(1, int(pc.token_mask.sum())) + 1
    )
    from ldagibbssampling_tpu.ops import gibbs as gibbs_mod

    gibbs_mod._warned_downgrades.clear()
    with caplog.at_level(logging.WARNING, logger="ldagibbssampling_tpu"):
        run = make_sweep_fn(
            pc.token_word, pc.token_doc, big_mask, fc.doc_lengths(),
            alpha=0.5, beta=0.1, block_size=BLOCK,
            use_pallas="fused", pallas_interpret=True,
        )
    assert run.kernel_tier == "xla"
    assert any("downgrade" in r.message for r in caplog.records)


def test_fused_awkward_block_single_tile():
    # 2*647 block: no multiple-of-8 row tile exists -> single-tile kernel
    fc = _corpus(seed=8)
    pc = fc.pad_to(1294)
    state = init_state(
        pc.token_word, pc.token_doc, pc.token_mask,
        num_docs=pc.num_docs, vocab_size=pc.vocab_size, num_topics=K, seed=4,
    )
    run = make_sweep_fn(
        pc.token_word, pc.token_doc, pc.token_mask, fc.doc_lengths(),
        alpha=0.5, beta=0.1, block_size=1294, num_sweeps=1,
        use_pallas="fused", pallas_interpret=True,
    )
    out = run(state)
    ndk, nwk = _recount(pc, np.asarray(out.z))
    np.testing.assert_array_equal(np.asarray(out.ndk), ndk)
    np.testing.assert_array_equal(np.asarray(out.nwk), nwk)


def test_fused_small_block_falls_back_to_xla():
    # block < 128 silently uses the XLA sweep — must still be correct
    fc = _corpus(seed=2)
    pc = fc.pad_to(64)
    state = init_state(
        pc.token_word, pc.token_doc, pc.token_mask,
        num_docs=pc.num_docs, vocab_size=pc.vocab_size, num_topics=K, seed=1,
    )
    run = make_sweep_fn(
        pc.token_word, pc.token_doc, pc.token_mask, fc.doc_lengths(),
        alpha=0.5, beta=0.1, block_size=64, num_sweeps=1,
        use_pallas="fused", pallas_interpret=True,
    )
    out = run(state)
    ndk, nwk = _recount(pc, np.asarray(out.z))
    np.testing.assert_array_equal(np.asarray(out.ndk), ndk)
    np.testing.assert_array_equal(np.asarray(out.nwk), nwk)

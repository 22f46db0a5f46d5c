"""Tests for the v3 deferred-``nwk`` fast path (``ops/count_kernel.py`` +
``ops/gibbs._deferred_sweep_impl``).

CPU CI runs the kernels in Pallas interpret mode; the same code compiles with
Mosaic on a real TPU (``bench.py`` with LDA_BENCH_PALLAS=deferred,
``scripts/tpu_smoke.py``).

Reference semantics anchor: ``LdaModel.sampleTopicZ`` step 5's per-token
``nkt`` increment (``src/liuyang/nlp/lda/main/LdaModel.java``, SURVEY.md
§3.3), here deferred to a per-sweep rebuild — the AD-LDA staleness of the
parallel runtimes applied within one chip.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ldagibbssampling_tpu.corpus.flat import FlatCorpus  # noqa: E402
from ldagibbssampling_tpu.models.state import check_invariants, init_state  # noqa: E402
from ldagibbssampling_tpu.ops.count_kernel import build_nwk, plan_deferred  # noqa: E402
from ldagibbssampling_tpu.ops.gibbs import make_sweep_fn  # noqa: E402

K = 7
V = 300
BLOCK = 512


def _corpus(seed=0, num_docs=60, vocab=V, t_target=4000):
    rng = np.random.default_rng(seed)
    # Zipf-ish skew so stripes are unevenly filled (the realistic case)
    raw = rng.zipf(1.3, size=t_target).astype(np.int64)
    tw = ((raw - 1) % vocab).astype(np.int32)
    td = (np.arange(t_target, dtype=np.int64) * num_docs // t_target).astype(np.int32)
    return tw, td, np.bincount(td, minlength=num_docs).astype(np.int32)


# ---------------------------------------------------------------------------
# layout planner
# ---------------------------------------------------------------------------


def test_plan_layout_invariants():
    tw, td, _ = _corpus()
    plan = plan_deferred(tw, td, V, BLOCK, v_loc=64, tile=128)
    assert plan.num_tokens % BLOCK == 0
    # real slots form a bijection onto the source stream, pads are -1
    valid = plan.perm >= 0
    assert valid.sum() == tw.shape[0]
    assert np.array_equal(np.sort(plan.perm[valid]), np.arange(tw.shape[0]))
    assert np.array_equal(plan.token_mask, valid.astype(np.int32))
    np.testing.assert_array_equal(plan.token_word[valid], tw[plan.perm[valid]])
    np.testing.assert_array_equal(plan.token_doc[valid], td[plan.perm[valid]])
    # within every block, word ids are non-decreasing (gather sortedness hint)
    for s in range(0, plan.num_tokens, BLOCK):
        blk = plan.token_word[s : s + BLOCK]
        assert (np.diff(blk) >= 0).all()
    # rebuild stream: tile_stripe non-decreasing, w_local within stripe width
    assert (np.diff(plan.tile_stripe) >= 0).all()
    assert plan.w_local.max() < plan.v_loc
    # every real token appears exactly once in the rebuild stream
    counts_rebuild = np.zeros(V, np.int64)
    stripe_of_slot = np.repeat(plan.tile_stripe, plan.tile)
    real_rb = plan.w_local >= 0
    np.add.at(
        counts_rebuild,
        stripe_of_slot[real_rb] * plan.v_loc + plan.w_local[real_rb],
        1,
    )
    np.testing.assert_array_equal(counts_rebuild, np.bincount(tw, minlength=V))
    assert plan.max_word_freq == int(np.bincount(tw).max())


def test_build_nwk_exact():
    from ldagibbssampling_tpu.ops.count_kernel import replicate_rows

    tw, td, _ = _corpus(seed=3)
    plan = plan_deferred(tw, td, V, BLOCK, v_loc=64, tile=128)
    rng = np.random.default_rng(7)
    z = rng.integers(0, K, plan.num_tokens).astype(np.int32)
    nt = plan.tile_stripe.shape[0]
    wl8 = replicate_rows(jnp.asarray(plan.w_local.reshape(nt, plan.tile)))
    out, nk = build_nwk(
        jnp.asarray(z), jnp.asarray(plan.row_gather_idx),
        wl8, jnp.asarray(plan.tile_stripe),
        v_loc=plan.v_loc, v_pad=plan.v_pad, k_pad=128, tile=plan.tile,
        interpret=True,
    )
    out = np.asarray(out)
    ref = np.zeros((V, K), np.int64)
    real = plan.token_mask > 0
    np.add.at(ref, (plan.token_word[real], z[real]), 1)
    np.testing.assert_array_equal(out[:V, :K].astype(np.int64), ref)
    assert not out[V:].any() and not out[:, K:].any()
    # ride-along topic totals match the table's column sums exactly
    np.testing.assert_array_equal(
        np.asarray(nk[:K]).astype(np.int64), ref.sum(axis=0))
    assert not np.asarray(nk[K:]).any()


# ---------------------------------------------------------------------------
# deferred sweep
# ---------------------------------------------------------------------------


def _make_run(plan, dl, num_sweeps=1, **kw):
    return make_sweep_fn(
        plan.token_word, plan.token_doc, plan.token_mask, dl,
        alpha=0.5, beta=0.1, block_size=plan.block_size,
        num_sweeps=num_sweeps, use_pallas="deferred", pallas_interpret=True,
        num_topics=K, deferred_plan=plan, **kw,
    )


def test_deferred_sweep_counts_consistent():
    tw, td, dl = _corpus(seed=1)
    plan = plan_deferred(tw, td, V, BLOCK, v_loc=64, tile=128)
    m = dl.shape[0]
    state = init_state(
        plan.token_word, plan.token_doc, plan.token_mask,
        num_docs=m, vocab_size=V, num_topics=K, seed=0,
    )
    run = _make_run(plan, dl, num_sweeps=2)
    out = run(state)
    assert int(out.sweep) == 2
    check_invariants(out, plan.token_mask, dl)
    z = np.asarray(out.z)
    real = plan.token_mask > 0
    nwk = np.zeros((V, K), np.int64)
    ndk = np.zeros((m, K), np.int64)
    np.add.at(nwk, (plan.token_word[real], z[real]), 1)
    np.add.at(ndk, (plan.token_doc[real], z[real]), 1)
    np.testing.assert_array_equal(np.asarray(out.nwk).astype(np.int64), nwk)
    np.testing.assert_array_equal(np.asarray(out.ndk).astype(np.int64), ndk)
    # padding assignments never move (masked in the kernel)
    np.testing.assert_array_equal(z[~real], np.asarray(state.z)[~real])
    assert (z[real] != np.asarray(state.z)[real]).any()


def test_deferred_sweep_seeded_determinism():
    tw, td, dl = _corpus(seed=2)
    plan = plan_deferred(tw, td, V, BLOCK, v_loc=64, tile=128)
    state = init_state(
        plan.token_word, plan.token_doc, plan.token_mask,
        num_docs=dl.shape[0], vocab_size=V, num_topics=K, seed=11,
    )
    run = _make_run(plan, dl)
    a = run(state)
    b = run(state)
    np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))


def test_deferred_mirror_carry_matches_per_sweep_dispatch():
    # a batched num_sweeps=2 dispatch reuses the rebuild kernel's ride-along
    # bf16 mirror for sweep 2; per-sweep dispatches re-cast it from the int32
    # table.  Both casts round the same exact integers, so the chains must be
    # bitwise identical.
    tw, td, dl = _corpus(seed=7)
    plan = plan_deferred(tw, td, V, BLOCK, v_loc=64, tile=128)
    state = init_state(
        plan.token_word, plan.token_doc, plan.token_mask,
        num_docs=dl.shape[0], vocab_size=V, num_topics=K, seed=3,
    )
    batched = _make_run(plan, dl, num_sweeps=2)(state)
    one = _make_run(plan, dl, num_sweeps=1)
    stepped = one(one(state))
    np.testing.assert_array_equal(np.asarray(batched.z), np.asarray(stepped.z))
    np.testing.assert_array_equal(
        np.asarray(batched.nwk), np.asarray(stepped.nwk))
    np.testing.assert_array_equal(
        np.asarray(batched.ndk), np.asarray(stepped.ndk))


def test_deferred_guard_word_frequency():
    # deferred rebuild accumulates cells in f32: reject max word freq >= 2^24
    tw, td, dl = _corpus(seed=4)
    plan = plan_deferred(tw, td, V, BLOCK, v_loc=64, tile=128)
    object.__setattr__(plan, "max_word_freq", 1 << 24)
    with pytest.raises(ValueError, match="word frequency"):
        _make_run(plan, dl)


def test_deferred_model_roundtrip():
    # LdaModel with use_pallas='deferred': z() maps back to corpus order
    from ldagibbssampling_tpu.config import LdaConfig
    from ldagibbssampling_tpu.models.lda import LdaModel

    tw, td, dl = _corpus(seed=6, num_docs=30, t_target=1500)
    ragged = [list(map(int, tw[td == m])) for m in range(30)]
    fc = FlatCorpus.from_ragged(ragged, vocab_size=V)
    cfg = LdaConfig(
        topic_num=K, iteration=2, block_size=BLOCK, use_pallas="deferred",
        seed=3,
    )
    model = LdaModel(cfg, fc)
    assert model._plan is not None
    model.sweep(2)
    z = model.z()
    assert z.shape == (fc.num_tokens,)
    # counts from corpus-order z match the device tables
    nwk = np.zeros((V, K), np.int64)
    np.add.at(nwk, (fc.token_word, z), 1)
    np.testing.assert_array_equal(np.asarray(model.state.nwk).astype(np.int64), nwk)


def test_lda_model_batched_sweeps_match_looped():
    # the round-5 single-dispatch batch (fori_loop with traced trip count +
    # mirror carry) must produce the SAME chain as one-sweep-at-a-time calls
    from ldagibbssampling_tpu.config import LdaConfig
    from ldagibbssampling_tpu.corpus.flat import FlatCorpus
    from ldagibbssampling_tpu.models.lda import LdaModel

    rng = np.random.default_rng(6)
    ragged = [[int(x) for x in rng.integers(0, 50, size=40)]
              for _ in range(24)]
    fc = FlatCorpus.from_ragged(ragged, vocab_size=50)
    cfg = LdaConfig(topic_num=6, seed=4, block_size=128,
                    use_pallas="deferred", pallas_interpret=True)
    a = LdaModel(cfg, fc)
    assert a.kernel_tier == "deferred"
    a.sweep(5)
    b = LdaModel(cfg, fc)
    for _ in range(5):
        b.sweep(1)
    np.testing.assert_array_equal(np.asarray(a.state.z), np.asarray(b.state.z))
    np.testing.assert_array_equal(np.asarray(a.state.nwk),
                                  np.asarray(b.state.nwk))
    a.check_counts_consistent()


def test_deferred_f32_mirror_batched_dispatch():
    # regression: mirror_dtype='float32' (the documented ablation) used to
    # break the batched fori_loop carry (mirror_out=None mid-loop)
    from ldagibbssampling_tpu.config import LdaConfig
    from ldagibbssampling_tpu.corpus.flat import FlatCorpus
    from ldagibbssampling_tpu.models.lda import LdaModel

    rng = np.random.default_rng(8)
    ragged = [[int(x) for x in rng.integers(0, 40, size=30)]
              for _ in range(16)]
    fc = FlatCorpus.from_ragged(ragged, vocab_size=40)
    base = dict(topic_num=6, seed=2, block_size=128, use_pallas="deferred",
                pallas_interpret=True)
    m32 = LdaModel(LdaConfig(**base, mirror_dtype="float32"), fc)
    assert m32.kernel_tier == "deferred"
    m32.sweep(4)
    m32.check_counts_consistent()
    # f32 mirror = exact snapshot: the chain equals the bf16 run only in
    # distribution, but counts must stay pure functions of z either way
    mbf = LdaModel(LdaConfig(**base), fc)
    mbf.sweep(4)
    mbf.check_counts_consistent()


def test_deferred_run_fn_default_num_topics_mismatch():
    # regression: the cold-start mirror padded K to the num_topics PARAMETER
    # (default 512) instead of the table's actual K
    from ldagibbssampling_tpu.models.state import init_state
    from ldagibbssampling_tpu.ops.count_kernel import plan_deferred
    from ldagibbssampling_tpu.ops.gibbs import make_sweep_fn

    rng = np.random.default_rng(9)
    tw = rng.integers(0, 30, 512).astype(np.int32)
    td = np.sort(rng.integers(0, 8, 512)).astype(np.int32)
    plan = plan_deferred(tw, td, 30, 128)
    st = init_state(plan.token_word, plan.token_doc, plan.token_mask,
                    num_docs=8, vocab_size=30, num_topics=6, seed=0)
    dl = np.bincount(td, minlength=8).astype(np.int32)
    run = make_sweep_fn(  # note: num_topics left at its default
        plan.token_word, plan.token_doc, plan.token_mask, dl,
        alpha=0.5, beta=0.1, block_size=128, draw_method="gumbel",
        num_sweeps=2, use_pallas="deferred", pallas_interpret=True,
        deferred_plan=plan)
    assert run.kernel_tier == "deferred"
    out = run(st)
    assert int(out.sweep) == 2

"""Kill-and-resume: a restored chain must reproduce the uninterrupted one."""

import numpy as np

from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.lda_io.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from ldagibbssampling_tpu.models.state import init_state
from ldagibbssampling_tpu.ops.gibbs import make_sweep_fn

_RAGGED = [[0, 1, 2, 1], [2, 3, 3, 0, 1], [4, 4, 0], [1, 2, 4, 3, 3, 0]]


def _setup():
    fc = FlatCorpus.from_ragged(_RAGGED, vocab_size=5)
    pc = fc.pad_to(4)
    state = init_state(
        pc.token_word, pc.token_doc, pc.token_mask,
        num_docs=pc.num_docs, vocab_size=pc.vocab_size, num_topics=3, seed=9,
    )
    run = make_sweep_fn(
        pc.token_word, pc.token_doc, pc.token_mask, fc.doc_lengths(),
        alpha=0.5, beta=0.1, block_size=4, num_sweeps=1,
    )
    return state, run


def test_latest_step_empty(tmp_path):
    assert latest_step(tmp_path / "none") is None


def test_kill_and_resume_reproduces_chain(tmp_path):
    state, run = _setup()

    # uninterrupted: 6 sweeps straight through
    s_straight = state
    for _ in range(6):
        s_straight = run(s_straight)

    # interrupted: 3 sweeps, checkpoint, "crash", restore, 3 more
    s = state
    for _ in range(3):
        s = run(s)
    step = save_checkpoint(tmp_path / "ckpt", s)
    assert step == 3
    assert latest_step(tmp_path / "ckpt") == 3

    restored = restore_checkpoint(tmp_path / "ckpt", like=state)
    assert int(restored.sweep) == 3
    np.testing.assert_array_equal(np.asarray(restored.z), np.asarray(s.z))
    for _ in range(3):
        restored = run(restored)

    np.testing.assert_array_equal(
        np.asarray(restored.z), np.asarray(s_straight.z)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.nwk), np.asarray(s_straight.nwk)
    )
    assert int(restored.sweep) == 6

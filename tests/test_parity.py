"""Statistical parity: the blocked device chain vs the serial oracle chain.

This is the gate SURVEY.md §7 hard-part 1 requires before trusting any
parallel configuration: matched sweep budgets, independent seeds,
permutation-invariant functionals within Monte-Carlo error.
"""

import numpy as np
import pytest

from ldagibbssampling_tpu.corpus.documents import Documents
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.data import write_minicorpus
from ldagibbssampling_tpu.evaluation.parity import oracle_vs_blocked, z_score


@pytest.fixture(scope="module")
def minicorpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    write_minicorpus(d, num_docs=12)
    docs = Documents().read_docs(d)
    return FlatCorpus.from_documents(docs)


def test_blocked_chain_statistically_matches_oracle(minicorpus):
    report = oracle_vs_blocked(
        minicorpus, k=5, sweeps=30, seeds=(0, 1, 2, 3), block_size=256,
    )
    # bias beyond MC error on either functional fails the build
    assert abs(report["z_ll"]) < 4.0, report
    assert abs(report["z_entropy"]) < 4.0, report
    # and both families actually learned something: LL/token above the
    # uniform-model floor log(1/V)
    v = minicorpus.vocab_size
    assert report["oracle"]["ll_per_token_mean"] > -np.log(v)
    assert report["blocked"]["ll_per_token_mean"] > -np.log(v)


def test_small_block_also_passes(minicorpus):
    # near-serial blocked chain (block 16) — tighter approximation, same result
    report = oracle_vs_blocked(
        minicorpus, k=5, sweeps=20, seeds=(0, 1, 2), block_size=16,
    )
    assert abs(report["z_ll"]) < 4.0, report


def test_z_score_helper():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 8)
    assert abs(z_score(a, a)) < 1e-9
    b = a + 100.0
    assert abs(z_score(a, b)) > 50

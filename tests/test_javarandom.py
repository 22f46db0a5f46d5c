"""Golden tests pinning JavaRandom to known JDK output vectors.

The seeded oracle chain (SURVEY.md §4) is only meaningful if the RNG is
bit-exact vs ``java.util.Random``; these vectors pin it.
"""

from ldagibbssampling_tpu.utils.javarandom import JavaRandom


def test_next_int_seed42_vector():
    r = JavaRandom(42)
    assert r.next_int() == -1170105035
    assert r.next_int() == 234785527


def test_next_double_seed42_vector():
    r = JavaRandom(42)
    assert r.next_double() == 0.7275636800328681


def test_next_double_sequence_seed0():
    r = JavaRandom(0)
    vals = [r.next_double() for _ in range(3)]
    # Java: new Random(0).nextDouble() x3
    assert vals[0] == 0.730967787376657
    for v in vals:
        assert 0.0 <= v < 1.0


def test_next_int_bound_range_and_determinism():
    r1, r2 = JavaRandom(7), JavaRandom(7)
    seq1 = [r1.next_int(10) for _ in range(100)]
    seq2 = [r2.next_int(10) for _ in range(100)]
    assert seq1 == seq2
    assert all(0 <= v < 10 for v in seq1)


def test_next_int_power_of_two_path():
    r = JavaRandom(123)
    vals = [r.next_int(16) for _ in range(64)]
    assert all(0 <= v < 16 for v in vals)


def test_next_long_signed():
    r = JavaRandom(42)
    v = r.next_long()
    assert -(1 << 63) <= v < (1 << 63)
    # nextLong(seed=42) from JDK: -1170105035 << 32 + ... — check determinism
    assert v == JavaRandom(42).next_long()


def test_set_seed_resets():
    r = JavaRandom(42)
    a = r.next_int()
    r.set_seed(42)
    assert r.next_int() == a

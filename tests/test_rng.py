"""Host LCG parity tests (reference: src/Common/Random.cpp:9-30)."""

import numpy as np

from partitionedhashjoin_tpu.utils.rng import (
    MultiplicativeLCG,
    MultiplicativeLCGFactory,
    lcg_skip,
)


def test_lcg_first_values_park_miller():
    """Known Park-Miller sequence from seed 1: 16807, 282475249, ..."""
    g = MultiplicativeLCG(1)
    vals = [g.next() for _ in range(3)]
    m = 2147483647
    assert vals[0] == 16807 / m
    assert vals[1] == 282475249 / m
    assert vals[2] == 1622650073 / m


def test_lcg_range_and_determinism():
    g1, g2 = MultiplicativeLCG(123456789), MultiplicativeLCG(123456789)
    a = [g1.next() for _ in range(1000)]
    b = list(g2.next_batch(1000))
    np.testing.assert_allclose(a, b)
    assert all(0.0 < x < 1.0 for x in a)


def test_lcg_skip():
    g = MultiplicativeLCG(42)
    for _ in range(1000):
        g.next()
    assert g.state == lcg_skip(42, 1000)


def test_factory():
    f = MultiplicativeLCGFactory()
    g = f.get_new_generator(seed=7)
    assert isinstance(g, MultiplicativeLCG)
    # fresh-entropy generators differ
    assert f.get_new_generator().next() != f.get_new_generator().next()


def test_next_batch_matches_scalar_stream():
    from partitionedhashjoin_tpu.utils.rng import MultiplicativeLCG

    a = MultiplicativeLCG(123456789)
    b = MultiplicativeLCG(123456789)
    scalar = [a.next() for _ in range(1000)]
    batch = b.next_batch(1000)
    assert scalar == batch.tolist()
    assert a.state == b.state
    # stream continues correctly after a batch
    assert a.next() == b.next()

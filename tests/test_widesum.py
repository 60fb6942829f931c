"""exact_sum_u64: exact 64-bit sums from 32-bit parts (no x64 mode)."""

import numpy as np
import jax.numpy as jnp

from partitionedhashjoin_tpu.utils.widesum import exact_sum_u64, pair_to_int


def _oracle(arr):
    return int(np.asarray(arr, dtype=np.uint64).sum())


def test_empty_and_singletons():
    assert pair_to_int(exact_sum_u64(jnp.zeros((0,), jnp.int32))) == 0
    assert pair_to_int(exact_sum_u64(jnp.asarray([0], jnp.int32))) == 0
    big = np.iinfo(np.int32).max
    assert pair_to_int(exact_sum_u64(jnp.asarray([big], jnp.int32))) == big


def test_random_sums_match_python():
    rng = np.random.default_rng(0)
    for n in (1, 7, 1000, 40_000, 1 << 15, (1 << 15) + 1, 200_001):
        x = rng.integers(0, np.iinfo(np.int32).max, n, dtype=np.int64)
        x32 = x.astype(np.int32)
        assert pair_to_int(exact_sum_u64(jnp.asarray(x32))) == int(x.sum())


def test_sum_beyond_2_63_boundary_region():
    # 5M max-valued terms ~ 1.07e16: far past 2^31 and 2^32
    n = 5_000_000
    x = np.full(n, np.iinfo(np.int32).max, np.int32)
    assert pair_to_int(exact_sum_u64(jnp.asarray(x))) == n * np.iinfo(np.int32).max


def test_uint32_terms():
    x = np.asarray([0xFFFFFFFF, 1, 0x80000000], np.uint32)
    assert pair_to_int(exact_sum_u64(jnp.asarray(x))) == _oracle(x)


def test_rejects_wrong_dtype():
    import pytest

    with pytest.raises(TypeError):
        exact_sum_u64(jnp.zeros((4,), jnp.float32))

"""Hashing kernel tests (reference: src/Common/XXHasher.hpp semantics —
seeded uniform hash to [0, cardinality))."""

import jax.numpy as jnp
import numpy as np
import pytest

from partitionedhashjoin_tpu.ops import hashing


def test_hash32_deterministic_and_seed_sensitive():
    keys = jnp.arange(1, 1001, dtype=jnp.int32)
    h1 = hashing.hash32(keys, seed=42)
    h2 = hashing.hash32(keys, seed=42)
    h3 = hashing.hash32(keys, seed=43)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    assert np.mean(np.asarray(h1) != np.asarray(h3)) > 0.99


def test_hash32_avalanche():
    """Flipping one key bit flips ~half the hash bits on average."""
    keys = jnp.arange(0, 4096, dtype=jnp.int32)
    h0 = np.asarray(hashing.hash32(keys, seed=7), dtype=np.uint32)
    for bit in (0, 7, 19, 30):
        h1 = np.asarray(hashing.hash32(keys ^ (1 << bit), seed=7), dtype=np.uint32)
        flips = np.unpackbits((h0 ^ h1).view(np.uint8)).mean() * 32
        assert 12.0 < flips < 20.0, f"bit {bit}: avg flips {flips}"


def test_bucket_uniformity_pow2_and_general():
    keys = jnp.arange(1, 200_001, dtype=jnp.int32)
    for card in (64, 100):
        b = np.asarray(hashing.bucket(hashing.hash32(keys, seed=3), card))
        assert b.min() >= 0 and b.max() < card
        counts = np.bincount(b, minlength=card)
        expect = len(keys) / card
        # chi-square-ish sanity: all buckets within 20% of expectation
        assert counts.min() > 0.8 * expect and counts.max() < 1.2 * expect


def test_vector_hasher_decorrelated_instances():
    a = hashing.VectorHasher(seed=1)
    b = hashing.VectorHasher(seed=2)
    keys = jnp.arange(1, 10_001, dtype=jnp.int32)
    pa = np.asarray(a.hash(keys, 64))
    pb = np.asarray(b.hash(keys, 64))
    # independent hashers agree only by chance (~1/64)
    agree = np.mean(pa == pb)
    assert agree < 0.05


def test_bucket_rejects_bad_cardinality():
    with pytest.raises(ValueError):
        hashing.bucket(jnp.uint32(1), 0)


def test_hash64_pair_differs_from_lo_only():
    lo = jnp.arange(100, dtype=jnp.int32)
    h_zero_hi = hashing.hash64_pair(lo, jnp.zeros(100, jnp.int32), seed=5)
    h_one_hi = hashing.hash64_pair(lo, jnp.ones(100, jnp.int32), seed=5)
    assert np.mean(np.asarray(h_zero_hi) != np.asarray(h_one_hi)) > 0.99

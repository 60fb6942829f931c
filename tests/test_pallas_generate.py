"""Pallas generation kernels: hashing (interpret-mode) and Zipf (TPU-only).

The hash kernel must be byte-identical to ops/hashing.hash32.  The on-chip
Zipf sampler needs the hardware PRNG (``pltpu.prng_seed`` has no CPU
interpreter rule), so its distribution test runs only when a real TPU is the
default backend — bench/record runs exercise it there; this suite validates
it opportunistically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.ops.hashing import hash32
from partitionedhashjoin_tpu.ops.pallas import generate as gen


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def test_hash_kernel_matches_jnp_hash():
    rng = np.random.default_rng(0)
    keys = rng.integers(-(2**31), 2**31 - 1, 50_000, dtype=np.int32)
    got = np.asarray(
        gen.hash_keys(jnp.asarray(keys), 42, interpret=not _on_tpu())
    )
    want = np.asarray(hash32(jnp.asarray(keys), 42))
    np.testing.assert_array_equal(got, want)


def test_hash_kernel_empty():
    out = gen.hash_keys(jnp.zeros((0,), jnp.int32), 1, interpret=True)
    assert out.shape == (0,)


@pytest.mark.skipif(
    not _on_tpu(), reason="on-chip PRNG requires a TPU backend"
)
def test_zipf_pallas_distribution():
    card, alpha, n = 500, 1.05, 200_000
    keys = np.asarray(gen.zipf_keys_pallas(7, n, alpha, card))
    assert keys.min() >= 1 and keys.max() <= card
    freq = np.bincount(keys, minlength=card + 1)[1:] / n
    expected = np.arange(1, card + 1, dtype=np.float64) ** -alpha
    expected /= expected.sum()
    assert 0.5 * np.abs(freq - expected).sum() < 0.035

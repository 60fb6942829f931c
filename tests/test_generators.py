"""Generator tests.

Mirrors the reference's Zipf statistical test (tests/DataGenerator/
ZipfTest.hpp:15-51: fixed seed, alpha=0.99, cardinality 10, 10k samples; all
samples in range and frequencies monotonically non-increasing) and adds
distribution-equivalence checks against the reference's host-side sampler.
"""

import math

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.data.table import Table
from partitionedhashjoin_tpu.ops import generators
from partitionedhashjoin_tpu.utils.rng import MultiplicativeLCG


def test_sequential_table():
    t = generators.sequential_table(1000, start=1)
    assert t.size == 1000
    np.testing.assert_array_equal(np.asarray(t.keys), np.arange(1, 1001))
    np.testing.assert_array_equal(np.asarray(t.payloads), np.arange(1000))
    assert t.uuid  # has identity (Table.cpp:18-22)


def test_zipf_reference_properties():
    """The reference's ZipfTest: bounds + monotone frequencies.

    The reference uses n=10k with a pinned seed (ZipfTest.hpp:15-51); at that
    n the tail-bin gaps are within sampling noise, so we use n=100k where
    strict monotonicity is statistically safe for any seed.
    """
    n, alpha, card = 100_000, 0.99, 10
    keys = np.asarray(generators.zipf_keys(jax.random.PRNGKey(123456789), n, alpha, card))
    assert keys.min() >= 1 and keys.max() <= card
    freqs = np.bincount(keys, minlength=card + 1)[1:]
    assert all(freqs[i] >= freqs[i + 1] for i in range(card - 1))


def test_uniform_table_bounds_and_flatness():
    """Zipf(0) = uniform (BASELINE.json 'uniform keys' configs): closed-range
    bounds hold and bucket frequencies are flat within sampling noise."""
    n, lo, hi = 200_000, 5, 104  # 100 buckets, E[count]=2000, sd~44
    t = generators.uniform_table(n, (lo, hi), seed=7)
    keys = np.asarray(t.keys)
    assert keys.min() >= lo and keys.max() <= hi
    freqs = np.bincount(keys - lo, minlength=hi - lo + 1)
    assert freqs.min() > 1700 and freqs.max() < 2300  # ~6.7 sd
    np.testing.assert_array_equal(np.asarray(t.payloads), np.arange(n))


def test_zipf_alpha_zero_routes_to_uniform():
    a = generators.zipf_table(50_000, 0.0, (1, 1000), seed=3)
    b = generators.uniform_table(50_000, (1, 1000), seed=3)
    np.testing.assert_array_equal(np.asarray(a.keys), np.asarray(b.keys))
    # alias method is skipped entirely at alpha=0 (uniform needs no tables)
    c = generators.zipf_table(50_000, 0.0, (1, 1000), seed=3, method="alias")
    np.testing.assert_array_equal(np.asarray(c.keys), np.asarray(b.keys))


def test_uniform_range_validation():
    with pytest.raises(ValueError):
        generators.uniform_table(100, (10, 10))


def test_zipf_range_validation():
    with pytest.raises(ValueError):
        generators.zipf_table(100, 1.05, (10, 10))
    with pytest.raises(ValueError):
        generators.zipf_keys(jax.random.PRNGKey(0), 10, 0.001, 10)


def test_zipf_closed_range_correction():
    t = generators.zipf_table(5000, 1.05, (100, 199), seed=7)
    keys = np.asarray(t.keys)
    assert keys.min() >= 100 and keys.max() <= 199


def test_zipf_alpha_one_clamp():
    """alpha within 0.01 of 1.0 is clamped (Zipf.cpp:22-26); must not blow up."""
    keys = np.asarray(generators.zipf_keys(jax.random.PRNGKey(0), 5000, 1.0, 100))
    assert keys.min() >= 1 and keys.max() <= 100


def _host_zipf_reference(n, alpha, card, seed):
    """The reference sampler verbatim on the host LCG (Zipf.cpp:14-56)."""
    gen = MultiplicativeLCG(seed)
    error = 0.01
    sd = 1.001 - alpha
    diff = 1.0 - alpha
    if abs(diff) < error:
        sd = error * (1 if diff < 0 else -1)
        alpha = 1.0 - sd
    norm = (card**sd - alpha) / sd
    out = np.empty(n, np.int64)
    for i in range(n):
        while True:
            u1, u2 = gen.next(), gen.next()
            un = u1 * norm
            icdf = un if un <= 1.0 else ((un * sd + alpha) ** (1.0 / sd))
            sample = math.floor(icdf + 1)
            d_orig = sample**-alpha
            d_samp = 1.0 / norm if sample <= 1.0 else (icdf**-alpha) / norm
            if u2 < d_orig / (d_samp * norm):
                out[i] = sample
                break
    return out


def test_zipf_distribution_matches_reference_sampler():
    """Device sampler ~ reference host sampler (chi-square over head buckets)."""
    n, alpha, card = 40_000, 1.05, 1000
    ours = np.asarray(generators.zipf_keys(jax.random.PRNGKey(9), n, alpha, card))
    ref = _host_zipf_reference(n, alpha, card, seed=424242)
    # compare mass on head values 1..20 plus tail bucket
    edges = list(range(1, 21)) + [card + 1]
    f_ours = np.histogram(ours, bins=edges)[0] / n
    f_ref = np.histogram(ref, bins=edges)[0] / n
    np.testing.assert_allclose(f_ours, f_ref, atol=0.01)


def test_table_is_pytree():
    t = generators.sequential_table(64)
    t2 = jax.jit(lambda x: Table(x.keys + 1, x.payloads, x.uuid))(t)
    np.testing.assert_array_equal(np.asarray(t2.keys), np.asarray(t.keys) + 1)


def test_zipf_large_cardinality_reaches_odd_keys():
    # float32 inverse-CDF quantizes to multiples of 4/8 above 2^24; the
    # dither must re-populate the skipped integers
    from partitionedhashjoin_tpu.ops.generators import zipf_keys
    import jax

    card = 100_000_000
    keys = np.asarray(
        zipf_keys(jax.random.PRNGKey(3), 50_000, 1.05, card)
    )
    big = keys[keys > (1 << 24)]
    assert len(big) > 1000  # the tail is well-populated at alpha=1.05
    odd_frac = (big % 2 == 1).mean()
    assert 0.4 < odd_frac < 0.6, f"odd fraction {odd_frac}"
    assert keys.min() >= 1 and keys.max() <= card


def test_zipf_unseeded_runs_differ():
    from partitionedhashjoin_tpu.ops.generators import zipf_table

    k1 = np.asarray(zipf_table(2000, 1.05, (1, 500), seed=None).keys)
    k2 = np.asarray(zipf_table(2000, 1.05, (1, 500), seed=None).keys)
    assert not np.array_equal(k1, k2)


class TestAliasSampler:
    def test_alias_tables_encode_exact_pmf(self):
        from partitionedhashjoin_tpu.data.host_loader import build_zipf_alias

        card, alpha = 500, 1.25
        prob, alias = build_zipf_alias(alpha, card)
        pmf = np.zeros(card)
        for i in range(card):
            pmf[i] += prob[i]
            pmf[alias[i]] += 1.0 - prob[i]
        pmf /= card
        expected = np.arange(1, card + 1, dtype=np.float64) ** -alpha
        expected /= expected.sum()
        assert np.abs(pmf - expected).max() < 1e-6

    def test_alias_sampling_matches_true_distribution(self):
        import jax

        from partitionedhashjoin_tpu.data.host_loader import build_zipf_alias
        from partitionedhashjoin_tpu.ops.generators import zipf_keys_alias

        card, alpha, n = 1000, 1.05, 200_000
        prob, alias = build_zipf_alias(alpha, card)
        keys = np.asarray(
            zipf_keys_alias(
                jax.random.PRNGKey(0), n, jnp.asarray(prob), jnp.asarray(alias)
            )
        )
        assert keys.min() >= 1 and keys.max() <= card
        freq = np.bincount(keys, minlength=card + 1)[1:] / n
        expected = np.arange(1, card + 1, dtype=np.float64) ** -alpha
        expected /= expected.sum()
        tv = 0.5 * np.abs(freq - expected).sum()
        # TV to the true pmf is pure sampling noise: E[TV] ~ sqrt(card/(2*pi*n))
        assert tv < 0.035, tv

    def test_alias_rejects_large_cardinality(self):
        import jax
        import pytest

        from partitionedhashjoin_tpu.ops.generators import zipf_keys_alias

        prob = jnp.zeros((1 << 25,), jnp.float32)
        alias = jnp.zeros((1 << 25,), jnp.int32)
        with pytest.raises(ValueError):
            zipf_keys_alias(jax.random.PRNGKey(0), 10, prob, alias)


def test_alias_matches_rejection_at_clamped_alpha():
    # alpha inside the clamp window: both methods must target the clamped
    # distribution (Zipf.cpp:22-26), not diverge by method
    from partitionedhashjoin_tpu.ops.generators import zipf_table

    n, card = 120_000, 200
    ka = np.asarray(zipf_table(n, 1.0, (1, card), seed=3, method="alias").keys)
    kr = np.asarray(zipf_table(n, 1.0, (1, card), seed=4, method="rejection").keys)
    fa = np.bincount(ka, minlength=card + 1)[1:] / n
    fr = np.bincount(kr, minlength=card + 1)[1:] / n
    assert 0.5 * np.abs(fa - fr).sum() < 0.02


def test_zipf_table_method_validation():
    from partitionedhashjoin_tpu.ops.generators import zipf_table

    with pytest.raises(ValueError):
        zipf_table(10, 1.05, (1, 100), seed=1, method="bogus")
    with pytest.raises(ValueError):
        zipf_table(10, 1.05, (1, (1 << 25)), seed=1, method="alias")


def test_zipf_keys_refill_loop_exact_count_and_range():
    """A deliberately undersized round (oversample << 1) forces the
    host-level refill loop; the result must still be exactly n samples in
    [1, cardinality] with the Zipf shape (most-frequent key is 1)."""
    from partitionedhashjoin_tpu.ops import generators

    n, card = 30_000, 1000
    keys = np.asarray(
        generators.zipf_keys(
            jax.random.PRNGKey(7), n, 1.05, card, oversample=0.01
        )
    )
    assert keys.shape == (n,)
    assert keys.min() >= 1 and keys.max() <= card
    vals, counts = np.unique(keys, return_counts=True)
    assert vals[np.argmax(counts)] == 1

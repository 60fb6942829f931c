"""Hash-table semantics tests.

Ports the reference's unit properties (tests/NoPartitioningHashJoin/
HashTableTest.hpp: insert/get/exists :10-26, duplicate-key GetAll :28-44,
concurrent-build coverage :46-82 — here the "concurrent" path *is* the
vectorized build) and adds what the reference lacks: randomized
presence/absence oracles and full-table load tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.ops import hash_table as ht


def _build(keys, seed=42, ratio=ht.DEFAULT_SIZE_RATIO):
    keys = jnp.asarray(np.asarray(keys, np.int32))
    return ht.build_hash_table(
        keys, jnp.uint32(seed), ht.table_size_for(keys.shape[0], ratio)
    )


def test_insert_get_and_exists():
    # HashTableTest.hpp:10-26 — one tuple: Exists true, Get returns its row.
    table = _build([15])
    assert bool(ht.probe_exists(table, jnp.asarray([15], jnp.int32))[0])
    found, row = ht.probe_get(table, jnp.asarray([15], jnp.int32))
    assert bool(found[0]) and int(row[0]) == 0
    assert not bool(ht.probe_exists(table, jnp.asarray([16], jnp.int32))[0])


def test_duplicates_get_all():
    # HashTableTest.hpp:28-44 — 10 duplicate keys, GetAll returns all 10.
    table = _build([7] * 10 + [3, 4])
    counts = ht.probe_count_all(table, jnp.asarray([7, 3, 5], jnp.int32))
    assert counts.tolist() == [10, 1, 0]


def test_all_keys_present_after_bulk_build():
    # The vectorized analogue of testMultiThreaded (HashTableTest.hpp:46-82):
    # every inserted key must be findable after the conflict-resolution build.
    n = 4096
    keys = np.arange(1, n + 1, dtype=np.int32)
    table = _build(keys)
    assert bool(ht.probe_exists(table, jnp.asarray(keys)).all())


def test_random_keys_with_collisions_and_absences():
    rng = np.random.default_rng(123)
    build = rng.integers(-(2**31), 2**31 - 1, 5000, dtype=np.int32)
    probe = rng.integers(-(2**31), 2**31 - 1, 8000, dtype=np.int32)
    probe[:4000] = rng.choice(build, 4000)  # guaranteed hits
    table = _build(build)
    expected = np.isin(probe, build)
    got = np.asarray(ht.probe_exists(table, jnp.asarray(probe)))
    np.testing.assert_array_equal(got, expected)


def test_count_all_matches_multiset_semantics():
    rng = np.random.default_rng(7)
    build = rng.integers(0, 50, 2000, dtype=np.int32)  # heavy duplication
    probe = np.arange(-5, 55, dtype=np.int32)
    table = _build(build)
    got = np.asarray(ht.probe_count_all(table, jnp.asarray(probe)))
    expected = np.array([(build == k).sum() for k in probe], np.int32)
    np.testing.assert_array_equal(got, expected)


def test_probe_rows_point_to_matching_build_rows():
    rng = np.random.default_rng(5)
    build = rng.permutation(np.arange(100, 600)).astype(np.int32)
    probe = rng.integers(0, 700, 300, dtype=np.int32)
    table = _build(build)
    found, row = ht.probe_get(table, jnp.asarray(probe))
    found, row = np.asarray(found), np.asarray(row)
    assert (row[found] >= 0).all()
    np.testing.assert_array_equal(build[row[found]], probe[found])
    assert (row[~found] == -1).all()


@pytest.mark.parametrize("ratio", [1.25, 2.0, 4.0])
def test_size_ratio_and_high_load(ratio):
    # LinearProbingConfiguration ratio analogue (LinearProbing.hpp:16-18):
    # table must stay correct down to the reference's tighter load factors.
    n = 3000
    keys = np.arange(n, dtype=np.int32)
    table = _build(keys, ratio=ratio)
    assert table.size >= n
    assert bool(ht.probe_exists(table, jnp.asarray(keys)).all())


def test_seed_decorrelation():
    # Two instances with different seeds place keys differently but agree on
    # semantics (XXHasher.hpp:12-17 per-instance seeding).
    keys = np.arange(512, dtype=np.int32)
    t1, t2 = _build(keys, seed=1), _build(keys, seed=2)
    assert not np.array_equal(np.asarray(t1.slot_rows), np.asarray(t2.slot_rows))
    for t in (t1, t2):
        assert bool(ht.probe_exists(t, jnp.asarray(keys)).all())


def test_table_size_for_is_pow2_and_covers():
    for n, ratio in [(1, 2.0), (3, 1.25), (1000, 2.0), (10_000_000, 2.0)]:
        s = ht.table_size_for(n, ratio)
        assert s & (s - 1) == 0
        assert s >= n * ratio - 1e-9


class TestChainedTable:
    """Chained bucket table: the one-sort build + windowed probe."""

    def _build(self, keys, seed=11):
        keys = jnp.asarray(np.asarray(keys, np.int32))
        return ht.build_chained(
            keys, jnp.uint32(seed), ht.chained_num_buckets(keys.shape[0])
        )

    def test_probe_matches_oracle(self):
        rng = np.random.default_rng(0)
        build = rng.integers(-(2**31), 2**31 - 1, 6000, dtype=np.int32)
        probe = rng.integers(-(2**31), 2**31 - 1, 9000, dtype=np.int32)
        probe[:4500] = rng.choice(build, 4500)
        table = self._build(build)
        count = int(ht.probe_chained_count(table, jnp.asarray(probe)))
        assert count == int(np.isin(probe, build).sum())

    def test_chunked_probe_equals_unchunked(self):
        rng = np.random.default_rng(1)
        build = rng.integers(0, 4000, 2000).astype(np.int32)
        probe = rng.integers(0, 4000, 8000).astype(np.int32)
        table = self._build(build)
        c1 = int(ht.probe_chained_count(table, jnp.asarray(probe), num_chunks=1))
        c4 = int(ht.probe_chained_count(table, jnp.asarray(probe), num_chunks=4))
        assert c1 == c4 == int(np.isin(probe, build).sum())

    def test_get_returns_matching_rows(self):
        rng = np.random.default_rng(2)
        build = rng.permutation(np.arange(500)).astype(np.int32)
        probe = rng.integers(-100, 600, 1000).astype(np.int32)
        table = self._build(build)
        found, row = ht.probe_chained_get(table, jnp.asarray(probe))
        found, row = np.asarray(found), np.asarray(row)
        np.testing.assert_array_equal(found, np.isin(probe, build))
        np.testing.assert_array_equal(build[row[found]], probe[found])
        assert (row[~found] == -1).all()

    def test_long_chains_beyond_window(self):
        # all keys identical -> one bucket chain of length 64 (> WINDOW);
        # probe must still find it and miss on others
        build = np.full(64, 42, np.int32)
        table = self._build(build)
        probe = np.array([42, 41, 43], np.int32)
        count = int(ht.probe_chained_count(table, jnp.asarray(probe)))
        assert count == 1
        assert int(table.max_chain) == 64

    def test_count_all_multiset_semantics(self):
        rng = np.random.default_rng(5)
        build = rng.integers(0, 40, 1500).astype(np.int32)
        probe = np.arange(-5, 45, dtype=np.int32)
        table = self._build(build)
        got = np.asarray(ht.probe_chained_count_all(table, jnp.asarray(probe)))
        expected = np.array([(build == k).sum() for k in probe], np.int32)
        np.testing.assert_array_equal(got, expected)

    def test_tail_compaction_paths(self):
        # rows resolving in the first window, rows needing the tail loop,
        # and the adversarial overflow fallback must all count exactly
        rng = np.random.default_rng(9)
        # long chains: tiny bucket count via build_chained_from_buckets
        keys = rng.integers(0, 50, 3000).astype(np.int32)
        bucket = jnp.asarray(keys % 4)  # 4 buckets -> ~750-long chains
        table = ht.build_chained_from_buckets(
            bucket, jnp.asarray(keys), jnp.uint32(3), 4
        )
        probe = rng.integers(-10, 60, 2000).astype(np.int32)
        got = int(
            ht._probe_chained_count_chunk(
                table, jnp.asarray(probe), jnp.asarray(probe % 4)
            )
        )
        # oracle: probe key matches iff present among build keys with the
        # same bucket (bucket = key % 4 is consistent for matching keys)
        expected = int(np.isin(probe, keys).sum())
        assert got == expected

    def test_tail_overflow_fallback_exact(self):
        # every probe misses in window 1 and stays active -> tail overflow
        build = np.full(4096, 77, np.int32)  # one 4096-chain
        table = self._build(build)
        probe = np.full(4096, 78, np.int32)  # same bucket? not guaranteed;
        # force same bucket via explicit bucket ids
        bucket = jnp.zeros((4096,), jnp.int32)
        table2 = ht.build_chained_from_buckets(
            bucket, jnp.asarray(build), jnp.uint32(1), 2
        )
        got_missing = int(
            ht._probe_chained_count_chunk(
                table2, jnp.asarray(probe), jnp.zeros((4096,), jnp.int32)
            )
        )
        assert got_missing == 0
        got_hit = int(
            ht._probe_chained_count_chunk(
                table2, jnp.asarray(build), jnp.zeros((4096,), jnp.int32)
            )
        )
        assert got_hit == 4096


def test_dispatch_chunks_prime_sizes_still_chunk():
    # round-1 ADVICE/VERDICT: the old largest-divisor rule returned 1 for
    # prime n, collapsing a 200M probe into one watchdog-tripping dispatch
    for n, target in ((199_999_991, 25_000_000), (101, 10), (30, 7)):
        k = ht.dispatch_chunks(n, target)
        assert k > 1
        assert -(-n // k) <= target
    assert ht.dispatch_chunks(10, 25) == 1
    assert ht.dispatch_chunks(0, 25) == 1


def test_chunked_probe_non_divisible_counts_exact():
    rng = np.random.default_rng(7)
    build = rng.integers(0, 5000, 3000).astype(np.int32)
    table = ht.build_chained(
        jnp.asarray(build), jnp.uint32(3), ht.chained_num_buckets(3000)
    )
    for n in (101, 997, 8191):  # primes: never divisible by the chunk count
        probe = rng.integers(0, 5000, n).astype(np.int32)
        want = int(np.isin(probe, build).sum())
        for chunks in (2, 3, 7):
            got = int(
                ht.probe_chained_count(
                    table, jnp.asarray(probe), num_chunks=chunks
                )
            )
            assert got == want, (n, chunks)


def test_build_overflow_surfaces_instead_of_hanging():
    # 12 valid distinct keys into an 8-slot table (only reachable via
    # has_valid, which skips the host-side size check): the bounded claim
    # loop must terminate and flag the overflow (round-1 ADVICE: this was a
    # silent infinite device loop)
    keys = jnp.arange(12, dtype=jnp.int32)
    valid = jnp.ones((12,), jnp.bool_)
    table = ht.build_hash_table(
        keys, jnp.uint32(5), 8, valid=valid, has_valid=True
    )
    assert bool(table.overflowed)
    # a correctly sized masked build does not overflow
    ok = ht.build_hash_table(
        keys, jnp.uint32(5), 16, valid=valid, has_valid=True
    )
    assert not bool(ok.overflowed)
    # dedup variant too
    t2, _ = ht.build_dedup_hash_table(
        keys, jnp.uint32(5), 8, valid=valid, has_valid=True
    )
    assert bool(t2.overflowed)

"""Pallas block-compaction kernel (ops/pallas/compact.py), interpret mode.

Oracle: numpy boolean indexing (stable front compaction).  Covers the
aligned-gap contract of ``block_compact``, exact compaction + capacity
semantics of ``compact_columns``, all-kept / none-kept / dense / sparse
patterns, and multi-column carry.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.ops.pallas import compact as pc
from partitionedhashjoin_tpu.ops.pallas.bitonic_sort import BLK


def _run_block_compact(keep, *cols):
    out = pc.block_compact(jnp.asarray(keep), *map(jnp.asarray, cols),
                           interpret=True)
    return (int(out[0]),) + tuple(np.asarray(o) for o in out[1:])


class TestBlockCompact:
    @pytest.mark.parametrize("density,seed", [
        (0.05, 0), (0.5, 1), (0.95, 2), (1.0, 3), (0.0, 4),
    ])
    def test_aligned_gap_contract(self, density, seed):
        n = 3 * BLK
        rng = np.random.default_rng(seed)
        keep = rng.random(n) < density
        vals = rng.integers(1, 2**31, n).astype(np.int32)
        total, pos, out = _run_block_compact(keep, vals)
        # within the aligned prefix, dropping sentinels yields exactly the
        # kept records in original order
        sel = pos[:total] >= 0
        np.testing.assert_array_equal(pos[:total][sel], np.where(keep)[0])
        np.testing.assert_array_equal(out[:total][sel], vals[keep])
        # per-block alignment: gaps < 128 per source block
        assert total <= keep.sum() + (n // BLK) * 128

    def test_multi_column_carry(self):
        n = 2 * BLK
        rng = np.random.default_rng(7)
        keep = rng.random(n) < 0.3
        cols = [rng.integers(0, 1000, n).astype(np.int32) for _ in range(4)]
        total, pos, *outs = _run_block_compact(keep, *cols)
        sel = pos[:total] >= 0
        for c, o in zip(cols, outs):
            np.testing.assert_array_equal(o[:total][sel], c[keep])


class TestCompactColumns:
    @pytest.mark.parametrize("density,n_blocks,seed", [
        (0.01, 4, 10), (0.4, 3, 11), (1.0, 2, 12), (0.0, 2, 13),
    ])
    def test_exact_front_compaction(self, density, n_blocks, seed):
        n = n_blocks * BLK
        rng = np.random.default_rng(seed)
        keep = rng.random(n) < density
        a = rng.integers(-(2**31), 2**31, n).astype(np.int32)
        b = np.arange(n, dtype=np.int32)
        count, ok, pos, ca, cb = pc.compact_columns(
            jnp.asarray(keep), jnp.asarray(a), jnp.asarray(b),
            interpret=True,
        )
        c = int(count)
        assert bool(ok)
        assert c == int(keep.sum())
        np.testing.assert_array_equal(np.asarray(pos)[:c], np.where(keep)[0])
        np.testing.assert_array_equal(np.asarray(ca)[:c], a[keep])
        np.testing.assert_array_equal(np.asarray(cb)[:c], b[keep])
        # zero tail
        assert not np.asarray(ca)[c:].any()

    def test_capacity_overflow_flag(self):
        n = 2 * BLK
        keep = np.ones(n, bool)  # everything kept
        vals = np.arange(n, dtype=np.int32)
        count, ok, pos, cv = pc.compact_columns(
            jnp.asarray(keep), jnp.asarray(vals), capacity=100,
            interpret=True,
        )
        assert int(count) == n  # exact even on overflow
        assert not bool(ok)  # capacity too small -> caller must retry

    def test_capacity_bound_respected_with_slack(self):
        # sparse keeps within capacity: ok and exact
        n = 4 * BLK
        rng = np.random.default_rng(21)
        keep = rng.random(n) < 0.02
        vals = rng.integers(0, 99, n).astype(np.int32)
        count, ok, pos, cv = pc.compact_columns(
            jnp.asarray(keep), jnp.asarray(vals),
            capacity=2048, interpret=True,
        )
        assert bool(ok) and int(count) == int(keep.sum())
        np.testing.assert_array_equal(
            np.asarray(cv)[: int(count)], vals[keep]
        )

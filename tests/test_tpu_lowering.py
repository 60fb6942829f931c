"""Cross-platform lowering of every Pallas kernel to the TPU target.

``jax.export(..., platforms=["tpu"])`` runs the Pallas→Mosaic lowering on a
CPU host, which is where unimplemented-primitive failures surface (round-3
catch: ``jnp.flip``'s ``rev`` primitive has no Pallas TPU lowering — the
interpret-mode tests all passed while the kernel could never have compiled
on the chip).  Mosaic's MLIR→machine-code backend still runs on the real
device, but every shape/layout/primitive legality check happens here.
"""

import jax
import jax.numpy as jnp
import pytest
from jax import export

S = jax.ShapeDtypeStruct


def _lowers(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0


class TestSorterLowering:
    def test_key_sort(self):
        from partitionedhashjoin_tpu.ops.pallas import bitonic_sort as bs

        n = 3 * bs.BLK + 100
        _lowers(lambda x: bs.sort_i32_tuple(x)[0], S((n,), jnp.int32))

    def test_tuple_sort_k2(self):
        from partitionedhashjoin_tpu.ops.pallas import bitonic_sort as bs

        n = 2 * bs.BLK
        _lowers(
            lambda x, v: tuple(bs.sort_i32_tuple(x, v)),
            S((n,), jnp.int32), S((n,), jnp.int32),
        )

    @pytest.mark.parametrize("rows", [256, 1024])
    def test_block_rows(self, rows):
        from partitionedhashjoin_tpu.ops.pallas import bitonic_sort as bs

        n = 2 * rows * bs.LANES
        _lowers(
            lambda x: bs.sort_i32_tuple(x, block_rows=rows)[0],
            S((n,), jnp.int32),
        )

    @pytest.mark.parametrize("rows", [512, 8192])
    def test_xla_phase_a(self, rows):
        # hybrid: batched minor-axis lax.sort blocks + Pallas merge passes
        from partitionedhashjoin_tpu.ops.pallas import bitonic_sort as bs

        n = 2 * rows * bs.LANES
        _lowers(
            lambda x: bs.sort_i32_tuple(
                x, block_rows=rows, phase_a="xla")[0],
            S((n,), jnp.int32),
        )


class TestProbeLowering:
    def test_count_prepared(self):
        from partitionedhashjoin_tpu.ops.pallas import merge_probe as mp

        _lowers(
            lambda a, b: mp.ranged_merge_count_prepared(a, b),
            S((100_000,), jnp.int32), S((400_000,), jnp.int32),
        )

    def test_payload_prepared(self):
        from partitionedhashjoin_tpu.ops.pallas import merge_probe as mp

        _lowers(
            lambda a, p, b: mp.ranged_merge_payload_prepared(a, p, b),
            S((100_000,), jnp.int32), S((100_000,), jnp.int32),
            S((400_000,), jnp.int32),
        )

    def test_i64_planes_both_sort_impls(self):
        from partitionedhashjoin_tpu.ops.pallas import merge_probe as mp

        args = (S((100_000,), jnp.int32),) * 2 + (
            S((400_000,), jnp.int32),) * 2
        _lowers(lambda *a: mp._count_i64_planes_full(*a), *args)
        _lowers(
            lambda *a: mp._count_i64_planes_full(*a, sort_impl="pallas"),
            *args,
        )


class TestCompactLowering:
    def test_compact_columns(self):
        from partitionedhashjoin_tpu.ops.pallas.compact import (
            BLK,
            compact_columns,
        )

        n = 4 * BLK
        _lowers(
            lambda m, c: compact_columns(m, c, capacity=n),
            S((n,), jnp.bool_), S((n,), jnp.int32),
        )


class TestMergeCountLowering:
    def test_merge_count_sorted(self):
        from partitionedhashjoin_tpu.ops.pallas import merge_count as mc

        n = 1 << 20
        _lowers(
            lambda k, b: mc.merge_count_sorted(k, b),
            S((n,), jnp.int32), S((n,), jnp.bool_),
        )


class TestComposedProgramLowering:
    """Whole engine programs (multiple pallas_calls + XLA glue) under the
    pallas sorter — the exact jits the flagship dispatches on chip."""

    def test_flagship_prepare_and_probe(self):
        from partitionedhashjoin_tpu.ops import merge_join as mj

        n_a, n_b = 200_000, 900_000
        _lowers(
            lambda k: mj._prepare_build_i32(k, sort_impl="pallas"),
            S((n_a,), jnp.int32),
        )
        _lowers(
            lambda a, m, b: mj._probe_prepared_i32(
                a, m, b, sort_impl="pallas"
            ),
            S((n_a,), jnp.int32), S((), jnp.bool_), S((n_b,), jnp.int32),
        )

    def test_materialize_program(self):
        from partitionedhashjoin_tpu.ops import merge_join as mj

        n_a, n_b = 150_000, 600_000
        _lowers(
            lambda ak, ap, bk, bp: mj._materialize_i32(
                ak, ap, bk, bp, sort_impl="pallas"
            ),
            S((n_a,), jnp.int32), S((n_a,), jnp.int32),
            S((n_b,), jnp.int32), S((n_b,), jnp.int32),
        )

    def test_group_by_program(self):
        from partitionedhashjoin_tpu.ops.aggregate import (
            _sort_group_and_aggregate,
        )

        n = 500_000
        _lowers(
            lambda k, p: _sort_group_and_aggregate(
                k, p, 4096, kernel_compaction=True, sort_impl="pallas"
            ),
            S((n,), jnp.int32), S((n,), jnp.int32),
        )


class TestGenerateLowering:
    def test_hash_keys(self):
        from partitionedhashjoin_tpu.ops.pallas.generate import hash_keys

        _lowers(
            lambda k, s: hash_keys(k, s),
            S((1 << 18,), jnp.int32), S((), jnp.uint32),
        )

    def test_zipf_pallas(self):
        from partitionedhashjoin_tpu.ops.pallas.generate import (
            zipf_keys_pallas,
        )

        _lowers(
            lambda s: zipf_keys_pallas(s, 1 << 18, 1.05, 10_000),
            S((), jnp.uint32),
        )


class TestStagedPipelineLowering:
    """Round-4 staged filter→GROUP BY: both dispatches, incl. the
    5-carried-column compaction kernel the distinct path adds."""

    def test_staged_filter_dispatch(self):
        from partitionedhashjoin_tpu.ops.aggregate import _staged_filter
        from partitionedhashjoin_tpu.ops.pallas.bitonic_sort import BLK

        n = 2 * BLK + 100  # exercises the pad branch
        _lowers(
            lambda k, p, m: _staged_filter(k, p, m),
            S((n,), jnp.int32), S((n,), jnp.int32), S((n,), jnp.bool_),
        )

    def test_staged_pass2_with_distinct(self):
        from partitionedhashjoin_tpu.ops.aggregate import _staged_pass2
        from partitionedhashjoin_tpu.ops.pallas.bitonic_sort import BLK

        n = 3 * BLK
        size = 2 * BLK
        _lowers(
            lambda t, pos, k, p: _staged_pass2(
                t, pos, k, p, n, size, 4096,
                kernel_compaction=True, interpret=False, sort_impl="pallas",
                with_distinct=True,
            ),
            S((), jnp.int32), S((n + BLK,), jnp.int32),
            S((n + BLK,), jnp.int32), S((n + BLK,), jnp.int32),
        )

    def test_group_by_distinct_program(self):
        from partitionedhashjoin_tpu.ops.aggregate import (
            _sort_group_and_aggregate,
        )

        n = 500_000
        _lowers(
            lambda k, p: _sort_group_and_aggregate(
                k, p, 4096, kernel_compaction=True, sort_impl="xla",
                with_distinct=True,
            ),
            S((n,), jnp.int32), S((n,), jnp.int32),
        )

    def test_aggregate_sorted_program(self):
        from partitionedhashjoin_tpu.ops.aggregate import (
            _aggregate_sorted_impl,
        )

        n = 500_000
        _lowers(
            lambda k, p, v: _aggregate_sorted_impl(
                k, p, 4096, n_valid_in=v, has_nvalid=True,
                kernel_compaction=True,
            ),
            S((n,), jnp.int32), S((n,), jnp.int32), S((), jnp.int32),
        )

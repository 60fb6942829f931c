"""Pallas kernel tests, run in interpreter mode on the CPU mesh.

Real-TPU execution of the same kernels is exercised by bench.py; these
validate kernel semantics hermetically (interpret=True runs the identical
kernel body through the Pallas interpreter).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.ops.pallas import merge_count as mc


def _oracle_inputs(rng, n_a, n_b, lo=-500, hi=500):
    a = rng.integers(lo, hi, n_a).astype(np.int32)
    b = rng.integers(lo - 100, hi + 100, n_b).astype(np.int32)
    keys = np.concatenate([a, b])
    is_build = np.concatenate([np.ones(n_a, bool), np.zeros(n_b, bool)])
    order = np.argsort(keys, kind="stable")  # builds precede ties (concat order)
    return keys[order], is_build[order], int(np.isin(b, a).sum())


@pytest.mark.parametrize(
    "n_a,n_b", [(100, 400), (5000, 20000), (1, 1), (0, 100)]
)
def test_merge_count_matches_oracle(n_a, n_b):
    rng = np.random.default_rng(n_a + n_b)
    ks, bs, expected = _oracle_inputs(rng, n_a, n_b)
    got = int(
        mc.merge_count_sorted(
            jnp.asarray(ks), jnp.asarray(bs), interpret=True
        )
    )
    assert got == expected


def test_merge_count_multi_block_carry():
    # force several grid steps so the SMEM carry crosses block boundaries:
    # one build key at the very start, all probe rows equal to it
    n = 3 * mc.BLOCK + 17
    keys = np.zeros(n, np.int32)
    is_build = np.zeros(n, bool)
    is_build[0] = True
    got = int(
        mc.merge_count_sorted(
            jnp.asarray(keys), jnp.asarray(is_build), interpret=True
        )
    )
    assert got == n - 1


def test_merge_count_run_spanning_blocks_without_build():
    # a probe-only run spanning blocks must not match a smaller earlier build
    n = 2 * mc.BLOCK
    keys = np.concatenate(
        [np.array([5], np.int32), np.full(n - 1, 7, np.int32)]
    )
    is_build = np.zeros(n, bool)
    is_build[0] = True  # build key 5; probes all 7
    got = int(
        mc.merge_count_sorted(
            jnp.asarray(keys), jnp.asarray(is_build), interpret=True
        )
    )
    assert got == 0


def test_merge_count_int_max_probe_rows_unaffected_by_padding():
    # genuine INT32_MAX probe rows precede the kernel's (INT32_MAX, build)
    # padding, so they must not match unless a real build INT32_MAX exists
    m = np.iinfo(np.int32).max
    keys = np.array([1, m, m], np.int32)
    is_build = np.array([True, False, False])
    got = int(
        mc.merge_count_sorted(
            jnp.asarray(keys), jnp.asarray(is_build), interpret=True
        )
    )
    assert got == 0
    keys2 = np.array([1, m, m, m], np.int32)
    is_build2 = np.array([True, True, False, False])
    got2 = int(
        mc.merge_count_sorted(
            jnp.asarray(keys2), jnp.asarray(is_build2), interpret=True
        )
    )
    assert got2 == 2

"""Pallas generation kernels: seeded hashing and on-chip Zipf sampling.

SURVEY.md §7 step 2 calls for the hashing kernel ("vectorized XXH3/Murmur-
style int64→uint64 finalizer in Pallas") and step 1 for the Zipf sampler as
a batch kernel driven by counter-based RNG.  Both exist here as true Mosaic
kernels:

- ``hash_keys``: the murmur3-style finalizer of ops/hashing.py as a tiled
  VMEM kernel.  The jnp formulation already fuses under XLA; the kernel form
  exists so hashing composes into larger hand-written kernels (and verifies
  the shared math runs under Mosaic byte-identically).
- ``zipf_keys_pallas``: the reference's rejection sampler
  (src/DataGenerator/Zipf.cpp:14-56 math, via ops/generators.zipf_candidates)
  running entirely on-chip with the hardware PRNG (``pltpu.prng_seed`` /
  ``prng_random_bits``): each grid block seeds independently, draws uniform
  candidate/accept pairs for a fixed round count, and keeps each slot's
  first accepted sample.  No host tables, no threefry streams — the whole
  relation is generated without leaving the chip.  Rounds are fixed (the
  proposal is tight: P(reject^R) < 1e-6 at R=16); never-accepted slots fall
  back to key 1 like the XLA sampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from partitionedhashjoin_tpu.ops.generators import zipf_candidates
from partitionedhashjoin_tpu.ops.hashing import hash32

_BLOCK_ROWS = 256
LANES = 128
BLOCK = _BLOCK_ROWS * LANES
_INV_2_32 = float(2.0**-32)


def _hash_kernel(seed_ref, keys_ref, out_ref):
    out_ref[:] = hash32(keys_ref[:], seed_ref[0]).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hash_keys(keys: jax.Array, seed, interpret: bool = False) -> jax.Array:
    """Seeded uint32 hash of int32 keys as a Pallas kernel (= ops/hashing.hash32)."""
    n = keys.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.uint32)
    padded = (n + BLOCK - 1) // BLOCK * BLOCK
    keys_p = jnp.zeros((padded,), jnp.int32)
    keys_p = jax.lax.dynamic_update_slice(
        keys_p, jnp.asarray(keys, jnp.int32), (0,)
    )
    out = pl.pallas_call(
        _hash_kernel,
        out_shape=jax.ShapeDtypeStruct((padded // LANES, LANES), jnp.uint32),
        grid=(padded // BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(seed).astype(jnp.uint32), (1,)),
        keys_p.reshape(padded // LANES, LANES),
    )
    return out.reshape(-1)[:n]


def _zipf_kernel(seed_ref, out_ref, *, alpha, cardinality, rounds):
    # independent stream per grid block
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    shape = out_ref.shape
    def uniform():
        # Mosaic has no uint32->float32 cast; build a float in [1, 2) from
        # 23 mantissa bits and subtract 1 (classic bit trick)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        mantissa = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
        return pltpu.bitcast(mantissa, jnp.float32) - 1.0

    vals = jnp.ones(shape, jnp.int32)
    accepted = jnp.zeros(shape, jnp.bool_)
    for _ in range(rounds):
        sample, ok = zipf_candidates(
            uniform(), uniform(), alpha, cardinality, u3=uniform()
        )
        take = ok & ~accepted
        vals = jnp.where(take, sample, vals)
        accepted = accepted | ok
    out_ref[:] = vals


@functools.partial(
    jax.jit, static_argnames=("n", "alpha", "cardinality", "rounds", "interpret")
)
def zipf_keys_pallas(
    seed,
    n: int,
    alpha: float,
    cardinality: int,
    rounds: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """n Zipf(alpha) samples over [1, cardinality] via the on-chip PRNG."""
    padded = (n + BLOCK - 1) // BLOCK * BLOCK
    out = pl.pallas_call(
        functools.partial(
            _zipf_kernel,
            alpha=float(alpha),
            cardinality=int(cardinality),
            rounds=rounds,
        ),
        out_shape=jax.ShapeDtypeStruct((padded // LANES, LANES), jnp.int32),
        grid=(padded // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(seed).astype(jnp.int32), (1,)))
    return out.reshape(-1)[:n]

"""Random number generation.

Two generators, mirroring the split in the design:

- ``MultiplicativeLCG``: the reference's Lehmer/Park-Miller multiplicative LCG
  (a=16807, m=2^31-1, Schrage's method; src/Common/Random.hpp:26-36,
  src/Common/Random.cpp:9-30, credited to genzipf.c).  Host-side numpy
  implementation with vectorized leapfrog skip-ahead — used by the host data
  oracle and by parity tests that replicate the reference's exact sample
  streams.
- The device-side generators (ops/generators.py) use JAX's counter-based
  threefry PRNG instead: a per-worker stateful LCG does not map to SPMD
  hardware, while counter-based streams are reproducible under any sharding
  (equivalent-by-distribution; match counts depend only on key multisets).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_A = 16807
_M = 2147483647  # 2^31 - 1


class MultiplicativeLCG:
    """Park-Miller minimal standard generator, doubles in (0, 1).

    Bit-compatible with the reference stream for the same seed
    (src/Common/Random.cpp:9-30).
    """

    def __init__(self, seed: int) -> None:
        seed = int(seed) % _M
        if seed == 0:
            seed = 1  # zero is a fixed point of the multiplicative LCG
        self._state = seed

    def next(self) -> float:
        self._state = (_A * self._state) % _M
        return self._state / _M

    def next_batch(self, n: int) -> np.ndarray:
        """Vectorized batch: states s*a^1..s*a^n mod m via cumulative products.

        Uses python ints (exact) chunk-wise; returns float64 in (0,1).
        """
        out = np.empty(n, dtype=np.float64)
        s = self._state
        for i in range(n):
            s = (_A * s) % _M
            out[i] = s / _M
        self._state = s
        return out

    @property
    def state(self) -> int:
        return self._state


class MultiplicativeLCGFactory:
    """Factory with fresh-entropy or explicit seeding (Random.cpp:32-41)."""

    def get_new_generator(self, seed: Optional[int] = None) -> MultiplicativeLCG:
        if seed is None:
            seed = int(np.random.SeedSequence().entropy % _M)
        return MultiplicativeLCG(seed)


def lcg_skip(seed: int, n: int) -> int:
    """State after n steps: a^n * seed mod m (for leapfrogged parallel streams)."""
    return (pow(_A, n, _M) * (seed % _M)) % _M

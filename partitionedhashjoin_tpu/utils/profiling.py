"""Tracing and roofline accounting.

TPU-native counterpart of the reference's profiling story (SURVEY.md §5):
the reference has manual phase timers plus an acknowledged TODO for CPU
cache-miss counters (Readme.md:66-67).  Here:

- ``trace(...)``: a ``jax.profiler`` trace context producing TensorBoard/
  Perfetto traces of device execution (the TPU answer to hardware counters).
- ``roofline(...)``: HBM-bandwidth roofline accounting for a phase — the
  engine's kernels are memory-bound, so achieved-GB/s over peak-GB/s is the
  speed-of-light fraction (BASELINE.json targets >= 70% on probe).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Iterator, Optional

#: Peak HBM bandwidth per chip, GB/s.  v5e ("TPU v5 lite") ~ 819 GB/s.
HBM_PEAK_GBPS = {
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
}
DEFAULT_CHIP = "v5e"


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile for [enter, exit) into ``log_dir``.

    View with TensorBoard's profile plugin or Perfetto.  Wraps
    ``jax.profiler.trace`` so callers don't import jax.profiler directly.
    """
    import jax.profiler

    with jax.profiler.trace(log_dir):
        yield


@dataclasses.dataclass
class RooflineReport:
    """Achieved vs peak memory bandwidth for one phase."""

    seconds: float
    bytes_moved: int
    achieved_gbps: float
    peak_gbps: float

    @property
    def fraction_of_peak(self) -> float:
        return self.achieved_gbps / self.peak_gbps

    def __str__(self) -> str:
        return (
            f"{self.bytes_moved / 1e9:.2f} GB in {self.seconds * 1e3:.0f} ms "
            f"-> {self.achieved_gbps:.0f} GB/s "
            f"({self.fraction_of_peak * 100:.0f}% of {self.peak_gbps:.0f} peak)"
        )


def roofline(
    seconds: float, bytes_moved: int, chip: str = DEFAULT_CHIP
) -> RooflineReport:
    """Bandwidth roofline for a measured phase.

    ``bytes_moved`` is the algorithmic HBM traffic (reads + writes of live
    arrays); callers compute it from shapes, e.g. a 210M-row 2-operand sort
    moves ~2 * passes * 210M * 5 bytes.
    """
    peak = HBM_PEAK_GBPS.get(chip, HBM_PEAK_GBPS[DEFAULT_CHIP])
    achieved = bytes_moved / max(seconds, 1e-12) / 1e9
    return RooflineReport(
        seconds=seconds,
        bytes_moved=bytes_moved,
        achieved_gbps=achieved,
        peak_gbps=peak,
    )


def sort_merge_bytes(n_build: int, n_probe: int, key_bytes: int = 4) -> int:
    """Algorithmic traffic of the sort-merge count join: the XLA sort's
    multi-pass read+write of (key, tag) plus one streaming scan pass.

    Sort pass count is an empirical ~8 for XLA's tiled TPU sort at 1e8-1e9
    elements (measured 4.1 ns/element ≈ 8 passes at ~2 B/ns/element/pass).
    """
    n = n_build + n_probe
    per_pass = n * (key_bytes + 1) * 2  # read + write of key+tag
    return 8 * per_pass + n * (key_bytes + 1)

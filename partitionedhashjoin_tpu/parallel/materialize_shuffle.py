"""Distributed materializing join over the device mesh.

The reference never materializes join output — it returns an empty table
and logs only the match count (src/NoPartitioning/HashJoin.hpp:184-186) —
so this operator is an engine extension: the scale-out of the typed
sort-merge materializer (ops/sort_merge.py::_materialize_typed), closing
the query layer's last mesh gap (``_exec_join_rows`` previously raised).

Why the shuffle join's exchange makes the per-shard union join EXACT for
every probe-side variant (inner/semi/anti/left):

- A **cold** key's rows — build and probe, both relations hash-route by
  the same key — all land on exactly one owner shard.  That shard sees
  every build row of the key, so per-probe-row match/no-match (and the
  first-match payload) is decided with complete information, exactly
  once.
- A **hot** key's build rows are ALL replicated to every shard
  (``is_hot_a`` covers every row of a planned key) and its probe rows
  ALL stay local, so each hot probe row is decided exactly once, against
  the complete (replicated) build set.
- Cross terms are empty: a cold probe row's key has no hot build rows
  (the hot set is a key-set membership), and vice versa.

``full`` is the one variant that cannot ride this plan: its unmatched-
BUILD emissions are per-build-row, and a replicated hot build row is
locally-unmatched on shards that hold none of its probe rows — deciding
it needs a cross-shard reduction per build row.  ``full`` therefore
stays single-device (query.py composes it there).

Output protocol: each shard materializes into a static ``pool``-sized
buffer (``pool`` = received probe capacity + local rows, an upper bound
because every probe-side variant emits at most one row per probe row —
no output overflow is possible).  ``run`` then all_gathers the per-shard
segments and compacts them into one replicated, prefix-compacted
``JoinedTable`` — identical (as a multiset of rows) to the single-device
materializer, modulo row order.  The gather is the honest cost of
*returning* a materialized relation to the caller; composed plans that
only aggregate it never pay it (parallel/join_aggregate.py does the
join → GROUP BY with partials, not rows).

Exactness: the engine-wide static-capacity protocol — the exchange's
three overflow counters (cold a, cold b, hot replication) grow and
retry; the output buffer is capacity-proved as above.

Filters: ``build_valid`` / ``probe_valid`` push down into the exchange
bucketizer (parallel/shuffle.py::_exchange) — invalid rows never travel
— and the received-row validity masks feed the typed materializer's
``build_valid``/``probe_valid`` so the variant semantics under filters
match the single-device masked materializer row for row.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from partitionedhashjoin_tpu.data.table import JoinedTable, Table
from partitionedhashjoin_tpu.ops.sort_merge import _materialize_typed
from partitionedhashjoin_tpu.parallel.mesh import SHARD_AXIS
from partitionedhashjoin_tpu.parallel.shuffle import (
    _exchange,
    plan_hot_keys,
)
from partitionedhashjoin_tpu.utils.logger import get_new_logger

_shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
if _shard_map is None:  # pragma: no cover - jax version fallback
    from jax.experimental.shard_map import shard_map as _shard_map


@functools.partial(
    jax.jit, static_argnames=("mesh", "join_type", "use_hot")
)
def _materialize_local(
    mesh: Mesh,
    rk_a, rp_a, rv_a,
    rk_b, rp_b, rv_b,
    keys_b, pays_b, is_hot_b,
    hk, hp, hv,
    join_type: str,
    use_hot: bool,
):
    """Per-shard union materialize + all_gather of the ragged segments.

    Returns replicated ``(keys, pay_a, pay_b, matched, live, total)``
    where the first five are the concatenated per-shard buffers (each
    shard's first ``count_s`` rows valid, flagged by ``live``) and
    ``total`` is the psum'd exact row count.
    """

    def local(rka, rpa, rva, rkb, rpb, rvb, kb, pb, ihb, hk_, hp_, hv_):
        build_k = jnp.concatenate([rka, hk_])
        build_p = jnp.concatenate([rpa, hp_])
        build_v = jnp.concatenate([rva, hv_])
        probe_k = jnp.concatenate([rkb, kb])
        probe_p = jnp.concatenate([rpb, pb])
        probe_v = jnp.concatenate([rvb, ihb])
        keys, pa, pb_, matched, count = _materialize_typed(
            build_k, build_p, probe_k, probe_p, join_type,
            build_valid=build_v, probe_valid=probe_v,
        )
        pool = probe_k.shape[0]
        live = jnp.arange(pool, dtype=jnp.int32) < count
        total = jax.lax.psum(count, SHARD_AXIS)

        def gather(x):
            return jax.lax.all_gather(x, SHARD_AXIS).reshape(-1)

        return (
            gather(keys), gather(pa), gather(pb_),
            gather(matched), gather(live),
            jnp.reshape(total, (1,)),
        )

    sh = P(SHARD_AXIS)
    rep = P()
    out = _shard_map(
        local,
        mesh=mesh,
        in_specs=(sh, sh, sh, sh, sh, sh, sh, sh, sh, rep, rep, rep),
        out_specs=(rep, rep, rep, rep, rep, rep),
        check_vma=False,
    )(
        rk_a, rp_a, rv_a, rk_b, rp_b, rv_b,
        keys_b, pays_b, is_hot_b, hk, hp, hv,
    )
    keys, pa, pb, matched, live, total = out
    return keys, pa, pb, matched, live, total[0]


@jax.jit
def _compact_gathered(keys, pa, pb, matched, live, total):
    """Compact the gathered ragged segments to a prefix (one value-carrying
    partition sort — the engine's compaction idiom, ops/filter.py) and
    zero the padding tail."""
    from partitionedhashjoin_tpu.ops.filter import compact_sort

    count, k, a, b, m = compact_sort(
        live, keys, pa, pb, matched.astype(jnp.int32)
    )
    n = keys.shape[0]
    live_out = jnp.arange(n, dtype=jnp.int32) < count
    return (
        jnp.where(live_out, k, 0),
        jnp.where(live_out, a, 0),
        jnp.where(live_out, b, 0),
        jnp.where(live_out, m > 0, False),
        total,
    )


class DistributedMaterializeJoiner:
    """Mesh-parallel materializing join driver.

    ``run(build, probe, join_type)`` returns a replicated, prefix-
    compacted ``JoinedTable`` equal as a row multiset to the single-
    device ``sort_merge_materialize_typed`` result (first-match payload
    choice among duplicate build keys is implementation-defined in both).
    Shares the shuffle join's exchange knobs and exactness contract.
    """

    def __init__(
        self,
        mesh: Mesh,
        seed: Optional[int] = None,
        slack: float = 2.0,
        handle_skew: bool = True,
        hot_capacity: int = 64,
        hot_sample: int = 16_384,
        hot_min_frac: float = 0.005,
        max_retries: int = 5,
    ) -> None:
        self._mesh = mesh
        self._num_shards = int(mesh.devices.size)
        if self._num_shards & (self._num_shards - 1):
            raise ValueError("mesh size must be a power of 2")
        if seed is None:
            import numpy as _np

            seed = int(_np.random.SeedSequence().entropy & 0xFFFFFFFF)
        self._shard_seed = jnp.asarray(seed & 0xFFFFFFFF, jnp.uint32)
        self._hot_seed = jnp.asarray(
            (seed ^ 0x9E3779B9) & 0xFFFFFFFF, jnp.uint32
        )
        self._slack = slack
        self._handle_skew = handle_skew
        self._hot_capacity = hot_capacity
        self._hot_sample = hot_sample
        self._hot_min_frac = hot_min_frac
        self._max_retries = max_retries
        self._logger = get_new_logger("DistributedMaterialize")

    def _capacity(self, rows_per_shard: int, slack: float) -> int:
        per_dest = rows_per_shard / self._num_shards
        return max(16, min(int(per_dest * slack + 1), rows_per_shard))

    def run(
        self,
        build: Table,
        probe: Table,
        join_type: str = "inner",
        build_valid=None,
        probe_valid=None,
    ) -> JoinedTable:
        if join_type not in ("inner", "semi", "anti", "left"):
            raise ValueError(
                f"distributed materialize supports inner/semi/anti/left; "
                f"{join_type!r} stays single-device (module docstring)"
            )
        for name, t in (("build", build), ("probe", probe)):
            if t.keys.dtype != jnp.int32 or t.payloads.dtype != jnp.int32:
                raise TypeError(
                    f"distributed materialize is int32-only ({name} keys "
                    f"{t.keys.dtype}, payloads {t.payloads.dtype})"
                )
        s = self._num_shards
        if build.size % s or probe.size % s:
            raise ValueError("relation sizes must divide the shard count")
        use_hot = self._handle_skew
        if use_hot:
            hot_keys, hot_valid = plan_hot_keys(
                probe.keys,
                self._hot_sample,
                self._hot_capacity,
                self._hot_min_frac,
                seed=int(self._hot_seed),
            )
        else:
            hot_keys = jnp.zeros((self._hot_capacity,), jnp.int32)
            hot_valid = jnp.zeros((self._hot_capacity,), jnp.bool_)

        slack = self._slack
        hot_cap = self._hot_capacity
        for _ in range(self._max_retries):
            cap_a = self._capacity(build.size // s, slack)
            cap_b = self._capacity(probe.size // s, slack)
            (
                rk_a, rp_a, rv_a, rk_b, rp_b, rv_b,
                is_hot_b, hk, hp, hv, stats,
            ) = _exchange(
                self._mesh,
                build.keys,
                build.payloads,
                probe.keys,
                probe.payloads,
                self._shard_seed,
                hot_keys,
                hot_valid,
                self._hot_seed,
                cap_a,
                cap_b,
                hot_cap,
                use_hot,
                valid_a=build_valid,
                valid_b=probe_valid,
            )
            dropped = jax.device_get(
                (stats.dropped_a, stats.dropped_b, stats.dropped_hot)
            )
            if any(int(d) > 0 for d in dropped):
                self._logger.info(
                    "bucket overflow (a=%d b=%d hot=%d) at slack %.1f; "
                    "retrying",
                    int(dropped[0]), int(dropped[1]), int(dropped[2]), slack,
                )
                if int(dropped[0]) > 0 or int(dropped[1]) > 0:
                    slack *= 2
                if int(dropped[2]) > 0:
                    hot_cap = hot_cap * 4 + int(dropped[2])
                continue
            keys, pa, pb, matched, live, total = _materialize_local(
                self._mesh,
                rk_a, rp_a, rv_a,
                rk_b, rp_b, rv_b,
                probe.keys, probe.payloads, is_hot_b,
                hk, hp, hv,
                join_type,
                use_hot,
            )
            keys, pa, pb, matched, count = _compact_gathered(
                keys, pa, pb, matched, live, total
            )
            self._logger.info(
                "Number of joined tuples: %d", int(jax.device_get(count))
            )
            return JoinedTable(
                keys=keys, payloads_a=pa, payloads_b=pb,
                count=count, matched=matched,
            )
        raise RuntimeError(
            f"materialize exchange overflowed after "
            f"{self._max_retries} retries"
        )

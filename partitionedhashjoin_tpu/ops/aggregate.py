"""Hash aggregate: GROUP BY key with COUNT / SUM / MIN / MAX.

Part of the extended db_exec_kernel suite (BASELINE.json configs[3],
"Filter + hash-aggregate pipeline"); the reference has no aggregate operator.

TPU-native hash aggregation, no sort: the deduplicating claim loop
(ops/hash_table.py::build_dedup_hash_table) maps every row to a canonical
representative row of its key in O(distinct-collision-chain) rounds —
independent of duplication, so Zipf heads cost nothing extra.  Group ids are
densified with a flag + prefix sum, and all aggregates are conflict-free
scatter-adds/mins/maxes onto the group vector (XLA scatter-add is
deterministic on TPU — the reference would have needed its latch/atomic
machinery here).

Output arrays have static capacity = number of input rows; ``num_groups``
bounds the valid prefix.  Group order is hash-table claim order (i.e.
arbitrary but deterministic given the seed), matching unordered GROUP BY
semantics.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from partitionedhashjoin_tpu.data.table import Table
from partitionedhashjoin_tpu.ops import hash_table as ht

_I32_MAX = jnp.iinfo(jnp.int32).max
_I32_MIN = jnp.iinfo(jnp.int32).min


def masked_mean(count, total, dtype=jnp.float32) -> jax.Array:
    """The engine's AVG convention (shared by GroupByResult and
    query.ScalarAggResult): sum/count where count > 0, else 0."""
    c = jnp.maximum(count, 1).astype(dtype)
    return jnp.where(
        count > 0, total.astype(dtype) / c, jnp.zeros((), dtype)
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GroupByResult:
    """GROUP BY output: per-group key + aggregates, valid in [0, num_groups)."""

    keys: jax.Array  # int32[n] group keys
    count: jax.Array  # int32[n] COUNT(*)
    sum: jax.Array  # payload-dtype[n] SUM(payload)
    min: jax.Array  # payload-dtype[n] MIN(payload)
    max: jax.Array  # payload-dtype[n] MAX(payload)
    num_groups: jax.Array  # int32 scalar
    # int32[n] dense group id per input row for AGGREGATION results
    # (all -1 on paths that don't track membership).  SELECTION results
    # (query.group_top_k: order_by/limit/having over a group table)
    # carry an EMPTY (0-length) group_of_row instead: a k-sized
    # selection has no row mapping, and a relation-sized -1 array cost
    # 800 MB of dead HBM per result at 200M rows (round 5).
    group_of_row: jax.Array
    # COUNT(DISTINCT payload) per group; present only when the sort path
    # ran with ``with_distinct=True`` (payload is the 3rd sort key there, so
    # distinct values are run boundaries — free ordering the hash path lacks)
    distinct: "jax.Array | None" = None

    def mean(self, dtype=jnp.float32) -> jax.Array:
        """AVG(payload) per group: sum/count where count > 0, else 0."""
        return masked_mean(self.count, self.sum, dtype)


@functools.partial(jax.jit, static_argnames=("size", "has_valid"))
def _group_and_aggregate(
    keys: jax.Array,
    payloads: jax.Array,
    seed: jax.Array,
    size: int,
    valid: "jax.Array | None" = None,
    has_valid: bool = False,
) -> GroupByResult:
    n = keys.shape[0]
    _, rep_row = ht.build_dedup_hash_table(
        keys, seed, size, valid=valid, has_valid=has_valid
    )
    # densify representatives -> group ids 0..G-1 (stable in row order);
    # invalid rows keep rep_row == -1 and aggregate into the dump slot
    safe_rep = jnp.where(rep_row >= 0, rep_row, n)
    is_rep_flag = (
        jnp.zeros((n,), jnp.int32).at[safe_rep].max(1, mode="drop")
    )
    dense_of_row = jnp.cumsum(is_rep_flag) - is_rep_flag  # id at rep positions
    gid = jnp.where(
        rep_row >= 0, dense_of_row[jnp.maximum(rep_row, 0)], n
    )
    num_groups = jnp.sum(is_rep_flag)

    ones = jnp.ones((n,), jnp.int32)
    count = jnp.zeros((n,), jnp.int32).at[gid].add(ones, mode="drop")
    sum_ = jnp.zeros((n,), payloads.dtype).at[gid].add(payloads, mode="drop")
    # MIN/MAX keep the payload dtype like SUM does (an int32 cast would
    # silently truncate int64 payloads in min/max only — round-1 ADVICE)
    pinfo = (
        jnp.iinfo(payloads.dtype)
        if jnp.issubdtype(payloads.dtype, jnp.integer)
        else jnp.finfo(payloads.dtype)
    )
    min_ = jnp.full((n,), pinfo.max, payloads.dtype).at[gid].min(
        payloads, mode="drop"
    )
    max_ = jnp.full((n,), pinfo.min, payloads.dtype).at[gid].max(
        payloads, mode="drop"
    )
    group_keys = jnp.zeros((n,), keys.dtype).at[gid].set(keys, mode="drop")
    return GroupByResult(
        keys=group_keys,
        count=count,
        sum=sum_,
        min=min_,
        max=max_,
        num_groups=num_groups,
        group_of_row=jnp.where(gid < n, gid, -1),
    )


def hash_aggregate(table: Table, seed: int = 0) -> GroupByResult:
    """GROUP BY ``table.keys``, aggregating ``table.payloads``."""
    size = ht.table_size_for(table.size)
    seed_dev = jnp.asarray(seed & 0xFFFFFFFF, jnp.uint32)
    return _group_and_aggregate(table.keys, table.payloads, seed_dev, size)


def filter_aggregate(table: Table, predicate, seed: int = 0) -> GroupByResult:
    """Filter → hash-aggregate pipeline (BASELINE.json configs[3]:
    "Filter + hash-aggregate pipeline on generated key/value tables").

    Rows failing ``predicate(keys, payloads)`` are excluded via the dedup
    table's validity mechanism (they are never inserted, keep ``rep_row ==
    -1``, and aggregate into a dropped dump slot) — no materialized
    intermediate table, so XLA fuses the mask directly into the group-by
    scatters.

    Returns ``(GroupByResult of the selected rows, selected_row_count)``;
    ``group_of_row`` is -1 for filtered-out rows.
    """
    mask = predicate(table.keys, table.payloads)
    g = _group_and_aggregate(
        table.keys,
        table.payloads,
        jnp.asarray(seed & 0xFFFFFFFF, jnp.uint32),
        ht.table_size_for(table.size),
        valid=mask,
        has_valid=True,
    )
    return g, jnp.sum(mask.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Sort-based aggregate: the at-scale GROUP BY path.
#
# The hash path above pays ~5 relation-sized scatters plus the dedup claim
# loop (8.6-11.7 ns/el each, docs/PERFORMANCE.md) — ~15+ s at 200M rows,
# beyond the single-program watchdog.  Sorting is this chip's cheapest full
# reorder (2-4 ns/el), and a (valid, key, payload) sort makes every group a
# contiguous run with its MIN payload first and MAX last, so all four
# aggregates fall out of ONE sort + prefix scans:
#
#   starts S_g  : boundary-flag compaction via a second unstable 2-key sort
#                 on (not-start, position) — cheaper than a scatter at scale,
#                 and it carries key/min/cumsum/max columns along as value
#                 operands so NO group-indexed gathers remain (a 16M-index
#                 gather from a 200M array costs 250-490 ms on this chip)
#   count       : S_{g+1} - S_g  (slice-shift of the compacted prefix)
#   sum         : exclusive-cumsum difference csx[S_{g+1}] - csx[S_g].
#                 int32 cumsum wraps mod 2^32 exactly like the hash path's
#                 scatter-add accumulation (addition mod 2^32 is
#                 associative), so the two paths return bit-identical sums
#                 even for overflowing heavy groups.
#   min / max   : payload at S_g / S_{g+1}-1 (payload is the 3rd sort key)
#   group keys  : key at S_g
#
# Group order is key-ascending (vs the hash path's claim order) — both are
# valid unordered-GROUP-BY orders; tests compare as key→aggregate maps.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_capacity", "has_valid", "with_group_of_row",
        "kernel_compaction", "interpret", "sort_impl", "with_distinct",
        "presorted",
    ),
)
def _sort_group_and_aggregate(
    keys: jax.Array,
    payloads: jax.Array,
    group_capacity: int,
    valid: "jax.Array | None" = None,
    has_valid: bool = False,
    with_group_of_row: bool = False,
    kernel_compaction: bool = False,
    interpret: bool = False,
    sort_impl: str = "xla",
    with_distinct: bool = False,
    presorted: bool = False,
) -> GroupByResult:
    n = keys.shape[0]
    if n == 0:
        gz = jnp.zeros((group_capacity,), jnp.int32)
        pz = jnp.zeros((group_capacity,), payloads.dtype)
        return GroupByResult(
            keys=gz, count=gz, sum=pz, min=pz, max=pz,
            num_groups=jnp.asarray(0, jnp.int32),
            group_of_row=jnp.full((n,), -1, jnp.int32),
            distinct=gz if with_distinct else None,
        )
    if group_capacity == 0:
        # num_groups stays EXACT (the capacity-overflow retry contract —
        # round-2 review: returning 0 here made 'num_groups <= capacity'
        # read as complete): count distinct valid keys, return no groups.
        inv = (
            jnp.where(valid, 0, 1).astype(jnp.int32)
            if has_valid
            else jnp.zeros((n,), jnp.int32)
        )
        inv_s, key_s = jax.lax.sort((inv, keys), num_keys=2, is_stable=False)
        valid_s = inv_s == 0
        prev_key = jnp.concatenate([key_s[:1], key_s[:-1]])
        is_start = valid_s & (
            (jnp.arange(n, dtype=jnp.int32) == 0) | (key_s != prev_key)
        )
        gz = jnp.zeros((0,), jnp.int32)
        pz = jnp.zeros((0,), payloads.dtype)
        return GroupByResult(
            keys=gz, count=gz, sum=pz, min=pz, max=pz,
            num_groups=jnp.sum(is_start.astype(jnp.int32)),
            group_of_row=jnp.full((n,), -1, jnp.int32),
            distinct=gz if with_distinct else None,
        )
    inv = (
        jnp.where(valid, 0, 1).astype(jnp.int32)
        if has_valid
        else jnp.zeros((n,), jnp.int32)
    )
    iota = jnp.arange(n, dtype=jnp.int32)
    # pass 1: one unstable multi-key sort; extra operands are nearly free.
    # Invalid rows sort to the back, so the valid prefix is contiguous.
    ops = (inv, keys, payloads) + ((iota,) if with_group_of_row else ())
    if presorted:
        # caller asserts the input is ALREADY (inv, key, payload)-ordered:
        # valid rows a prefix, keys ascending within it, payloads ascending
        # within each key run (aggregate_sorted's payload_sorted contract —
        # the materialized join emits exactly this order).  Every
        # downstream invariant (min at run start, max at run end, distinct
        # pair boundaries) then holds without the relation sort.
        sorted_ops = ops
    elif sort_impl == "pallas" and all(o.dtype == jnp.int32 for o in ops):
        # full-lex tuple order == (inv, key, payload) 3-key order (payload
        # IS the 3rd key; an iota operand only breaks exact-duplicate ties,
        # whose rows share a group).  All-MAX padding sorts past inv<=1.
        from partitionedhashjoin_tpu.ops.pallas import bitonic_sort

        sorted_ops = bitonic_sort.sort_i32_tuple(*ops, interpret=interpret)
    else:
        sorted_ops = jax.lax.sort(ops, num_keys=3, is_stable=False)
    inv_s, key_s, pay_s = sorted_ops[:3]
    valid_s = inv_s == 0
    n_valid = jnp.sum(valid_s.astype(jnp.int32))

    prev_key = jnp.concatenate([key_s[:1], key_s[:-1]])
    is_start = valid_s & ((iota == 0) | (key_s != prev_key))
    num_groups = jnp.sum(is_start.astype(jnp.int32))

    # pass 2: compact the start rows by sorting on (not-start, position) and
    # CARRY every per-group value through the same sort as value operands.
    # Measured (docs/PERFORMANCE.md): a 16M-index gather from a 200M array
    # costs 250-490 ms, and the previous formulation (scatter-compacted
    # starts + 5 group-indexed gathers) spent ~4 s here; value operands ride
    # the compaction sort at ~1 ns/el, and every group aggregate below falls
    # out of slice-shifts of the compacted prefix:
    #   key_g   = key at the start row
    #   min_g   = payload at the start row (payload is the 3rd sort key, so
    #             runs are payload-ascending)
    #   sum_g   = csx[s_{g+1}] - csx[s_g] with csx the EXCLUSIVE payload
    #             cumsum (last group closes with the total valid sum)
    #   max_g   = payload at s_{g+1}-1 = maxprev carried at start row g+1
    #             (last group: payload at the last valid row)
    # dtype= pins the accumulator: reductions otherwise promote int32 to
    # int64 under x64, which would break the documented mod-2^32 sum parity
    # with the hash path for overflowing heavy groups
    cs = jnp.cumsum(pay_s, dtype=payloads.dtype)
    csx = cs - pay_s.astype(payloads.dtype)
    maxprev = jnp.concatenate([pay_s[:1], pay_s[:-1]])
    if with_distinct:
        # payload is the 3rd sort key, so each group's payloads ascend and
        # COUNT(DISTINCT payload) = number of (group, payload) run starts.
        # Same exclusive-cumsum-at-boundary trick as SUM: one extra int32
        # column rides pass 2 (kernel capacity: 5 of MAX_COLS=6).
        pair_start = (
            valid_s & (is_start | (pay_s != maxprev))
        ).astype(jnp.int32)
        cpx_d = jnp.cumsum(pair_start) - pair_start
        total_pairs = jnp.sum(pair_start)
    else:
        cpx_d = None
    if kernel_compaction:
        # Mosaic path (round 3): block-local bitonic stable partition +
        # aligned writes + one ~G-sized XLA cleanup instead of the n-sized
        # 2-key/4-value sort (1.4 s of the 3.15 s GROUP BY at 200M —
        # VERDICT_r02 weak #3).  Same outputs: s_full = start positions,
        # per-group carried columns, zero tails masked downstream.
        from partitionedhashjoin_tpu.ops.pallas.compact import (
            BLK as _CBLK,
            compact_columns,
        )

        pad = (-n) % _CBLK

        def padded(x, fill):
            if pad == 0:
                return x
            return jnp.concatenate(
                [x, jnp.full((pad,), fill, x.dtype)]
            )

        carried = [
            padded(key_s, 0),
            padded(pay_s, 0),
            padded(csx, jnp.zeros((), payloads.dtype)),
            padded(maxprev, 0),
        ]
        if with_distinct:
            carried.append(padded(cpx_d, 0))
        _, _ok, s_full, gkey, gmin, gcsx, gmaxp, *rest = compact_columns(
            padded(is_start, False),
            *carried,
            capacity=group_capacity,
            interpret=interpret,
        )
        # exactness: _ok is implied by num_groups <= group_capacity (the
        # cleanup bound includes the per-block alignment overhead), which
        # is already this function's retry contract
    else:
        flag = jnp.where(is_start, 0, 1).astype(jnp.int32)
        ops2 = [flag, iota, key_s, pay_s, csx, maxprev]
        if with_distinct:
            ops2.append(cpx_d)
        _, s_full, gkey, gmin, gcsx, gmaxp, *rest = jax.lax.sort(
            tuple(ops2), num_keys=2, is_stable=False,
        )
    gcpxd = rest[0] if with_distinct else None

    cap = group_capacity
    g = jnp.arange(cap, dtype=jnp.int32)
    g_ok = g < num_groups
    has_next = g + 1 < num_groups
    zero_p = jnp.zeros((), payloads.dtype)
    zero1 = jnp.zeros((1,), jnp.int32)
    zero1_p = jnp.zeros((1,), payloads.dtype)

    def shift(col, pad):
        return jnp.concatenate([col[1:cap + 1], pad])[:cap]

    s_g = jnp.where(g_ok, s_full[:cap], 0)
    e_excl = jnp.where(has_next, shift(s_full, zero1), n_valid)
    count = jnp.where(g_ok, e_excl - s_g, 0)

    total_valid = jnp.sum(
        jnp.where(valid_s, pay_s, 0), dtype=payloads.dtype
    )
    sum_hi = jnp.where(has_next, shift(gcsx, zero1_p), total_valid)
    sum_ = jnp.where(g_ok, sum_hi - gcsx[:cap], zero_p)

    last_valid_pay = pay_s[jnp.maximum(n_valid - 1, 0)]
    max_ = jnp.where(
        g_ok,
        jnp.where(has_next, shift(gmaxp, zero1_p), last_valid_pay),
        zero_p,
    )
    if with_distinct:
        d_hi = jnp.where(has_next, shift(gcpxd, zero1), total_pairs)
        distinct = jnp.where(g_ok, d_hi - gcpxd[:cap], 0)
    else:
        distinct = None
    res = GroupByResult(
        keys=jnp.where(g_ok, gkey[:cap], 0),
        count=count,
        sum=sum_,
        min=jnp.where(g_ok, gmin[:cap], zero_p),
        max=max_,
        num_groups=num_groups,
        group_of_row=jnp.full((n,), -1, jnp.int32),
        distinct=distinct,
    )
    if with_group_of_row:
        # dense id of each SORTED row, scattered back to input positions
        row_iota_s = sorted_ops[3]
        gid_s = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        gid_s = jnp.where(valid_s, gid_s, -1)
        res = dataclasses.replace(
            res,
            group_of_row=jnp.zeros((n,), jnp.int32).at[row_iota_s].set(gid_s),
        )
    return res


_SEG_L = 8192  # intra-block scan length for the two-level segmented scan


def _seg_comb(op):
    """Segmented-scan operator: flag marks a segment START toward the scan
    direction.  Associative by the standard (value, flag) construction."""

    def comb(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, op(va, vb)), fa | fb

    return comb


def _seg_suffix_scan(vals, is_end, op):
    """Segmented SUFFIX scan: out[i] = op-fold of vals[i..j] where j is the
    first position >= i with ``is_end[j]`` (out[i] = vals[i] when is_end[i]).

    TWO-LEVEL formulation: a single flat ``associative_scan`` over a
    relation-sized array emits log2(n) ≈ 28 levels of relation-sized
    slice/concat HLO — at 200M that OOM-killed the remote TPU compile
    helper (round-4 measurement, scripts/r4_logs/pipeline.log).  Reshaping
    to (B, 8192) caps level count at 13 relation-sized levels plus a
    B-sized block-summary scan and one broadcast fix-up — the hierarchical
    scan idiom the merge-count kernel uses in VMEM, expressed in XLA.
    Works in reversed orientation (suffix = prefix of the flipped array,
    where ``is_end`` becomes the segment-start flag)."""
    n = vals.shape[0]
    comb = _seg_comb(op)
    if n <= _SEG_L:
        out, _ = jax.lax.associative_scan(comb, (vals, is_end), reverse=True)
        return out
    pad = (-n) % _SEG_L
    r_vals = vals[::-1]
    r_flag = is_end[::-1]
    if pad:
        # pad values are op-identity-free: they carry flag False and sit
        # PAST every real row in reversed orientation, so they only ever
        # appear as the left operand of real rows' combines — where a
        # flagged first real element resets anyway.  The LAST real row of
        # the original array is is_end (or invalid/unread), so no real
        # suffix extends into the pad.
        r_vals = jnp.concatenate([r_vals, jnp.zeros((pad,), vals.dtype)])
        r_flag = jnp.concatenate([r_flag, jnp.zeros((pad,), jnp.bool_)])
    B = r_vals.shape[0] // _SEG_L
    V = r_vals.reshape(B, _SEG_L)
    F = r_flag.reshape(B, _SEG_L)
    # level 1: segmented prefix scan within each block (13 levels)
    sv, sf = jax.lax.associative_scan(comb, (V, F), axis=1)
    # level 2: carry flowing INTO each block = inclusive segmented scan of
    # the block summaries (last element of each block's level-1 scan),
    # shifted by one.  For every b > 0 the incoming piece is nonempty (the
    # segment containing block b-1's last element), so only b=0 lacks one.
    csv, _ = jax.lax.associative_scan(comb, (sv[:, -1], sf[:, -1]))
    carry_v = jnp.concatenate([csv[:1], csv[:-1]])  # value is unread for b=0
    no_carry = (
        jnp.arange(B, dtype=jnp.int32) == 0
    )
    # fix-up: rows with no flag at-or-before them in their block (sf False)
    # continue the incoming segment and absorb the carry
    fixed = jnp.where(
        sf | no_carry[:, None], sv, op(carry_v[:, None], sv)
    )
    out = fixed.reshape(-1)[:n]
    return out[::-1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_capacity", "has_nvalid", "kernel_compaction", "interpret",
    ),
)
def _aggregate_sorted_impl(
    keys: jax.Array,
    payloads: jax.Array,
    group_capacity: int,
    n_valid_in=None,
    has_nvalid: bool = False,
    kernel_compaction: bool = False,
    interpret: bool = False,
) -> GroupByResult:
    n = keys.shape[0]
    if n == 0:
        gz = jnp.zeros((group_capacity,), jnp.int32)
        pz = jnp.zeros((group_capacity,), payloads.dtype)
        return GroupByResult(
            keys=gz, count=gz, sum=pz, min=pz, max=pz,
            num_groups=jnp.asarray(0, jnp.int32),
            group_of_row=jnp.full((n,), -1, jnp.int32),
        )
    iota = jnp.arange(n, dtype=jnp.int32)
    if has_nvalid:
        n_valid = jnp.asarray(n_valid_in, jnp.int32)
        valid_s = iota < n_valid
    else:
        n_valid = jnp.asarray(n, jnp.int32)
        valid_s = jnp.ones((n,), jnp.bool_)
    key_s, pay_s = keys, payloads
    prev_key = jnp.concatenate([key_s[:1], key_s[:-1]])
    is_start = valid_s & ((iota == 0) | (key_s != prev_key))
    num_groups = jnp.sum(is_start.astype(jnp.int32))
    if group_capacity == 0:
        gz = jnp.zeros((0,), jnp.int32)
        pz = jnp.zeros((0,), payloads.dtype)
        return GroupByResult(
            keys=gz, count=gz, sum=pz, min=pz, max=pz,
            num_groups=num_groups,
            group_of_row=jnp.full((n,), -1, jnp.int32),
        )

    cs = jnp.cumsum(pay_s, dtype=payloads.dtype)
    csx = cs - pay_s.astype(payloads.dtype)

    # MIN/MAX without payload ordering (the sort path gets them free from
    # payload-as-3rd-key; here payloads within a group are arbitrary):
    # segmented SUFFIX scans — at a group's start row, the suffix aggregate
    # bounded by the group end IS the full-group aggregate, and start rows
    # are exactly what pass 2 compacts.  The invalid tail never reaches a
    # start row (valid rows are a prefix), so its scan content is unread.
    nxt_key = jnp.concatenate([key_s[1:], key_s[-1:]])
    nxt_valid = jnp.concatenate([valid_s[1:], jnp.zeros((1,), jnp.bool_)])
    is_end = valid_s & (~nxt_valid | (nxt_key != key_s))

    seg_min = _seg_suffix_scan(pay_s, is_end, jnp.minimum)
    seg_max = _seg_suffix_scan(pay_s, is_end, jnp.maximum)

    if kernel_compaction:
        from partitionedhashjoin_tpu.ops.pallas.compact import (
            BLK as _CBLK,
            compact_columns,
        )

        pad = (-n) % _CBLK

        def padded(x, fill):
            if pad == 0:
                return x
            return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])

        _, _ok, s_full, gkey, gmin, gcsx, gmax = compact_columns(
            padded(is_start, False),
            padded(key_s, 0),
            padded(seg_min, 0),
            padded(csx, jnp.zeros((), payloads.dtype)),
            padded(seg_max, 0),
            capacity=group_capacity,
            interpret=interpret,
        )
    else:
        flag = jnp.where(is_start, 0, 1).astype(jnp.int32)
        _, s_full, gkey, gmin, gcsx, gmax = jax.lax.sort(
            (flag, iota, key_s, seg_min, csx, seg_max),
            num_keys=2, is_stable=False,
        )

    cap = group_capacity
    g = jnp.arange(cap, dtype=jnp.int32)
    g_ok = g < num_groups
    has_next = g + 1 < num_groups
    zero_p = jnp.zeros((), payloads.dtype)
    zero1 = jnp.zeros((1,), jnp.int32)
    zero1_p = jnp.zeros((1,), payloads.dtype)

    def shift(col, pad_v):
        return jnp.concatenate([col[1:cap + 1], pad_v])[:cap]

    s_g = jnp.where(g_ok, s_full[:cap], 0)
    e_excl = jnp.where(has_next, shift(s_full, zero1), n_valid)
    count = jnp.where(g_ok, e_excl - s_g, 0)
    total_valid = jnp.sum(
        jnp.where(valid_s, pay_s, 0), dtype=payloads.dtype
    )
    sum_hi = jnp.where(has_next, shift(gcsx, zero1_p), total_valid)
    return GroupByResult(
        keys=jnp.where(g_ok, gkey[:cap], 0),
        count=count,
        sum=jnp.where(g_ok, sum_hi - gcsx[:cap], zero_p),
        min=jnp.where(g_ok, gmin[:cap], zero_p),
        max=jnp.where(g_ok, gmax[:cap], zero_p),
        num_groups=num_groups,
        group_of_row=jnp.full((n,), -1, jnp.int32),
    )


def aggregate_sorted(
    table: Table,
    group_capacity: "int | None" = None,
    n_valid=None,
    compaction: str = "auto",
    interpret: bool = False,
    check: bool = False,
    payload_sorted: bool = False,
    with_distinct: bool = False,
) -> GroupByResult:
    """Order-propagating GROUP BY: aggregate a table whose keys are ALREADY
    ascending, skipping the pass-1 relation sort entirely (the dominant
    cost of ``sort_aggregate`` — 1.12 s of 1.70 s at 200M rows on chip).

    This is the engine's interesting-order rule: the materialized join
    (``merge_join.two_run_materialize``) emits its output in sorted-key
    order, so a join → GROUP BY query feeds it here and never pays a
    second relation-sized reorder.  Two variants:

    - ``payload_sorted=True`` (the at-scale route): payloads also ascend
      within each key run (``two_run_materialize(probe_payload_sorted=
      True)`` provides this for ~0.2 ns/el).  MIN/MAX/COUNT DISTINCT fall
      out of run boundaries exactly as in ``sort_aggregate``'s post-sort
      logic, which this reuses verbatim with the sort skipped
      (``presorted=True``) — no scans, full feature set.
    - default: payloads within a run are arbitrary; MIN/MAX come from a
      two-level segmented suffix scan (``_seg_suffix_scan``).  COUNT
      DISTINCT is refused (it needs payload-ordered runs).  CAUTION: the
      scan program at full relation scale (200M) OOM-kills this
      environment's remote TPU compile helper (measured, round 4); it
      compiles fine at tens of millions of rows and everywhere on CPU.
      Prefer ``payload_sorted`` when the producer can provide the order.

    COUNT/SUM use the boundary-cumsum scheme either way.  ``n_valid``:
    number of leading valid rows (rows past it are ignored — the
    materializer's compacted zero tail, for instance).  Keys must ascend
    over ``[0, n_valid)`` (and payload runs too, under
    ``payload_sorted``); ``check=True`` verifies that with one cheap
    fused reduce + readback and raises on violation (unchecked calls with
    unsorted input return garbage, like any presorted contract).  Returns
    the usual capacity-truncated ``GroupByResult`` with exact
    ``num_groups``.
    """
    n = table.size
    if check and n:
        k = table.keys
        asc = k[1:] >= k[:-1]
        if payload_sorted:
            p = table.payloads
            asc = (k[1:] > k[:-1]) | (
                (k[1:] == k[:-1]) & (p[1:] >= p[:-1])
            )
        if n_valid is not None:
            lim = jnp.asarray(n_valid, jnp.int32)
            ok_arr = (jnp.arange(n - 1, dtype=jnp.int32) + 1 >= lim) | asc
        else:
            ok_arr = asc
        if not bool(jax.device_get(jnp.all(ok_arr))):
            raise ValueError(
                "aggregate_sorted: keys (or payload runs, with "
                "payload_sorted) are not ascending over the valid prefix"
            )
    cap = n if group_capacity is None else min(group_capacity, n)
    if payload_sorted:
        # payloads ascend within each key run (the materializer's
        # probe_payload_sorted=True output): min/max/distinct come from the
        # run boundaries exactly as in the sort path, so this rides
        # _sort_group_and_aggregate with the pass-1 sort skipped — no
        # segmented scans (whose 200M-scale programs OOM the remote
        # compile helper; see _seg_suffix_scan).
        valid = None
        if n_valid is not None:
            valid = jnp.arange(n, dtype=jnp.int32) < jnp.asarray(
                n_valid, jnp.int32
            )
        return _sort_group_and_aggregate(
            table.keys,
            table.payloads,
            cap,
            valid=valid,
            has_valid=valid is not None,
            kernel_compaction=_kernel_compaction_choice(table, compaction),
            interpret=interpret,
            with_distinct=with_distinct,
            presorted=True,
        )
    if with_distinct:
        raise ValueError(
            "with_distinct needs payload-ordered runs: pass "
            "payload_sorted=True (or use sort_aggregate)"
        )
    return _aggregate_sorted_impl(
        table.keys,
        table.payloads,
        cap,
        n_valid_in=n_valid,
        has_nvalid=n_valid is not None,
        kernel_compaction=_kernel_compaction_choice(table, compaction),
        interpret=interpret,
    )


def _kernel_compaction_choice(table: Table, compaction: str) -> bool:
    """Resolve the pass-2 compaction strategy.  "auto": the Mosaic block-
    compaction kernel when the backend lowers it and the columns are
    int32 (the kernel is 32-bit; x64 tracing is gated too); "sort"/"kernel"
    force a path."""
    if compaction not in ("auto", "sort", "kernel"):
        raise ValueError(f"unknown compaction {compaction!r}")
    if compaction == "sort":
        return False
    if compaction == "kernel":
        # the kernel is 32-bit: forcing it with wider columns would silently
        # truncate the carried cumsum/key/payload (exactness is
        # non-negotiable — round-3 review repro: int64 payloads of 2^33
        # returned wrong sums with no error)
        if table.keys.dtype != jnp.int32 or table.payloads.dtype != jnp.int32:
            raise TypeError(
                "compaction='kernel' is int32-only (keys "
                f"{table.keys.dtype}, payloads {table.payloads.dtype}); "
                "use compaction='sort' for wider columns"
            )
        return True
    from partitionedhashjoin_tpu.ops import merge_join

    return (
        merge_join.supported()
        and not jax.config.jax_enable_x64
        and table.keys.dtype == jnp.int32
        and table.payloads.dtype == jnp.int32
    )


def _pass1_sort_choice(table: Table, interpret: bool = False) -> str:
    """Pass-1 sort implementation: follows the engine-wide switch
    (merge_join.set_sort_impl) with the same backend/dtype gates as the
    compaction kernel — the tuple sorter is int32 Mosaic-only (or the
    Pallas interpreter when ``interpret`` is set, as in tests)."""
    from partitionedhashjoin_tpu.ops import merge_join

    impl = merge_join.get_sort_impl()
    if impl == "auto":
        # auto never uses the interpreter (CPU suite speed); explicit
        # "pallas" + interpret stays reachable for tests
        impl = "pallas" if merge_join.supported() else "xla"
    elif impl == "pallas" and not (merge_join.supported() or interpret):
        impl = "xla"
    if (
        impl == "pallas"
        and not jax.config.jax_enable_x64
        and table.keys.dtype == jnp.int32
        and table.payloads.dtype == jnp.int32
    ):
        return "pallas"
    return "xla"


def sort_aggregate(
    table: Table,
    group_capacity: "int | None" = None,
    with_group_of_row: bool = False,
    compaction: str = "auto",
    interpret: bool = False,
    with_distinct: bool = False,
) -> GroupByResult:
    """GROUP BY via one multi-key sort — the at-scale aggregate path.

    ``group_capacity`` bounds the group-indexed outputs (default: table
    size).  Exactness contract: ``num_groups`` is always exact; if it
    exceeds ``group_capacity`` the per-group arrays are truncated and the
    caller must retry with a larger capacity (the static-capacity +
    overflow-counter protocol used across the engine).

    ``compaction`` selects the pass-2 strategy (see
    ``_kernel_compaction_choice``); ``interpret`` runs the kernel in the
    Pallas interpreter (tests).
    """
    cap = table.size if group_capacity is None else min(group_capacity, table.size)
    return _sort_group_and_aggregate(
        table.keys,
        table.payloads,
        cap,
        with_group_of_row=with_group_of_row,
        kernel_compaction=_kernel_compaction_choice(table, compaction),
        interpret=interpret,
        sort_impl=_pass1_sort_choice(table, interpret),
        with_distinct=with_distinct,
    )


@functools.partial(
    jax.jit, static_argnames=("n_orig", "size", "group_capacity",
                              "kernel_compaction", "interpret", "sort_impl",
                              "with_distinct"),
)
def _staged_pass2(
    aligned_total, pos, keys_c, pay_c, n_orig: int, size: int,
    group_capacity: int,
    kernel_compaction: bool, interpret: bool, sort_impl: str,
    with_distinct: bool = False,
):
    """Dispatch 2 of the staged filter→GROUP BY: aggregate the bucketed
    static slice ``[0, size)`` of the kernel-compacted columns.  ``pos``
    is block_compact's original-row-index column; ``pos < 0`` marks the
    per-block alignment sentinels.  Content at ``>= aligned_total`` is
    UNDEFINED per the block_compact contract (never-written output rows),
    so the validity test must bound by ``aligned_total`` too — a stale
    ``pos >= 0`` there would inject phantom rows."""
    pos_s = jax.lax.slice_in_dim(pos, 0, size)
    valid = (pos_s >= 0) & (
        jnp.arange(size, dtype=jnp.int32) < aligned_total
    )
    g = _sort_group_and_aggregate(
        jax.lax.slice_in_dim(keys_c, 0, size),
        jax.lax.slice_in_dim(pay_c, 0, size),
        group_capacity,
        valid=valid,
        has_valid=True,
        kernel_compaction=kernel_compaction,
        interpret=interpret,
        sort_impl=sort_impl,
        with_distinct=with_distinct,
    )
    # group_of_row keeps its documented [n_orig] shape (all -1: the staged
    # path drops row→group tracking; see filter_sort_aggregate_staged)
    g = dataclasses.replace(
        g, group_of_row=jnp.full((n_orig,), -1, jnp.int32)
    )
    return g, jnp.sum(valid.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _staged_filter(keys, payloads, mask, interpret: bool = False):
    """Dispatch 1 of the staged pipeline: pad to a kernel-block multiple
    and block-compact (keys, payloads) by the predicate mask.  Returns the
    ALIGNED form (kept rows in order with <128 sentinel rows per source
    block, pos == -1 there) — the XLA cleanup sort of ``compact_columns``
    is deliberately skipped: the aggregate's validity column absorbs the
    sentinels, so exact front-compaction would be a wasted relation-sized
    pass."""
    from partitionedhashjoin_tpu.ops.pallas.bitonic_sort import BLK
    from partitionedhashjoin_tpu.ops.pallas.compact import block_compact

    n = keys.shape[0]
    pad = (-n) % BLK
    if pad:
        mask = jnp.concatenate([mask, jnp.zeros((pad,), jnp.bool_)])
        keys = jnp.concatenate([keys, jnp.zeros((pad,), keys.dtype)])
        payloads = jnp.concatenate(
            [payloads, jnp.zeros((pad,), payloads.dtype)]
        )
    return block_compact(mask, keys, payloads, interpret=interpret)


def filter_sort_aggregate_staged(
    table: Table,
    predicate,
    group_capacity: "int | None" = None,
    compaction: str = "auto",
    interpret: bool = False,
    slice_granularity: int = 16,
    with_distinct: bool = False,
):
    """Filter → GROUP BY as TWO dispatches so the relation-sized sort only
    touches the rows that survive the filter.

    The fused path (``filter_sort_aggregate``) folds the predicate into the
    pass-1 sort as a leading key — elegant, but the sort still runs over
    the full static shape, so filtered-out rows cost full sort work.  This
    variant spends one Pallas block-compaction pass (~91 in-register
    stages + sequential writes, no relation sort) to shrink the data
    FIRST, reads back the aligned survivor count, and dispatches the
    aggregate over the smallest bucketed static slice that covers it
    (buckets of ``n/slice_granularity`` rows, so at most
    ``slice_granularity`` program shapes ever compile — the dispatch-level
    dynamic-shape idiom used across the engine).

    Wins whenever the filter drops enough rows: at 200M rows the
    compaction pass costs ~0.3-0.4 s while pass-1 sort time scales with
    survivors (~5.6 ns/el), so the crossover is ~25-30 % dropped; at the
    benchmark's 50 % selectivity it saves ~0.5 s end-to-end
    (docs/PERFORMANCE.md).  Exactness: identical GroupByResult aggregates
    (the validity column absorbs block_compact's alignment sentinels).

    int32 columns + a Mosaic backend (or ``interpret``) only — callers with
    wider columns use the fused path.  ``group_of_row`` is not tracked
    (returned all -1); use the fused path when row→group ids are needed.
    Returns ``(GroupByResult, selected_row_count)``.
    """
    from partitionedhashjoin_tpu.ops import merge_join

    if table.keys.dtype != jnp.int32 or table.payloads.dtype != jnp.int32:
        raise TypeError(
            "staged filter aggregate is int32-only (keys "
            f"{table.keys.dtype}, payloads {table.payloads.dtype}); "
            "use filter_sort_aggregate for wider columns"
        )
    if jax.config.jax_enable_x64 or not (
        interpret or merge_join.supported()
    ):
        # no Mosaic path here: the fused sort handles the filter exactly
        return filter_sort_aggregate(
            table, predicate, group_capacity,
            compaction=compaction, interpret=interpret,
            with_distinct=with_distinct,
        )
    from partitionedhashjoin_tpu.ops.pallas.bitonic_sort import BLK

    n = table.size
    mask = predicate(table.keys, table.payloads)
    aligned_total, pos, keys_c, pay_c = _staged_filter(
        table.keys, table.payloads, jnp.asarray(mask, jnp.bool_),
        interpret=interpret,
    )
    total = int(jax.device_get(aligned_total))
    # bucketed static slice: BLK-aligned chunks of ~n/slice_granularity
    chunk = max(BLK, -(-(n // max(slice_granularity, 1)) // BLK) * BLK)
    size = min(max(-(-total // chunk) * chunk, BLK), pos.shape[0])
    cap = n if group_capacity is None else min(group_capacity, n)
    cap = min(cap, size)
    return _staged_pass2(
        aligned_total, pos, keys_c, pay_c, n, size, cap,
        kernel_compaction=_kernel_compaction_choice(
            Table(keys=keys_c, payloads=pay_c), compaction
        ),
        interpret=interpret,
        sort_impl=_pass1_sort_choice(
            Table(keys=keys_c, payloads=pay_c), interpret
        ),
        with_distinct=with_distinct,
    )


def filter_sort_aggregate(
    table: Table,
    predicate,
    group_capacity: "int | None" = None,
    with_group_of_row: bool = False,
    compaction: str = "auto",
    interpret: bool = False,
    with_distinct: bool = False,
):
    """Filter → sort-aggregate pipeline (BASELINE.json configs[3] at scale).

    The predicate mask becomes the leading sort key, so filtering fuses
    into the same sort — no materialized intermediate, like
    ``filter_aggregate``.  Returns ``(GroupByResult, selected_row_count)``.
    """
    mask = predicate(table.keys, table.payloads)
    cap = table.size if group_capacity is None else min(group_capacity, table.size)
    g = _sort_group_and_aggregate(
        table.keys,
        table.payloads,
        cap,
        valid=mask,
        has_valid=True,
        with_group_of_row=with_group_of_row,
        kernel_compaction=_kernel_compaction_choice(table, compaction),
        interpret=interpret,
        sort_impl=_pass1_sort_choice(table, interpret),
        with_distinct=with_distinct,
    )
    return g, jnp.sum(mask.astype(jnp.int32))

"""Mosaic bitonic block sort + pairwise merge passes: the hand-written
sorter that attacks XLA's 2.1 ns/el unstable-sort floor (the partition step
of the flagship two-run join — docs/PERFORMANCE.md "Roofline accounting").

Why this shape (the round-2 blocker analysis only considered scatter-shaped
reorders): a MERGE of two sorted runs writes its output *sequentially* — no
per-lane scatter — and the concatenation of an ascending run with a reversed
(descending) run is a BITONIC sequence, so a fixed log2(m)-stage
compare-exchange network sorts it with in-row gathers and static sublane
moves only, all Mosaic-legal.  The full sorter:

  phase A  ``sort_blocks_i32``: each 8192-element block (64 sublanes x 128
           lanes, row-major flat order) sorted by a 91-stage bitonic
           network entirely in registers.  Compare-exchange partners are
           ``i XOR d``: lane distances (d < 128) via one in-row
           ``take_along_axis`` with a static XOR index; sublane distances
           via a static middle-axis flip (rows reshaped to (G, 2, dr)).
  phase B  ``merge_pass_i32``: pairwise merge of sorted runs.  Output
           block w (8192 ranks of the merged pair) takes a window of run A
           and a window of run B located by a *diagonal* (merge-path)
           binary search at the XLA level — two num_blocks-sized gathers
           per search round, NOT per data element.  The kernel DMAs both
           windows at 128-aligned offsets, rotates away the misalignment
           in registers (one in-row gather + a row-shifted select — the
           only dynamic cross-row move Mosaic grants), overlays the
           reversed B window behind the A prefix (ascending-then-descending
           = bitonic for ANY split point), and runs the 13-stage bitonic
           merge before one sequential aligned write.

Everything is written over TUPLES of int32 operands compared in full
lexicographic order (``sort_i32_tuple``); the 1-operand case is the plain
key sort.  Full-tuple comparison makes the all-INT32_MAX padding row the
MAXIMAL tuple, so padding is either strictly last or bit-identical to a
genuine all-MAX row — value association survives padding with no pad-flag
operand.  Ties between identical tuples are interchangeable, so the network
(which is unstable) is still a correct deterministic sort of row tuples:
"sort by operand 0, ties by operand 1, ..." — exactly the contract the
engine's 2-key plane sorts (int64 keys) and value-carrying sorts
(materialize / GROUP BY) need.

Unstable pure-key sort semantics (like the flagship's partition step); the
merge rule "A wins ties" makes the diagonal search's predicate monotone.
Out-of-range reads behave as +INT32_MAX tuples, which makes truncated tail
pairs (array length not a multiple of the pair span) and lone tail runs
(odd run count) correct with no special cases: a lone run merges against an
empty B and copies through.

Reference context: the radix fan-out exists to make data movement cheap
(src/RadixCluster/HashJoin.hpp:333-440); this sorter is the TPU engine's
equivalent investment in its own partition phase.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 64  # sublanes per block
WIN_ROWS = ROWS + 8  # merge window scratch rows (data in [0, ROWS+1); the
#                      extra rows keep the shape a sublane-tile multiple —
#                      unaligned sublane slices crash Mosaic's layout pass)
BLK = ROWS * LANES  # 8192 elements per block
LOG_BLK = 13
_I32_MAX = jnp.iinfo(jnp.int32).max
_I32_MIN = jnp.iinfo(jnp.int32).min


def _flat_iota(rows: int = ROWS):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return r * LANES + l


def _partner(x, d: int):
    """x[i XOR d] over the whole (ROWS, LANES) block, static distance d.

    Sublane distances swap the two halves of (g, 2, dr, LANES) groups via
    CONCATENATION of static slices — ``jnp.flip``'s ``rev`` primitive has
    no Pallas TPU lowering (round-3 catch: cross-platform ``jax.export``
    to the tpu target surfaced it; interpret mode hid it)."""
    if d < LANES:
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) ^ d
        return jnp.take_along_axis(x, idx, axis=1)
    dr = d // LANES
    g = x.shape[0] // (2 * dr)
    h = x.reshape(g, 2, dr, LANES)
    return jnp.concatenate([h[:, 1:2], h[:, 0:1]], axis=1).reshape(x.shape)


def _lt_tuple(ps, xs):
    """Strict lexicographic ``p < x`` over operand lists (signed int32)."""
    lt = ps[-1] < xs[-1]
    for p, x in zip(reversed(ps[:-1]), reversed(xs[:-1])):
        lt = (p < x) | ((p == x) & lt)
    return lt


def _compare_exchange(xs, take_min, d: int):
    """One compare-exchange stage over operand tuples.

    Position i keeps its own tuple on ties; pairs (i, i^d) have
    complementary take_min, so swap decisions complement: both positions
    swap iff the partner's tuple is strictly on the wrong side."""
    ps = [_partner(x, d) for x in xs]
    p_lt_x = _lt_tuple(ps, xs)
    x_lt_p = _lt_tuple(xs, ps)
    # Mosaic has no on-chip select over i1 vectors (lowers via an
    # unsupported trunci i8->i1; interpret mode hid it) — boolean algebra
    # instead of jnp.where on bool operands.
    swap = (take_min & p_lt_x) | (~take_min & x_lt_p)
    return [jnp.where(swap, p, x) for p, x in zip(ps, xs)]


def _bitonic_sort_block(xs, rows: int = ROWS):
    """Bitonic sort of one (rows, LANES) block, flat row-major.

    Stage count is log_m(log_m+1)/2 with m = rows*LANES — 91 at 8192.
    Larger blocks cost NO extra VPU work overall: the stage counts
    telescope (sort(4m) = sort(m) + the two merge levels the saved HBM
    passes would have run anyway), so phase-A block size is a pure
    HBM-pass saving; see _sort_padded's block_rows."""
    m = rows * LANES
    log_m = m.bit_length() - 1
    i = _flat_iota(rows)
    for k in range(1, log_m + 1):
        for j in range(k - 1, -1, -1):
            d = 1 << j
            # take_min = (ascending region at level k) == (lower element of
            # the pair) = bit_k(i) == bit_j(i), compared as integer bits —
            # an i1==i1 vector compare has no Mosaic lowering on chip.
            take_min = ((i >> k) & 1) == ((i >> j) & 1)
            xs = _compare_exchange(xs, take_min, d)
    return xs


def _bitonic_merge_block(xs):
    """13-stage ascending bitonic merge of one (ROWS, LANES) block whose
    flat content is bitonic (ascending prefix + descending suffix)."""
    i = _flat_iota()
    for j in range(LOG_BLK - 1, -1, -1):
        d = 1 << j
        take_min = (i & d) == 0
        xs = _compare_exchange(xs, take_min, d)
    return xs


def _make_sort_blocks_kernel(rows: int):
    def kernel(*refs):
        k = len(refs) // 2
        out = _bitonic_sort_block([r[...] for r in refs[:k]], rows)
        for o_ref, o in zip(refs[k:], out):
            o_ref[...] = o

    return kernel


def _sort_blocks(xs, interpret: bool, rows: int = ROWS):
    n = xs[0].shape[0]
    blk = rows * LANES
    num_blocks = n // blk
    k = len(xs)
    spec = pl.BlockSpec((rows, LANES), lambda w: (w, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((num_blocks * rows, LANES), jnp.int32)
    out = pl.pallas_call(
        _make_sort_blocks_kernel(rows),
        grid=(num_blocks,),
        in_specs=[spec] * k,
        out_specs=[spec] * k,
        out_shape=[shape] * k,
        interpret=interpret,
    )(*[x.reshape(num_blocks * rows, LANES) for x in xs])
    return [o.reshape(n) for o in out]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_blocks_i32(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Sort each consecutive 8192-element block of ``x`` ascending (int32,
    length a BLK multiple — pad with INT32_MAX upstream).  Phase A."""
    assert x.shape[0] % BLK == 0, "pad to a BLK multiple first"
    return _sort_blocks([x], interpret)[0]


# ---------------------------------------------------------------------------
# Phase B: pairwise merge passes.
# ---------------------------------------------------------------------------


def _diag_search(xs_rows, n, boundaries, base_a, base_b, run_len,
                 rounds: int):
    """Merge-path split: elements of A consumed before each boundary.

    For each output boundary ``g`` (offset within its pair; ``base_a``/
    ``base_b`` are the pair's run starts), find

        i* = max{ i in [max(0, g-run_len), min(g, run_len)] :
                  A[i-1] <= B[g-i] }

    under "A wins ties" merge semantics (predicate monotone decreasing in
    i; true at the lower bound), tuples compared lexicographically.
    Out-of-range reads are +/-inf: A[-1] is -inf; any index past the
    logical end ``n`` is the +inf tuple — masked HERE, so the rows past
    ``n`` in ``xs_rows`` may hold garbage (they are never *selected* by the
    kernel either: only merge-path-consumed elements reach the output
    block; see _merge_kernel's overlay).
    """
    g = boundaries
    lo = jnp.maximum(jnp.int32(0), g - run_len)
    hi = jnp.minimum(g, run_len)

    def read(idx, oob_hi_mask):
        idxc = jnp.clip(idx, 0, n - 1)
        mask = oob_hi_mask | (idx >= n)
        return [
            jnp.where(mask, _I32_MAX, x[idxc // LANES, idxc % LANES])
            for x in xs_rows
        ]

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi  # converged searches must not move again
        mid = (lo + hi + 1) >> 1  # candidate in [lo+1, hi] when active
        a_idx = base_a + mid - 1
        a_val = read(a_idx, jnp.zeros_like(a_idx, jnp.bool_))
        j = g - mid  # in [0, run_len) when active
        b_idx = base_b + j
        b_val = read(b_idx, j >= run_len)
        ok = ~_lt_tuple(b_val, a_val)  # A[mid-1] <= B[g-mid] lexicographic
        lo = jnp.where(active & ok, mid, lo)
        hi = jnp.where(active & ~ok, mid - 1, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    return lo


def _make_merge_kernel(k: int):
    """Merge kernel over ``k`` operand arrays.  Argument layout:
    5 scalar-prefetch refs, k HBM inputs, k output blocks, then scratch:
    k double-buffered A windows, k B windows, one (2, 2k) DMA sem array."""

    def kernel(astart_ref, arot_ref, atake_ref, bstart_ref, brot_ref, *rest):
        x_hbms = rest[:k]
        o_refs = rest[k:2 * k]
        awins = rest[2 * k:3 * k]
        bwins = rest[3 * k:4 * k]
        sems = rest[4 * k]

        w = pl.program_id(0)
        num_steps = pl.num_programs(0)
        slot = jax.lax.rem(w, 2)
        nxt = jax.lax.rem(w + 1, 2)

        def start_all(step, buf_slot):
            for c, (x_hbm, awin, bwin) in enumerate(
                zip(x_hbms, awins, bwins)
            ):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(astart_ref[step], ROWS + 1)],
                    awin.at[buf_slot, pl.ds(0, ROWS + 1)],
                    sems.at[buf_slot, 2 * c],
                ).start()
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(bstart_ref[step], ROWS + 1)],
                    bwin.at[buf_slot, pl.ds(0, ROWS + 1)],
                    sems.at[buf_slot, 2 * c + 1],
                ).start()

        @pl.when(w == 0)
        def _():
            start_all(0, 0)

        @pl.when(w + 1 < num_steps)
        def _():
            start_all(w + 1, nxt)

        for c, (x_hbm, awin, bwin) in enumerate(zip(x_hbms, awins, bwins)):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(astart_ref[w], ROWS + 1)],
                awin.at[slot, pl.ds(0, ROWS + 1)],
                sems.at[slot, 2 * c],
            ).wait()
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(bstart_ref[w], ROWS + 1)],
                bwin.at[slot, pl.ds(0, ROWS + 1)],
                sems.at[slot, 2 * c + 1],
            ).wait()

        # Overlay: flat m < a_take -> A[a_pos + m] (ascending);
        # m >= a_take -> rev(B)[m] = B[b_pos + BLK-1-m] (descending), whose
        # LAST consumed element (m = a_take) is the block's last B element.
        # asc-then-desc = bitonic for any split point, padding included.
        i = _flat_iota()
        sel = i < atake_ref[w]
        merged = []
        for awin, bwin in zip(awins, bwins):
            a = _rotate_left(awin[slot], arot_ref[w])
            b = _rotate_left(bwin[slot], brot_ref[w])
            merged.append(jnp.where(sel, a, _reverse_block(b)))
        out = _bitonic_merge_block(merged)
        for o_ref, o in zip(o_refs, out):
            o_ref[...] = o

    return kernel


def _reverse_block(x):
    """Full flat reversal of a (rows, LANES) block: out[i] = x[m-1-i].

    ``m-1-i = i XOR (m-1)`` for power-of-two m, which decomposes into one
    in-row lane reversal (a take_along_axis gather) plus log2(rows) static
    half-swaps — ``jnp.flip`` has no Pallas TPU lowering (see _partner).
    """
    rows = x.shape[0]
    l = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    out = jnp.take_along_axis(x, (LANES - 1) - l, axis=1)
    d = 1
    while d < rows:
        g = rows // (2 * d)
        h = out.reshape(g, 2, d, LANES)
        out = jnp.concatenate([h[:, 1:2], h[:, 0:1]], axis=1).reshape(
            rows, LANES
        )
        d *= 2
    return out


def _rotate_left(win, r):
    """Drop the first ``r`` (dynamic, 0..127) elements of the flat
    row-major (WIN_ROWS, LANES) window: out[i] = win_flat[i + r].

    Cross-row dynamic shifts are not a Mosaic primitive; the legal form is
    one in-row gather with a uniform dynamic index vector (rotate lanes by
    r) plus a sublane roll-by-one (``pltpu.roll``) and a select.  Two
    on-chip Mosaic crashes shaped this code (ApplyVectorLayout SIGABRT,
    Array::Slice check ``limits <= dim`` — interpret mode hides both):
    slicing any i1 (mask) vector, and sublane slices at unaligned offsets
    (the earlier ``concatenate([rotated[1:], rotated[:1]])`` form) — hence
    the tile-aligned WIN_ROWS window, the roll, and the wrap mask being
    REBUILT at output shape rather than sliced.
    """
    rows = win.shape[0]
    l = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    idx = l + r
    idx = jnp.where(idx >= LANES, idx - LANES, idx)
    rotated = jnp.take_along_axis(win, idx, axis=1)
    nxt = pltpu.roll(rotated, rows - 1, 0)  # nxt[i] = rotated[i + 1]
    l_out = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    wrap = (l_out + r) >= LANES  # element lives in the next row; never
    #                              slice an i1 vector (see docstring)
    return jnp.where(wrap, nxt[:ROWS], rotated[:ROWS])


PAD_ROWS = ROWS + 2  # fixed-size (ROWS+1)-row windows may reach past the data


def _to_padded_rows(x):
    """Flat BLK-multiple array -> (n_rows + PAD_ROWS, LANES) rows form.
    The pad rows are +INT32_MAX here for hygiene, but their content is
    irrelevant after the first merge pass (see _diag_search) — keeping the
    array in this form across passes avoids a full-array repad copy per
    pass (round-3 fix: the repad was a 3rd full touch per pass)."""
    n_rows = x.shape[0] // LANES
    x_rows = jnp.full((n_rows + PAD_ROWS, LANES), _I32_MAX, jnp.int32)
    return jax.lax.dynamic_update_slice(
        x_rows, x.reshape(n_rows, LANES), (0, 0)
    )


def _merge_pass_rows(xs_rows, n, run_len, interpret: bool, rounds: int = 31):
    """One pairwise merge pass over the padded rows form: sorted runs of
    ``run_len`` (traced int32 scalar, power-of-two multiple of BLK) ->
    sorted runs of 2*run_len.  ``n`` (static) is the logical element count,
    a BLK multiple; rows past n//LANES in both input and output hold
    garbage."""
    num_blocks = n // BLK
    k = len(xs_rows)

    blk_idx = jnp.arange(num_blocks, dtype=jnp.int32)
    g_global = blk_idx * BLK
    pair = g_global // (2 * run_len)
    base_a = pair * (2 * run_len)
    base_b = base_a + run_len
    g = g_global - base_a  # boundary offset within the pair

    a_excl = _diag_search(xs_rows, n, g, base_a, base_b, run_len, rounds)
    # A consumed by block END: the next block's a_excl while inside the
    # pair; at the pair's last EMITTED block the merge path has consumed
    # min(run_len, n - base_a) A elements (all of A, or everything when B
    # is empty/truncated — padding reads as +inf so A drains first only up
    # to its real content, but run_len-capped either way).
    nxt_excl = jnp.concatenate([a_excl[1:], a_excl[:1]])
    last_emitted = (g + BLK >= 2 * run_len) | (g_global + BLK >= n)
    a_end = jnp.where(
        last_emitted, jnp.minimum(run_len, jnp.int32(n) - base_a), nxt_excl
    )
    a_take = a_end - a_excl  # this block's A element count, in [0, BLK]

    a_pos = base_a + a_excl
    b_pos = base_b + g - a_excl
    astart = a_pos // LANES
    arot = a_pos % LANES
    bstart = b_pos // LANES
    brot = b_pos % LANES

    n_rows = n // LANES
    hi_row = n_rows + PAD_ROWS - (ROWS + 1)
    astart = jnp.clip(astart, 0, hi_row)
    bstart = jnp.clip(bstart, 0, hi_row)

    shape = jax.ShapeDtypeStruct((n_rows + PAD_ROWS, LANES), jnp.int32)
    out = pl.pallas_call(
        _make_merge_kernel(k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(num_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
            out_specs=[
                pl.BlockSpec((ROWS, LANES), lambda w, *_: (w, 0),
                             memory_space=pltpu.VMEM)
            ] * k,
            scratch_shapes=(
                [pltpu.VMEM((2, WIN_ROWS, LANES), jnp.int32)] * (2 * k)
                + [pltpu.SemaphoreType.DMA((2, 2 * k))]
            ),
        ),
        out_shape=[shape] * k,
        interpret=interpret,
    )(astart, arot, a_take, bstart, brot, *xs_rows)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_pass_i32(
    x: jax.Array, run_len: jax.Array, interpret: bool = False
) -> jax.Array:
    """Jitted single merge pass (tests / incremental use).  ``run_len`` is
    traced, so every pass of a sort shares one compiled program."""
    n = x.shape[0]
    out = _merge_pass_rows(
        [_to_padded_rows(x)], n, jnp.asarray(run_len, jnp.int32), interpret
    )
    return out[0].reshape(-1)[:n]


#: Phase-A block rows (elements = rows * 128).  Each 4x block size saves two
#: full HBM merge passes at zero extra VPU stages (see _bitonic_sort_block);
#: the ceiling is VMEM pipelining + Mosaic compile time for the unrolled
#: network.  Tuned on chip via scripts/probe_bitonic.py.
DEFAULT_BLOCK_ROWS = ROWS

#: Phase-A implementation: "network" = the in-register bitonic kernel above;
#: "xla" = one batched minor-axis ``lax.sort`` of the blocks (reshape to
#: (num_blocks, blk), sort dimension=1 — identical output contract: every
#: flat blk-range ascending).  The XLA form has no unrolled-network compile
#: ceiling, so it unlocks much larger phase-A blocks (fewer HBM merge
#: passes); whether its batched-run cost beats the network at equal block
#: size is measured head-to-head by scripts/probe_bitonic.py.
import os as _os

DEFAULT_PHASE_A = _os.environ.get("PHJ_SORT_PHASE_A", "network")


def _xla_sort_blocks(xps, rows: int):
    """Phase A via one batched unstable lexicographic XLA sort along the
    minor axis: same contract as _sort_blocks (each flat rows*LANES block
    ascending), no Pallas involvement."""
    n = xps[0].shape[0]
    blk = rows * LANES
    nb = n // blk
    out = jax.lax.sort(
        tuple(x.reshape(nb, blk) for x in xps),
        num_keys=len(xps),
        is_stable=False,
        dimension=1,
    )
    return [o.reshape(n) for o in out]


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_rows", "phase_a")
)
def _sort_padded(
    xps, interpret: bool = False, block_rows: int = ROWS,
    phase_a: str = "network",
):
    """Block sort + all merge passes in ONE program (a dispatch through the
    relay costs ~25 ms; 15 passes must not pay it 15 times).  The arrays
    stay in padded rows form across passes — each pass touches HBM exactly
    once for read and once for write per operand."""
    n = xps[0].shape[0]
    blk = block_rows * LANES
    num_blocks = n // blk
    if phase_a == "xla":
        xps = _xla_sort_blocks(list(xps), rows=block_rows)
    else:
        xps = _sort_blocks(list(xps), interpret, rows=block_rows)
    passes = max(num_blocks - 1, 0).bit_length()  # ceil(log2(num_blocks))

    def body(p, xs_rows):
        run_len = jax.lax.shift_left(jnp.int32(blk), p)
        return tuple(_merge_pass_rows(list(xs_rows), n, run_len, interpret))

    out = jax.lax.fori_loop(
        0, passes, body, tuple(_to_padded_rows(x) for x in xps)
    )
    return [o.reshape(-1)[:n] for o in out]


def sort_i32(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Full unstable key sort: phase A block sort + ceil(log2(blocks))
    pairwise merge passes, one fused program.  Any length (pads with
    INT32_MAX — correct for the full int32 domain: padding only adds extra
    maximal elements whose multiset position is interchangeable with any
    genuine INT32_MAX keys)."""
    return sort_i32_tuple(x, interpret=interpret)[0]


def sort_i32_tuple(
    *operands: jax.Array,
    interpret: bool = False,
    block_rows: "int | None" = None,
    phase_a: "str | None" = None,
):
    """Unstable ascending sort of int32 row TUPLES in full lexicographic
    order: sorted by operand 0, ties by operand 1, and so on.  Returns the
    reordered operands as a list.

    This one primitive covers the engine's sort shapes beyond the plain key
    sort: 2-key (hi, lo) plane sorts for int64 keys (lexicographic plane
    order IS int64 order after the lo-plane bias flip — see
    merge_probe.two_run_count_i64_planes) and value-carrying sorts
    (key, payload...) where any tie order is acceptable (the tuple order
    makes it deterministic).  Any length; pads with all-INT32_MAX rows,
    which are maximal tuples (strictly last or bit-identical to genuine
    all-MAX rows, so value association is exact over the full domain).
    """
    n = operands[0].shape[0]
    for o in operands[1:]:
        assert o.shape[0] == n, "operands must share a length"
    if n == 0:
        return [jnp.asarray(o, jnp.int32) for o in operands]
    rows = DEFAULT_BLOCK_ROWS if block_rows is None else block_rows
    phase_a = DEFAULT_PHASE_A if phase_a is None else phase_a
    if phase_a not in ("network", "xla"):
        raise ValueError(f"unknown phase_a {phase_a!r}")
    # small inputs: shrink the phase-A block down to one BLK so padding
    # never exceeds one super block's worth of work
    while rows > ROWS and (rows // 2) * LANES >= n:
        rows //= 2
    blk = rows * LANES
    padded = (n + blk - 1) // blk * blk
    xps = []
    for o in operands:
        xp = jnp.full((padded,), _I32_MAX, jnp.int32)
        xps.append(
            jax.lax.dynamic_update_slice(xp, jnp.asarray(o, jnp.int32), (0,))
        )
    out = _sort_padded(
        tuple(xps), interpret=interpret, block_rows=rows, phase_a=phase_a
    )
    return [o[:n] for o in out]

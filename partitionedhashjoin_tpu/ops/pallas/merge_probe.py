"""Ranged merge-probe kernel: count sorted-probe blocks against sorted-build
key ranges held in VMEM — the per-partition join phase of the radix join.

The reference's radix join exists to make each per-partition build table fit
cache during the probe (src/RadixCluster/HashJoin.hpp:243-331: per-partition
``factory.New`` at :278, probe loop :295-301).  The TPU translation of that
cache story (SURVEY.md §7 step 4) is VMEM residency:

1. Both relations arrive sorted by key (one UNstable 1-key ``jax.lax.sort``
   each — measured 2.1 ns/element, the cheapest full data movement on this
   chip).  A sorted layout IS range-radix clustering: partition = contiguous
   key range (Manegold et al.'s original radix formulation on key bits; the
   reference hashes first only to randomize arbitrary key sets).
2. The probe is cut into fixed ``BLOCK``-key blocks.  A sorted block spans a
   key range, so it can only match a contiguous range of the sorted build
   side; one ``searchsorted`` of the grid-count block boundaries (not the
   probe rows!) yields each block's build range.
3. The kernel walks probe blocks on the grid.  Per block it DMAs the build
   range from HBM tile-by-tile (scalar-prefetched offsets — data-dependent
   DMA at block granularity is the one dynamic access Mosaic grants) and
   searches every probe element against the VMEM tile.

Tile layout (the trick that makes the search Mosaic-legal): the build side
is pre-arranged into ``CAP``-key tiles of shape (SUBL, 128) where **lane l
holds keys [16l, 16l+16) of the tile** — so each lane is a contiguous sorted
run and the last sublane row is the per-lane maxima, ascending across lanes.
Measured constraint: ``take_along_axis`` gathers only within native 128-lane
tiles, in-row.  With this layout membership is:

    level 1: binary-search the (1,128) maxima row for the owning lane
             (7 in-row gathers — per-element, all within 128 lanes)
    level 2: scan the owning lane's SUBL entries: SUBL in-row gathers of
             broadcast sublane rows + equality + a flat-position validity
             guard (tile padding is INT32_MAX and must not match genuine
             INT32_MAX probes)

Per element: ~23 in-row gathers + compares in VPU registers.  No HBM gather
ever happens — the round-1 radix probe paid 7.6 ns per HBM gather × ~12 per
row; this kernel replaces all of them with VMEM traffic.

Exactness: sentinel-free over the full int32 domain.  Build tiles beyond
``n_a`` are INT32_MAX but excluded by the per-chunk length guard; probe
padding (INT32_MAX) is corrected on the host side of the jit (padding rows
match iff INT32_MAX is a genuine build key — detectable as ``a_sorted[-1]``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

LANES = 128
SUBL = 16  # sublanes per tile; lane l holds SUBL contiguous keys
CAP = SUBL * LANES  # 2048 build keys per tile/DMA chunk
#: probe rows per grid step (default 512*128 = 64K probe keys per block).
#: Total per-element search work scales as 2*n_b + BLOCK*n_tiles (each of
#: the ~2/block + range-spanning work items rescans the WHOLE block), so a
#: smaller block trades per-item fixed cost for fewer wasted rescans —
#: env-tunable for the on-chip sweep (import-time constant; all work-list
#: math below is parametric in it).
BLOCK_ROWS = int(_os.environ.get("PHJ_PROBE_BLOCK_ROWS", "512"))
BLOCK = BLOCK_ROWS * LANES
_I32_MAX = jnp.iinfo(jnp.int32).max


def tile_build_side(a_sorted: jax.Array):
    """(tiles, n_tiles): arrange sorted build keys into the kernel's tiled-
    transposed HBM layout, padded with INT32_MAX plus one spare tile.

    tiles[k, r, l] = a_padded[CAP*k + SUBL*l + r] — lane-contiguous runs.
    """
    n_a = a_sorted.shape[0]
    n_tiles = (n_a + CAP - 1) // CAP + 1  # +1: chunk loops may touch one past
    a_pad = jnp.full((n_tiles * CAP,), _I32_MAX, jnp.int32)
    a_pad = jax.lax.dynamic_update_slice(a_pad, a_sorted.astype(jnp.int32), (0,))
    tiles = a_pad.reshape(n_tiles, LANES, SUBL).transpose(0, 2, 1)
    return tiles, n_tiles


def _tile_member_mask(tile, q, length):
    """bool q.shape: does q exist among tile's first ``length`` keys?

    ``tile`` is (SUBL, 128) in the lane-contiguous layout; flat sorted
    position of tile[r, l] is SUBL*l + r.
    """
    maxima = jnp.broadcast_to(tile[SUBL - 1 : SUBL, :], q.shape)
    # level 1: lower-bound lane t = first lane whose max >= q
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, LANES, jnp.int32)
    for _ in range(8):  # full convergence of [0,128] needs ceil(log2(129))
        mid = jax.lax.shift_right_logical(lo + hi, jnp.int32(1))
        go_right = jnp.take_along_axis(maxima, mid, axis=1) < q
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    t = jnp.minimum(lo, LANES - 1)  # q > all maxima -> no match anyway
    # level 2: scan the owning lane's SUBL entries
    hit = jnp.zeros(q.shape, jnp.bool_)
    base = t * SUBL
    for r in range(SUBL):
        row_r = jnp.broadcast_to(tile[r : r + 1, :], q.shape)
        val = jnp.take_along_axis(row_r, t, axis=1)
        hit = hit | ((val == q) & (base + r < length))
    return hit


def _ranged_count_kernel(
    blk_ref,  # scalar prefetch: int32[W] probe-block index per work item
    tile_ref,  # scalar prefetch: int32[W] build tile to search
    len_ref,  # scalar prefetch: int32[W] genuine keys in this chunk (0=noop)
    plast_ref,  # scalar prefetch: int32[W] build key just before this chunk
    pvalid_ref,  # scalar prefetch: int32[W] 1 = plast is a real key
    a_hbm,  # int32[n_tiles, SUBL, 128] tiled build keys (stays in HBM)
    b_ref,  # int32[BLOCK_ROWS, 128] this work item's probe block (VMEM)
    out_ref,  # int32[1] total count (SMEM)
    tile_vmem,  # VMEM scratch (SUBL, 128)
    sem,  # DMA semaphore
    acc_ref,  # SMEM scratch accumulator
):
    """One (probe block, build tile) work item per grid step.

    The work list is flattened on the host side of the jit because Mosaic
    cannot legalize loops with data-dependent trip counts (scf.for); a
    straight-line body over a precomputed list also lets the pallas
    pipeline prefetch the next probe block while this tile is searched.

    An element may match in TWO consecutive tiles of its block's range
    (duplicates straddling the tile boundary); it is counted only in the
    tile where its run starts: ``q > (last build key before this tile)``.
    """
    w = pl.program_id(0)
    num_steps = pl.num_programs(0)
    slot = jax.lax.rem(w, 2)
    nxt = jax.lax.rem(w + 1, 2)

    @pl.when(w == 0)
    def _():
        acc_ref[0] = 0
        # warm-up: fetch the first tile into slot 0
        pltpu.make_async_copy(
            a_hbm.at[tile_ref[0]], tile_vmem.at[0], sem.at[0]
        ).start()

    # double buffer: start the NEXT work item's tile before searching this
    # one, then wait only on this item's slot
    @pl.when(w + 1 < num_steps)
    def _():
        pltpu.make_async_copy(
            a_hbm.at[tile_ref[w + 1]], tile_vmem.at[nxt], sem.at[nxt]
        ).start()

    pltpu.make_async_copy(
        a_hbm.at[tile_ref[w]], tile_vmem.at[slot], sem.at[slot]
    ).wait()
    q = b_ref[:]
    hit = _tile_member_mask(tile_vmem[slot], q, len_ref[w])
    first_run = (q > plast_ref[w]) | (pvalid_ref[w] == 0)
    acc_ref[0] = acc_ref[0] + jnp.sum((hit & first_run).astype(jnp.int32))

    @pl.when(w == num_steps - 1)
    def _():
        out_ref[0] = acc_ref[0]


def _work_items(run_start, lo, hi, n_tiles: int, num_blocks: int):
    """Static-capacity (block, tile) work list: for each probe block, every
    tile holding a key-run START inside the block's build range [lo_b, hi_b).

    An element is only ever COUNTED in the tile where its key's run starts
    (the ``q > prev_last`` dedup in the kernel), so tiles that are pure
    interior of a duplicate run contribute nothing and are skipped.  That
    is what makes the static capacity PROVABLE — enumerating every tile of
    [lo_b, hi_b) (the round-2 original) is unbounded under duplication: a
    run spanning T tiles was scanned T times by every block touching it,
    and items beyond w_cap were silently dropped (undercount; caught in
    round-2 review).

    Bound proof for w_cap = 2*num_blocks + n_tiles: each block emits one
    item for tile(lo_b) (num_blocks total).  Every further item consumes a
    distinct F_t := first-run-start-position of tile t with lo_b < F_t <
    hi_b.  Block position ranges [lo_b, hi_b) of a sorted probe overlap
    only within the boundary key's duplicate run, which contains no run
    start except possibly lo_{b+1} itself (excluded by the strict >), so
    each F_t is claimed by at most one block: <= n_tiles extra items, plus
    the per-block item — comfortably under w_cap.

    ``run_start``: bool[n_tiles*CAP] — True where a sorted key differs from
    its predecessor (padding included; harmless, range-excluded).
    Returns (blk, tile_w, len_w) int32[w_cap]; len_w == 0 marks no-ops.
    """
    w_cap = 2 * num_blocks + n_tiles
    pos = jnp.arange(n_tiles * CAP, dtype=jnp.int32)
    # first run-start position per tile (sentinel INT32_MAX: none)
    f_t = jnp.min(
        jnp.where(run_start, pos, _I32_MAX).reshape(n_tiles, CAP), axis=1
    )
    # ascending among valid entries (positions grow with t); sort pushes
    # the sentinels of run-interior tiles to the tail
    f_sorted = jnp.sort(f_t)
    first_tile = jax.lax.div(lo, jnp.int32(CAP))
    # F entries strictly after lo_b AND in a tile beyond tile(lo_b) — the
    # tile(lo_b) item below would otherwise be emitted twice (double count)
    j_lo = jnp.maximum(
        jnp.searchsorted(f_sorted, lo, side="right").astype(jnp.int32),
        jnp.searchsorted(
            f_sorted, (first_tile + 1) * CAP, side="left"
        ).astype(jnp.int32),
    )
    j_hi = jnp.searchsorted(f_sorted, hi, side="left").astype(jnp.int32)
    ntiles = 1 + jnp.maximum(j_hi - j_lo, 0)

    offs = jnp.cumsum(ntiles) - ntiles
    total_work = offs[-1] + ntiles[-1]
    w_idx = jnp.arange(w_cap, dtype=jnp.int32)
    blk = (
        jnp.searchsorted(offs, w_idx, side="right").astype(jnp.int32) - 1
    ).clip(0, num_blocks - 1)
    c = w_idx - offs[blk]
    fs_idx = (j_lo[blk] + c - 1).clip(0, n_tiles - 1)
    extra_tile = jax.lax.div(f_sorted[fs_idx], jnp.int32(CAP))
    tile_w = jnp.where(c == 0, first_tile[blk], extra_tile).clip(
        0, n_tiles - 1
    )
    valid = (w_idx < total_work) & (c >= 0) & (c < ntiles[blk])
    len_w = jnp.where(
        valid, jnp.clip(hi[blk] - tile_w * CAP, 0, CAP), 0
    )
    return blk, tile_w, len_w


def _prepare_probe_ranges(a_sorted, b_sorted, exclude_int32_max: bool):
    """Shared int32 probe prep (the count / payload kernels differ only in
    what each work item EMITS): probe padding to a BLOCK multiple, build
    tiling, per-block build ranges from the block boundary keys
    (searchsorted over the genuine build prefix, widened outward to tile
    alignment — the extra edge keys are < block-min or > block-max and can
    never match), the static (block, run-start tile) work list (Mosaic
    cannot legalize data-dependent loop bounds inside the kernel, so the
    tile walk becomes extra grid steps; see _work_items for the
    enumeration and its capacity proof), and the duplicate-dedup scalars
    (the build key just before each chunk).

    ``exclude_int32_max=True`` clamps every searched range below the first
    INT32_MAX build key — the validity-mask protocol of ops/merge_join.py.

    Returns ``(b_pad, num_blocks, tiles, n_tiles, blk, tile_w, len_w,
    prev_last, prev_valid)``.
    """
    n_b = b_sorted.shape[0]
    padded_b = (n_b + BLOCK - 1) // BLOCK * BLOCK
    b_pad = jnp.full((padded_b,), _I32_MAX, jnp.int32)
    b_pad = jax.lax.dynamic_update_slice(
        b_pad, b_sorted.astype(jnp.int32), (0,)
    )
    num_blocks = padded_b // BLOCK

    tiles, n_tiles = tile_build_side(a_sorted)
    a_flat = tiles.transpose(0, 2, 1).reshape(-1)  # padded flat sorted keys

    firsts = b_pad[::BLOCK]
    lasts = b_pad[BLOCK - 1 :: BLOCK]
    a32 = a_sorted.astype(jnp.int32)
    lo = jnp.searchsorted(a32, firsts, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(a32, lasts, side="right").astype(jnp.int32)
    if exclude_int32_max:
        limit = jnp.searchsorted(
            a32, jnp.asarray(_I32_MAX, jnp.int32), side="left"
        ).astype(jnp.int32)
        lo = jnp.minimum(lo, limit)
        hi = jnp.minimum(hi, limit)
    run_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), a_flat[1:] != a_flat[:-1]]
    )
    blk, tile_w, len_w = _work_items(run_start, lo, hi, n_tiles, num_blocks)
    gpos = tile_w * CAP  # global flat position of this chunk's first key
    prev_valid = (gpos > 0).astype(jnp.int32)
    prev_last = a_flat[jnp.maximum(gpos - 1, 0)]
    return (
        b_pad, num_blocks, tiles, n_tiles, blk, tile_w, len_w,
        prev_last, prev_valid,
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "exclude_int32_max")
)
def ranged_merge_count_prepared(
    a_sorted: jax.Array,
    b_sorted: jax.Array,
    exclude_int32_max: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Get-semantics match count: number of ``b_sorted`` rows whose key
    exists in ``a_sorted`` (both int32 ascending).  See module doc.

    ``exclude_int32_max=True`` clamps every searched range below the first
    INT32_MAX build key and therefore counts NO INT32_MAX probe rows —
    the validity-mask protocol of ops/merge_join.py (invalid rows are
    rewritten to INT32_MAX before sorting; the caller restores genuine
    INT32_MAX matches in closed form).
    """
    n_a = a_sorted.shape[0]
    n_b = b_sorted.shape[0]
    if n_a == 0 or n_b == 0:
        return jnp.asarray(0, jnp.int32)

    (
        b_pad, num_blocks, tiles, n_tiles, blk, tile_w, len_w,
        prev_last, prev_valid,
    ) = _prepare_probe_ranges(a_sorted, b_sorted, exclude_int32_max)
    padded_b = num_blocks * BLOCK
    a32 = a_sorted.astype(jnp.int32)
    w_cap = 2 * num_blocks + n_tiles

    # trace with x64 canonicalization off — see ranged_merge_count_i64:
    # Mosaic rejects the int64 take_along_axis indices x64 mode introduces
    from jax._src.config import enable_x64 as _enable_x64

    with _enable_x64(False):
        count = pl.pallas_call(
            _ranged_count_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(w_cap,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),  # tiles stay in HBM
                    pl.BlockSpec(
                        (BLOCK_ROWS, LANES),
                        # consecutive work items usually share a probe block;
                        # the pipeline skips re-fetching an unchanged block
                        lambda w, blk_ref, *_: (blk_ref[w], 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, SUBL, LANES), jnp.int32),  # double buffer
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SMEM((1,), jnp.int32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            interpret=interpret,
        )(
            blk,
            tile_w,
            len_w,
            prev_last,
            prev_valid,
            tiles,
            b_pad.reshape(BLOCK_ROWS * num_blocks, LANES),
        )[0]

    if exclude_int32_max:
        # ranges exclude the INT32_MAX region entirely, so neither probe
        # padding nor genuine INT32_MAX probes were counted — no correction
        return count
    # probe-padding correction: padded INT32_MAX rows matched iff INT32_MAX
    # is a genuine build key (== the build maximum, since sorted)
    n_pad = padded_b - n_b
    max_in_a = a32[n_a - 1] == _I32_MAX
    return count - jnp.where(max_in_a, n_pad, 0)


def ranged_merge_count(
    a_sorted: jax.Array, b_sorted: jax.Array, interpret: bool = False
) -> jax.Array:
    """Count of sorted-probe rows whose key exists among the sorted build
    keys — the pre-sorted merge primitive (full int32 domain)."""
    return ranged_merge_count_prepared(a_sorted, b_sorted, interpret=interpret)


# ---------------------------------------------------------------------------
# Materializing variant: per probe element, the matched build payload and
# sorted-build position (sequential VMEM writes — the output-placement step
# that makes materialization scale; the round-2 XLA path paid relation-sized
# scatter-sets and a 200M-row payload gather instead, VERDICT_r02 missing #3).
# ---------------------------------------------------------------------------


def _tile_match_pos(tile, q, length):
    """int32 q.shape: flat in-tile position of the FIRST key equal to q
    among the tile's first ``length`` keys, or -1.  Same two-level search
    as ``_tile_member_mask``; the downward row scan keeps the smallest
    position, making the duplicate-key match deterministic (lowest sorted
    position wins)."""
    maxima = jnp.broadcast_to(tile[SUBL - 1 : SUBL, :], q.shape)
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, LANES, jnp.int32)
    for _ in range(8):
        mid = jax.lax.shift_right_logical(lo + hi, jnp.int32(1))
        go_right = jnp.take_along_axis(maxima, mid, axis=1) < q
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    t = jnp.minimum(lo, LANES - 1)
    pos = jnp.full(q.shape, -1, jnp.int32)
    base = t * SUBL
    for r in range(SUBL - 1, -1, -1):
        row_r = jnp.broadcast_to(tile[r : r + 1, :], q.shape)
        val = jnp.take_along_axis(row_r, t, axis=1)
        pos = jnp.where((val == q) & (base + r < length), base + r, pos)
    return pos


def _ranged_payload_kernel(
    blk_ref, tile_ref, len_ref, plast_ref, pvalid_ref,
    a_hbm,  # int32[n_tiles, SUBL, 128] tiled build keys (HBM)
    apay_hbm,  # int32[n_tiles, SUBL, 128] tiled build payloads (HBM)
    b_ref,  # int32[BLOCK_ROWS, 128] probe block (VMEM)
    pay_ref,  # OUT int32[BLOCK_ROWS, 128] matched payload (0 if miss)
    pos_ref,  # OUT int32[BLOCK_ROWS, 128] matched sorted-A position + 1
    tile_vmem,  # VMEM scratch (2, 2, SUBL, 128): [slot][key/pay]
    sem,  # DMA semaphores (2, 2)
):
    """Like ``_ranged_count_kernel`` but emits, per probe element, the
    matched build payload and flat sorted position (+1; 0 = miss).  Output
    blocks are revisited by consecutive work items of the same probe block
    (the work list is block-ordered), so each item initializes on first
    visit and overlays its tile's matches after."""
    w = pl.program_id(0)
    num_steps = pl.num_programs(0)
    slot = jax.lax.rem(w, 2)
    nxt = jax.lax.rem(w + 1, 2)

    @pl.when(w == 0)
    def _():
        pltpu.make_async_copy(
            a_hbm.at[tile_ref[0]], tile_vmem.at[0, 0], sem.at[0, 0]
        ).start()
        pltpu.make_async_copy(
            apay_hbm.at[tile_ref[0]], tile_vmem.at[0, 1], sem.at[0, 1]
        ).start()

    @pl.when(w + 1 < num_steps)
    def _():
        pltpu.make_async_copy(
            a_hbm.at[tile_ref[w + 1]], tile_vmem.at[nxt, 0], sem.at[nxt, 0]
        ).start()
        pltpu.make_async_copy(
            apay_hbm.at[tile_ref[w + 1]], tile_vmem.at[nxt, 1],
            sem.at[nxt, 1],
        ).start()

    pltpu.make_async_copy(
        a_hbm.at[tile_ref[w]], tile_vmem.at[slot, 0], sem.at[slot, 0]
    ).wait()
    pltpu.make_async_copy(
        apay_hbm.at[tile_ref[w]], tile_vmem.at[slot, 1], sem.at[slot, 1]
    ).wait()

    first_visit = jnp.logical_or(
        w == 0, blk_ref[jnp.maximum(w - 1, 0)] != blk_ref[w]
    )

    @pl.when(first_visit)
    def _():
        pay_ref[...] = jnp.zeros_like(pay_ref)
        pos_ref[...] = jnp.zeros_like(pos_ref)

    q = b_ref[:]
    pos = _tile_match_pos(tile_vmem[slot, 0], q, len_ref[w])
    first_run = (q > plast_ref[w]) | (pvalid_ref[w] == 0)
    hit = (pos >= 0) & first_run
    # payload at the matched in-tile position: row = pos % SUBL (sublane),
    # lane = pos // SUBL — same layout as the key search, SUBL row gathers
    lane = jax.lax.div(jnp.maximum(pos, 0), jnp.int32(SUBL))
    sub = jax.lax.rem(jnp.maximum(pos, 0), jnp.int32(SUBL))
    pay = jnp.zeros(q.shape, jnp.int32)
    for r in range(SUBL):
        row_r = jnp.broadcast_to(tile_vmem[slot, 1, r : r + 1, :], q.shape)
        pay = jnp.where(
            sub == r, jnp.take_along_axis(row_r, lane, axis=1), pay
        )
    gpos = tile_ref[w] * CAP
    pay_ref[...] = jnp.where(hit, pay, pay_ref[...])
    pos_ref[...] = jnp.where(hit, gpos + pos + 1, pos_ref[...])


@functools.partial(
    jax.jit, static_argnames=("interpret", "exclude_int32_max")
)
def ranged_merge_payload_prepared(
    a_sorted: jax.Array,
    a_payloads: jax.Array,
    b_sorted: jax.Array,
    exclude_int32_max: bool = False,
    interpret: bool = False,
):
    """Per-probe-row first-match materialization against a sorted build:

    returns ``(pay, pos)`` int32 arrays of ``b_sorted``'s shape — ``pos``
    is 1 + the matched flat position in ``a_sorted`` (0 = no match; the
    FIRST equal position wins, deterministic under duplicate build keys),
    ``pay`` the matched build payload (0 for misses; disambiguate with
    ``pos``).  ``a_payloads`` rides in tiles exactly like the i64 plane
    pair.  Probe padding rows report pos=0.
    """
    n_a = a_sorted.shape[0]
    n_b = b_sorted.shape[0]
    if n_a == 0 or n_b == 0:
        z = jnp.zeros((n_b,), jnp.int32)
        return z, z

    (
        b_pad, num_blocks, tiles, n_tiles, blk, tile_w, len_w,
        prev_last, prev_valid,
    ) = _prepare_probe_ranges(a_sorted, b_sorted, exclude_int32_max)
    pay_pad = jnp.zeros((n_tiles * CAP,), jnp.int32)
    pay_pad = jax.lax.dynamic_update_slice(
        pay_pad, a_payloads.astype(jnp.int32), (0,)
    )
    pay_tiles = pay_pad.reshape(n_tiles, LANES, SUBL).transpose(0, 2, 1)

    from jax._src.config import enable_x64 as _enable_x64

    with _enable_x64(False):
        pay, pos = pl.pallas_call(
            _ranged_payload_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(blk.shape[0],),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        (BLOCK_ROWS, LANES),
                        lambda w, blk_ref, *_: (blk_ref[w], 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (BLOCK_ROWS, LANES),
                        lambda w, blk_ref, *_: (blk_ref[w], 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (BLOCK_ROWS, LANES),
                        lambda w, blk_ref, *_: (blk_ref[w], 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, 2, SUBL, LANES), jnp.int32),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct(
                    (BLOCK_ROWS * num_blocks, LANES), jnp.int32
                ),
                jax.ShapeDtypeStruct(
                    (BLOCK_ROWS * num_blocks, LANES), jnp.int32
                ),
            ],
            interpret=interpret,
        )(blk, tile_w, len_w, prev_last, prev_valid, tiles, pay_tiles, b_pad.reshape(BLOCK_ROWS * num_blocks, LANES))

    pay = pay.reshape(-1)[:n_b]
    pos = pos.reshape(-1)[:n_b]
    return pay, pos


# ---------------------------------------------------------------------------
# int64 keys: hi/lo int32 plane pairs with lexicographic compare.
#
# The reference's Tuple::id is int64 (src/Common/Table.hpp:20-25).  Mosaic
# kernels are 32-bit, so a 64-bit key becomes two planes:
#     hi = key >> 32 (signed), lo_cmp = (key & 0xFFFFFFFF) - 2^31 (the bias
# trick: int32 compare of lo_cmp == unsigned compare of the low word), and
# (hi, lo_cmp) ordered lexicographically == int64 order.  Tiles, probe
# blocks, and padding all carry both planes; gather count doubles (~46
# in-row gathers per element).
# ---------------------------------------------------------------------------


def split_i64(x: jax.Array):
    """(hi, lo_cmp) int32 planes of an int64 array (order-preserving)."""
    hi = (x >> jnp.int64(32)).astype(jnp.int32)
    lo_cmp = ((x & jnp.int64(0xFFFFFFFF)) - jnp.int64(1 << 31)).astype(
        jnp.int32
    )
    return hi, lo_cmp


def _tile_member_mask_i64(tile_h, tile_l, qh, ql, length):
    """bool: does (qh, ql) exist among the tile's first ``length`` keys?"""
    mh = jnp.broadcast_to(tile_h[SUBL - 1 : SUBL, :], qh.shape)
    ml = jnp.broadcast_to(tile_l[SUBL - 1 : SUBL, :], qh.shape)
    lo = jnp.zeros(qh.shape, jnp.int32)
    hi = jnp.full(qh.shape, LANES, jnp.int32)
    for _ in range(8):
        mid = jax.lax.shift_right_logical(lo + hi, jnp.int32(1))
        vh = jnp.take_along_axis(mh, mid, axis=1)
        vl = jnp.take_along_axis(ml, mid, axis=1)
        go_right = (vh < qh) | ((vh == qh) & (vl < ql))
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    t = jnp.minimum(lo, LANES - 1)
    hit = jnp.zeros(qh.shape, jnp.bool_)
    base = t * SUBL
    for r in range(SUBL):
        vh = jnp.take_along_axis(
            jnp.broadcast_to(tile_h[r : r + 1, :], qh.shape), t, axis=1
        )
        vl = jnp.take_along_axis(
            jnp.broadcast_to(tile_l[r : r + 1, :], qh.shape), t, axis=1
        )
        hit = hit | ((vh == qh) & (vl == ql) & (base + r < length))
    return hit


def _ranged_count_kernel_i64(
    blk_ref, tile_ref, len_ref, plast_h_ref, plast_l_ref, pvalid_ref,
    ah_hbm, al_hbm, bh_ref, bl_ref, out_ref,
    tile_h, tile_l, sem_h, sem_l, acc_ref,
):
    w = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(w == 0)
    def _():
        acc_ref[0] = 0

    dh = pltpu.make_async_copy(ah_hbm.at[tile_ref[w]], tile_h, sem_h)
    dl = pltpu.make_async_copy(al_hbm.at[tile_ref[w]], tile_l, sem_l)
    dh.start()
    dl.start()
    dh.wait()
    dl.wait()
    qh = bh_ref[:]
    ql = bl_ref[:]
    hit = _tile_member_mask_i64(tile_h[:], tile_l[:], qh, ql, len_ref[w])
    ph = plast_h_ref[w]
    plc = plast_l_ref[w]
    q_gt_prev = (qh > ph) | ((qh == ph) & (ql > plc))
    first_run = q_gt_prev | (pvalid_ref[w] == 0)
    acc_ref[0] = acc_ref[0] + jnp.sum((hit & first_run).astype(jnp.int32))

    @pl.when(w == num_steps - 1)
    def _():
        out_ref[0] = acc_ref[0]


def _lex_searchsorted(ah, al, qh, ql, side: str):
    """searchsorted over a lexicographically sorted (hi, lo) int32 plane
    pair — the x64-off replacement for ``jnp.searchsorted`` on int64 keys.
    Vectorized binary search: ceil(log2(n+1)) rounds of two plane gathers
    over the QUERY count (block boundaries, thousands — not rows)."""
    n = ah.shape[0]
    lo = jnp.zeros(qh.shape, jnp.int32)
    hi = jnp.full(qh.shape, n, jnp.int32)
    for _ in range(max(int(n).bit_length(), 1)):
        active = lo < hi
        mid = (lo + hi) >> 1  # in [lo, hi) when active
        midc = jnp.clip(mid, 0, n - 1)
        vh = ah[midc]
        vl = al[midc]
        if side == "left":
            go_right = (vh < qh) | ((vh == qh) & (vl < ql))
        else:
            go_right = (vh < qh) | ((vh == qh) & (vl <= ql))
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return lo


@functools.partial(jax.jit, static_argnames=("interpret", "sort_impl"))
def _count_i64_planes_full(
    ah, al, bh, bl, interpret: bool = False, sort_impl: str = "xla"
) -> jax.Array:
    """Whole int64 count on int32 planes, ONE x64-off program: 2-key plane
    sorts (unstable 2-KEY sort measured 3.1 ns/el vs ~2x 2.1+ ns/el for the
    two x64 int64 sorts it replaces), plane tiling, lexicographic block
    ranges, work list, and the kernel — collapsing the round-2 int64 path's
    three dispatches (x64 sorts -> x64 prep -> x64-off kernel) into one
    compiled program that never sees a 64-bit type (VERDICT_r02 #4).

    ``sort_impl='pallas'`` swaps the plane sorts for the Pallas tuple
    sorter (full-lex (hi, lo) order == 2-key plane order)."""
    from partitionedhashjoin_tpu.ops import merge_join as _mj

    n_a = ah.shape[0]
    n_b = bh.shape[0]
    if _mj.resolve_sort_impl(sort_impl, interpret) == "pallas":
        from partitionedhashjoin_tpu.ops.pallas import bitonic_sort

        ah, al = bitonic_sort.sort_i32_tuple(ah, al, interpret=interpret)
        bh, bl = bitonic_sort.sort_i32_tuple(bh, bl, interpret=interpret)
    else:
        ah, al = jax.lax.sort((ah, al), num_keys=2, is_stable=False)
        bh, bl = jax.lax.sort((bh, bl), num_keys=2, is_stable=False)

    padded_b = (n_b + BLOCK - 1) // BLOCK * BLOCK
    bh_pad = jnp.full((padded_b,), _I32_MAX, jnp.int32)
    bl_pad = jnp.full((padded_b,), _I32_MAX, jnp.int32)
    bh_pad = jax.lax.dynamic_update_slice(bh_pad, bh, (0,))
    bl_pad = jax.lax.dynamic_update_slice(bl_pad, bl, (0,))
    num_blocks = padded_b // BLOCK

    n_tiles = (n_a + CAP - 1) // CAP + 1
    ah_pad = jnp.full((n_tiles * CAP,), _I32_MAX, jnp.int32)
    al_pad = jnp.full((n_tiles * CAP,), _I32_MAX, jnp.int32)
    ah_pad = jax.lax.dynamic_update_slice(ah_pad, ah, (0,))
    al_pad = jax.lax.dynamic_update_slice(al_pad, al, (0,))
    tiles_h = ah_pad.reshape(n_tiles, LANES, SUBL).transpose(0, 2, 1)
    tiles_l = al_pad.reshape(n_tiles, LANES, SUBL).transpose(0, 2, 1)

    lo = _lex_searchsorted(
        ah, al, bh_pad[::BLOCK], bl_pad[::BLOCK], "left"
    )
    hi = _lex_searchsorted(
        ah, al, bh_pad[BLOCK - 1 :: BLOCK], bl_pad[BLOCK - 1 :: BLOCK],
        "right",
    )
    run_start = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            (ah_pad[1:] != ah_pad[:-1]) | (al_pad[1:] != al_pad[:-1]),
        ]
    )
    blk, tile_w, len_w = _work_items(run_start, lo, hi, n_tiles, num_blocks)
    gpos = tile_w * CAP
    prev_valid = (gpos > 0).astype(jnp.int32)
    plast_h = ah_pad[jnp.maximum(gpos - 1, 0)]
    plast_l = al_pad[jnp.maximum(gpos - 1, 0)]

    n_pad = padded_b - n_b
    max_in_a = (ah[n_a - 1] == _I32_MAX) & (al[n_a - 1] == _I32_MAX)
    pad_correction = jnp.where(max_in_a, n_pad, 0).astype(jnp.int32)

    count = pl.pallas_call(
        _ranged_count_kernel_i64,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(blk.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (BLOCK_ROWS, LANES),
                    lambda w, blk_ref, *_: (blk_ref[w], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (BLOCK_ROWS, LANES),
                    lambda w, blk_ref, *_: (blk_ref[w], 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((SUBL, LANES), jnp.int32),
                pltpu.VMEM((SUBL, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        interpret=interpret,
    )(
        blk,
        tile_w,
        len_w,
        plast_h,
        plast_l,
        prev_valid,
        tiles_h,
        tiles_l,
        bh_pad.reshape(BLOCK_ROWS * num_blocks, LANES),
        bl_pad.reshape(BLOCK_ROWS * num_blocks, LANES),
    )[0]
    return count - pad_correction


@jax.jit
def _split_planes(x: jax.Array):
    """(hi, lo_cmp) planes of UNSORTED int64 keys (tiny x64 streaming
    program — the only dispatch of the int64 path that sees 64-bit)."""
    return split_i64(jnp.asarray(x, jnp.int64))


def two_run_count_i64_planes(
    build_keys: jax.Array,
    probe_keys: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """int64 two-run count via plane sorts: split each relation into
    (hi, lo_cmp) int32 planes (one trivial x64 dispatch), then ONE x64-off
    program does the 2-key plane sorts + prep + kernel.  See
    ``_count_i64_planes_full``."""
    if build_keys.shape[0] == 0 or probe_keys.shape[0] == 0:
        return jnp.asarray(0, jnp.int32)
    ah, al = _split_planes(build_keys)
    bh, bl = _split_planes(probe_keys)
    from jax._src.config import enable_x64 as _enable_x64

    from partitionedhashjoin_tpu.ops import merge_join

    with _enable_x64(False):
        return _count_i64_planes_full(
            ah, al, bh, bl, interpret=interpret,
            sort_impl=merge_join.get_sort_impl(),
        )


@jax.jit
def _prep_i64(a_sorted: jax.Array, b_sorted: jax.Array):
    """x64 half of the int64 count: plane splits, tiling, and the work
    list.  Everything 64-bit happens here; every output is int32 so the
    kernel half can trace, LOWER, and compile under x64-off (Mosaic's
    lowering re-traces reductions under the *global* dtype config, so the
    pallas_call must live in a jit that never sees x64 — a trace-scope
    guard alone is not enough)."""
    n_a = a_sorted.shape[0]
    n_b = b_sorted.shape[0]
    i64_max = jnp.iinfo(jnp.int64).max
    a64 = a_sorted.astype(jnp.int64)
    b64 = b_sorted.astype(jnp.int64)

    padded_b = (n_b + BLOCK - 1) // BLOCK * BLOCK
    b_pad = jnp.full((padded_b,), i64_max, jnp.int64)
    b_pad = jax.lax.dynamic_update_slice(b_pad, b64, (0,))
    num_blocks = padded_b // BLOCK

    n_tiles = (n_a + CAP - 1) // CAP + 1
    a_pad = jnp.full((n_tiles * CAP,), i64_max, jnp.int64)
    a_pad = jax.lax.dynamic_update_slice(a_pad, a64, (0,))
    ah, al = split_i64(a_pad)
    tiles_h = ah.reshape(n_tiles, LANES, SUBL).transpose(0, 2, 1)
    tiles_l = al.reshape(n_tiles, LANES, SUBL).transpose(0, 2, 1)

    firsts = b_pad[::BLOCK]
    lasts = b_pad[BLOCK - 1 :: BLOCK]
    lo = jnp.searchsorted(a64, firsts, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(a64, lasts, side="right").astype(jnp.int32)
    # run starts on the 64-bit keys (both planes); work list shared with
    # the int32 path — see _work_items for the capacity proof
    run_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), a_pad[1:] != a_pad[:-1]]
    )
    blk, tile_w, len_w = _work_items(run_start, lo, hi, n_tiles, num_blocks)
    gpos = tile_w * CAP
    prev_valid = (gpos > 0).astype(jnp.int32)
    prev = a_pad[jnp.maximum(gpos - 1, 0)]
    plast_h, plast_l = split_i64(prev)
    bh, bl = split_i64(b_pad)

    # probe-padding correction: padded INT64_MAX rows matched iff INT64_MAX
    # is a genuine build key (== the build maximum, since sorted)
    n_pad = padded_b - n_b
    pad_correction = jnp.where(
        a64[n_a - 1] == i64_max, n_pad, 0
    ).astype(jnp.int32)
    return (
        blk,
        tile_w,
        len_w,
        plast_h,
        plast_l,
        prev_valid,
        tiles_h,
        tiles_l,
        bh.reshape(BLOCK_ROWS * num_blocks, LANES),
        bl.reshape(BLOCK_ROWS * num_blocks, LANES),
        pad_correction,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _count_i64_planes(
    blk,
    tile_w,
    len_w,
    plast_h,
    plast_l,
    prev_valid,
    tiles_h,
    tiles_l,
    bh_rows,
    bl_rows,
    pad_correction,
    interpret: bool = False,
) -> jax.Array:
    """int32-only kernel half of the int64 count — every input is an int32
    plane from ``_prep_i64``; the caller invokes this under x64-off so
    Mosaic lowering never sees a 64-bit type."""
    w_cap = blk.shape[0]
    count = pl.pallas_call(
            _ranged_count_kernel_i64,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=6,
                grid=(w_cap,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        (BLOCK_ROWS, LANES),
                        lambda w, blk_ref, *_: (blk_ref[w], 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (BLOCK_ROWS, LANES),
                        lambda w, blk_ref, *_: (blk_ref[w], 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[
                    pltpu.VMEM((SUBL, LANES), jnp.int32),
                    pltpu.VMEM((SUBL, LANES), jnp.int32),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SMEM((1,), jnp.int32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            interpret=interpret,
        )(
            blk,
            tile_w,
            len_w,
            plast_h,
            plast_l,
            prev_valid,
            tiles_h,
            tiles_l,
            bh_rows,
            bl_rows,
        )[0]
    return count - pad_correction


def ranged_merge_count_i64(
    a_sorted: jax.Array,
    b_sorted: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """int64 variant of ``ranged_merge_count`` (requires x64 inputs).

    Same algorithm; keys travel as (hi, lo) int32 plane pairs.  Padding is
    INT64_MAX, corrected like the int32 path.  Two jits: the x64 prep and
    the x64-off kernel — see ``_prep_i64`` for why the split is load-bearing.
    """
    if a_sorted.shape[0] == 0 or b_sorted.shape[0] == 0:
        return jnp.asarray(0, jnp.int32)
    operands = _prep_i64(a_sorted, b_sorted)
    from jax._src.config import enable_x64 as _enable_x64

    with _enable_x64(False):
        return _count_i64_planes(*operands, interpret=interpret)

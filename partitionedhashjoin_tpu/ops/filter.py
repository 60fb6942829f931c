"""Filter + compaction operator.

Part of the extended db_exec_kernel suite (BASELINE.json north star); the
reference has no standalone filter operator — its closest analogue is the
accept/reject masking inside the Zipf sampler (src/DataGenerator/Zipf.cpp:
46-53).  TPU-native selection is mask → exclusive prefix sum → scatter
(conflict-free by construction, like the radix scatter,
src/RadixCluster/HashJoin.hpp:394-412): output position of row i is the count
of selected rows before i.  Output capacity is static (= input size); ``count``
gives the number of valid rows.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from partitionedhashjoin_tpu.data.table import Table, make_table


@jax.jit
def compact(mask: jax.Array, *columns: jax.Array):
    """Scatter rows where ``mask`` into the front of same-size outputs.

    Returns ``(count, *compacted_columns)``; rows past ``count`` are zeros.
    Stable: selected rows keep their relative order.
    """
    n = mask.shape[0]
    mask = jnp.asarray(mask, jnp.bool_)
    inc = mask.astype(jnp.int32)
    pos = jnp.cumsum(inc) - inc  # exclusive prefix sum
    dst = jnp.where(mask, pos, n)  # rejected rows -> dump slot
    outs = tuple(
        jnp.zeros((n,), c.dtype).at[dst].set(c, mode="drop") for c in columns
    )
    return (jnp.sum(inc),) + outs


def filter_table(
    table: Table, predicate: Callable[[jax.Array, jax.Array], jax.Array]
) -> Tuple[Table, jax.Array]:
    """Select rows where ``predicate(keys, payloads)`` holds.

    Returns ``(compacted_table, count)``; the table keeps the input's static
    size, with valid rows in ``[0, count)``.
    """
    mask = predicate(table.keys, table.payloads)
    count, keys, payloads = compact(mask, table.keys, table.payloads)
    return make_table(keys, payloads), count

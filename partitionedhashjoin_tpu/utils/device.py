"""Device synchronization helper.

``jax.block_until_ready`` is the canonical phase barrier, but on tunneled
PJRT backends (the axon TPU relay) enqueue-and-return semantics make it a
no-op — timings collapse to dispatch latency.  ``sync`` forces completion by
fetching a single element of each leaf to the host: the transfer cannot start
until the producing computation finishes, so it is a true barrier at ~one
round-trip of cost (and is equivalent to ``block_until_ready`` on local
backends).
"""

from __future__ import annotations

import jax
import numpy as np


def sync(tree) -> None:
    """Block until every array in ``tree`` has finished computing."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            if getattr(leaf, "is_fully_addressable", True) is False:
                # multi-host array: a one-element readback is not legal from
                # a single process; block_until_ready works on the CPU/TPU
                # pod backends (the enqueue-and-return quirk is specific to
                # the single-host axon relay)
                jax.block_until_ready(leaf)
            elif leaf.ndim == 0:
                jax.device_get(leaf)
            else:
                # slice one element; device_get waits on the source buffer
                jax.device_get(leaf.ravel()[:1])

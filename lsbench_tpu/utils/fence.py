"""Device-completion fencing that works through the remote-TPU tunnel.

`jax.block_until_ready` has been observed returning BEFORE the device
work completes through the axon remote-TPU tunnel (a full n=262k AMG-CG
solve "finishing" in 0.12 ms; a 200-step Pallas chain in 0.09 ms), which
silently zeroes timings fenced with it. A host transfer of the result is
reliably synchronous — and TPU executes enqueued programs in order, so
fetching the LAST result fences every program before it too.
"""

from __future__ import annotations

import jax
import numpy as np


def host_fence(out) -> None:
    """Block until `out` (any pytree of arrays) is actually computed, by
    round-tripping each leaf to the host. Use instead of
    jax.block_until_ready around anything timed."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)

"""Device mesh helpers for multi-chip execution.

The workload's natural parallel axes:

* ``dp`` — data parallelism over independent sensor streams (the reference's
  multi-sensor deployment runs one pipeline per sensor,
  launch/demo_touareg.launch:20-31);
* ``sp`` — spatial parallelism over the ring-buffer column axis (the
  continuous azimuth dimension), the analog of sequence parallelism for the
  unbounded range image.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        # prefer a 2D mesh when possible
        dp = 2 if n % 2 == 0 and n > 1 else 1
    sp = n // dp
    arr = np.array(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def state_sharding(mesh: Mesh, stacked: bool = True):
    """Sharding for a (stacked) RingState pytree.

    Ring arrays (S, R, ring_cols) shard sensors over ``dp`` and the ring
    column axis over ``sp``; scalars/vectors shard over ``dp`` only.
    """

    def spec_for(leaf_ndim: int) -> P:
        lead = ("dp",) if stacked else ()
        if leaf_ndim == len(lead) + 2:  # (S, R, rc)
            return P(*lead, None, "sp")
        if leaf_ndim == len(lead) + 1:  # (S, R) incl_diffs
            return P(*lead, None)
        return P(*lead) if lead else P()

    def map_leaf(leaf):
        return NamedSharding(mesh, spec_for(np.ndim(leaf)))

    return map_leaf


def shard_pytree(mesh: Mesh, tree, stacked: bool = True):
    f = state_sharding(mesh, stacked)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, f(x)), tree)

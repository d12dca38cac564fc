"""Packed per-cell readout: all publish fields as ONE (n_rows, R, W) slab.

The reference re-reads the range image on the publish thread field by field
(columnToPointCloud, src/ros/ros_utils.cpp:34-77).  On TPU every device
round trip costs dispatch latency (catastrophically so through a remote
link), so all readout fields are packed into a single i32 slab — f32/u32
bitcast, bools widened — fetched in one transfer and bitcast back on host.

Used in two places:

* ``ContinuousClustering._fetch_packed`` — on-demand jitted fetch for
  arbitrary column ranges (cold path),
* the fused pipeline step — the step returns the slab for the publish
  window ``[fu_old, fu_old + W)`` as part of its outputs, so steady-state
  emission costs ZERO extra dispatches (the host just transfers an output
  that already exists).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .state import RingState, ring_read

# field order of the slab rows; the trailing two rows are the device-side
# component-slot join (cell cluster id, representative cell glid)
FETCH_F32 = ("x", "y", "z", "distance", "azimuth", "inclination",
             "cont_az", "finish_az")
FETCH_U32 = ("stamp_lo", "stamp_hi", "uidx_lo", "uidx_hi")
FETCH_I32 = ("gcol", "firing_index", "intensity", "ground_label",
             "debug_label", "nbr_stats", "slot", "is_ignored")
FETCH_ORDER = FETCH_F32 + FETCH_U32 + FETCH_I32
N_SLAB_ROWS = len(FETCH_ORDER) + 2


def packed_readout(state: RingState, lc0: jax.Array, width: int) -> jax.Array:
    """Read ``width`` ring columns starting at local column ``lc0`` as a
    packed (N_SLAB_ROWS, R, width) i32 slab.

    Cluster ids resolve through the component-slot table on device (cells
    store one slot index; slots are freed only after their cells are cleared
    from the ring, so any live cell's slot resolves to valid data).
    """

    def rd(name):
        a = ring_read(getattr(state, name), lc0, width)
        if a.dtype in (jnp.float32, jnp.uint32):
            a = jax.lax.bitcast_convert_type(a, jnp.int32)
        elif a.dtype == jnp.bool_:
            a = a.astype(jnp.int32)
        return a

    rows = [rd(f) for f in FETCH_ORDER]
    slot = ring_read(state.slot, lc0, width)
    res = jnp.take(state.slot_parent, jnp.maximum(slot, 0))
    has = slot >= 0
    rows.append(jnp.where(has, jnp.take(state.slot_cid, res), 0))
    rows.append(jnp.where(has, jnp.take(state.slot_rep, res), -1))
    return jnp.stack(rows)


def unpack_slab(slab, off: int, n: int):
    """Host-side view extraction: slice columns [off, off+n) of a fetched
    (N_SLAB_ROWS, R, W) numpy slab into the per-field dict ``get_columns``
    consumes (f32/u32 bitcast back)."""
    import numpy as np

    out = {}
    for i, f in enumerate(FETCH_ORDER):
        a = np.ascontiguousarray(slab[i, :, off:off + n])
        if f in FETCH_F32:
            a = a.view(np.float32)
        elif f in FETCH_U32:
            a = a.view(np.uint32)
        out[f] = a
    out["cell_cid"] = np.ascontiguousarray(slab[-2, :, off:off + n])
    out["cell_rep"] = np.ascontiguousarray(slab[-1, :, off:off + n])
    return out

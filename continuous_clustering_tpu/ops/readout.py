"""Packed per-cell readout: all publish fields as ONE (n_rows, R, W) slab.

The reference re-reads the range image on the publish thread field by field
(columnToPointCloud, src/ros/ros_utils.cpp:34-77).  On TPU every device
round trip costs dispatch latency (catastrophically so through a remote
link), so all readout fields are packed into a single i32 slab — f32/u32
bitcast, bools widened — fetched in one transfer and bitcast back on host.

Round-4 layout (v2): the publish transfer is the dominant measured latency
component on any link, so the slab is dtype-packed to 16 rows (was 22):

* the four u8-range fields (intensity, ground_label, debug_label,
  is_ignored) share ONE row (``PK8``: byte lanes lo->hi in that order);
* ``gcol`` is DROPPED — it is derivable on host as
  ``isnan(distance) ? -1 : from_gcol + c`` (ingest writes exactly that:
  ops/ingest.py gcol_vals; CLEAR_VALUES resets gcol to -1 together with
  distance=NaN, ops/state.py:183);
* ``slot`` is DROPPED — no slab consumer reads it (the cluster-id join
  happens on device: the trailing cell_cid/cell_rep rows);
* ``nbr_stats`` is emitted only when ``record_neighbor_stats`` is on
  (default off): the row trails the layout so consumers key on row count.

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

from .state import RingState

# field order of the slab rows; PK8 packs the four u8-range fields
# (intensity | ground_label<<8 | debug_label<<16 | is_ignored<<24); the
# optional trailing row is nbr_stats (only when record_neighbor_stats).
# The component-slot JOIN (cell cluster id / representative) is NOT done at
# window scale on device — three (R, W)-scale gathers measured ~1.3 ms/step
# at bench shapes (round-4 battery: slab=on 29.1 ms/rev vs 21.2 off).  The
# slab carries the raw ``slot`` row; the step outputs K-scale pre-joined
# tables (``join_tables``: cid/rep by slot, 2 gathers over K=8k lanes) and
# the host joins with one cache-resident lookup per record.
FETCH_F32 = ("x", "y", "z", "distance", "azimuth", "inclination",
             "cont_az", "finish_az")
FETCH_U32 = ("stamp_lo", "stamp_hi", "uidx_lo", "uidx_hi")
FETCH_ORDER = FETCH_F32 + FETCH_U32 + ("pk8", "firing_index", "slot")
N_SLAB_ROWS = len(FETCH_ORDER)            # without the optional nbr row
N_SLAB_ROWS_NBR = N_SLAB_ROWS + 1


def slab_rows(with_nbr: bool) -> int:
    return N_SLAB_ROWS_NBR if with_nbr else N_SLAB_ROWS


def join_tables(state: RingState) -> jax.Array:
    """(2, K) i32: cluster id and representative glid per RESOLVED slot.

    Cells store one slot index; slots are freed only after their cells are
    cleared from the ring, so any live cell's slot resolves to valid data.
    Row 0 = slot_cid[slot_parent[k]], row 1 = slot_rep[slot_parent[k]]."""
    return jnp.stack([
        jnp.take(state.slot_cid, state.slot_parent),
        jnp.take(state.slot_rep, state.slot_parent),
    ])


def packed_readout(state: RingState, lc0: jax.Array, width: int,
                   with_nbr: bool = False) -> jax.Array:
    """Read ``width`` ring columns starting at local column ``lc0`` as a
    packed (slab_rows(with_nbr), R, width) i32 slab.

    All raw planes ride ONE stacked ring read (``ring_read_stack``: one
    shared wrap correction instead of ~5 ops per field — the slab is
    per-op-overhead-bound, docs/ROUND4_NOTES.md slab A/B), then the four
    u8-range fields pack into the PK8 row."""
    from .state import ring_read_stack

    planes = [getattr(state, f) for f in FETCH_F32 + FETCH_U32]
    planes += [state.intensity, state.ground_label, state.debug_label,
               state.is_ignored, state.firing_index, state.slot]
    if with_nbr:
        planes.append(state.nbr_stats)
    stack = ring_read_stack(planes, lc0, width)
    n = len(FETCH_F32 + FETCH_U32)
    pk8 = (
        jnp.clip(stack[n], 0, 255)
        | ((stack[n + 1] & 0xFF) << 8)
        | ((stack[n + 2] & 0xFF) << 16)
        | (stack[n + 3] << 24)
    )
    rows = [stack[:n], pk8[None], stack[n + 4 : n + 6]]
    if with_nbr:
        rows.append(stack[n + 6 : n + 7])
    return jnp.concatenate(rows, axis=0)


def unpack_slab(slab, off: int, n: int, from_gcol: int, tabs):
    """Host-side view extraction: slice columns [off, off+n) of a fetched
    (n_rows, R, W) numpy slab into the per-field dict ``get_columns``
    consumes (f32/u32 bitcast back, PK8 bytes split, gcol derived, the
    component-slot join applied via ``tabs`` = numpy (2, K) join_tables)."""
    import numpy as np

    out = {}
    for i, f in enumerate(FETCH_F32 + FETCH_U32):
        a = np.ascontiguousarray(slab[i, :, off:off + n])
        if f in FETCH_F32:
            a = a.view(np.float32)
        else:
            a = a.view(np.uint32)
        out[f] = a
    base = len(FETCH_F32) + len(FETCH_U32)
    pk8 = slab[base, :, off:off + n]
    out["intensity"] = pk8 & 0xFF
    out["ground_label"] = (pk8 >> 8) & 0xFF
    out["debug_label"] = (pk8 >> 16) & 0xFF
    out["is_ignored"] = (pk8 >> 24) & 0xFF
    out["firing_index"] = np.ascontiguousarray(slab[base + 1, :, off:off + n])
    slot = slab[base + 2, :, off:off + n]
    has = slot >= 0
    slot0 = np.maximum(slot, 0)
    out["slot"] = slot
    out["cell_cid"] = np.where(has, tabs[0][slot0], 0)
    out["cell_rep"] = np.where(has, tabs[1][slot0], -1)
    out["nbr_stats"] = (
        np.ascontiguousarray(slab[base + 3, :, off:off + n])
        if slab.shape[0] > N_SLAB_ROWS
        else np.zeros_like(pk8)
    )
    # gcol is not transmitted: ingest writes the column index for every cell
    # holding data and -1 for NaN-distance cells (ops/ingest.py); clears
    # reset gcol to -1 together with distance=NaN (ops/state.py CLEAR_VALUES)
    gcols = from_gcol + np.arange(n, dtype=np.int64)[None, :]
    out["gcol"] = np.where(
        np.isnan(out["distance"]), np.int64(-1), gcols
    ).astype(np.int64)
    return out

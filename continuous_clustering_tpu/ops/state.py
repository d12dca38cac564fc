"""Device-resident ring-buffer state.

The reference's central data structure is a ring buffer of 40-field AoS
``Point`` structs (``clustering/continuous_clustering.hpp:126-161``, allocated
``src/clustering/continuous_clustering.cpp:27``).  On TPU we keep the same
information as a structure-of-arrays: one ``(num_rows, ring_columns)`` array
per field, which XLA tiles onto the VPU lanes (columns last = lane dimension).

Unbounded quantities are handled as:

* global column indices — absolute ``int32`` (wraps after ~2^31 columns,
  ~35 hours at VLS-128 rates; a rebase op exists for longer runs),
* continuous azimuth — ``float32`` *relative to a host-managed origin*
  (an integer number of rotations).  f32 azimuth precision degrades past
  ~8k radians, so the pipeline rebases the state every few hundred
  rotations (``rebase_azimuth``).  The reference instead uses ``double``
  (``continuous_azimuth_angle``, hpp:135); the relative-f32 scheme keeps
  comparisons exact to <1e-5 rad inside the live window.
* timestamps / unique point indices — pairs of ``uint32`` (lo, hi).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import Config

I32_MAX = jnp.iinfo(jnp.int32).max


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RingState:
    # geometry (stage A writes, stage E clears)
    x: jax.Array
    y: jax.Array
    z: jax.Array
    distance: jax.Array       # f32, NaN = empty cell
    azimuth: jax.Array        # f32 sensor-frame azimuth
    inclination: jax.Array    # f32 (supplemented for NaN cells by stage B)
    cont_az: jax.Array        # f32, relative to origin_rot rotations
    gcol: jax.Array           # i32 global column index, -1 = empty
    stamp_lo: jax.Array       # u32
    stamp_hi: jax.Array       # u32
    uidx_lo: jax.Array        # u32 (0xFFFFFFFF = none)
    uidx_hi: jax.Array        # u32
    intensity: jax.Array      # i32
    firing_index: jax.Array   # i32

    # stage B outputs
    ground_label: jax.Array   # i32 (GP_*)
    debug_label: jax.Array    # i32 (DBG_*)
    is_ignored: jax.Array     # bool

    # stage C/D state — per-cell component membership is a single slot index
    # into the compact component table below (the reference's per-cell tree
    # links, clustering/continuous_clustering.hpp:126-161, become one i32:
    # all per-component quantities live in the K-sized table, so association
    # and completion never run irregular ops at ring/window scale)
    slot: jax.Array           # i32 component-table index, -1 = none
    finish_az: jax.Array      # f32: cont_az + max_angle_diff of this point
    # packed profiling counters (populated when
    # clustering.record_neighbor_stats): low 16 bits = visited-neighbor
    # count (reference …cpp:725), high 16 = tested-edge degree (the CC
    # analog of the reference's tree-child count)
    nbr_stats: jax.Array      # i32

    # component table, shape (K,) = (clustering.max_active_components,)
    slot_parent: jax.Array    # i32 union-find parent (kept path-compressed)
    slot_live: jax.Array      # bool: allocated (canonical or forwarding)
    slot_valid: jax.Array     # bool: canonical root holding real aggregates
    slot_finished: jax.Array  # bool: component finished (cells frozen)
    slot_cid: jax.Array       # i32 published cluster id (0 = none)
    slot_finish: jax.Array    # f32 max finish_az over members
    slot_gmin: jax.Array      # i32 min member global column
    slot_gmax: jax.Array      # i32 max member global column
    slot_count: jax.Array     # i32 member count
    slot_rep: jax.Array       # i32 representative cell glid (tree_id analog)

    # scalar pipeline state (all shape ())
    prev_rearmost: jax.Array       # i32
    prev_foremost: jax.Array       # i32
    first_unfinished: jax.Array    # i32 (-1 before first firing)
    ring_start: jax.Array          # i32
    ring_end: jax.Array            # i32
    first_unpublished: jax.Array   # i32
    # async-safe clearing bound: the publish frontier as of the *previous*
    # completion (-1 = fall back).  The host reads [fu_old, fu_new) from the
    # ring after a step returns (one step later in async mode), so clearing
    # may never pass the previous step's frontier.
    clear_bound: jax.Array         # i32
    # columns < clear_target are due for clearing; ring_start tracks how far
    # the bounded per-batch chunk clear has actually gotten (-1 = unset)
    clear_target: jax.Array        # i32
    cluster_counter: jax.Array     # i32
    origin_rot: jax.Array          # i32: azimuth origin in whole rotations
    reset_required: jax.Array      # bool
    overflow: jax.Array            # bool: ring buffer overflow detected
    # bool: CC fixpoint hit its 64-round cap with labels still changing —
    # a labeling-correctness failure (raise CCT_SWEEPS / jump knobs), NOT a
    # throughput problem; kept distinct from `overflow` so the host can give
    # the right remediation
    cc_failed: jax.Array

    # stage B cross-column carry: last valid inclination diff per row (f32 (R,))
    incl_diffs: jax.Array

    @property
    def num_rows(self) -> int:
        return self.x.shape[0]

    @property
    def ring_cols(self) -> int:
        return self.x.shape[1]


def init_state(config: Config, num_rows: int) -> RingState:
    """Allocate and clear the ring buffer (reference reset(),
    src/clustering/continuous_clustering.cpp:11-47)."""
    rc = config.ring_buffer_max_columns
    shape = (num_rows, rc)
    K = config.clustering.max_active_components

    def f32(v):
        return jnp.full(shape, v, dtype=jnp.float32)

    def i32(v):
        return jnp.full(shape, v, dtype=jnp.int32)

    def u32(v):
        return jnp.full(shape, v, dtype=jnp.uint32)

    nan = float("nan")
    return RingState(
        x=f32(nan), y=f32(nan), z=f32(nan),
        distance=f32(nan), azimuth=f32(nan), inclination=f32(nan),
        cont_az=f32(nan), gcol=i32(-1),
        stamp_lo=u32(0), stamp_hi=u32(0),
        uidx_lo=u32(0xFFFFFFFF), uidx_hi=u32(0xFFFFFFFF),
        intensity=i32(0), firing_index=i32(0),
        ground_label=i32(0), debug_label=i32(0),
        is_ignored=jnp.zeros(shape, dtype=bool),
        slot=i32(-1), finish_az=f32(0.0), nbr_stats=i32(0),
        slot_parent=jnp.arange(K, dtype=jnp.int32),
        slot_live=jnp.zeros((K,), bool),
        slot_valid=jnp.zeros((K,), bool),
        slot_finished=jnp.zeros((K,), bool),
        slot_cid=jnp.zeros((K,), jnp.int32),
        slot_finish=jnp.full((K,), -jnp.inf, jnp.float32),
        slot_gmin=jnp.full((K,), I32_MAX, jnp.int32),
        slot_gmax=jnp.full((K,), -1, jnp.int32),
        slot_count=jnp.zeros((K,), jnp.int32),
        slot_rep=jnp.full((K,), -1, jnp.int32),
        prev_rearmost=jnp.asarray(0, jnp.int32),
        prev_foremost=jnp.asarray(-1, jnp.int32),
        first_unfinished=jnp.asarray(-1, jnp.int32),
        ring_start=jnp.asarray(-1, jnp.int32),
        ring_end=jnp.asarray(-1, jnp.int32),
        first_unpublished=jnp.asarray(-1, jnp.int32),
        clear_bound=jnp.asarray(-1, jnp.int32),
        clear_target=jnp.asarray(-1, jnp.int32),
        cluster_counter=jnp.asarray(1, jnp.int32),
        origin_rot=jnp.asarray(0, jnp.int32),
        reset_required=jnp.asarray(False),
        overflow=jnp.asarray(False),
        cc_failed=jnp.asarray(False),
        incl_diffs=jnp.full((num_rows,), nan, dtype=jnp.float32),
    )


CLEAR_VALUES = {
    "x": float("nan"), "y": float("nan"), "z": float("nan"),
    "distance": float("nan"), "azimuth": float("nan"),
    "inclination": float("nan"), "cont_az": float("nan"),
    "gcol": -1, "stamp_lo": 0, "stamp_hi": 0,
    "uidx_lo": 0xFFFFFFFF, "uidx_hi": 0xFFFFFFFF,
    "intensity": 0, "firing_index": 0,
    "ground_label": 0, "debug_label": 0, "is_ignored": False,
    "slot": -1, "finish_az": 0.0, "nbr_stats": 0,
}

CELL_FIELDS = tuple(CLEAR_VALUES.keys())


def ring_read(arr: jax.Array, lcol0: jax.Array, width: int) -> jax.Array:
    """Read ``width`` consecutive ring columns starting at ``lcol0`` (mod rc).

    O(width), ring-size-independent: one dynamic slice at
    ``min(lcol0, rc - width)`` plus a static head slice, combined with
    window-sized rolls (a wrap-extending concat would copy the whole ring).
    """
    R, rc = arr.shape
    if width >= rc:
        # fall back to the general gather (only trivial ring sizes)
        idx = (lcol0 + jnp.arange(width, dtype=jnp.int32)) % rc
        return arr[:, idx]
    if not _on_tpu():
        # CPU: the wrap-extended contiguous slice is faster there
        ext = jnp.concatenate([arr, jax.lax.slice(arr, (0, 0), (R, width))], axis=1)
        return jax.lax.dynamic_slice(ext, (0, lcol0), (R, width))
    # over = columns wrapping past the ring end (0 in the common case)
    over = jnp.maximum(0, lcol0 - (rc - width))
    s = jnp.minimum(lcol0, rc - width)
    part = jax.lax.dynamic_slice(arr, (0, s), (R, width))   # covers [s, s+w)
    head = jax.lax.slice(arr, (0, 0), (R, width))           # covers [0, w)
    # desired[j] = arr[(lcol0 + j) % rc]:
    #   j <  w - over -> part[j + over]   (note lcol0 - s == over)
    #   j >= w - over -> head[j - (w - over)]
    part_r = jnp.roll(part, -over, axis=1)
    head_r = jnp.roll(head, width - over, axis=1)
    j = jnp.arange(width, dtype=jnp.int32)[None, :]
    return jnp.where(j < width - over, part_r, head_r)


def ring_read_stack(arrs, lcol0: jax.Array, width: int) -> jax.Array:
    """:func:`ring_read` for MANY same-shape planes at one (lcol0, width),
    stacked to (len(arrs), R, width) i32, with the wrap correction applied
    ONCE on the stacked tensor instead of once per field.

    The publish-slab readout reads ~18 ring fields every step; per-field
    ring_read costs ~5 ops each (two slices, two rolls, a select) and the
    slab is per-op-overhead-bound on TPU (~0.4 ms/step at W=1024,
    docs/ROUND4_NOTES.md slab A/B).  Sharing the correction cuts the op
    count roughly in half.  Non-i32 planes are bitcast (f32/u32) or
    widened (bool/sub-word ints) to i32."""
    R, rc = arrs[0].shape

    def as_i32(a):
        if a.dtype in (jnp.float32, jnp.uint32):
            return jax.lax.bitcast_convert_type(a, jnp.int32)
        if a.dtype != jnp.int32:
            return a.astype(jnp.int32)
        return a

    if width >= rc:  # trivial ring sizes: per-field general fallback
        return jnp.stack([as_i32(ring_read(a, lcol0, width)) for a in arrs])
    over = jnp.maximum(0, lcol0 - (rc - width))
    s = jnp.minimum(lcol0, rc - width)
    part = jnp.stack([
        jax.lax.dynamic_slice(as_i32(a), (0, s), (R, width)) for a in arrs
    ])
    head = jnp.stack([
        jax.lax.slice(as_i32(a), (0, 0), (R, width)) for a in arrs
    ])
    part_r = jnp.roll(part, -over, axis=2)
    head_r = jnp.roll(head, width - over, axis=2)
    j = jnp.arange(width, dtype=jnp.int32)[None, None, :]
    return jnp.where(j < width - over, part_r, head_r)


def ring_write(arr: jax.Array, lcol0: jax.Array, vals: jax.Array) -> jax.Array:
    """Overwrite ``vals.shape[1]`` consecutive ring columns starting at
    ``lcol0`` (mod rc) — the scatter-free analog of :func:`ring_read`.

    O(width): two read-modify-write dynamic_update_slices of window-sized
    regions (a gathered column scatter lowers near-serially on TPU, and the
    previous roll-the-whole-ring scheme copied the full ring four times).
    """
    R, rc = arr.shape
    width = vals.shape[1]
    if width > rc:
        idx = (lcol0 + jnp.arange(width, dtype=jnp.int32)) % rc
        return arr.at[:, idx].set(vals.astype(arr.dtype))
    vals = vals.astype(arr.dtype)
    if not _on_tpu():
        # CPU: roll-the-ring is faster there
        rolled = jnp.roll(arr, -lcol0, axis=1)
        rolled = jax.lax.dynamic_update_slice(rolled, vals, (0, 0))
        return jnp.roll(rolled, lcol0, axis=1)
    over = jnp.maximum(0, lcol0 - (rc - width))   # wrapped column count
    s = jnp.minimum(lcol0, rc - width)
    # rolled[j] = vals[j - over]: tail region [s, s+w) takes rolled[j] for
    # j >= over (global col s+j == lcol0 + (j - over)); head region [0, w)
    # takes rolled[j] for j < over (global col j == lcol0 + (w - over) + j)
    rolled = jnp.roll(vals, over, axis=1)
    j = jnp.arange(width, dtype=jnp.int32)[None, :]
    cur_tail = jax.lax.dynamic_slice(arr, (0, s), (R, width))
    arr = jax.lax.dynamic_update_slice(
        arr, jnp.where(j >= over, rolled, cur_tail), (0, s)
    )
    cur_head = jax.lax.slice(arr, (0, 0), (R, width))
    arr = jax.lax.dynamic_update_slice(
        arr, jnp.where(j < over, rolled, cur_head), (0, 0)
    )
    return arr


def clear_columns_chunk(
    state: RingState, cleared_to: jax.Array, target: jax.Array, width: int
) -> Tuple[RingState, jax.Array]:
    """Clear at most ``width`` ring columns in [cleared_to, target) and
    return (state, new_cleared_to).

    The reference clears lazily one rotation behind the publish frontier
    (clearColumns, …cpp:1094-1145); with the component-slot design clearing
    is bookkeeping (stale cells are excluded by their gcol mismatch and
    slots are freed against the cleared bound), so a bounded O(width) chunk
    per batch — two dynamic_update_slices per field — replaces the full-ring
    masked reset and still catches up at the column rate.

    Because the chunk clear can lag the target by up to ~ring_cols columns,
    a ring position due for clearing may already have been overwritten by a
    newer (published-frontier-legal) column.  Clearing is therefore gated on
    the cell's stored gcol: only cells whose gcol is at most the column being
    cleared are wiped — fresher cells (gcol > expected) are the new column's
    data and must survive (overwrite-is-the-clear for them)."""
    n = jnp.clip(target - cleared_to, 0, width)
    lc0 = jnp.maximum(cleared_to, 0) % state.ring_cols
    expected = cleared_to + jnp.arange(width, dtype=jnp.int32)
    gcol_cur = ring_read(state.gcol, lc0, width)
    mask = (jnp.arange(width) < n)[None, :] & (gcol_cur <= expected[None, :])
    R = state.num_rows

    updates = {}
    for name, value in CLEAR_VALUES.items():
        arr = getattr(state, name)
        cur = ring_read(arr, lc0, width)
        vals = jnp.where(mask, jnp.asarray(value, arr.dtype), cur)
        updates[name] = ring_write(arr, lc0, vals)
    return dataclasses.replace(state, **updates), cleared_to + n


def rebase_azimuth(state: RingState, rotations: int) -> Tuple[RingState, int]:
    """Shift all stored continuous azimuths down by ``rotations`` full turns.

    Keeps f32 azimuths small over unbounded streams (the analog of the
    reference's use of double for continuous azimuth). Returns the state and
    the rotation delta the host must add to its azimuth origin.
    """
    shift = jnp.float32(2.0 * math.pi) * jnp.float32(rotations)
    return (
        dataclasses.replace(
            state,
            cont_az=state.cont_az - shift,
            finish_az=state.finish_az - shift,
            # component finish azimuths live in the slot table; only valid
            # canonical slots hold real values (-inf identities stay put)
            slot_finish=jnp.where(
                state.slot_valid, state.slot_finish - shift, state.slot_finish
            ),
            origin_rot=state.origin_rot + jnp.int32(rotations),
        ),
        rotations,
    )

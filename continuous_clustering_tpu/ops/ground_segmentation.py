"""Stage B — ground point segmentation over a batch of columns.

Re-derives the reference's sequential bottom-to-top row scan
(``src/clustering/continuous_clustering.cpp:294-624``) as two ``lax.scan``
passes over the row axis, vectorized across a batch of B columns:

1. *classification scan* (bottom→top): carries exactly the reference's
   per-column walking state (first point found, first obstacle detected,
   last-certain-ground position, previous position/label) as (B,) vectors and
   emits labels plus "obstacle events";
2. *backtrack scan* (same order): applies the reference's retroactive
   "mark very close lower ground points as obstacle" walks (…cpp:514-535).
   Each event's walk is a prefix-AND over rows below, evaluated against the
   labels as mutated by earlier events — bit-matching the sequential order.

Cross-column state (the per-row inclination-diff array
``sc_inclination_angles_between_lasers_``, …cpp:352-357) is a forward-fill
along the column axis, computed with an associative scan and carried across
batches in ``RingState.incl_diffs``.

The supplemented inclination for NaN cells (…cpp:362-369) cascades bottom-up
inside the classification scan; the NaN-cell continuous azimuth refill
(…cpp:371) and the ``is_ignored`` pass (…cpp:567-616) are elementwise.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..constants import (
    DBG_DARKRED,
    DBG_GRAY,
    DBG_GREEN,
    DBG_LIGHTGRAY,
    DBG_ORANGE,
    DBG_RED,
    DBG_VIOLET,
    DBG_WHITE,
    DBG_YELLOW,
    DBG_YELLOWGREEN,
    GP_EGO_VEHICLE,
    GP_FOG,
    GP_GROUND,
    GP_OBSTACLE,
    GP_UNKNOWN,
)
from .state import RingState, ring_read, ring_write


def _gseg_unroll() -> int:
    """CCT_GSEG_UNROLL: lax.scan unroll factor for the two row scans.

    The scans are R(=64)-iteration sequential loops whose per-iteration
    body is small; TPU while-loop machinery charges a fixed cost per
    iteration, so unrolling amortizes it U-fold and lets XLA fuse
    consecutive rows (exact — unroll changes loop structure, not math).
    Default 4: the r5b chip battery (docs/battery_r5b_tpu.jsonl) shows
    unroll composes with the CC schedule, +4-5% on every scene (u4 vs u1
    same-session: standard 8.19M vs 7.88M, clutter 6.42M vs 6.15M); u8 is
    within noise of u4."""
    import os

    return max(1, int(os.environ.get("CCT_GSEG_UNROLL", "4")))


class SegmentInputs(NamedTuple):
    """Per-column-batch host-prepared inputs (B columns)."""

    gcol0: jax.Array                 # () i32: first global column of the batch
    n_cols: jax.Array                # () i32: number of valid columns (<= B)
    sensor_pos: jax.Array            # (B, 3) f32: sensor position per column
    ego_rot: jax.Array               # (B, 3, 3) f32: ego_from_odom rotation
    ego_trans: jax.Array             # (B, 3) f32: ego_from_odom translation
    height_sensor_to_ground: jax.Array  # () f32


def _ffill_columns(values: jax.Array, valid: jax.Array, carry: jax.Array):
    """Forward-fill along the column axis, seeded by carry (R,)."""
    carry_valid = ~jnp.isnan(carry)
    v = jnp.concatenate([carry[:, None], values], axis=1)
    m = jnp.concatenate([carry_valid[:, None], valid], axis=1)

    def combine(a, b):
        va, ma = a
        vb, mb = b
        return jnp.where(mb, vb, va), ma | mb

    fv, fm = jax.lax.associative_scan(combine, (v, m), axis=1)
    filled = jnp.where(fm, fv, jnp.nan)
    return filled[:, 1:], filled[:, -1]


def ground_segment_columns(
    config: Config, state: RingState, inputs: SegmentInputs, batch_size: int
) -> RingState:
    """Segment columns [gcol0, gcol0 + n_cols) and write results to state."""
    R = state.num_rows
    B = batch_size
    rc = state.ring_cols
    num_cols = config.range_image.num_columns
    az_width = jnp.float32(2.0 * math.pi / num_cols)
    g = config.ground_segmentation
    cl = config.clustering

    cols = inputs.gcol0 + jnp.arange(B, dtype=jnp.int32)       # (B,) global
    col_valid = jnp.arange(B) < inputs.n_cols                   # (B,)
    lc0 = inputs.gcol0 % rc

    def take(arr):
        return ring_read(arr, lc0, B)  # (R, B) contiguous

    dist = take(state.distance)
    inc_raw = take(state.inclination)
    xs, ys, zs = take(state.x), take(state.y), take(state.z)
    intensity = take(state.intensity)
    cont_az = take(state.cont_az)
    gcol_cell = take(state.gcol)

    # ring-buffer overflow check (…cpp:319-345)
    overflow = jnp.any(
        (gcol_cell != -1) & (gcol_cell != cols[None, :]) & col_valid[None, :]
    )

    # ---- cross-column inclination diffs (…cpp:352-357) -------------------
    inc_below = jnp.concatenate(
        [inc_raw[1:], jnp.zeros((1, B), jnp.float32)], axis=0
    )  # bottom row diffs against initial 0.0 (…cpp:312)
    diffs = inc_raw - inc_below
    sc_incl, new_incl_carry = _ffill_columns(
        diffs, ~jnp.isnan(diffs) & col_valid[None, :], state.incl_diffs
    )

    # ---- elementwise preparation ----------------------------------------
    cell_nan = jnp.isnan(dist)
    sx = inputs.sensor_pos[:, 0][None, :]
    sy = inputs.sensor_pos[:, 1][None, :]
    sz = inputs.sensor_pos[:, 2][None, :]
    xr, yr, zrel = xs - sx, ys - sy, zs - sz
    d = jnp.sqrt(xr * xr + yr * yr)  # xy distance in azimuth plane

    fog = jnp.zeros_like(cell_nan)
    if g.fog_filtering_enabled:
        fog = (
            ~cell_nan
            & (intensity < g.fog_filtering_intensity_below)
            & (dist < g.fog_filtering_distance_below)
            & (inc_raw > g.fog_filtering_inclination_above)
        )

    er, et = inputs.ego_rot, inputs.ego_trans
    pe = [
        er[:, i, 0][None, :] * xs + er[:, i, 1][None, :] * ys + er[:, i, 2][None, :] * zs
        + et[:, i][None, :]
        for i in range(3)
    ]
    ego = (
        ~cell_nan
        & ~fog
        & (pe[0] < g.length_ref_to_front_end)
        & (pe[0] > g.length_ref_to_rear_end)
        & (pe[1] < g.width_ref_to_left_mirror)
        & (pe[1] > g.width_ref_to_right_mirror)
        & (pe[2] < g.height_ref_to_maximum)
        & (pe[2] > g.height_ref_to_ground)
    )

    hsg = inputs.height_sensor_to_ground

    # ---- phase 1: classification scan, bottom (r=R-1) to top (r=0) -------
    def classify_step(carry, row_inputs):
        (first_found, first_obst, lg_d, lg_z, prev_d, prev_z, prev_label, inc_below_stored) = carry
        (r_nan, r_fog, r_ego, r_d, r_z, r_inc_raw, r_sc_incl, r_is_bottom) = row_inputs

        # supplemented inclination cascade (…cpp:362-369)
        if config.range_image.supplement_inclination_angle_for_nan_cells:
            supplied = jnp.where(r_is_bottom, jnp.nan, inc_below_stored + r_sc_incl)
        else:
            supplied = jnp.full_like(r_inc_raw, jnp.nan)
        inc_stored = jnp.where(r_nan, supplied, r_inc_raw)

        skip = r_nan | r_fog | r_ego
        is_first = ~first_found & ~skip
        hog = r_z - hsg
        first_ground = (
            is_first
            & (hog > g.first_ring_as_ground_min_allowed_z_diff)
            & (hog < g.first_ring_as_ground_max_allowed_z_diff)
        )
        first_obstacle_pt = is_first & ~first_ground

        normal = first_found & ~skip
        dxp = r_d - prev_d
        dzp = r_z - prev_z
        slope_prev = dzp / dxp
        flat_prev = (jnp.abs(slope_prev) < g.max_slope) & (dxp > 0)
        if g.use_terrain:
            flat_prev = flat_prev & (dxp < 5.0)
        dxl = r_d - lg_d
        dzl = r_z - lg_z
        slope_lg = dzl / dxl
        flat_lg = (jnp.abs(slope_lg) < g.max_slope) & (dxl > 0)

        green = normal & ~first_obst & flat_prev
        if g.use_terrain:
            yellowgreen = jnp.zeros_like(green)
            yellow = jnp.zeros_like(green)
        else:
            yellowgreen = normal & ~green & first_obst & flat_prev & flat_lg
            yellow = (
                normal
                & ~green
                & ~yellowgreen
                & (jnp.abs(dxl) < g.ground_because_close_to_last_certain_ground_max_dist_diff)
                & (jnp.abs(dzl) < g.ground_because_close_to_last_certain_ground_max_z_diff)
            )

        ground = green | yellowgreen | yellow | first_ground
        obstacle = (normal & ~ground) | first_obstacle_pt

        label = jnp.where(
            r_fog,
            GP_FOG,
            jnp.where(
                r_ego,
                GP_EGO_VEHICLE,
                jnp.where(ground, GP_GROUND, jnp.where(obstacle, GP_OBSTACLE, GP_UNKNOWN)),
            ),
        ).astype(jnp.int32)
        debug = jnp.where(
            r_fog,
            DBG_LIGHTGRAY,
            jnp.where(
                r_ego,
                DBG_VIOLET,
                jnp.where(
                    first_ground,
                    DBG_GRAY,
                    jnp.where(
                        first_obstacle_pt,
                        DBG_ORANGE,
                        jnp.where(
                            green,
                            DBG_GREEN,
                            jnp.where(
                                yellowgreen,
                                DBG_YELLOWGREEN,
                                jnp.where(
                                    yellow,
                                    DBG_YELLOW,
                                    jnp.where(obstacle, DBG_RED, DBG_WHITE),
                                ),
                            ),
                        ),
                    ),
                ),
            ),
        ).astype(jnp.int32)

        # obstacle event for the backtrack pass: only normal-path obstacles
        event = normal & ~ground

        # last-certain-ground update (…cpp:542-551 + first point …cpp:419)
        update_lg = (
            (green | yellowgreen)
            & (slope_prev > g.last_ground_point_slope_higher_than)
            & (jnp.abs(dxp) < g.last_ground_point_distance_smaller_than)
            & (prev_label != DBG_YELLOW)
        ) | first_ground
        lg_d = jnp.where(update_lg, r_d, lg_d)
        lg_z = jnp.where(update_lg, r_z, lg_z)

        first_obst = jnp.where(
            is_first, first_obstacle_pt, first_obst | (normal & obstacle)
        )
        first_found = first_found | ~skip
        prev_d = jnp.where(~skip, r_d, prev_d)
        prev_z = jnp.where(~skip, r_z, prev_z)
        prev_label = jnp.where(~skip, debug, prev_label)
        inc_below_stored = inc_stored

        return (
            (first_found, first_obst, lg_d, lg_z, prev_d, prev_z, prev_label, inc_below_stored),
            (label, debug, event, inc_stored),
        )

    is_bottom = jnp.zeros((R, B), bool).at[R - 1].set(True)
    init = (
        jnp.zeros(B, bool),                     # first_point_found
        jnp.zeros(B, bool),                     # first_obstacle_detected
        jnp.zeros(B, jnp.float32),              # last_ground d
        jnp.full(B, 1.0, jnp.float32) * hsg,    # last_ground z (…cpp:308)
        jnp.zeros(B, jnp.float32),              # prev d
        jnp.zeros(B, jnp.float32),              # prev z
        jnp.full(B, DBG_WHITE, jnp.int32),      # prev label
        jnp.full(B, jnp.nan, jnp.float32),      # inc stored below
    )
    _, (labels, debug, events, inc_stored) = jax.lax.scan(
        classify_step,
        init,
        (cell_nan, fog, ego, d, zrel, inc_raw, sc_incl, is_bottom),
        reverse=True,
        unroll=_gseg_unroll(),
    )
    # scan outputs are stacked in row order (R, B)

    # ---- phase 2: backtrack scan (…cpp:514-535) --------------------------
    row_idx = jnp.arange(R, dtype=jnp.int32)[:, None]  # (R, 1)

    def backtrack_step(carry, r):
        lab, dbg = carry
        ev = events[r]          # (B,)
        ev_d = d[r]             # (B,)
        cont = (dbg == DBG_YELLOW) | (
            (lab == GP_GROUND)
            & (jnp.abs(ev_d[None, :] - d)
               < g.obstacle_because_next_certain_obstacle_max_dist_diff)
        )
        walk = jnp.where(row_idx <= r, True, cont)
        in_run = jnp.cumprod(walk.astype(jnp.int32), axis=0).astype(bool)
        relabel = in_run & (row_idx > r) & (lab == GP_GROUND) & ev[None, :]
        lab = jnp.where(relabel, GP_OBSTACLE, lab)
        dbg = jnp.where(relabel, DBG_DARKRED, dbg)
        return (lab, dbg), None

    (labels, debug), _ = jax.lax.scan(
        backtrack_step, (labels, debug), jnp.arange(R - 1, -1, -1),
        unroll=_gseg_unroll(),
    )

    # ---- phase 3: is_ignored flags (…cpp:567-616) ------------------------
    ignored = cell_nan | (labels != GP_OBSTACLE) | (dist < 1.0 * cl.max_distance)
    if cl.ignore_points_with_too_big_inclination_angle_diff:
        gate = (row_idx < R - 1) & (
            jnp.arctan2(jnp.float32(cl.max_distance), dist) < sc_incl
        )
        ignored = ignored | gate
    if cl.ignore_points_in_chessboard_pattern:
        col_even = cols[None, :] % 2 == 0
        row_even = row_idx % 2 == 0
        ignored = ignored | (col_even != row_even)

    # ---- NaN-cell continuous azimuth refill (…cpp:371) -------------------
    gcol_rel = (cols - state.origin_rot * num_cols).astype(jnp.float32)
    nan_az = (gcol_rel[None, :] + 0.5) * az_width
    cont_az_out = jnp.where(cell_nan, nan_az, cont_az)

    # ---- scatter back ----------------------------------------------------
    wmask = col_valid[None, :]

    def put(arr, vals):
        cur = ring_read(arr, lc0, B)
        return ring_write(arr, lc0, jnp.where(wmask, vals.astype(arr.dtype), cur))

    return dataclasses.replace(
        state,
        ground_label=put(state.ground_label, labels),
        debug_label=put(state.debug_label, debug),
        is_ignored=put(state.is_ignored, ignored),
        inclination=put(state.inclination, inc_stored),
        cont_az=put(state.cont_az, cont_az_out),
        gcol=put(state.gcol, jnp.broadcast_to(cols[None, :], (R, B))),
        incl_diffs=jnp.where(inputs.n_cols > 0, new_incl_carry, state.incl_diffs),
        overflow=state.overflow | overflow,
    )

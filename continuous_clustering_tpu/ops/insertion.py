"""Stage A — continuous range image construction on device.

Re-derives the reference's per-firing insertion
(``src/clustering/continuous_clustering.cpp:105-292``) as a ``lax.scan`` over
a *batch* of firings.  Each scan step is fully vectorized over the laser rows
(azimuth/column unwrap, collision shift, nearer-point priority, scatter into
the ring buffer); only the rotation-unwrap recurrence (rearmost/foremost laser
tracking) is sequential, exactly as in the reference.

Semantic notes mirrored from the reference:

* azimuth is computed in the *sensor* frame (…cpp:142), distance and
  inclination from the odom-relative vector (…cpp:189,232);
* a point landing on an occupied cell first tries the next column
  (…cpp:190-202) and is dropped if the cell holds a nearer point (…cpp:205);
  dropped points do not update the rearmost/foremost tracking (the
  ``continue`` at …cpp:206 precedes …cpp:241);
* points behind the already-finished frontier are counted for unwrap
  purposes but not written (…cpp:208-238);
* a first firing spanning more than half a rotation flags a reset
  (…cpp:252-260) and subsequent firings in the batch are ignored.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from .state import RingState


class FiringBatch(NamedTuple):
    """A batch of F firings with R rows each (host-assembled)."""

    xyz: jax.Array          # (F, R, 3) f32 sensor frame, NaN = missing
    pose: jax.Array         # (F, 3, 4) f32 odom_from_sensor
    stamp_lo: jax.Array     # (F, R) u32
    stamp_hi: jax.Array     # (F, R) u32
    uidx_lo: jax.Array      # (F, R) u32
    uidx_hi: jax.Array      # (F, R) u32
    intensity: jax.Array    # (F, R) i32
    firing_index: jax.Array  # (F,) i32
    valid: jax.Array        # (F,) bool — padding mask


class InsertResult(NamedTuple):
    state: RingState
    rearmost_per_firing: jax.Array  # (F,) i32: prev_rearmost after each firing


def insert_firings(config: Config, state: RingState, batch: FiringBatch) -> InsertResult:
    """Insert a batch of firings: slim scan + one vectorized field apply.

    The only truly sequential dependency per firing is the rotation-unwrap
    recurrence and the distance-occupancy of the ring (collision shift /
    nearer-point priority).  The scan therefore carries ONLY the distance
    plane plus the frontier scalars (one scatter per step); all other cell
    fields are written afterwards in a single batched scatter where the
    winner of each cell is the accepted write with the minimum distance —
    identical to the sequential outcome because every accepted overwrite is
    strictly nearer than its predecessor (…cpp:205).
    """
    num_cols = config.range_image.num_columns
    rc = config.ring_buffer_max_columns
    az_width = jnp.float32(2.0 * math.pi / num_cols)  # f32 like …cpp:16
    half = num_cols // 2
    R = state.num_rows
    rows = jnp.arange(R, dtype=jnp.int32)
    F = batch.xyz.shape[0]

    INF = jnp.float32(jnp.inf)

    def step(carry, f, occ):
        (prev_rearmost, prev_foremost, first_unfinished,
         ring_start, ring_end, first_unpublished, reset_required) = carry

        valid = ~jnp.isnan(f["xyz"][:, 0]) & f["valid"] & ~reset_required
        pose = f["pose"]
        sensor_pos = pose[:, 3]
        px, py, pz = f["xyz"][:, 0], f["xyz"][:, 1], f["xyz"][:, 2]
        # elementwise 3x3 transform (MXU bf16 default would cost precision)
        p_odom = jnp.stack(
            [pose[i, 0] * px + pose[i, 1] * py + pose[i, 2] * pz + pose[i, 3]
             for i in range(3)],
            axis=1,
        )
        p_rel = p_odom - sensor_pos

        azimuth = jnp.arctan2(py, px)  # sensor frame (…cpp:142)
        pi32 = jnp.float32(math.pi)
        if config.range_image.sensor_is_clockwise:
            inc_az = -azimuth + pi32
        else:
            inc_az = azimuth + pi32

        col_in_rot = (jnp.where(valid, inc_az, 0.0) / az_width).astype(jnp.int32)
        prev_rot = prev_rearmost // num_cols
        gcol = prev_rot * num_cols + col_in_rot
        diff = col_in_rot - prev_rearmost % num_cols
        wrap_fwd = diff < -half                      # …cpp:161
        wrap_back = (prev_rearmost > 0) & (diff > half)  # …cpp:166
        rot_off = jnp.where(wrap_fwd, 1, jnp.where(wrap_back, -1, 0))
        gcol = gcol + rot_off * num_cols

        distance = jnp.sqrt(jnp.sum(p_rel * p_rel, axis=1))
        distance = jnp.where(valid, distance, jnp.nan)

        lcol = jnp.where(valid, gcol % rc, 0)
        old_enc = occ(lcol)
        next_lcol = (lcol + 1) % rc
        next_enc = occ(next_lcol)
        shift = (old_enc < INF) & valid & (next_enc == INF)
        lcol = jnp.where(shift, next_lcol, lcol)
        gcol = gcol + shift.astype(jnp.int32)
        old2 = jnp.where(shift, next_enc, old_enc)

        refused = (old2 < INF) & (~valid | (distance >= old2))
        tracked = valid & ~refused
        behind = (first_unfinished >= 0) & (gcol < first_unfinished)
        write = tracked & ~behind

        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        rearmost = jnp.min(jnp.where(tracked, gcol, big))
        foremost = jnp.max(jnp.where(tracked, gcol, -1))
        any_tracked = jnp.any(tracked)
        invalid_span = any_tracked & ((foremost - rearmost) > half)  # …cpp:252

        ok = any_tracked & ~invalid_span
        prev_rearmost = jnp.where(ok & (rearmost > prev_rearmost), rearmost, prev_rearmost)
        prev_foremost = jnp.where(ok & (foremost > prev_foremost), foremost, prev_foremost)

        have_data = prev_foremost >= 0
        ring_start = jnp.where(have_data & (ring_start == -1), prev_rearmost, ring_start)
        first_unpublished = jnp.where(
            have_data & (first_unpublished == -1), prev_rearmost, first_unpublished
        )
        ring_end = jnp.where(have_data & (prev_foremost > ring_end), prev_foremost, ring_end)
        first_unfinished = jnp.where(
            have_data & (first_unfinished == -1), prev_rearmost, first_unfinished
        )
        # reference while loop (…cpp:289-291): columns [first_unfinished,
        # prev_rearmost) are handed to segmentation
        first_unfinished = jnp.where(
            have_data & (first_unfinished < prev_rearmost), prev_rearmost, first_unfinished
        )
        reset_required = reset_required | invalid_span

        carry = (prev_rearmost, prev_foremost, first_unfinished,
                 ring_start, ring_end, first_unpublished, reset_required)
        cont_az = (
            jnp.float32(2.0 * math.pi)
            * (prev_rot + rot_off - state.origin_rot).astype(jnp.float32)
            + inc_az
        )
        inclination = jnp.arcsin(p_rel[:, 2].astype(jnp.float32) / distance)
        finished_up_to = jnp.where(have_data, prev_rearmost, jnp.int32(-1))
        ys = dict(
            lcol=lcol, gcol=gcol, write=write, distance=distance,
            azimuth=azimuth, inclination=inclination, cont_az=cont_az,
            x=p_odom[:, 0], y=p_odom[:, 1], z=p_odom[:, 2],
            finished_up_to=finished_up_to,
        )
        return carry, ys

    # group several firings per scan iteration: the per-iteration work is
    # tiny, so TPU scan/scatter overhead dominates an ungrouped scan.  The
    # distance plane is carried inf-encoded (free cell = +inf) so that the
    # group's writes commit as ONE scatter-min; mid-group occupancy combines
    # the pre-group plane with the group's earlier accepted claims (accepted
    # overwrites are strictly nearer, so min is exact; …cpp:205).
    G = 8 if F % 8 == 0 else (4 if F % 4 == 0 else 1)
    INFv = jnp.float32(jnp.inf)

    def gstep(carry, fg):
        dist_enc, *scal = carry
        scal = tuple(scal)
        ys_list = []
        claims = []  # (lcol (R,), enc (R,)) of accepted writes so far

        for g_i in range(G):
            f = {k: v[g_i] for k, v in fg.items()}

            def occ(lc, _claims=tuple(claims)):
                e = dist_enc[rows, lc]
                for cl, ce in _claims:
                    e = jnp.where(cl == lc, jnp.minimum(e, ce), e)
                return e

            scal, ys = step(scal, f, occ)
            claims.append(
                (ys["lcol"], jnp.where(ys["write"], ys["distance"], INFv))
            )
            ys_list.append(ys)

        all_l = jnp.stack([c[0] for c in claims]).reshape(-1)       # (G*R,)
        all_e = jnp.stack([c[1] for c in claims]).reshape(-1)
        rows_t = jnp.broadcast_to(rows[None, :], (G, R)).reshape(-1)
        dist_enc = dist_enc.at[rows_t, all_l].min(all_e)
        stacked = {
            k: jnp.stack([y[k] for y in ys_list]) for k in ys_list[0]
        }
        return (dist_enc,) + scal, stacked

    firings = {
        "xyz": batch.xyz.reshape(F // G, G, R, 3),
        "pose": batch.pose.reshape(F // G, G, 3, 4),
        "valid": batch.valid.reshape(F // G, G),
    }
    dist_enc0 = jnp.where(jnp.isnan(state.distance), jnp.inf, state.distance)
    carry0 = (
        dist_enc0, state.prev_rearmost, state.prev_foremost,
        state.first_unfinished, state.ring_start, state.ring_end,
        state.first_unpublished, state.reset_required,
    )
    carry, ys = jax.lax.scan(gstep, carry0, firings)
    ys = {k: v.reshape((F,) + v.shape[2:]) for k, v in ys.items()}
    (dist_enc, prev_rearmost, prev_foremost, first_unfinished,
     ring_start, ring_end, first_unpublished, reset_required) = carry
    dist_ring = jnp.where(jnp.isinf(dist_enc), jnp.nan, dist_enc)

    # winner of each cell = accepted write matching the final distance plane
    lcol = ys["lcol"].reshape(-1)
    write = ys["write"].reshape(-1)
    row_idx = jnp.broadcast_to(rows[None, :], (F, R)).reshape(-1)
    final_d = dist_enc[row_idx, lcol]
    winner = write & (ys["distance"].reshape(-1) == final_d)
    sr = jnp.where(winner, row_idx, R)  # out-of-bounds rows drop losers
    sc = lcol

    def put(arr, vals):
        return arr.at[sr, sc].set(vals.reshape(-1).astype(arr.dtype), mode="drop")

    fidx = jnp.broadcast_to(batch.firing_index[:, None], (F, R))
    new_state = dataclasses.replace(
        state,
        distance=dist_ring,
        x=put(state.x, ys["x"]),
        y=put(state.y, ys["y"]),
        z=put(state.z, ys["z"]),
        azimuth=put(state.azimuth, ys["azimuth"]),
        inclination=put(state.inclination, ys["inclination"]),
        cont_az=put(state.cont_az, ys["cont_az"]),
        gcol=put(state.gcol, ys["gcol"]),
        stamp_lo=put(state.stamp_lo, batch.stamp_lo),
        stamp_hi=put(state.stamp_hi, batch.stamp_hi),
        uidx_lo=put(state.uidx_lo, batch.uidx_lo),
        uidx_hi=put(state.uidx_hi, batch.uidx_hi),
        intensity=put(state.intensity, batch.intensity),
        firing_index=put(state.firing_index, fidx),
        prev_rearmost=prev_rearmost,
        prev_foremost=prev_foremost,
        first_unfinished=first_unfinished,
        ring_start=ring_start,
        ring_end=ring_end,
        first_unpublished=first_unpublished,
        reset_required=reset_required,
    )
    return InsertResult(state=new_state, rearmost_per_firing=ys["finished_up_to"])


def insert_firings_jit(config: Config):
    """Returns a jitted insertion fn with donated state."""
    return jax.jit(
        lambda state, batch: insert_firings(config, state, batch),
        donate_argnums=(0,),
    )

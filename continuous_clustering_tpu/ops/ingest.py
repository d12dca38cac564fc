"""Dense column-block ingest: device-side writes for host-side insertion.

When the native C++ insertion fast path is active (the reference's stage A is
pointer-chasing host work by nature), the device receives *dense finished
column blocks* instead of running the insertion scan: one masked write per
field plus the frontier scalars computed by the host. Exactness comes from
the native engine (oracle-verified); this op only places the data.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from .state import RingState, ring_read, ring_write


class ColumnBlock(NamedTuple):
    """Host-inserted dense columns [gcol0, gcol0 + n_cols), shape (R, B)."""

    gcol0: jax.Array        # () i32
    n_cols: jax.Array       # () i32
    x: jax.Array
    y: jax.Array
    z: jax.Array
    distance: jax.Array
    azimuth: jax.Array
    inclination: jax.Array
    cont_az: jax.Array      # f32, origin-relative
    stamp_lo: jax.Array     # u32
    stamp_hi: jax.Array
    uidx_lo: jax.Array
    uidx_hi: jax.Array
    intensity: jax.Array    # i32
    firing_index: jax.Array  # i32
    # frontier scalars computed by the host insertion engine
    prev_rearmost: jax.Array
    prev_foremost: jax.Array
    first_unfinished: jax.Array
    first_unpublished_init: jax.Array  # -1 if frontier already initialized
    reset_required: jax.Array


# packed single-transfer staging: the fields of a ColumnBlock as (B, R)
# planes of ONE i32 buffer (f32/u32 bitcast), so host->device staging costs
# two transfers (fields + scalars) instead of ~20 — through a remote TPU
# link each dispatch pays the round trip, and even on PCIe fewer/larger
# copies win.  The (B, R) plane orientation matches the native engine's
# cell iteration order, so the host side is ONE contiguous C++ pass
# (native/src/insertion.cpp fetchPacked — the previous per-field numpy
# transpose/split chain cost ~4 ms/revolution of single-core host time);
# the device transposes the whole stack once inside the jitted step.
BLOCK_F32_FIELDS = ("x", "y", "z", "distance", "azimuth", "inclination",
                    "cont_az")
BLOCK_U32_FIELDS = ("stamp_lo", "stamp_hi", "uidx_lo", "uidx_hi")
BLOCK_I32_FIELDS = ("intensity", "firing_index")
N_BLOCK_FIELDS = len(BLOCK_F32_FIELDS) + len(BLOCK_U32_FIELDS) + len(BLOCK_I32_FIELDS)
# scalar row order (i32): gcol0, n_cols, prev_rearmost, prev_foremost,
# first_unfinished, first_unpublished_init, reset_required, (pad)
N_BLOCK_SCALARS = 8

# fully merged staging (round 4): fields + per-column seg poses + scalars in
# ONE (N_BLOCK_FIELDS + 2, B, R) i32 buffer = ONE host->device transfer per
# batch (was three; each pays a link round trip on a remote device).  The
# extra planes piggyback on the (B, R) geometry: plane N_BLOCK_FIELDS
# lanes 0:15 carry the (B, 15) seg-pose matrix (f32 bitcast), plane
# N_BLOCK_FIELDS+1 column b=0 lanes 0:N_BLOCK_SCALARS carry the scalars.
# Requires R >= 15 (callers fall back otherwise).
N_MERGED_PLANES = N_BLOCK_FIELDS + 2


def split_merged(buf: jax.Array):
    """Inside-jit split of the merged staging buffer ((planes, B, R)):
    returns (fields, scalars, seg_poses_bt) where seg_poses_bt is
    (B, 15) f32 and fields stays (N_BLOCK_FIELDS, B, R) for
    ``unpack_block`` to transpose once."""
    fields = buf[:N_BLOCK_FIELDS]
    segp = jax.lax.bitcast_convert_type(
        buf[N_BLOCK_FIELDS, :, :15], jnp.float32
    )  # (B, 15)
    scalars = buf[N_BLOCK_FIELDS + 1, 0, :N_BLOCK_SCALARS]
    return fields, scalars, segp


def unpack_block(fields: jax.Array, scalars: jax.Array) -> ColumnBlock:
    """Rebuild a ColumnBlock inside jit from the packed staging buffers
    (``HostInsertion.fetch_block_packed``): fields (N_BLOCK_FIELDS, B, R)
    i32 (transposed to (_, R, B) in ONE device op here), scalars
    (N_BLOCK_SCALARS,) i32."""
    bc = jax.lax.bitcast_convert_type
    fields = jnp.swapaxes(fields, 1, 2)  # (N_BLOCK_FIELDS, R, B)
    kw = {}
    i = 0
    for name in BLOCK_F32_FIELDS:
        kw[name] = bc(fields[i], jnp.float32)
        i += 1
    for name in BLOCK_U32_FIELDS:
        kw[name] = bc(fields[i], jnp.uint32)
        i += 1
    for name in BLOCK_I32_FIELDS:
        kw[name] = fields[i]
        i += 1
    return ColumnBlock(
        gcol0=scalars[0], n_cols=scalars[1],
        prev_rearmost=scalars[2], prev_foremost=scalars[3],
        first_unfinished=scalars[4], first_unpublished_init=scalars[5],
        reset_required=scalars[6].astype(bool),
        **kw,
    )


def ingest_columns(config: Config, state: RingState, block: ColumnBlock,
                   batch_size: int) -> RingState:
    R = state.num_rows
    rc = state.ring_cols
    B = batch_size
    cols = block.gcol0 + jnp.arange(B, dtype=jnp.int32)
    wmask = (jnp.arange(B) < block.n_cols)[None, :]
    gcol_vals = jnp.broadcast_to(cols[None, :], (R, B))
    gcol_vals = jnp.where(jnp.isnan(block.distance), -1, gcol_vals)

    lc0 = block.gcol0 % rc

    def put(arr, vals):
        cur = ring_read(arr, lc0, B)
        return ring_write(arr, lc0, jnp.where(wmask, vals.astype(arr.dtype), cur))

    first_unpublished = jnp.where(
        state.first_unpublished == -1,
        block.first_unpublished_init,
        state.first_unpublished,
    )
    ring_start = jnp.where(
        state.ring_start == -1, block.first_unpublished_init, state.ring_start
    )
    return dataclasses.replace(
        state,
        x=put(state.x, block.x),
        y=put(state.y, block.y),
        z=put(state.z, block.z),
        distance=put(state.distance, block.distance),
        azimuth=put(state.azimuth, block.azimuth),
        inclination=put(state.inclination, block.inclination),
        cont_az=put(state.cont_az, block.cont_az),
        gcol=put(state.gcol, gcol_vals),
        stamp_lo=put(state.stamp_lo, block.stamp_lo),
        stamp_hi=put(state.stamp_hi, block.stamp_hi),
        uidx_lo=put(state.uidx_lo, block.uidx_lo),
        uidx_hi=put(state.uidx_hi, block.uidx_hi),
        intensity=put(state.intensity, block.intensity),
        firing_index=put(state.firing_index, block.firing_index),
        prev_rearmost=jnp.maximum(state.prev_rearmost, block.prev_rearmost),
        prev_foremost=jnp.maximum(state.prev_foremost, block.prev_foremost),
        first_unfinished=jnp.maximum(state.first_unfinished, block.first_unfinished),
        ring_end=jnp.maximum(state.ring_end, block.prev_foremost),
        first_unpublished=first_unpublished,
        ring_start=ring_start,
        reset_required=state.reset_required | block.reset_required,
    )

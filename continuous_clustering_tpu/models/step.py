"""Fused device step: insertion + segmentation + association + completion.

One jitted program per firing batch.  The host→device surface is the firing
batch plus the ego calibration; everything else (finished-column range,
per-column trigger poses, frontier bookkeeping) is derived on device so the
streaming hot path costs a single dispatch and a single scalar readback.

The step's scalar results are PACKED into one (9,) i32 vector
(``StepInfo.meta``): through a remote device link every host-side
``int(...)`` conversion pays a full round trip, so fetching nine scalars
individually cost up to nine round trips per consumed batch.  One vector =
one transfer.  Named access stays available via NamedTuple properties
(``info.n_cols`` etc.), which index the last axis so they also work on
scan-stacked infos.

This is the "flagship model forward step" exposed via ``__graft_entry__``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.association import AssocInputs, CompleteResult, associate_and_complete
from ..ops.ground_segmentation import SegmentInputs, ground_segment_columns
from ..ops.insertion import FiringBatch, insert_firings
from ..ops.state import RingState

# meta vector lanes
(META_GCOL0, META_NCOLS, META_FU_OLD, META_FU_NEW, META_NUM_NEW,
 META_COUNTER_OLD, META_RESET, META_OVERFLOW, META_CC_FAILED,
 META_CC_ROUNDS) = range(10)
N_META = 10


class StepInfo(NamedTuple):
    # packed per-step scalars, ONE (N_META,) i32 vector (see module docstring)
    meta: jax.Array
    # publish slab: packed per-cell readout of columns [fu_old, fu_old + W)
    # (W = the static ``slab_cols``; (n_slab_rows, R, W) i32, zero-size when
    # disabled).  Riding the readout on the step outputs makes steady-state
    # emission cost ZERO extra dispatches — the host serves get_columns from
    # this array instead of launching a separate fetch program (the
    # reference's publish thread re-reads the range image the same way,
    # src/ros/ros_utils.cpp:34-77, but a dispatch there is a function call).
    # The window is SPLIT in two step outputs — a narrow head covering the
    # typical publish window and the remaining tail — so the per-step
    # transfer pays only the head's bytes unless the frontier lags far
    # (the publish transfer is the dominant measured latency term on any
    # link; LATENCY_r3.json).
    slab: jax.Array       # head: columns [fu_old, fu_old + head_cols)
    slab_ext: jax.Array   # tail: columns [fu_old + head_cols, fu_old + W)

    @property
    def gcol0(self):
        return self.meta[..., META_GCOL0]

    @property
    def n_cols(self):
        return self.meta[..., META_NCOLS]

    @property
    def fu_old(self):
        return self.meta[..., META_FU_OLD]

    @property
    def fu_new(self):
        return self.meta[..., META_FU_NEW]

    @property
    def num_new_clusters(self):
        return self.meta[..., META_NUM_NEW]

    @property
    def cluster_counter_old(self):
        return self.meta[..., META_COUNTER_OLD]

    @property
    def reset_required(self):
        return self.meta[..., META_RESET]

    @property
    def overflow(self):
        return self.meta[..., META_OVERFLOW]

    @property
    def cc_failed(self):
        return self.meta[..., META_CC_FAILED]

    @property
    def cc_rounds(self):
        # CC fixpoint rounds this batch (observability: scenes needing many
        # diffusion rounds are where the CCT_SWEEPS/CCT_CC_JUMP knobs matter)
        return self.meta[..., META_CC_ROUNDS]


def pack_meta(gcol0, n_cols, fu_old, fu_new, num_new, counter_old,
              reset_required, overflow, cc_failed, cc_rounds=0,
              join_tabs=None) -> jax.Array:
    """Pack the step scalars (lanes 0..9) and, when the publish slab is on,
    the flattened (2, K) component-slot join tables (ops/readout.py
    join_tables) into one i32 vector = one device->host transfer."""
    vals = [gcol0, n_cols, fu_old, fu_new, num_new, counter_old,
            reset_required, overflow, cc_failed, cc_rounds]
    head = jnp.stack([jnp.asarray(v).astype(jnp.int32) for v in vals])
    if join_tabs is None:
        return head
    return jnp.concatenate([head, join_tabs.reshape(-1)])


class EgoCalibration(NamedTuple):
    """Static-per-stream ego calibration, device-resident."""

    ego_from_sensor: jax.Array       # (3, 4) f32
    height_sensor_to_ground: jax.Array  # () f32


class SegPoses(NamedTuple):
    """Per-column trigger poses for segmentation (host-derived)."""

    sensor_pos: jax.Array  # (B, 3) f32
    ego_rot: jax.Array     # (B, 3, 3) f32
    ego_trans: jax.Array   # (B, 3) f32


def _publish_slab(config: Config, state: RingState, fu_old, slab_cols: int,
                  head_cols: int = 0):
    """Packed readout of the publish window [fu_old, fu_old + slab_cols),
    split into (head, tail) at ``head_cols`` (0 or >= slab_cols: whole
    window in the head, zero-width tail)."""
    from ..ops.readout import packed_readout, slab_rows

    with_nbr = bool(config.clustering.record_neighbor_stats)
    n_rows = slab_rows(with_nbr)
    if not slab_cols:
        z = jnp.zeros((n_rows, state.num_rows, 0), jnp.int32)
        return z, z
    lc0 = jnp.maximum(fu_old, 0) % state.ring_cols
    full = packed_readout(state, lc0, slab_cols, with_nbr)
    if head_cols <= 0 or head_cols >= slab_cols:
        return full, jnp.zeros((n_rows, state.num_rows, 0), jnp.int32)
    return full[:, :, :head_cols], full[:, :, head_cols:]


def pipeline_step_block(
    config: Config,
    state: RingState,
    block,
    seg_poses: SegPoses,
    hsg,
    batch_cols: int,
    profile_cut: str = "",
    slab_cols: int = 0,
    slab_head: int = 0,
    ring_capacity: int | None = None,
    skip_clear: bool = False,
):
    """Host-insertion variant: ingest a dense finished-column block, then
    segmentation + association + completion (no insertion scan).

    ``profile_cut`` (profiling only) truncates the program after the named
    stage: "ingest", "seg", or an association cut ("bits"/"cc"/"union"/
    "completion").  ``ring_capacity``/``skip_clear`` support running this
    step on the halo path's window-sized scratch ring (parallel/halo.py;
    see ops.association.associate_and_complete).
    """
    from ..ops.ingest import ingest_columns

    def _cut_info(s):
        zero = jnp.asarray(0, jnp.int32)
        slab, slab_ext = _publish_slab(config, s, s.first_unpublished, 0)
        return s, StepInfo(
            meta=pack_meta(
                block.gcol0, block.n_cols, s.first_unpublished,
                s.first_unpublished, zero, s.cluster_counter,
                s.reset_required, s.overflow, s.cc_failed,
            ),
            slab=slab, slab_ext=slab_ext,
        )

    if profile_cut == "null":
        # measures scan + per-step slicing overhead only: fold a
        # data-dependent scalar so the block inputs stay live
        s = dataclasses.replace(
            state,
            cluster_counter=state.cluster_counter
            + (jnp.sum(block.x) == jnp.float32(-1.25e-38)).astype(jnp.int32),
        )
        return _cut_info(s)
    state = ingest_columns(config, state, block, batch_cols)
    if profile_cut == "ingest":
        return _cut_info(state)
    seg_in = SegmentInputs(
        gcol0=block.gcol0,
        n_cols=block.n_cols,
        sensor_pos=seg_poses.sensor_pos,
        ego_rot=seg_poses.ego_rot,
        ego_trans=seg_poses.ego_trans,
        height_sensor_to_ground=hsg,
    )
    state = ground_segment_columns(config, state, seg_in, batch_cols)
    if profile_cut == "seg":
        return _cut_info(state)
    counter_old = state.cluster_counter
    cres: CompleteResult = associate_and_complete(
        config, state, AssocInputs(gcol0=block.gcol0, n_cols=block.n_cols), batch_cols,
        profile_cut=profile_cut,
        ring_capacity=ring_capacity, skip_clear=skip_clear,
    )
    state = cres.state
    slab, slab_ext = _publish_slab(config, state, cres.fu_old, slab_cols, slab_head)
    from ..ops.readout import join_tables

    info = StepInfo(
        meta=pack_meta(
            block.gcol0, block.n_cols, cres.fu_old, cres.fu_new,
            cres.num_new_clusters, counter_old,
            state.reset_required, state.overflow, state.cc_failed,
            cc_rounds=cres.cc_rounds,
            join_tabs=join_tables(state) if slab_cols else None,
        ),
        slab=slab, slab_ext=slab_ext,
    )
    return state, info


def pipeline_step(
    config: Config,
    state: RingState,
    batch: FiringBatch,
    ego: EgoCalibration,
    batch_cols: int,
    slab_cols: int = 0,
    slab_head: int = 0,
):
    """Process one firing batch end-to-end on device.

    ``batch_cols`` is the static column-batch capacity; normally
    ``F + slack``.  If more columns finish than fit, the surplus is deferred
    to the next step (the insertion frontier is rolled back accordingly).
    """
    F = batch.xyz.shape[0]
    B = batch_cols

    fu_before = state.first_unfinished  # may be -1 before first data
    res = insert_firings(config, state, batch)
    state = res.state
    rearmost = res.rearmost_per_firing  # (F,) finished_up_to after each firing

    valid_rm = jnp.where(rearmost >= 0, rearmost, jnp.iinfo(jnp.int32).max)
    first_valid = jnp.min(valid_rm)  # init value of the frontier
    gcol0 = jnp.where(fu_before >= 0, fu_before, first_valid)
    fu_after = state.first_unfinished
    n_cols = jnp.clip(fu_after - gcol0, 0, B)
    has_work = (fu_after >= 0) & (n_cols > 0) & ~state.reset_required
    n_cols = jnp.where(has_work, n_cols, 0)
    # defer surplus columns: roll the insertion frontier back to what we segment
    state = dataclasses.replace(
        state,
        first_unfinished=jnp.where(has_work, gcol0 + n_cols, fu_after),
    )

    # per-column trigger pose: first firing whose rearmost exceeds the column
    cols = gcol0 + jnp.arange(B, dtype=jnp.int32)
    rm_key = jnp.where(rearmost >= 0, rearmost, jnp.iinfo(jnp.int32).min)
    trig = jnp.clip(jnp.searchsorted(rm_key, cols, side="right"), 0, F - 1)
    pose_cols = batch.pose[trig]              # (B, 3, 4)
    sensor_pos = pose_cols[:, :, 3]

    # ego_from_odom = ego_from_sensor @ inverse(odom_from_sensor)
    rot = pose_cols[:, :, :3]
    rinv = jnp.swapaxes(rot, 1, 2)           # (B, 3, 3)
    tinv = -jnp.einsum("bij,bj->bi", rinv, sensor_pos, precision="highest")
    er = ego.ego_from_sensor[:, :3]
    etr = ego.ego_from_sensor[:, 3]
    ego_rot = jnp.einsum("ij,bjk->bik", er, rinv, precision="highest")
    ego_trans = jnp.einsum("ij,bj->bi", er, tinv, precision="highest") + etr

    seg_in = SegmentInputs(
        gcol0=gcol0,
        n_cols=n_cols,
        sensor_pos=sensor_pos,
        ego_rot=ego_rot,
        ego_trans=ego_trans,
        height_sensor_to_ground=ego.height_sensor_to_ground,
    )
    state = ground_segment_columns(config, state, seg_in, B)

    cres: CompleteResult = associate_and_complete(
        config, state, AssocInputs(gcol0=gcol0, n_cols=n_cols), B
    )
    counter_old = state.cluster_counter
    state = cres.state

    slab, slab_ext = _publish_slab(config, state, cres.fu_old, slab_cols, slab_head)
    from ..ops.readout import join_tables

    info = StepInfo(
        meta=pack_meta(
            gcol0, n_cols, cres.fu_old, cres.fu_new,
            cres.num_new_clusters, counter_old,
            state.reset_required, state.overflow, state.cc_failed,
            cc_rounds=cres.cc_rounds,
            join_tabs=join_tables(state) if slab_cols else None,
        ),
        slab=slab, slab_ext=slab_ext,
    )
    return state, info

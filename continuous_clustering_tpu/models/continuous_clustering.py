"""The flagship streaming pipeline: TPU-native ContinuousClustering.

Public API parity with the reference class
(``clustering/continuous_clustering.hpp:197-221``):

* ``reset(num_rows)``, ``set_configuration(cfg)``, ``reset_required()``
* ``add_firing(firing, odom_from_sensor)``
* ``set_transform_robot_frame_from_sensor_frame(tf)``
* ``set_finished_column_callback(cb)`` / ``set_finished_cluster_callback(cb)``

Architectural difference from the reference (by design, for TPU): the
five reference thread-pool stages become three fused device programs over
*column batches* — insertion (lax.scan over firings), ground segmentation,
and association+completion — with the host orchestrating batches and
dispatching callbacks.  Column callbacks receive ranges instead of single
columns (the reference's publish path already uses ranges,
…cpp:1087-1089); data is re-read from the device ring buffer via
``get_columns`` exactly like the reference's ros_utils re-reads
``range_image_`` (src/ros/ros_utils.cpp:34-77).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..config import Config
from ..io.point_cloud import ProcessingStage, combine_u64, stage_dtype
from ..ops.insertion import FiringBatch
from ..ops.state import RingState, init_state, rebase_azimuth
from ..utils.stats import StageTimer, WorkloadRecorder
from .step import EgoCalibration, SegPoses, pipeline_step, pipeline_step_block

TWO_PI = 2.0 * math.pi


class ContinuousClustering:
    """Streaming continuous clustering on TPU."""

    def __init__(
        self,
        config: Config = Config(),
        firing_batch_size: int = 256,
        rebase_after_rotations: int = 256,
    ):
        self._config = config
        self._batch_F = firing_batch_size
        self._rebase_after = rebase_after_rotations
        self._num_rows: Optional[int] = None
        self._state: Optional[RingState] = None
        self._ego_from_sensor: Optional[np.ndarray] = None
        self._reset_required = False

        self.finished_column_callback: Optional[Callable[[int, int, bool], None]] = None
        self.finished_cluster_callback: Optional[Callable[[np.ndarray, int], None]] = None

        self._fifo: List[Dict[str, np.ndarray]] = []
        self._fifo_poses: List[np.ndarray] = []

        # observability (reference recordJobQueueWorkload analog)
        self.stats = StageTimer()
        self.workload = WorkloadRecorder()
        # decode-queue depth, fed by the owning node when a sensor decode
        # offload is active (ClusteringNode._on_new_firing)
        self._sensor_depth = 0

    # ------------------------------------------------------------------ API
    def set_configuration(self, config: Config) -> None:
        if self._config.reset_required_vs(config):
            self._reset_required = True
        self._config = config
        if self._num_rows is not None:
            self._build_jits()

    def reset_required(self) -> bool:
        return self._reset_required

    def set_transform_robot_frame_from_sensor_frame(self, tf: np.ndarray) -> None:
        self._ego_from_sensor = np.asarray(tf, dtype=np.float64)
        self._hsg_dev = None

    def has_transform_robot_frame_from_sensor_frame(self) -> bool:
        return self._ego_from_sensor is not None

    def set_finished_column_callback(self, cb) -> None:
        self.finished_column_callback = cb

    def set_finished_cluster_callback(self, cb) -> None:
        self.finished_cluster_callback = cb

    def reset(self, num_rows: int) -> None:
        self._num_rows = num_rows
        self._state = init_state(self._config, num_rows)
        self._fetch_cache = {}
        self._reset_required = False
        self._fifo.clear()
        self._fifo_poses.clear()
        # host-side insertion fast path (native C++ engine); stage A is
        # pointer-chasing host work — see models/host_insertion.py
        self._host_ins = None
        if os.environ.get("CCT_HOST_INSERT", "1") != "0":
            try:
                from .host_insertion import HostInsertion

                self._host_ins = HostInsertion(self._config, num_rows)
            except (RuntimeError, ImportError):
                self._host_ins = None
        # host mirrors of device scalars (avoid syncs on the hot path)
        self._h_first_unfinished = -1
        self._h_first_unpublished = -1
        self._h_cluster_counter = 1
        self._h_origin_rot = 0
        self._pending_infos = []
        self._last_pose = np.eye(4)
        self._last_ncols = 0
        # publish-slab cache: (lo_gcol, hi_gcol, head_dev, tail_dev) of the
        # last consumed step's packed readout; get_columns within [lo, hi)
        # is served from it with zero extra device dispatches.  The device
        # slab is split head/tail so the typical (narrow) publish window
        # transfers only the head's bytes (models/step.py _publish_slab).
        self._slab = None
        self._slab_np = None
        # assembled-records cache: (lo, hi, records) of the last native
        # full-window assembly; the emit path and the column callback read
        # overlapping ranges of the same window every consumed step, so the
        # second consumer gets a contiguous slice instead of a re-assembly
        self._cloud_cache = None
        # observability for the zero-dispatch-emission guarantee (tested)
        self.n_fetch_dispatches = 0
        # CC diffusion rounds of the last consumed batch (meta lane)
        self.last_cc_rounds = 0
        # optional publish trace: when set to a list, _consume_info appends
        # one dict per consumed step (real publish windows + counter ranges
        # + the materialized slab) — bench.py replays these to measure the
        # true per-revolution host publish cost; also handy for sizing the
        # slab head (window-width stats)
        self._publish_trace = None
        self._build_jits()

    def _build_jits(self) -> None:
        cfg = self._config
        # column capacity per step: firings per batch + slack for uneven
        # column completion at stream start
        self._batch_B = self._batch_F + 32
        # the completion live window must fit the ring; aliased window
        # columns would silently corrupt state.  The publish frontier can lag
        # the head by num_cols + 2*nth columns (one-round publish hold at nth
        # cadence + nth detection delay — docs/ROUND2_NOTES.md "frontier
        # lag"), so the worst-case live span is num_cols + 2*nth + batch +
        # halo; undersized rings previously surfaced only as a mid-stream
        # overflow RuntimeError.
        nth = cfg.clustering.cluster_point_trees_every_nth_column
        win = (
            cfg.range_image.num_columns
            + self._batch_B
            + 2 * cfg.clustering.max_steps_in_row
            + (2 * nth if nth > 1 else 0)
        )
        if win > cfg.ring_buffer_max_columns:
            raise ValueError(
                f"ring buffer too small: {cfg.ring_buffer_max_columns} columns "
                f"< worst-case live window {win} (num_columns + "
                f"firing_batch_size + 32 + 2*max_steps_in_row + 2*nth). "
                f"Increase ring_buffer_revolutions, or reduce the firing "
                f"batch size or cluster_point_trees_every_nth_column."
            )
        # publish-slab width: static columns of packed readout riding every
        # step's outputs (emission costs zero extra dispatches while the
        # publish window fits; larger windows fall back to an on-demand
        # fetch).  CCT_SLAB_W: <0 disables, >0 overrides, 0/unset = auto.
        w_env = int(os.environ.get("CCT_SLAB_W", "0"))
        rc = cfg.ring_buffer_max_columns
        if w_env < 0:
            self._slab_W = 0
        elif w_env > 0:
            self._slab_W = min(w_env, rc)
        else:
            self._slab_W = min(1 << (2 * self._batch_B - 1).bit_length(), rc)
        # head width: the publish window is typically (frontier lag +
        # n_cols) wide — the head covers that common case so the per-step
        # transfer pays only its bytes; the tail rides along for the rare
        # wide window (both are step outputs: zero extra dispatches either
        # way).  CCT_SLAB_W1 overrides (0/unset = auto: half the slab).
        w1_env = int(os.environ.get("CCT_SLAB_W1", "0"))
        if w1_env > 0:
            self._slab_W1 = min(w1_env, self._slab_W)
        else:
            self._slab_W1 = self._slab_W // 2
        # adaptive head (VERDICT r4 missing #3): the static auto head can
        # undershoot the streamed publish-window widths (measured head hit
        # rate 0.57 with p95 width 161 vs head 64 at B=32) — every miss
        # pays the tail transfer.  When enabled, _consume_info tracks the
        # streamed width distribution and GROWS the head to cover its p95
        # once the hit rate drops below the target (one re-jit per growth,
        # grow-only, capped at the slab width).
        self._slab_adapt = (
            os.environ.get("CCT_SLAB_ADAPT", "1") == "1"
            and self._slab_W > 0 and w1_env <= 0
        )
        self._slab_hit_target = float(
            os.environ.get("CCT_SLAB_HIT_TARGET", "0.9")
        )
        self._recent_widths = []
        # optional transfer clock: when a float, _consume_info/_fetch_slab
        # accumulate the device->host transfer seconds they pay (the
        # loaded-latency soak decomposes measured wall time into link
        # transfer vs host grouping; scripts/latency_model.py)
        self._transfer_s = None
        self._build_jit_steps()

    def _build_jit_steps(self):
        """(Re)build the jitted step closures at the current slab widths.
        Called once at init and again when the adaptive head grows."""
        import jax

        cfg = self._config
        self._jit_step = jax.jit(
            partial(
                pipeline_step, cfg, batch_cols=self._batch_B,
                slab_cols=self._slab_W, slab_head=self._slab_W1,
            ),
            donate_argnums=(0,),
        )
        self._jit_block_step = jax.jit(
            partial(
                pipeline_step_block, cfg, batch_cols=self._batch_B,
                slab_cols=self._slab_W, slab_head=self._slab_W1,
            ),
            donate_argnums=(0,),
        )

        # packed-staging variant: the hot streaming loop ships the block as
        # TWO host buffers (fields + scalars) and one (B, 15) pose buffer;
        # the ColumnBlock/SegPoses rebuild happens inside the jit, so a
        # batch costs 3 host->device transfers instead of ~20 (each transfer
        # pays a dispatch round trip — through the remote TPU link that tax
        # dominated the streaming rate)
        B = self._batch_B

        def _packed_block_step(state, fields, scalars, segp, hsg):
            from ..ops.ingest import unpack_block

            block = unpack_block(fields, scalars)
            seg = SegPoses(
                sensor_pos=segp[:, 0:3],
                ego_rot=segp[:, 3:12].reshape(B, 3, 3),
                ego_trans=segp[:, 12:15],
            )
            return pipeline_step_block(
                cfg, state, block, seg, hsg,
                batch_cols=B, slab_cols=self._slab_W, slab_head=self._slab_W1,
            )

        self._jit_block_step_packed = jax.jit(
            _packed_block_step, donate_argnums=(0,)
        )

        # fully merged staging: fields + seg poses + scalars in ONE buffer =
        # ONE host->device transfer per batch (ops/ingest.py split_merged);
        # needs R >= 15 rows to carry the (B, 15) pose matrix in one plane
        R = self._num_rows
        self._merged_buf = None
        if R is not None and R >= 15:  # pose lanes need 15 rows (scalars 8)
            def _merged_block_step(state, buf, hsg):
                from ..ops.ingest import split_merged, unpack_block

                fields, scalars, segp = split_merged(buf)
                block = unpack_block(fields, scalars)
                seg = SegPoses(
                    sensor_pos=segp[:, 0:3],
                    ego_rot=segp[:, 3:12].reshape(B, 3, 3),
                    ego_trans=segp[:, 12:15],
                )
                return pipeline_step_block(
                    cfg, state, block, seg, hsg,
                    batch_cols=B, slab_cols=self._slab_W,
                    slab_head=self._slab_W1,
                )

            self._jit_block_step_merged = jax.jit(
                _merged_block_step, donate_argnums=(0,)
            )
        else:
            self._jit_block_step_merged = None
        self._hsg_dev = None  # cached device scalar (invalidated on config/tf)

    def _merged_block(self, first: int, end: int, reset: bool):
        """Build the single-transfer staging buffer for columns
        [first, first + B): fields planes + seg-pose plane + scalars plane.
        Returns (buffer, n_cols)."""
        from ..ops.ingest import (N_BLOCK_FIELDS, N_BLOCK_SCALARS,
                                  N_MERGED_PLANES)

        B, R = self._batch_B, self._num_rows
        # ring of staging buffers: jnp.asarray may alias (zero-copy) or
        # lazily consume the numpy buffer while the dispatch is in flight;
        # with at most 2 outstanding steps (async double buffering) a
        # 3-buffer ring guarantees no in-flight buffer is overwritten
        if self._merged_buf is None:
            self._merged_buf = [
                np.zeros((N_MERGED_PLANES, B, R), np.int32) for _ in range(3)
            ]
            self._merged_idx = 0
        buf = self._merged_buf[self._merged_idx]
        self._merged_idx = (self._merged_idx + 1) % 3
        fields, scalars, trig = self._host_ins.fetch_block_packed(
            first, end, B, self._h_origin_rot, reset, out=buf
        )
        segp = self._seg_poses_packed(trig)  # (B, 15) f32
        buf[N_BLOCK_FIELDS, :, :15].view(np.float32)[...] = segp
        buf[N_BLOCK_FIELDS + 1, 0, :N_BLOCK_SCALARS] = scalars
        return buf, int(scalars[1])

    def add_firing(self, firing: Dict[str, np.ndarray], odom_from_sensor: np.ndarray) -> None:
        if self._num_rows is None:
            raise RuntimeError("reset(num_rows) must be called before add_firing")
        if firing["xyz"].shape[0] != self._num_rows:
            raise RuntimeError(
                "The number of points in a firing has changed. This is probably a bug!"
            )
        self._fifo.append(firing)
        self._fifo_poses.append(np.asarray(odom_from_sensor, dtype=np.float64))
        if len(self._fifo) >= self._batch_F:
            self._process_batch()

    def flush(self) -> None:
        """Process buffered firings (padding the batch) and drain async results."""
        if self._fifo:
            self._process_batch()
        self._drain_pending()
        if self._host_ins is None:
            # stream end: drain surplus finished columns beyond step capacity
            # (the host-insertion path drains inline)
            while self._last_ncols == self._batch_B and not self._reset_required:
                calib = self._make_calib()
                self._last_ncols = 0
                self._run_step(self._empty_batch(), calib)
                self._drain_pending()
        # finalization kicks: clusters that finished in the last batch hold
        # the publish frontier for one round (reference one-round delay);
        # empty steps release them so the stream end is fully finalized
        if self._h_first_unfinished >= 0 and not self._reset_required:
            for _ in range(3):
                fu_before = self._h_first_unpublished
                if self._host_ins is not None:
                    fu = self._h_first_unfinished
                    if self._jit_block_step_merged is not None:
                        buf, _ = self._merged_block(fu, fu, False)
                        self._state, info = self._jit_block_step_merged(
                            self._state, jnp.asarray(buf), self._hsg()
                        )
                    else:
                        fields, scalars, trig = self._host_ins.fetch_block_packed(
                            fu, fu, self._batch_B, self._h_origin_rot, False
                        )
                        self._state, info = self._jit_block_step_packed(
                            self._state, jnp.asarray(fields),
                            jnp.asarray(scalars),
                            jnp.asarray(self._seg_poses_packed(trig)),
                            self._hsg(),
                        )
                    self._consume_info(info)
                else:
                    self._run_step(self._empty_batch(), self._make_calib())
                self._drain_pending()
                if self._h_first_unpublished == fu_before:
                    break

    # ---------------------------------------------------------------- internals
    def _make_batch(self, firings, poses) -> FiringBatch:
        F, R = self._batch_F, self._num_rows
        n = len(firings)
        xyz = np.full((F, R, 3), np.nan, np.float32)
        stamp = np.zeros((F, R), np.uint64)
        uidx = np.full((F, R), np.iinfo(np.uint64).max, np.uint64)
        inten = np.zeros((F, R), np.int32)
        fidx = np.zeros((F,), np.int64)
        pose_arr = np.tile(np.eye(4)[:3], (F, 1, 1)).astype(np.float32)
        for i, f in enumerate(firings):
            xyz[i] = f["xyz"]
            if "stamp" in f:
                stamp[i] = f["stamp"]
            if "uidx" in f:
                uidx[i] = f["uidx"]
            if "intensity" in f:
                inten[i] = f["intensity"]
            fidx[i] = f.get("firing_index", 0)
            pose_arr[i] = poses[i][:3, :]
        valid = np.arange(F) < n
        return FiringBatch(
            xyz=jnp.asarray(xyz),
            pose=jnp.asarray(pose_arr),
            stamp_lo=jnp.asarray(stamp & np.uint64(0xFFFFFFFF), jnp.uint32),
            stamp_hi=jnp.asarray(stamp >> np.uint64(32), jnp.uint32),
            uidx_lo=jnp.asarray(uidx & np.uint64(0xFFFFFFFF), jnp.uint32),
            uidx_hi=jnp.asarray(uidx >> np.uint64(32), jnp.uint32),
            intensity=jnp.asarray(inten),
            firing_index=jnp.asarray(fidx, jnp.int32),
            valid=jnp.asarray(valid),
        )

    def _make_calib(self) -> EgoCalibration:
        if self._ego_from_sensor is None:
            raise RuntimeError("Transform robot frame from sensor frame was not set yet!")
        ego = self._ego_from_sensor
        hsg = np.float32(-ego[2, 3] + self._config.ground_segmentation.height_ref_to_ground)
        return EgoCalibration(
            ego_from_sensor=jnp.asarray(ego[:3, :], jnp.float32),
            height_sensor_to_ground=jnp.asarray(hsg, jnp.float32),
        )

    def _seg_poses_packed(self, trig_poses: np.ndarray) -> np.ndarray:
        """Per-column segmentation inputs as ONE (B, 15) f32 buffer:
        [sensor_pos | ego_rot.reshape(9) | ego_trans] (single transfer;
        unpacked inside the jitted packed step)."""
        B = self._batch_B
        ego = self._ego_from_sensor
        n = len(trig_poses)
        out = np.zeros((B, 15), np.float32)
        if n:
            rot = trig_poses[:, :3, :3]
            t = trig_poses[:, :3, 3]
            out[:n, 0:3] = t
            rinv = np.swapaxes(rot, 1, 2)
            tinv = -np.einsum("bij,bj->bi", rinv, t)
            out[:n, 3:12] = np.einsum(
                "ij,bjk->bik", ego[:3, :3], rinv
            ).reshape(n, 9)
            out[:n, 12:15] = np.einsum("ij,bj->bi", ego[:3, :3], tinv) + ego[:3, 3]
        return out

    def _hsg(self):
        """Cached device scalar: sensor height over ground (changes only
        with the ego transform / configuration)."""
        if self._hsg_dev is None:
            self._hsg_dev = jnp.asarray(
                np.float32(
                    -self._ego_from_sensor[2, 3]
                    + self._config.ground_segmentation.height_ref_to_ground
                )
            )
        return self._hsg_dev

    def _seg_poses(self, trig_poses: np.ndarray) -> SegPoses:
        """Per-column segmentation inputs from trigger poses (n, 3, 4)."""
        B = self._batch_B
        ego = self._ego_from_sensor
        n = len(trig_poses)
        sensor_pos = np.zeros((B, 3), np.float32)
        ego_rot = np.zeros((B, 3, 3), np.float32)
        ego_trans = np.zeros((B, 3), np.float32)
        if n:
            rot = trig_poses[:, :3, :3]
            t = trig_poses[:, :3, 3]
            sensor_pos[:n] = t
            rinv = np.swapaxes(rot, 1, 2)
            tinv = -np.einsum("bij,bj->bi", rinv, t)
            ego_rot[:n] = np.einsum("ij,bjk->bik", ego[:3, :3], rinv)
            ego_trans[:n] = np.einsum("ij,bj->bi", ego[:3, :3], tinv) + ego[:3, 3]
        return SegPoses(
            sensor_pos=jnp.asarray(sensor_pos),
            ego_rot=jnp.asarray(ego_rot),
            ego_trans=jnp.asarray(ego_trans),
        )

    def _process_batch_host_insertion(self, firings, poses) -> None:
        ins = self._host_ins
        first, end, reset = ins.add_firings(firings, poses)
        if reset:
            self._reset_required = True
            return
        hsg = self._hsg()
        while True:
            if self._jit_block_step_merged is not None:
                buf, n = self._merged_block(first, end, reset)
                self._state, info = self._jit_block_step_merged(
                    self._state, jnp.asarray(buf), hsg
                )
            else:
                fields, scalars, trig = ins.fetch_block_packed(
                    first, end, self._batch_B, self._h_origin_rot, reset
                )
                n = int(scalars[1])
                segp = self._seg_poses_packed(trig)
                self._state, info = self._jit_block_step_packed(
                    self._state, jnp.asarray(fields), jnp.asarray(scalars),
                    jnp.asarray(segp), hsg,
                )
            if self._config.general.is_single_threaded:
                self._consume_info(info)
            else:
                self._pending_infos.append(info)
                if len(self._pending_infos) > 1:
                    self._consume_info(self._pending_infos.pop(0))
            first += n
            if first >= end or n == 0:
                break
        keep_from = self._h_first_unpublished - self._config.range_image.num_columns
        ins.clear_before(keep_from)
        self._maybe_rebase()

    def _process_batch(self) -> None:
        firings, poses = self._fifo, self._fifo_poses
        self._fifo, self._fifo_poses = [], []
        calib = self._make_calib()
        self._last_pose = poses[-1]
        # queue-depth sampling across all four stages (reference
        # recordJobQueueWorkload, …cpp:1147-1159): sensor = packets awaiting
        # decode (set by the node when a decode offload runs), fifo =
        # buffered firings, device = dispatched-but-unconsumed steps,
        # publish = finished-but-unpublished column backlog
        self.workload.record(
            sensor=self._sensor_depth,
            fifo=len(firings),
            device=len(self._pending_infos),
            publish=max(0, self._h_first_unfinished - self._h_first_unpublished),
        )
        if self._host_ins is not None:
            with self.stats.track("device_step"):
                self._process_batch_host_insertion(firings, poses)
            return
        with self.stats.track("host_batch_prep"):
            batch = self._make_batch(firings, poses)
        with self.stats.track("device_step"):
            n_cols = self._run_step(batch, calib)
        # If the step clamped at its column capacity there may be surplus
        # finished columns; empty batches re-advance the frontier from the
        # persistent prev_rearmost scalar and drain them.
        while n_cols == self._batch_B and not self._reset_required:
            n_cols = self._run_step(self._empty_batch(), calib)

        self._maybe_rebase()

    def _empty_batch(self) -> FiringBatch:
        empty = self._make_batch([], [])
        return empty._replace(
            pose=jnp.broadcast_to(
                jnp.asarray(self._last_pose[:3, :], jnp.float32), empty.pose.shape
            )
        )

    def _run_step(self, batch: FiringBatch, calib) -> int:
        """Dispatch one device step.

        In async mode (is_single_threaded=False) the step's scalar results are
        consumed one batch later, so the host processes batch k's callbacks
        while the device runs batch k+1 (double buffering); JAX's async
        dispatch gives the overlap for free.  Returns n_cols of the batch
        whose results were consumed (0 if deferred).
        """
        self._state, info = self._jit_step(self._state, batch, calib)
        if self._config.general.is_single_threaded:
            return self._consume_info(info)
        self._pending_infos.append(info)
        if len(self._pending_infos) > 1:
            return self._consume_info(self._pending_infos.pop(0))
        return 0

    def _drain_pending(self) -> None:
        while self._pending_infos:
            self._consume_info(self._pending_infos.pop(0))

    def _consume_info(self, info) -> int:
        from .step import (META_CC_FAILED, META_CC_ROUNDS, META_COUNTER_OLD,
                           META_FU_NEW, META_FU_OLD, META_GCOL0, META_NCOLS,
                           META_NUM_NEW, META_OVERFLOW, META_RESET, N_META)

        # ONE device->host transfer for all per-step scalars (through a
        # remote link each int(...) conversion pays a round trip)
        if self._transfer_s is not None:
            import time as _time

            _t0 = _time.perf_counter()
            m = np.asarray(info.meta)
            self._transfer_s += _time.perf_counter() - _t0
        else:
            m = np.asarray(info.meta)
        if bool(m[META_RESET]):
            self._reset_required = True
            return 0
        if bool(m[META_CC_FAILED]):
            raise RuntimeError(
                "Connected-components labeling did not converge within the "
                "64-round cap (labels still changing). This is a correctness "
                "failure, not a throughput one: raise CCT_SWEEPS or enable "
                "pointer jumps (CCT_CC_JUMP/CCT_CC_JUMP_AFTER) — slowing the "
                "input stream cannot help."
            )
        if bool(m[META_OVERFLOW]):
            raise RuntimeError(
                "Ring buffer overflow: a column was not cleared before reuse. "
                "The clustering cannot keep up with the input rate; slow down "
                "the stream or adjust parameters (reference throws the same "
                "way, src/clustering/continuous_clustering.cpp:337-344)."
            )

        n_cols = int(m[META_NCOLS])
        self._last_ncols = n_cols
        # observability: CC diffusion rounds of this batch (scenes needing
        # many rounds are where the CCT_SWEEPS/CCT_CC_JUMP knobs matter)
        self.last_cc_rounds = int(m[META_CC_ROUNDS])
        gcol0 = int(m[META_GCOL0])
        fu_old, fu_new = int(m[META_FU_OLD]), int(m[META_FU_NEW])
        if n_cols == 0 and fu_new == fu_old:
            return 0
        if n_cols > 0:
            self._h_first_unfinished = gcol0 + n_cols
        counter_old = int(m[META_COUNTER_OLD])
        num_new = int(m[META_NUM_NEW])
        self._h_cluster_counter = counter_old + num_new
        self._h_first_unpublished = fu_new

        # adaptive slab head: track streamed publish-window widths; when the
        # head-hit rate over the recent window falls below the target, grow
        # the head to cover the distribution's p95 (one re-jit, grow-only)
        if self._slab_adapt and fu_old >= 0:
            width = max(gcol0 + n_cols, fu_new) - fu_old
            ws = self._recent_widths
            ws.append(width)
            # first check after 32 windows: short streams at large B see few
            # windows per revolution (53 in a 3-rev soak at B=128 — a
            # 64-sample gate never fired and the head sat at a 0.5 hit rate,
            # LATENCY_r5).  Growth covers p95 + margin rounded up to the TPU
            # lane width (128); pow2 doubling overshot transfer bytes by up
            # to 2x (B=128: p95 321 -> 512 where 384 suffices).
            if len(ws) >= 32:
                hits = sum(1 for v in ws if v <= self._slab_W1)
                if hits < self._slab_hit_target * len(ws):
                    p95 = sorted(ws)[int(0.95 * len(ws))]
                    want = max(p95 + 16, self._slab_W1 + 1)
                    new_w1 = min(self._slab_W, (want + 127) // 128 * 128)
                    if new_w1 > self._slab_W1:
                        self._slab_W1 = new_w1
                        self._build_jit_steps()
                    else:
                        self._slab_adapt = False  # head already at the cap
                    del ws[:]
                elif len(ws) >= 512:
                    del ws[: len(ws) - 256]

        # cache this step's publish slab: all readout below (ground columns,
        # published columns, cluster emission) is served from it as long as
        # the publish window fits its static width
        if self._slab_W and fu_old >= 0:
            hi = gcol0 + n_cols if n_cols > 0 else fu_new
            hi = max(hi, fu_new)
            # the (2, K) component-slot join tables rode the meta transfer
            # (snapshot taken by the same step that produced the slab)
            tabs = (
                m[N_META:].reshape(2, -1) if m.shape[0] > N_META else None
            )
            self._slab = (
                fu_old, min(fu_old + self._slab_W, hi), info.slab,
                info.slab_ext, tabs,
            )
            self._slab_np = None
            self._cloud_cache = None

        if n_cols > 0 and self.finished_column_callback:
            self.finished_column_callback(gcol0, gcol0 + n_cols - 1, True)
        if num_new > 0 and self.finished_cluster_callback:
            self._emit_clusters(
                fu_old, max(gcol0 + n_cols, fu_new), counter_old, counter_old + num_new
            )
        if fu_new > fu_old and self.finished_column_callback:
            self.finished_column_callback(fu_old, fu_new - 1, False)
        if self._publish_trace is not None:
            # bench/diagnostic capture: the step's REAL publish window,
            # counter range and materialized slab (bench.py replays these to
            # measure the per-revolution host publish cost; also the data
            # source for slab-head sizing)
            hi_emit = max(gcol0 + n_cols, fu_new)
            slab_np = slab_lo = tabs = None
            if hi_emit > fu_old >= 0:
                got = self._fetch_slab(fu_old, hi_emit - fu_old)
                if got is not None:
                    slab_np, off, tabs = got
                    slab_lo = fu_old - off
            self._publish_trace.append(dict(
                gcol0=gcol0, n_cols=n_cols, fu_old=fu_old, fu_new=fu_new,
                counter_old=counter_old, counter_new=counter_old + num_new,
                slab_np=slab_np, slab_lo=slab_lo, tabs=tabs,
                cc_rounds=self.last_cc_rounds,
            ))
        return n_cols

    def _emit_clusters(
        self, from_gcol: int, to_gcol: int, counter_old: int, counter_new: int
    ) -> None:
        from ..io import native_readout

        if native_readout.available():
            got = self._fetch_slab(from_gcol, to_gcol - from_gcol)
            if got is not None:
                slab, off, tabs = got
                groups, full = native_readout.emit_clusters(
                    slab, tabs, off, to_gcol - from_gcol, from_gcol,
                    self._state.ring_cols,
                    TWO_PI * self._h_origin_rot, counter_old, counter_new,
                    self._config.clustering.use_last_point_for_cluster_stamp,
                )
                if full is not None:
                    # dense selection assembled the whole window: cache it
                    # so the column callback's get_columns over the same
                    # window becomes a slice
                    self._cloud_cache = (from_gcol, to_gcol, full)
                for group, stamp in groups:
                    self.finished_cluster_callback(group, stamp)
                return
        cloud = self.get_columns(from_gcol, to_gcol - 1, ProcessingStage.CONTINUOUS_CLUSTERING)
        ids = cloud["id"]
        # bound above too: in async mode the state may already contain ids
        # assigned by a later batch (they will be emitted with that batch)
        new = (ids >= counter_old) & (ids < counter_new)
        if not np.any(new):
            return
        cloud = cloud[new]
        order = np.argsort(cloud["id"], kind="stable")
        cloud = cloud[order]
        ids = cloud["id"]
        boundaries = np.flatnonzero(np.diff(ids)) + 1
        for group in np.split(cloud, boundaries):
            if len(group) <= 20:  # reference publish gate (…cpp:1023)
                continue
            stamps = group["time_sec"].astype(np.uint64) * np.uint64(1_000_000_000) + group[
                "time_nsec"
            ].astype(np.uint64)
            smin, smax = int(stamps.min()), int(stamps.max())
            if self._config.clustering.use_last_point_for_cluster_stamp:
                stamp = smax
            else:
                stamp = smin + (smax - smin) // 2
            self.finished_cluster_callback(group, stamp)

    def _maybe_rebase(self) -> None:
        rot = self._h_first_unpublished // self._config.range_image.num_columns
        if rot - self._h_origin_rot > self._rebase_after:
            # Cached/in-flight publish slabs hold cont_az relative to the OLD
            # origin; a slab-served read after the origin moves would add
            # TWO_PI * new_origin to un-shifted values, inflating published
            # azimuths by 2*pi*delta.  Consume everything first, then drop
            # the cache.  Rebase fires once per _rebase_after (256) rotations,
            # so the drain's pipeline bubble is negligible.
            self._drain_pending()
            self._slab = None
            self._slab_np = None
            self._cloud_cache = None
            rot = self._h_first_unpublished // self._config.range_image.num_columns
            delta = rot - self._h_origin_rot
            self._state, _ = rebase_azimuth(self._state, delta)
            self._h_origin_rot += delta

    # ---------------------------------------------------------------- access
    def _fetch_slab(self, from_gcol: int, n: int):
        """Fetch the packed (n_fields, R, width) i32 readout slab covering
        ``[from_gcol, from_gcol + n)`` as ``(slab_np, column offset)``.

        Fast path: the requested range is covered by the publish slab that
        rode the last consumed step's outputs — served with ZERO extra
        dispatches (at most one transfer, on first touch; only the narrow
        HEAD piece is transferred unless the window extends past it).
        Otherwise one jitted dispatch + one transfer; widths are bucketed to
        powers of two so at most ~log2(ring) programs compile.  Returns
        ``None`` when the range exceeds the ring (legacy modular-gather
        path)."""
        import jax

        from ..ops.readout import packed_readout

        if self._slab is not None:
            lo, hi, head, tail, tabs = self._slab
            if tabs is not None and from_gcol >= lo and from_gcol + n <= hi:
                need = from_gcol - lo + n
                w1 = head.shape[2]
                if self._slab_np is None or self._slab_np.shape[2] < need:
                    _t0 = None
                    if self._transfer_s is not None:
                        import time as _time

                        _t0 = _time.perf_counter()
                    if need <= w1:
                        self._slab_np = np.asarray(head)
                    else:
                        self._slab_np = np.concatenate(
                            [np.asarray(head), np.asarray(tail)], axis=2
                        )
                    if _t0 is not None:
                        self._transfer_s += _time.perf_counter() - _t0
                return self._slab_np, from_gcol - lo, tabs

        rc = self._state.ring_cols
        bucket = max(8, 1 << max(0, n - 1).bit_length())
        bucket = min(bucket, rc)
        if bucket < n:  # range exceeds the ring
            return None

        with_nbr = bool(self._config.clustering.record_neighbor_stats)
        fn = self._fetch_cache.get(bucket)
        if fn is None:
            fn = jax.jit(
                lambda state, lc0: packed_readout(state, lc0, bucket, with_nbr)
            )
            self._fetch_cache[bucket] = fn

        self.n_fetch_dispatches += 1
        slab = np.asarray(fn(self._state, jnp.asarray(from_gcol % rc, jnp.int32)))
        # on-demand join tables from the CURRENT state (valid for any cell
        # still in the ring: slots are freed only after their cells clear)
        parent = np.asarray(self._state.slot_parent)
        tabs = np.stack([
            np.asarray(self._state.slot_cid)[parent],
            np.asarray(self._state.slot_rep)[parent],
        ])
        return slab, 0, tabs

    def _fetch_packed(self, from_gcol: int, n: int):
        """Per-field dict of all readout fields for ``n`` columns (the NumPy
        ``get_columns`` path consumes this; the native path reads the slab
        directly via ``_fetch_slab``)."""
        from ..ops.readout import unpack_slab

        got = self._fetch_slab(from_gcol, n)
        if got is not None:
            return unpack_slab(got[0], got[1], n, from_gcol, got[2])

        rc = self._state.ring_cols
        lcols = jnp.asarray((from_gcol + np.arange(n)) % rc, jnp.int32)
        fields = ("x", "y", "z", "distance", "azimuth", "inclination",
                  "cont_az", "finish_az", "stamp_lo", "stamp_hi", "uidx_lo",
                  "uidx_hi", "gcol", "firing_index", "intensity",
                  "ground_label", "debug_label", "nbr_stats")
        out = {
            f: np.asarray(getattr(self._state, f)[:, lcols])
            for f in fields
        }
        out["is_ignored"] = np.asarray(
            self._state.is_ignored[:, lcols]
        ).astype(np.int32)
        sp = np.asarray(self._state.slot_parent)
        cid = np.asarray(self._state.slot_cid)
        rep = np.asarray(self._state.slot_rep)
        slots = np.asarray(self._state.slot[:, lcols])
        res = sp[np.maximum(slots, 0)]
        has = slots >= 0
        out["slot"] = slots
        out["cell_cid"] = np.where(has, cid[res], 0)
        out["cell_rep"] = np.where(has, rep[res], -1)
        return out

    @property
    def state(self) -> RingState:
        return self._state

    @property
    def num_rows(self) -> int:
        return self._num_rows

    @property
    def first_unpublished_global_column_index(self) -> int:
        return self._h_first_unpublished

    def get_columns(
        self,
        from_gcol: int,
        to_gcol: int,
        stage: ProcessingStage = ProcessingStage.CONTINUOUS_CLUSTERING,
    ) -> np.ndarray:
        """Read back a column range as a structured point cloud (analog of
        columnToPointCloud, src/ros/ros_utils.cpp:34-77). Rows are flattened
        column-major like the reference message layout.

        All per-cell fields come back in ONE jitted dispatch and ONE device
        transfer (a packed (n_fields, R, width) i32 slab, bitcast on host):
        a per-field gather costs ~20 device round trips, which dominates
        publish latency on any host and catastrophically so through a
        remote device link."""
        s = self._state
        rc = s.ring_cols
        R = self._num_rows
        gcols = np.arange(from_gcol, to_gcol + 1)
        lcols = gcols % rc
        n = len(gcols)

        if stage == ProcessingStage.CONTINUOUS_CLUSTERING:
            from ..io import native_readout

            if native_readout.available():
                # the cluster-emit path usually assembled an overlapping
                # window of the same slab moments ago (records are contiguous
                # column-major, so a sub-range is a zero-copy slice)
                cc = self._cloud_cache
                if cc is not None and cc[0] <= from_gcol and to_gcol < cc[1]:
                    return cc[2][(from_gcol - cc[0]) * R:(to_gcol + 1 - cc[0]) * R]
                got = self._fetch_slab(from_gcol, n)
                if got is not None:
                    cloud = native_readout.assemble_cloud(
                        got[0], got[2], got[1], n, from_gcol, rc,
                        TWO_PI * self._h_origin_rot,
                    )
                    self._cloud_cache = (from_gcol, to_gcol + 1, cloud)
                    return cloud

        fetched = self._fetch_packed(from_gcol, n)

        def take(arr_name):
            return fetched[arr_name]
        out = np.zeros(R * n, dtype=stage_dtype(stage))
        origin_az = TWO_PI * self._h_origin_rot

        def put(name, vals):
            if name in out.dtype.names:
                out[name] = np.asarray(vals).T.reshape(-1)  # column-major

        put("x", take("x"))
        put("y", take("y"))
        put("z", take("z"))
        put("firing_index", take("firing_index"))
        put("intensity", np.clip(take("intensity"), 0, 255).astype(np.uint8))
        put("globally_unique_point_index", combine_u64(take("uidx_hi"), take("uidx_lo")))
        stamps = combine_u64(take("stamp_hi"), take("stamp_lo"))
        put("time_sec", (stamps // np.uint64(1_000_000_000)).astype(np.uint32))
        put("time_nsec", (stamps % np.uint64(1_000_000_000)).astype(np.uint32))
        put("distance", take("distance"))
        put("azimuth_angle", take("azimuth"))
        put("inclination_angle", take("inclination"))
        put("continuous_azimuth_angle", take("cont_az").astype(np.float64) + origin_az)
        put("global_column_index", take("gcol").astype(np.int64))
        put("local_column_index", np.broadcast_to(lcols[None, :], (R, n)).astype(np.uint16))
        put("row_index", np.broadcast_to(np.arange(R)[:, None], (R, n)).astype(np.uint16))
        put("ground_point_label", take("ground_label").astype(np.uint8))
        put("debug_ground_point_label", take("debug_label").astype(np.uint8))
        put("height_over_ground", np.full((R, n), np.nan, np.float32))
        put("ignore_for_clustering", take("is_ignored").astype(np.uint8))
        put(
            "finished_at_continuous_azimuth_angle",
            take("finish_az").astype(np.float64) + origin_az,
        )
        # profiling counters (populated when clustering.record_neighbor_stats;
        # reference …cpp:725 / ros_utils.cpp:291-295).  num_child_points has
        # no direct analog in the CC formulation; the tested-edge degree
        # stands in.
        nbr = take("nbr_stats")
        put("number_of_visited_neighbors", (nbr & 0xFFFF).astype(np.uint32))
        put("num_child_points", (nbr >> 16).astype(np.uint16))
        # per-cell cluster ids are resolved through the component-slot table
        # on device during the packed fetch (cells store one slot index;
        # slots are freed only after their cells are cleared, so any cell
        # still holding a slot resolves to valid component data)
        put("id", fetched["cell_cid"].astype(np.uint64))
        # tree fields have no analog in the CC formulation; the component's
        # representative cell stands in for the tree root
        rep = np.maximum(fetched["cell_rep"], 0)
        put("tree_id", rep.astype(np.uint64))
        put("tree_root_row_index", (rep // rc).astype(np.uint16))
        put("tree_root_column_index", (rep % rc).astype(np.int64))
        return out

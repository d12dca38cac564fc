"""Multi-chip (GSPMD) correctness: the sharded multi-sensor step must produce
exactly the same clustering as the unsharded per-sensor pipeline.

Runs on the 8 virtual CPU devices configured in conftest.py — a dp x sp
mesh with the ring column axis sharded over sp, mirroring the reference's
multi-sensor deployment semantics (launch/demo_touareg.launch:20-31) where
each sensor runs an independent pipeline.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from continuous_clustering_tpu.config import kitti_config
from continuous_clustering_tpu.models.step import EgoCalibration, pipeline_step
from continuous_clustering_tpu.ops.insertion import FiringBatch
from continuous_clustering_tpu.ops.state import init_state
from continuous_clustering_tpu.parallel.mesh import make_mesh, shard_pytree
from continuous_clustering_tpu.parallel.multi_sensor import (
    make_sharded_step,
    stacked_init,
)
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    make_scene,
    raycast_frame,
)

NUM_ROWS, NUM_COLS = 16, 110
F = 55  # firings per step


def small_cfg():
    cfg = kitti_config()
    return cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=4
        )
    )


def make_batches(seed, n_steps):
    """Distinct scene per sensor: n_steps FiringBatches of F firings."""
    scene = make_scene(num_boxes=3 + seed % 3, seed=seed, spread=14.0)
    firings = []
    for f in range((n_steps * F) // NUM_COLS + 1):
        xyz, _ = raycast_frame(
            scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, seed=seed + f
        )
        firings += frame_to_firings(xyz, frame_index=f)
    batches = []
    for s in range(n_steps):
        chunk = firings[s * F : (s + 1) * F]
        xyz = np.stack([c["xyz"] for c in chunk])
        stamp = np.stack([c["stamp"] for c in chunk])
        uidx = np.stack([c["uidx"] for c in chunk])
        batches.append(
            FiringBatch(
                xyz=jnp.asarray(xyz, jnp.float32),
                pose=jnp.asarray(
                    np.stack([np.eye(4)[:3]] * F), jnp.float32
                ),
                stamp_lo=jnp.asarray(stamp & np.uint64(0xFFFFFFFF), jnp.uint32),
                stamp_hi=jnp.asarray(stamp >> np.uint64(32), jnp.uint32),
                uidx_lo=jnp.asarray(uidx & np.uint64(0xFFFFFFFF), jnp.uint32),
                uidx_hi=jnp.asarray(uidx >> np.uint64(32), jnp.uint32),
                intensity=jnp.asarray(
                    np.stack([c["intensity"] for c in chunk]), jnp.int32
                ),
                valid=jnp.ones(F, bool),
                firing_index=jnp.asarray(
                    [c["firing_index"] for c in chunk], jnp.int32
                ),
            )
        )
    return batches


def calib():
    return EgoCalibration(
        ego_from_sensor=jnp.asarray(np.eye(4)[:3], jnp.float32),
        height_sensor_to_ground=jnp.asarray(-1.7, jnp.float32),
    )


def cell_ids(state, sensor=None):
    """Per-cell cluster ids resolved through the slot table."""
    sel = (lambda a: np.asarray(a)) if sensor is None else (
        lambda a: np.asarray(a)[sensor]
    )
    slots = sel(state.slot)
    sp = sel(state.slot_parent)
    cid = sel(state.slot_cid)
    res = sp[np.maximum(slots, 0)]
    return np.where(slots >= 0, cid[res], 0)


@pytest.mark.parametrize("n_steps", [4])
def test_sharded_step_matches_unsharded(n_steps):
    """≥2 distinct sensor scenes × ≥4 steps: identical partitions, ground
    labels, frontiers, and cluster counts vs the unsharded per-sensor run."""
    cfg = small_cfg()
    mesh = make_mesh(8)  # dp=2, sp=4
    S = mesh.shape["dp"] * 2
    B = F + 32

    per_sensor_batches = [make_batches(seed=7 + s, n_steps=n_steps) for s in range(S)]

    # --- unsharded reference run: one pipeline per sensor -----------------
    ref_states = []
    step = jax.jit(lambda s, b, c: pipeline_step(cfg, s, b, c, batch_cols=B))
    for s in range(S):
        st = init_state(cfg, NUM_ROWS)
        for k in range(n_steps):
            st, info = step(st, per_sensor_batches[s][k], calib())
        ref_states.append(st)

    # --- sharded run ------------------------------------------------------
    state = stacked_init(cfg, NUM_ROWS, S)
    state = shard_pytree(mesh, state)
    run = make_sharded_step(cfg, mesh, batch_cols=B)
    for k in range(n_steps):
        sbatch = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[per_sensor_batches[s][k] for s in range(S)]
        )
        scalib = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[calib() for _ in range(S)]
        )
        state, info = run(state, sbatch, scalib)

    assert not bool(np.any(np.asarray(state.overflow)))
    for s in range(S):
        ref = ref_states[s]
        assert int(np.asarray(state.first_unpublished)[s]) == int(
            np.asarray(ref.first_unpublished)
        ), f"sensor {s} frontier"
        assert int(np.asarray(state.cluster_counter)[s]) == int(
            np.asarray(ref.cluster_counter)
        ), f"sensor {s} cluster count"
        np.testing.assert_array_equal(
            np.asarray(state.ground_label)[s], np.asarray(ref.ground_label),
            err_msg=f"sensor {s} ground labels",
        )
        np.testing.assert_array_equal(
            cell_ids(state, s), cell_ids(ref), err_msg=f"sensor {s} cluster ids"
        )
        np.testing.assert_array_equal(
            np.asarray(state.slot)[s], np.asarray(ref.slot),
            err_msg=f"sensor {s} slots",
        )


def test_sharded_step_is_actually_sharded():
    """The jitted step's output state must be partitioned over the mesh,
    not replicated (a silent replication fallback hides placement bugs)."""
    cfg = small_cfg()
    mesh = make_mesh(8)
    S = mesh.shape["dp"]
    B = F + 32
    state = stacked_init(cfg, NUM_ROWS, S)
    state = shard_pytree(mesh, state)
    batches = make_batches(seed=3, n_steps=1)
    sbatch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[batches[0] for _ in range(S)]
    )
    scalib = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[calib() for _ in range(S)]
    )
    run = make_sharded_step(cfg, mesh, batch_cols=B)
    out, _ = run(state, sbatch, scalib)
    spec = out.distance.sharding.spec
    assert spec == jax.sharding.PartitionSpec("dp", None, "sp"), spec
    # dp-only leaves (slot tables) shard the sensor axis
    assert out.slot_parent.sharding.spec[0] == "dp", out.slot_parent.sharding.spec

"""Checkpoint / resume for the streaming pipeline.

The reference has no persistence ("resume" = reset(),
src/clustering/continuous_clustering.cpp:11-64); for production streaming we
add full state save/restore: the device ring state plus the host-side
frontier mirrors, as a single .npz.  Useful for fault recovery and for
bit-reproducible replay from a mid-stream point.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.state import RingState

def save_state(pipe, path) -> None:
    """Snapshot a ContinuousClustering pipeline to <path>.npz."""
    pipe.flush()
    state = pipe.state
    arrays = {}
    for f in dataclasses.fields(state):
        arrays[f.name] = np.asarray(getattr(state, f.name))
    arrays["_h_mirrors"] = np.asarray(
        [
            pipe._h_first_unfinished,
            pipe._h_first_unpublished,
            pipe._h_cluster_counter,
            pipe._h_origin_rot,
        ],
        np.int64,
    )
    arrays["_num_rows"] = np.asarray(pipe.num_rows)
    np.savez_compressed(path, **arrays)


def load_state(pipe, path) -> None:
    """Restore a snapshot into a pipeline (same config/batch size)."""
    data = np.load(path)
    num_rows = int(data["_num_rows"])
    pipe.reset(num_rows)
    # the native host-insertion engine's ring is not serialized; resumed
    # pipelines use the (equivalent) device insertion path
    pipe._host_ins = None
    kwargs = {}
    for f in dataclasses.fields(pipe.state):
        if f.name not in data:  # fields added after the snapshot was taken
            kwargs[f.name] = getattr(pipe.state, f.name)
            continue
        kwargs[f.name] = jnp.asarray(data[f.name])
    pipe._state = RingState(**kwargs)
    h = data["_h_mirrors"]
    pipe._h_first_unfinished = int(h[0])
    pipe._h_first_unpublished = int(h[1])
    pipe._h_cluster_counter = int(h[2])
    pipe._h_origin_rot = int(h[3])

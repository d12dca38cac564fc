"""Multi-sensor data-parallel + column-sharded pipeline execution.

Maps the reference's multi-sensor deployment (three independent clustering
nodes, launch/demo_touareg.launch) onto a device mesh: sensor streams shard
over the ``dp`` axis, each stream's ring buffer shards its column axis over
``sp``.  The full fused step (insertion scan, ground segmentation, CC,
completion) is vmapped over the sensor axis and partitioned by GSPMD.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.step import EgoCalibration, pipeline_step
from ..ops.insertion import FiringBatch
from ..ops.state import RingState, init_state
from .mesh import state_sharding


def stacked_init(config: Config, num_rows: int, n_sensors: int) -> RingState:
    import jax.numpy as jnp

    one = init_state(config, num_rows)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_sensors,) + x.shape).copy(), one
    )


def make_sharded_step(config: Config, mesh: Mesh, batch_cols: int):
    """Jitted multi-sensor step: (stacked_state, stacked_batch, stacked_calib)
    -> (stacked_state, stacked_info), partitioned over the mesh.

    Shardings are passed explicitly to ``jax.jit`` — placement never falls
    back to replication if an input arrives uncommitted.
    """
    step = partial(pipeline_step, config, batch_cols=batch_cols)
    vstep = jax.vmap(step)

    state_shard = state_sharding(mesh, stacked=True)

    def batch_shard(leaf):
        return NamedSharding(mesh, P("dp", *([None] * (np.ndim(leaf) - 1))))

    def in_batch_tree(tree):
        return jax.tree_util.tree_map(batch_shard, tree)

    jit_step = None

    def run(state: RingState, batch: FiringBatch, calib: EgoCalibration):
        nonlocal jit_step
        if jit_step is None:
            jit_step = jax.jit(
                vstep,
                in_shardings=(
                    jax.tree_util.tree_map(state_shard, state),
                    in_batch_tree(batch),
                    in_batch_tree(calib),
                ),
                out_shardings=(
                    jax.tree_util.tree_map(state_shard, state),
                    None,
                ),
                donate_argnums=(0,),
            )
        return jit_step(state, batch, calib)

    return run

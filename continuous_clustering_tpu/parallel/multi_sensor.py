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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.step import EgoCalibration, pipeline_step
from ..ops.insertion import FiringBatch
from ..ops.state import RingState, init_state
from .mesh import state_sharding


def stacked_init(config: Config, num_rows: int, n_sensors: int) -> RingState:
    one = init_state(config, num_rows)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_sensors,) + x.shape).copy(), one
    )


def make_sharded_step(config: Config, mesh: Mesh, batch_cols: int):
    """Jitted multi-sensor step: (stacked_state, stacked_batch, stacked_calib)
    -> (stacked_state, stacked_info), partitioned over the mesh."""
    step = partial(pipeline_step, config, batch_cols=batch_cols)
    vstep = jax.vmap(step)

    state_shard = state_sharding(mesh, stacked=True)

    def in_shardings(tree):
        return jax.tree_util.tree_map(lambda x: state_shard(x), tree)

    dp_only = NamedSharding(mesh, P("dp"))

    def batch_shard(leaf):
        return NamedSharding(mesh, P("dp", *([None] * (np.ndim(leaf) - 1))))

    jit_step = jax.jit(
        vstep,
        donate_argnums=(0,),
    )

    def run(state: RingState, batch: FiringBatch, calib: EgoCalibration):
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, state_shard(x))
            if not _is_committed(x) else x,
            state,
        )
        batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, batch_shard(x)), batch)
        calib = jax.tree_util.tree_map(lambda x: jax.device_put(x, batch_shard(x)), calib)
        return jit_step(state, batch, calib)

    return run


def _is_committed(x) -> bool:
    return isinstance(x, jax.Array) and getattr(x, "committed", False)

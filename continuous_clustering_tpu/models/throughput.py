"""Device-resident multi-batch execution for maximum throughput.

For offline/bulk processing (and benchmarking) the per-batch host round
trip is unnecessary: this runner stacks many firing batches and executes
the full pipeline step for all of them inside ONE jitted ``lax.scan`` —
a single dispatch per stack, state resident on device throughout.
Callbacks are not available in this mode; results are read from the ring
state afterwards (same as the reference's --evaluate-fast which skips
publishers, src/tools/kitti_demo.cpp:474-482).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.insertion import FiringBatch
from ..ops.state import RingState
from .step import EgoCalibration, pipeline_step


def make_scan_runner(config: Config, batch_cols: int):
    """Returns jit(state, stacked_batches, calib) -> (state, stacked_infos).

    ``stacked_batches`` is a FiringBatch whose leaves carry a leading
    stack axis (n_steps, ...).
    """

    step = partial(pipeline_step, config, batch_cols=batch_cols)

    def run(state: RingState, batches: FiringBatch, calib: EgoCalibration):
        def body(s, b):
            s2, info = step(s, b, calib)
            return s2, info

        return jax.lax.scan(body, state, batches)

    return jax.jit(run, donate_argnums=(0,))


def stack_batches(batches) -> FiringBatch:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def make_block_scan_runner(config: Config, batch_cols: int, profile_cut: str = "",
                           slab_cols: int = 0, slab_head: int = 0):
    """Scan runner over host-inserted dense column blocks (+ seg poses):
    the insertion scan disappears from the device program entirely.

    ``slab_cols``/``slab_head`` optionally include the publish-slab readout
    in the scanned step (what the streaming path pays every step); the
    default 0 measures the pure compute rate."""
    from .step import pipeline_step_block

    def run(state: RingState, blocks, seg_poses, hsg):
        def body(s, xs):
            b, sp = xs
            s2, info = pipeline_step_block(
                config, s, b, sp, hsg, batch_cols, profile_cut=profile_cut,
                slab_cols=slab_cols, slab_head=slab_head,
            )
            return s2, info

        return jax.lax.scan(body, state, (blocks, seg_poses))

    return jax.jit(run, donate_argnums=(0,))

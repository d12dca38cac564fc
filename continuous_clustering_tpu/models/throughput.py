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


# one revolution is exactly 2*pi of continuous azimuth; f32 literal so the
# periodic runner's k*TWO_PI offset matches the host engine's unwrap step
_TWO_PI = 6.2831853071795864769


def make_periodic_block_scan_runner(config: Config, batch_cols: int,
                                    num_cols: int, n_steps: int,
                                    slab_cols: int = 0, slab_head: int = 0,
                                    reduce_infos: bool = True,
                                    rebase_every: int = 64):
    """Benchmark runner: scan ``n_steps`` pipeline steps over a PERIODIC
    one-revolution block stack resident on device.

    The throughput scenes feed the identical firing set every revolution, so
    revolution 0's host-inserted blocks replayed with per-revolution offsets
    — global columns (and the frontier scalars derived from them) advanced
    by ``k * num_cols``, continuous azimuth by ``k * 2*pi`` — form a valid,
    self-consistent stream carrying the production scene's geometry every
    revolution.  (It is not bit-identical to really re-inserting the
    firings: the host engine's f32 azimuth accumulation jitters column
    boundaries by ±1 between revolutions.  The work profile is what a
    throughput bench needs, and ``tests/test_throughput_runner.py`` pins
    the semantic equivalence: steady per-revolution cluster production,
    frontier advance, convergence.)  Applying the offsets inside the scan
    body (elementwise on one block, ~negligible next to a pipeline step)
    lets ONE dispatch execute an arbitrary number of revolutions with a
    single device-resident revolution of data — no per-revolution
    host->device staging and no per-revolution dispatch, so the measured
    rate tracks the device, not the link (bench.py measures the
    steady-state rate as the difference between two scan lengths,
    cancelling the per-call fixed cost exactly).

    The scanned step includes the publish-slab readout when
    ``slab_cols``/``slab_head`` are set (what the streaming path pays every
    step); per-step infos are reduced to one checksum so the slab is
    produced but not stacked (see ``make_block_scan_runner`` reduce_infos).

    Returns jit(state, blocks0, seg_poses0, hsg, k0) -> (state, checksums)
    where ``blocks0``/``seg_poses0`` carry one revolution (per_rev leading
    dim) and ``k0`` is the global step index the scan starts at (pass the
    running total so consecutive calls continue one coherent stream).

    Azimuth rebase: production keeps f32 azimuths small by shifting the
    origin every few hundred rotations (``ops.state.rebase_azimuth``); the
    scan body applies the same shift on device every ``rebase_every``
    revolutions (a lax.cond taken once per ``rebase_every`` revs), so a
    soak of ANY length stays inside f32 precision.  The replayed block's
    azimuth offset is then ``(rev - rebases_applied) * 2*pi`` — its
    azimuths stay expressed relative to the state's CURRENT origin.
    ``rebase_every=0`` disables (the pre-round-5 behavior, valid to ~300
    revolutions only; tests/test_throughput_runner.py pins the rebased
    and unrebased streams produce identical results inside that window)."""
    from ..ops.state import rebase_azimuth
    from .step import pipeline_step_block

    def run(state: RingState, blocks0, seg_poses0, hsg, k0):
        per_rev = jax.tree_util.tree_leaves(blocks0)[0].shape[0]
        # The captured blocks' azimuths are relative to the CAPTURE-time
        # origin.  Rebases apply deterministically — by revolution rev the
        # scan has shifted the origin by rebase_every*(rev // rebase_every)
        # rotations — so the capture origin is recoverable from (state, k0)
        # even on continuation calls (k0 > 0, same rebase_every).
        if rebase_every:
            rev0 = k0 // per_rev
            capture_origin = state.origin_rot - rebase_every * (
                rev0 // rebase_every
            )

        def body(s, i):
            k = k0 + i
            rev = k // per_rev
            j = k % per_rev
            if rebase_every:
                # once a new rebase_every boundary is crossed, shift every
                # stored azimuth down by rebase_every whole rotations
                # (exactly production's rebase) so cont_az stays below
                # ~(rebase_every + live window)*2*pi
                needed = rebase_every * (rev // rebase_every)
                applied = s.origin_rot - capture_origin
                s = jax.lax.cond(
                    applied < needed,
                    lambda st: rebase_azimuth(st, rebase_every)[0],
                    lambda st: st,
                    s,
                )
                az_rev = (rev - needed).astype(jnp.float32)
            else:
                az_rev = rev.astype(jnp.float32)
            pick = lambda a: jax.lax.dynamic_index_in_dim(
                a, j, 0, keepdims=False
            )
            b = jax.tree_util.tree_map(pick, blocks0)
            sp = jax.tree_util.tree_map(pick, seg_poses0)
            off = rev * num_cols
            # column-index scalars shift by off; -1 sentinels stay put
            shift = lambda v: jnp.where(v >= 0, v + off, v)
            b = b._replace(
                gcol0=b.gcol0 + off,
                cont_az=b.cont_az + az_rev * jnp.float32(_TWO_PI),
                prev_rearmost=shift(b.prev_rearmost),
                prev_foremost=shift(b.prev_foremost),
                first_unfinished=shift(b.first_unfinished),
                # the frontier-init scalar is consumed once at stream start;
                # replayed revolutions must not re-arm it
                first_unpublished_init=jnp.where(
                    rev == 0, b.first_unpublished_init, jnp.int32(-1)
                ),
            )
            s2, info = pipeline_step_block(
                config, s, b, sp, hsg, batch_cols,
                slab_cols=slab_cols, slab_head=slab_head,
            )
            if reduce_infos:
                chk = (
                    jnp.sum(info.meta)
                    + jnp.sum(info.slab)
                    + jnp.sum(info.slab_ext)
                )
                return s2, chk
            return s2, info

        return jax.lax.scan(
            body, state, jnp.arange(n_steps, dtype=jnp.int32)
        )

    return jax.jit(run, donate_argnums=(0,))


def make_block_scan_runner(config: Config, batch_cols: int, profile_cut: str = "",
                           slab_cols: int = 0, slab_head: int = 0,
                           reduce_infos: bool = False):
    """Scan runner over host-inserted dense column blocks (+ seg poses):
    the insertion scan disappears from the device program entirely.

    ``slab_cols``/``slab_head`` optionally include the publish-slab readout
    in the scanned step (what the streaming path pays every step); the
    default 0 measures the pure compute rate.

    ``reduce_infos`` replaces the stacked per-step ``StepInfo`` output with
    one i32 checksum per step (sum of meta + slab planes, wrapping).  The
    checksum consumes every info field so XLA cannot dead-code the slab
    production, while the scan's stacked output stays (n_steps,) instead of
    n_steps full slabs — this is what lets a long benchmark scan include the
    publish readout the streaming path pays without materializing hundreds
    of slab copies."""
    from .step import pipeline_step_block

    def run(state: RingState, blocks, seg_poses, hsg):
        def body(s, xs):
            b, sp = xs
            s2, info = pipeline_step_block(
                config, s, b, sp, hsg, batch_cols, profile_cut=profile_cut,
                slab_cols=slab_cols, slab_head=slab_head,
            )
            if reduce_infos:
                chk = (
                    jnp.sum(info.meta)
                    + jnp.sum(info.slab)
                    + jnp.sum(info.slab_ext)
                )
                return s2, chk
            return s2, info

        return jax.lax.scan(body, state, (blocks, seg_poses))

    return jax.jit(run, donate_argnums=(0,))

"""Halo-exchange column-sharded execution (the sp axis, built).

ARCHITECTURE.md round-3 measured what GSPMD does with the sp axis: the
fused step compiles to ~104 all-to-alls per step (one per ring-array
window read), each small — collective-LAUNCH-bound through anything
slower than ICI.  This module is the spec'd shard_map replacement: the
ring stays column-sharded, and the step's entire irregular communication
collapses to ONE collective per step.

Design (deviates from the ARCHITECTURE spec's neighbor-ppermute in one
way, for a reason): every shard must apply the identical update to the
REPLICATED component table (K slots) and frontier scalars — the window
labels feed the K-table fold, so every shard needs the whole association
window, not just its neighbor's H-column halo.  A single masked
``lax.psum`` over the sp axis assembles the window on every shard (each
shard contributes the window columns it owns, zeros elsewhere; exactly
one shard owns each column).  Costs one collective of
(n_fields, R, H+B) i32 — ~2.7 MB at bench shapes — versus the spec's one
ppermute plus a broadcast it would still have needed for the table
update.  Everything else is local:

* the pipeline step (ingest, segmentation, association, completion) runs
  REPLICATED on a window-sized scratch ring (width WS = H+B+pad, column
  g stored at slot g % WS — the same ring arithmetic the ops already
  use, so they run unchanged with ``ring_capacity``/``skip_clear``
  supplying real-ring semantics for the overflow check and the clear);
* each shard writes back only the batch columns it owns (masked select);
* the bounded chunk clear applies per shard with the identical
  gcol-gated rule as ``ops.state.clear_columns_chunk``.

Window-scale compute is a few MB; replicating it costs less than any
scheme that round-trips per-shard results.  What sp buys is RING MEMORY
(multi-revolution rings / long live windows sharded across chips) with
per-step communication independent of ring size: one ~MB psum instead of
104 all-to-alls (scripts/shard_hlo_inventory.py banks both counts).

Exactness: tests/test_halo.py pins sharded == unsharded cell-for-cell
(ring content, K-table, scalars, per-step meta) on the 8-device CPU mesh.
Reference anchor: the multi-sensor deployment this extends is
launch/demo_touareg.launch:20-31 (the reference has no multi-node ring).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.step import SegPoses, pipeline_step_block
from ..ops.ingest import ColumnBlock
from ..ops.state import CELL_FIELDS, CLEAR_VALUES, RingState


def compat_shard_map(body, mesh, in_specs, out_specs):
    """shard_map across jax versions: jax.shard_map(check_vma=) in >=0.8,
    jax.experimental.shard_map.shard_map(check_rep=) before.  Replication
    checking is off either way: the body provably produces replicated
    non-ring outputs (they descend from psum results and replicated
    inputs), but the static checker cannot see through the dataclass
    reconstruction."""
    try:
        from jax import shard_map as sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as sm
    try:
        return sm(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except TypeError:
        return sm(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def _to_i32(arr: jax.Array) -> jax.Array:
    if arr.dtype == jnp.int32:
        return arr
    if arr.dtype == jnp.bool_:
        return arr.astype(jnp.int32)
    return jax.lax.bitcast_convert_type(arr, jnp.int32)


def _from_i32(arr: jax.Array, dtype) -> jax.Array:
    if dtype == jnp.int32:
        return arr
    if dtype == jnp.bool_:
        return arr.astype(jnp.bool_)
    return jax.lax.bitcast_convert_type(arr, dtype)


def _state_specs(state: RingState, dp: bool):
    """Spec tree: ring arrays shard columns over sp, everything else is
    replicated (over sp; sharded over dp when a sensor axis leads)."""
    lead = ("dp",) if dp else ()
    nlead = len(lead)

    def spec(leaf):
        if np.ndim(leaf) == nlead + 2:   # (S?, R, rc)
            return P(*lead, None, "sp")
        return P(*lead)

    return jax.tree_util.tree_map(spec, state)


def _repl_specs(tree, dp: bool):
    lead = ("dp",) if dp else ()
    return jax.tree_util.tree_map(lambda _: P(*lead), tree)


def halo_step_local(config: Config, state: RingState, block: ColumnBlock,
                    segp: SegPoses, hsg, batch_cols: int, nsp: int,
                    ws_pad: int = 8, slab_cols: int = 0, slab_head: int = 0):
    """One pipeline step on a column-sharded ring, from INSIDE shard_map.

    ``state``'s ring arrays are the local (R, rc/nsp) shard; all other
    fields are replicated.  Returns (new local state, StepInfo) — the
    StepInfo and the state's non-ring fields are replicated (identical on
    every shard by construction).

    ``slab_cols``/``slab_head`` produce the publish slab exactly like the
    single-device step: a SECOND masked psum assembles the post-step slab
    window [fu_old, fu_old + slab_cols) on every shard and the unchanged
    packed readout runs on it; the component-slot join tables ride the
    meta vector as usual.  Two collectives per step with the slab on, one
    without (vs GSPMD's 243).
    """
    cl = config.clustering
    H = cl.max_steps_in_row
    B = batch_cols
    WS = H + B + ws_pad
    p = jax.lax.axis_index("sp")
    w = state.x.shape[1]
    rc = w * nsp

    # ---- 1. window assembly: ONE masked psum over sp -----------------
    # scratch slot t holds global column g_t (g_t == t mod WS, covering
    # [win0, win0 + WS): the H-column halo, the B batch columns, the pad)
    win0 = block.gcol0 - H
    t = jnp.arange(WS, dtype=jnp.int32)
    g_t = win0 + ((t - win0) % WS)
    l_t = g_t % rc
    own = (l_t >= p * w) & (l_t < (p + 1) * w)
    li = jnp.clip(l_t - p * w, 0, w - 1)
    loc = jnp.stack([_to_i32(getattr(state, n)) for n in CELL_FIELDS])
    contrib = jnp.where(own[None, None, :], loc[:, :, li], 0)
    win = jax.lax.psum(contrib, "sp")            # (F, R, WS), replicated

    win_fields = {
        n: _from_i32(win[i], getattr(state, n).dtype)
        for i, n in enumerate(CELL_FIELDS)
    }
    win_state = dataclasses.replace(state, **win_fields)

    # ---- 2. the unchanged step, replicated at window scale -----------
    ring_start_old = state.ring_start
    win2, info = pipeline_step_block(
        config, win_state, block, segp, hsg, B,
        ring_capacity=rc, skip_clear=True,
    )

    # representative ids of slots allocated THIS step are in scratch ring
    # coordinates (rep = row * WS + lcol_s); translate to real-ring
    # coordinates so published tree ids match the unsharded path
    new_alloc = win2.slot_live & ~state.slot_live
    rep = win2.slot_rep
    lcol_s = rep % WS
    g_rep = win0 + ((lcol_s - win0) % WS)
    rep_real = (rep // WS) * rc + (g_rep % rc)
    win2 = dataclasses.replace(
        win2, slot_rep=jnp.where(new_alloc & (rep >= 0), rep_real, rep)
    )

    # ---- 3. write back the batch columns this shard owns -------------
    il = jnp.arange(w, dtype=jnp.int32)
    gl = p * w + il                               # ring lcol per local col
    boff = (gl - (block.gcol0 % rc)) % rc         # offset into the batch
    is_batch = boff < info.n_cols
    sb = (block.gcol0 + boff) % WS                # scratch slot holding it
    win2_stack = jnp.stack([_to_i32(getattr(win2, n)) for n in CELL_FIELDS])
    loc2 = jnp.where(is_batch[None, None, :], win2_stack[:, :, sb], loc)

    # ---- 4. the bounded chunk clear, applied shard-locally -----------
    # identical semantics to ops.state.clear_columns_chunk: columns
    # [ring_start_old, win2.ring_start) wipe to CLEAR_VALUES, gated on the
    # stored gcol so fresher (legally overwritten) cells survive
    cs1 = win2.ring_start
    coff = (gl - (jnp.maximum(ring_start_old, 0) % rc)) % rc
    expected = ring_start_old + coff
    gcol_cur = loc2[CELL_FIELDS.index("gcol")]
    cmask = (coff < (cs1 - ring_start_old))[None, :] & (
        gcol_cur <= expected[None, :]
    )
    out_fields = {}
    for i, n in enumerate(CELL_FIELDS):
        arr = _from_i32(loc2[i], getattr(state, n).dtype)
        arr = jnp.where(cmask, jnp.asarray(CLEAR_VALUES[n], arr.dtype), arr)
        out_fields[n] = arr

    if slab_cols:
        # assemble the POST-step slab window on every shard (masked psum of
        # the written+cleared local fields) and run the unchanged packed
        # readout on a scratch ring, exactly like models.step._publish_slab
        from ..models.step import META_FU_OLD, StepInfo, _publish_slab
        from ..ops.readout import join_tables

        WS2 = slab_cols + ws_pad
        fu_old = info.meta[META_FU_OLD]
        s0 = jnp.maximum(fu_old, 0)
        t2 = jnp.arange(WS2, dtype=jnp.int32)
        g2 = s0 + ((t2 - s0) % WS2)
        l2 = g2 % rc
        own2 = (l2 >= p * w) & (l2 < (p + 1) * w)
        li2 = jnp.clip(l2 - p * w, 0, w - 1)
        loc3 = jnp.stack([_to_i32(out_fields[n]) for n in CELL_FIELDS])
        sw = jax.lax.psum(
            jnp.where(own2[None, None, :], loc3[:, :, li2], 0), "sp"
        )
        slab_state = dataclasses.replace(win2, **{
            n: _from_i32(sw[i], getattr(state, n).dtype)
            for i, n in enumerate(CELL_FIELDS)
        })
        slab, slab_ext = _publish_slab(
            config, slab_state, fu_old, slab_cols, slab_head
        )
        info = StepInfo(
            meta=jnp.concatenate([info.meta, join_tables(win2).reshape(-1)]),
            slab=slab, slab_ext=slab_ext,
        )

    return dataclasses.replace(win2, **out_fields), info


def make_halo_sharded_step(config: Config, mesh: Mesh, batch_cols: int,
                           stacked: bool = False,
                           slab_cols: int = 0, slab_head: int = 0):
    """Jitted column-sharded step via shard_map: ONE collective per step
    (two with the publish slab on).

    (state, block, seg_poses, hsg) -> (state, info), with ring arrays
    placed P([dp,] None, 'sp') and everything else replicated over sp.
    ``stacked`` adds a leading sensor axis sharded over dp (the
    multi-sensor deployment), vmapping the per-stream body.
    """
    nsp = mesh.shape["sp"]
    body = partial(
        halo_step_local, config, batch_cols=batch_cols, nsp=nsp,
        slab_cols=slab_cols, slab_head=slab_head,
    )
    if stacked:
        body = jax.vmap(body)

    jit_step = None

    def run(state: RingState, block: ColumnBlock, segp: SegPoses, hsg):
        nonlocal jit_step
        if jit_step is None:
            sm = compat_shard_map(
                body, mesh,
                in_specs=(
                    _state_specs(state, stacked),
                    _repl_specs(block, stacked),
                    _repl_specs(segp, stacked),
                    _repl_specs(hsg, stacked),
                ),
                out_specs=(
                    _state_specs(state, stacked),
                    _repl_specs_info(stacked),
                ),
            )
            jit_step = jax.jit(sm, donate_argnums=(0,))
        return jit_step(state, block, segp, hsg)

    return run


def _repl_specs_info(stacked: bool):
    from ..models.step import StepInfo

    lead = ("dp",) if stacked else ()
    return StepInfo(meta=P(*lead), slab=P(*lead), slab_ext=P(*lead))


def place_state(mesh: Mesh, state: RingState, stacked: bool = False):
    """Device_put a host RingState onto the mesh with halo placement."""
    specs = _state_specs(state, stacked)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )

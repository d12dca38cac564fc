"""Stages C/D/E — association, cluster combination, and completion on device.

The reference grows point trees per column and links them into an undirected
graph, then BFS-finishes connected components when the sensor has rotated
past them (``src/clustering/continuous_clustering.cpp:638-974``).  On TPU we
re-derive the same *partition* as connected components over the tested-edge
graph:

* **edge set** — for every non-ignored point ``p`` the reference walks a
  field-of-view wedge: up to ``min(ceil(asin(max_d/dist)/col_width),
  max_steps_in_row)`` columns to the left, ``±max_steps_in_column`` rows with
  an early *break* at the first row whose inclination differs from ``p`` by
  more than ``asin(max_d/dist)`` (…cpp:698-771).  We precompute, per point and
  column offset, the reachable row range as an inclusive prefix-AND and pack
  it into bitmasks; an edge additionally requires the euclidean gate
  ``|Δxyz|² < max_d²`` (…cpp:638-641).  With
  ``stop_after_association_enabled=false`` this is exactly the reference's
  tested-edge set; with the stop heuristic on, the reference tests a subset,
  which only *coarsens* our components in rare tie cases (measured ≥98%
  agreement in tests).

* **connected components** — iterative min-label diffusion over the window
  (halo of ``max_steps_in_row`` columns + the new batch) with pointer-jumping
  compression, then a FastSV-style union of window components into a compact
  K-slot component table (``state.slot_*``) through the slotted halo cells.
  Cells store one slot index; all per-component aggregates (finish azimuth,
  column span, count) are maintained incrementally at slot granularity, so
  completion is K-sized elementwise work instead of window-scale
  segment-reduces.

* **completion** (…cpp:837-974) — per resolved root: segment-max of
  ``finish_az = cont_az + asin(max_d/dist)`` (the reference's
  ``finished_at_continuous_azimuth_angle`` accumulation, …cpp:669-671,818),
  segment-min/max of member columns (full-rotation force-finish, …cpp:912-919)
  and member count (>5 gate, …cpp:936).  A component is finished when its
  max finish azimuth is not greater than the minimum continuous azimuth of
  the newest column (…cpp:884-885).  Completion runs once per batch with the
  newest column's frontier azimuth — the set of finished clusters matches the
  reference's per-column checks because finish azimuths are monotone.

Cluster ids are assigned sequentially to finished components with more than
5 points; member cells of finished components are frozen so later points can
no longer associate with them (…cpp:656-659,687-690).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from .state import RingState, clear_columns_chunk, ring_read, ring_write

I32_MAX = jnp.iinfo(jnp.int32).max


def _use_cm_labels() -> bool:
    """Column-major window label ids (CCT_LABEL=cm, the default).

    Labels are per-component minima of the cell ids, so the id ENUMERATION
    is a free choice.  Column-major ids (``c * R + r``) make the winning
    representative the member with the smallest window COLUMN, which has two
    payoffs in the linkage block (the measured hot spot, docs/ROUND3_NOTES):

    * a brand-new component's ``gmin`` (minimum member global column — the
      reference's ``minimum_required_global_column_index`` source,
      …cpp:943-959) is derivable from its representative's global column at
      K scale, deleting one R*B-lane scatter segment: batch cells can never
      lower an EXISTING slot's gmin (all previous members have strictly
      smaller global columns), so per-cell gmin contributions only ever
      mattered for new slots;
    * in the column-major value space the batch region is the contiguous id
      tail ``[H*R:)``, so per-label scatter sources slice to R*B lanes.

    ``rm`` (row-major, the original convention) is kept for on-chip A/B.
    """
    import os

    return os.environ.get("CCT_LABEL", "cm") != "rm"


def _jump_take(Lflat: jax.Array, f: jax.Array, R: int, WCOL: int) -> jax.Array:
    """One pointer-jump hop: label at the cell whose id is ``f``.

    ``Lflat`` is the row-major flattening of the (R, WCOL) label grid; under
    column-major ids the cell of id v sits at row-major position
    ``(v % R) * WCOL + v // R``."""
    if _use_cm_labels():
        return jnp.take(Lflat, (f % R) * WCOL + f // R)
    return jnp.take(Lflat, f)


def _hscan_conn(config: Config, bits: jax.Array, R: int, H: int) -> jax.Array:
    """Per-cell horizontal connectivity: conn[r, wc] = a (dr=0, dc=1) edge
    exists between window columns wc-1 and wc (halo columns carry no bits
    and start fresh runs; the halo→batch link is applied by the sweep)."""
    V = config.clustering.max_steps_in_column
    B = bits.shape[-1]
    conn_b = ((bits[1, V // 32] >> jnp.int32(V % 32)) & 1) == 1  # (R, B)
    return jnp.concatenate([jnp.zeros((R, H), bool), conn_b], axis=1)


def _hscan_min(L: jax.Array, conn: jax.Array) -> jax.Array:
    """Segmented min along rows: propagate labels through runs of directly
    horizontally-connected (dr=0, dc=1 edge) same-row columns, both
    directions, in one log-depth associative scan each.

    Pure extra min-propagation along real edges — the monotone min-label
    fixpoint is unchanged — but a wide flat component (near-field wall or
    vehicle spanning hundreds of batch columns) collapses in O(1) rounds
    instead of O(width / sweep reach): the cc_rounds meta lane showed
    12-round spikes on exactly such steps (docs/ROUND4_NOTES.md)."""

    def seg(Lx, start):
        def op(a, b):
            sa, va = a
            sb, vb = b
            return sa | sb, jnp.where(sb, vb, jnp.minimum(va, vb))

        _, v = jax.lax.associative_scan(op, (start, Lx), axis=1)
        return v

    fwd = seg(L, ~conn)
    # reverse: the link between c and c+1 is conn[c+1] (wrap lands on the
    # scan's first element, whose start flag is irrelevant)
    start_b = ~jnp.roll(conn, -1, axis=1)
    bwd = jnp.flip(seg(jnp.flip(L, 1), jnp.flip(start_b, 1)), 1)
    return jnp.minimum(fwd, bwd)


def _vscan_conn(config: Config, bits: jax.Array, R: int, H: int) -> jax.Array:
    """Per-cell vertical connectivity: conn[r, wc] = a (dr=-1, dc=0) edge
    exists between window rows r-1 and r at column wc.  The dc=0 plane
    carries only up (dr<0) edges (the same-column wedge walk goes up only,
    `_edge_bits` down_edge/dr0_edge masking), so bit V-1 at (r, b) IS the
    (r-1, r) link; halo columns carry no bits and never join runs."""
    V = config.clustering.max_steps_in_column
    dr_idx = V - 1  # dr = -1
    conn_b = ((bits[0, dr_idx // 32] >> jnp.int32(dr_idx % 32)) & 1) == 1
    # row 0 can never link upward (wedge walk is image-bounded); enforce it
    # here because _vscan_min's backward scan wraps row 0 to the last row
    conn_b = conn_b.at[0].set(False)
    return jnp.concatenate([jnp.zeros((R, H), bool), conn_b], axis=1)


def _vscan_min(L: jax.Array, conn: jax.Array) -> jax.Array:
    """Segmented min along columns: propagate labels through runs of
    directly vertically-connected (dr=-1, dc=0 edge) same-column rows, both
    directions, in one log-depth associative scan each (log2(R) ~ 6 steps).

    The column-axis counterpart of `_hscan_min`: pure extra exact
    min-propagation along real edges, targeting tall components (poles,
    walls, trunks) whose labels otherwise climb max_steps_in_column rows
    per sweep."""

    def seg(Lx, start):
        def op(a, b):
            sa, va = a
            sb, vb = b
            return sa | sb, jnp.where(sb, vb, jnp.minimum(va, vb))

        _, v = jax.lax.associative_scan(op, (start, Lx), axis=0)
        return v

    fwd = seg(L, ~conn)
    start_b = ~jnp.roll(conn, -1, axis=0)
    bwd = jnp.flip(seg(jnp.flip(L, 0), jnp.flip(start_b, 0)), 0)
    return jnp.minimum(fwd, bwd)


def _hscan_after() -> int:
    """CCT_CC_HSCAN: -1 = off; N >= 0 = run the row scan after every sweep
    from round N on (while still unconverged).  Default ON from round 0:
    two valid-method TPU batteries measured the scan lifting every bench
    scene (min-over-scenes 5.48M -> 6.2M+ pts/s with the new jump
    defaults; docs/ROUND4_NOTES.md)."""
    import os as _os

    return int(_os.environ.get("CCT_CC_HSCAN", "0"))


def _vscan_after() -> int:
    """CCT_CC_VSCAN: -1 = off; N >= 0 = run the column scan after every
    sweep from round N on.  Default STAGGERED to round 1 (r5b chip battery
    docs/battery_r5b_tpu.jsonl: on top of the row scan + CCT_CC_JUMP=0,
    vs@1 beats vs@0 on every scene same-session — clutter 6.83M vs 6.42M,
    min-over-scenes 6.64M vs 6.42M — because the easy round-0 pass skips
    the scan's cost while the hard rounds still collapse columns; the ROW
    scan must stay at round 0, hs@1 loses, docs/ROUND5_NOTES.md)."""
    import os as _os

    return int(_os.environ.get("CCT_CC_VSCAN", "1"))


def _hscan_post(config: Config, bits: jax.Array, R: int, H: int):
    """(post_fn, post_after) for cc_converge / the Pallas driver, or
    (None, 0) when all post-sweep scans are off.  ``post_fn(L, it)``
    combines the row scan (CCT_CC_HSCAN) and column scan (CCT_CC_VSCAN),
    each gated on its OWN round threshold so A/B batteries sweeping the
    thresholds keep per-knob semantics; ``post_after`` is the earliest
    threshold (callers may skip the whole call before that round)."""
    hs = _hscan_after() if H >= 1 else -1  # no dc=1 plane when wedge is 0 wide
    vs = _vscan_after()
    if config.clustering.max_steps_in_column < 1:
        vs = -1  # no dr=-1 bit when the wedge is 0 tall
    entries = []
    if hs >= 0:
        conn = _hscan_conn(config, bits, R, H)
        entries.append((hs, lambda L: _hscan_min(L, conn)))
    if vs >= 0:
        vconn = _vscan_conn(config, bits, R, H)
        entries.append((vs, lambda L: _vscan_min(L, vconn)))
    if not entries:
        return None, 0
    post_after = min(th for th, _ in entries)

    def post(L, it):
        for th, f in entries:
            if th == post_after:
                # the caller's outer gate already ensures it >= post_after
                L = f(L)
            else:
                L = jax.lax.cond(it >= th, f, lambda l: l, L)
        return L

    return post, post_after


class AssocInputs(NamedTuple):
    gcol0: jax.Array   # () i32 first new column
    n_cols: jax.Array  # () i32 number of valid new columns (<= B)


def _window_arrays(config: Config, state: RingState, gcol0: jax.Array, B: int):
    """Gather the halo+batch window (R, W+B) from the ring."""
    H = config.clustering.max_steps_in_row
    rc = state.ring_cols
    wcols = gcol0 - H + jnp.arange(H + B, dtype=jnp.int32)  # global col per window slot
    lcols = wcols % rc
    return wcols, lcols


def _edge_bits(config: Config, state: RingState, inputs: AssocInputs, B: int):
    """Precompute per (point, column-offset) reachable-row bitmasks + edges.

    Returns (bits, active_w, wcols, lcols) where bits has shape
    (H+1, 2, R, B): for batch point (r, b) and offset dc, bit (dr + V) of the
    two packed words marks an edge to window cell (r + dr, b + H - dc).
    """
    cl = config.clustering
    H = cl.max_steps_in_row        # horizontal steps
    V = cl.max_steps_in_column     # vertical steps
    R = state.num_rows
    rc = state.ring_cols
    num_cols = config.range_image.num_columns
    az_width = jnp.float32(2.0 * math.pi / num_cols)
    max_d = jnp.float32(cl.max_distance)
    max_d2 = max_d * max_d

    wcols, lcols = _window_arrays(config, state, inputs.gcol0, B)
    WCOL = H + B
    lc0 = (inputs.gcol0 - H) % rc

    def take(arr):
        return ring_read(arr, lc0, WCOL)

    xw, yw, zw = take(state.x), take(state.y), take(state.z)
    incw = take(state.inclination)
    distw = take(state.distance)
    gcolw = take(state.gcol)
    ignw = take(state.is_ignored)
    # frozen on the fly: a cell belongs to a finished cluster iff its slot's
    # canonical component is finished (slot_parent is kept path-compressed,
    # so one hop resolves).  Only halo cells (the first H window columns,
    # wcols < gcol0) carry valid slots: batch columns are fresh this step
    # and may still hold a STALE slot from one rotation ago (ingest
    # overwrites cells before the lagging ring clear reaches them) — so
    # slots are read for the halo region only, keeping these gathers at
    # R*H instead of R*(H+B) indices.
    slot_h = ring_read(state.slot, lc0, H)                      # (R, H)
    slot_res = jnp.take(state.slot_parent, jnp.maximum(slot_h, 0))
    froz_h = (slot_h >= 0) & jnp.take(state.slot_finished, slot_res)
    frozw = jnp.concatenate([froz_h, jnp.zeros((R, B), bool)], axis=1)

    col_ok = (wcols[None, :] >= state.first_unpublished) & (
        wcols[None, :] < inputs.gcol0 + inputs.n_cols
    )
    active_w = (gcolw == wcols[None, :]) & ~ignw & ~frozw & col_ok  # (R, WCOL)

    # initial CC labels: halo cells that already share a component (same
    # resolved slot) start pre-merged at the component's minimum halo wlid,
    # so the sweep only has to claim the NEW batch cells instead of
    # re-deriving every existing component from scratch each batch
    K_ = cl.max_active_components
    ah = active_w[:, :H] & (slot_h >= 0)
    if _use_cm_labels():
        # column-major cell ids: c * R + r (see _use_cm_labels)
        wlid_h = (
            jnp.arange(R, dtype=jnp.int32)[:, None]
            + jnp.arange(H, dtype=jnp.int32)[None, :] * R
        )
        wlid_b = (
            jnp.arange(R, dtype=jnp.int32)[:, None]
            + jnp.arange(H, WCOL, dtype=jnp.int32)[None, :] * R
        )
    else:
        wlid_h = (
            jnp.arange(R, dtype=jnp.int32)[:, None] * WCOL
            + jnp.arange(H, dtype=jnp.int32)[None, :]
        )
        wlid_b = (
            jnp.arange(R, dtype=jnp.int32)[:, None] * WCOL
            + jnp.arange(H, WCOL, dtype=jnp.int32)[None, :]
        )
    m_slot = (
        jnp.full(K_, R * WCOL, jnp.int32)
        .at[jnp.where(ah, slot_res, K_)]
        .min(wlid_h, mode="drop")
    )
    pre = jnp.take(m_slot, jnp.clip(slot_res, 0, K_ - 1))
    L0 = jnp.concatenate(
        [jnp.where(ah, jnp.minimum(pre, wlid_h), wlid_h), wlid_b],
        axis=1,
    )

    # batch-point quantities
    xb, yb, zb = xw[:, H:], yw[:, H:], zw[:, H:]
    incb = incw[:, H:]
    distb = distw[:, H:]
    active_b = active_w[:, H:]
    mad = jnp.arcsin(max_d / distb)                       # (R, B)
    wp = jnp.minimum(jnp.ceil(mad / az_width).astype(jnp.int32), H)

    from .cc_pallas import edge_bits_pallas, pallas_enabled

    import os as _os

    if (pallas_enabled(B) and not cl.record_neighbor_stats
            and _os.environ.get("CCT_PALLAS_BITS", "1") == "1"):
        # fused VMEM neighbor-search kernel (bit-identical to the stack
        # formulation below; validated in tests/test_cc_pallas.py)
        max_wp_k = jnp.max(jnp.where(active_b, wp, 0))
        bits, brev = edge_bits_pallas(
            config, xw, yw, zw, incw, active_w, mad, wp, max_wp_k
        )
        return bits, brev, L0, active_w, wcols, lcols, mad, active_b, slot_h, None

    # padded window arrays for vertical shifts
    def vpad(arr, fill):
        return jnp.pad(arr, ((V, V), (0, 0)), constant_values=fill)

    xp, yp, zp = vpad(xw, jnp.nan), vpad(yw, jnp.nan), vpad(zw, jnp.nan)
    incp = vpad(incw, jnp.nan)
    actp = vpad(active_w, False)

    # vectorized over ALL (dc, dr) offsets at once: neighbor values come from
    # one gather per field into the padded flat arrays (TPU-friendly; no
    # sequential lax.map over column offsets)
    n_dr = 2 * V + 1
    ND = H + 1
    PW = WCOL  # horizontal padding is implicit: wc - dc >= 0 - H handled below
    dc_a = jnp.arange(ND, dtype=jnp.int32)[:, None, None, None]   # (ND,1,1,1)
    dr_a = jnp.arange(n_dr, dtype=jnp.int32)[None, :, None, None] - V
    r_a = jnp.arange(R, dtype=jnp.int32)[None, None, :, None]
    b_a = jnp.arange(B, dtype=jnp.int32)[None, None, None, :]

    # neighbor of batch point (r, H+b) at (r + dr, H + b - dc), in the
    # vertically padded arrays (rows offset by V); columns never underflow
    # because dc <= H and the window has an H-column halo
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        platform = "cpu"
    if platform in ("tpu", "axon"):
        # static slices (TPU gathers lower near-serially)
        def g(arr_padded):
            per_dc = []
            for dc in range(ND):
                per_dr = [
                    jax.lax.slice(arr_padded, (k, H - dc), (k + R, H - dc + B))
                    for k in range(n_dr)
                ]
                per_dc.append(jnp.stack(per_dr, axis=0))
            return jnp.stack(per_dc, axis=0)  # (ND, n_dr, R, B)
    else:
        flat_idx = (V + r_a + dr_a) * WCOL + (H + b_a - dc_a)  # (ND, n_dr, R, B)

        def g(arr_padded):
            return arr_padded.reshape(-1)[flat_idx]

    nx, ny, nz = g(xp), g(yp), g(zp)
    ninc = g(incp)
    nact = g(actp)

    # break test (…cpp:728): the reference breaks on `abs(diff) > mad`, which
    # is FALSE for NaN — walks continue through NaN-inclination cells (they
    # are merely skipped via is_ignored)
    incl_ok = ~(jnp.abs(ninc - incb[None, None]) > mad[None, None])  # (ND,n_dr,R,B)
    ok0 = incl_ok[:, V]  # (ND, R, B)

    # walk reachability with break-at-first-violation semantics:
    #   up walk tests ok(0), ok(-1), … for dc>0, but starts at ok(-1) for
    #   dc==0 (…cpp:712-717); the down walk (dc>0 only) starts at ok(+1)
    #   and never tests ok(0).
    up_excl0 = jnp.cumprod(
        incl_ok[:, V - 1 :: -1].astype(jnp.int8), axis=1
    )[:, ::-1].astype(bool)  # (ND, V, R, B): index k ↔ dr = k - V
    down_excl0 = jnp.cumprod(
        incl_ok[:, V + 1 :].astype(jnp.int8), axis=1
    ).astype(bool)  # (ND, V, R, B): index k ↔ dr = k + 1

    is_dc0 = (dc_a == 0)[:, 0]  # (ND,1,1) -> broadcast (ND, R, B)
    up_edge = up_excl0 & jnp.where(is_dc0, True, ok0)[:, None]
    dr0_edge = (ok0 & ~is_dc0)[:, None]
    down_edge = down_excl0 & ~is_dc0[:, None]
    reach = jnp.concatenate([up_edge, dr0_edge, down_edge], axis=1)

    dx, dy, dz = nx - xb[None, None], ny - yb[None, None], nz - zb[None, None]
    close = (dx * dx + dy * dy + dz * dz) < max_d2

    edge = reach & close & nact & active_b[None, None] & (dc_a[:, 0, :, :][:, None] <= wp[None, None])

    # pack the 2V+1 dr-bits into two i32 words (bit = dr + V, word = bit//32)
    dr_idx = jnp.arange(n_dr, dtype=jnp.int32)
    shifts = jnp.left_shift(jnp.int32(1), dr_idx % 32)[None, :, None, None]
    in_w0 = (dr_idx < 32)[None, :, None, None]
    w0 = jnp.sum(jnp.where(in_w0 & edge, shifts, 0), axis=1).astype(jnp.int32)
    w1 = jnp.sum(jnp.where(~in_w0 & edge, shifts, 0), axis=1).astype(jnp.int32)
    bits = jnp.stack([w0, w1], axis=1)  # (ND, 2, R, B)
    brev = None  # XLA CC variants build their own reverse masks

    slotw = slot_h
    nbr_stats = None
    if cl.record_neighbor_stats:
        # reconstruct the reference's visited-cell counter (…cpp:725): a
        # cell is visited iff every cell strictly earlier in its walk passed
        # the inclination test (the breaking cell itself is counted) and the
        # row is in bounds; the wedge spans dc <= wp and columns >= the
        # publish frontier (…cpp:762).  Exact for
        # stop_after_association_enabled=false (the stop heuristic visits a
        # data-dependent subset the vectorized form does not model).
        def exc_cumprod(seq):  # exclusive prefix products along axis 1
            c = jnp.cumprod(seq.astype(jnp.int32), axis=1)
            return jnp.concatenate(
                [jnp.ones_like(c[:, :1]), c[:, :-1]], axis=1
            )

        up_seq = incl_ok[:, V - 1 :: -1]   # dr=-1..-V in walk order
        dn_seq = incl_ok[:, V + 1 :]       # dr=+1..+V
        iu_exc = exc_cumprod(up_seq)       # (ND, V, R, B)
        id_exc = exc_cumprod(dn_seq)
        r_i2 = jnp.arange(R, dtype=jnp.int32)[None, None, :, None]
        dshift = jnp.arange(1, V + 1, dtype=jnp.int32)[None, :, None, None]
        up_inb = (r_i2 - dshift) >= 0
        dn_inb = (r_i2 + dshift) <= R - 1
        s_up = jnp.sum(jnp.where(up_inb, iu_exc, 0), axis=1)   # (ND, R, B)
        s_dn = jnp.sum(jnp.where(dn_inb, id_exc, 0), axis=1)
        is_dc0_b = (dc_a == 0)[:, 0, :, :]                      # (ND, 1, 1)
        per_dc = jnp.where(
            is_dc0_b, s_up, 1 + ok0.astype(jnp.int32) * s_up + s_dn
        )
        gcol_b = wcols[None, H:]                                # (1, B)
        dc_col = dc_a[:, 0]                                     # (ND, 1, 1)
        fu0 = jnp.maximum(state.first_unpublished, 0)
        gate = (dc_col <= wp[None]) & (gcol_b[None] - dc_col >= fu0)
        visited = jnp.sum(jnp.where(gate, per_dc, 0), axis=0)   # (R, B)
        degree = jnp.sum(edge.astype(jnp.int32), axis=(0, 1))
        nbr_stats = jnp.where(
            active_b, visited + (degree << 16), 0
        ).astype(jnp.int32)

    return bits, brev, L0, active_w, wcols, lcols, mad, active_b, slotw, nbr_stats


def cc_converge(sweep_fn, R: int, WCOL: int, max_iters: int = 64,
                L0=None, post=None, post_after=0):
    """Shared CC driver: alternate a sweep with pointer-jump compression
    until the labels are stable.  ``L0`` optionally seeds the labels (must
    be component-consistent: L0[i] = wlid of some cell in i's component,
    <= wlid[i]); the fixpoint is the same per-component minimum wlid.

    Returns ``(labels, converged, rounds)`` — ``converged`` is False iff
    the loop hit ``max_iters`` with labels still changing (a pathological
    chain the caller must surface rather than silently mislabel);
    ``rounds`` is the executed iteration count (rides StepInfo.meta as
    observability: scenes needing many diffusion rounds are where the CC
    knobs CCT_SWEEPS/CCT_CC_JUMP matter, docs/ROUND4_NOTES.md)."""
    if L0 is not None:
        wlid = L0
    elif _use_cm_labels():
        wlid = (
            jnp.arange(R, dtype=jnp.int32)[:, None]
            + jnp.arange(WCOL, dtype=jnp.int32)[None, :] * R
        )
    else:
        wlid = jnp.arange(R * WCOL, dtype=jnp.int32).reshape(R, WCOL)

    import os as _os

    # pointer-doubling count per round (f stays position-indexed through
    # the hops); same knob as the Pallas driver so CPU probes of the
    # cc_rounds meta lane predict the TPU knob's effect.  Default OFF since
    # the round-5 battery: with BOTH segmented scans on, the jump's
    # window-scale gathers cost more than the rounds they save on every
    # scene (docs/battery_r4c_tpu.jsonl, tag hsvsj0)
    n_jump = int(_os.environ.get("CCT_CC_JUMP", "0"))

    def jump(L):
        f = L.reshape(-1)
        for _ in range(n_jump):
            f = _jump_take(f, f, R, WCOL)
        return f.reshape(R, WCOL)

    def cond(c):
        L, changed, it = c
        return changed & (it < max_iters)

    def body(c):
        L, _, it = c
        L2 = sweep_fn(L)
        if post is not None:
            # extra exact min-propagation (e.g. the segmented row scan,
            # _hscan_min) applied from round ``post_after`` on; at
            # post_after=0 the predicate is constant-true, so skip the cond
            if post_after == 0:
                L2 = post(L2, it)
            else:
                L2 = jax.lax.cond(
                    it >= post_after, lambda l: post(l, it), lambda l: l, L2
                )
        L2 = jump(L2)
        return L2, jnp.any(L2 != L), it + 1

    L, changed, it = jax.lax.while_loop(
        cond, body, (wlid, jnp.asarray(True), 0)
    )
    return L, ~changed, it


def _window_cc_vectorized(config: Config, bits: jax.Array, active_w: jax.Array, L0,
                          B: int, max_wp: jax.Array) -> jax.Array:
    """Vectorized min-label diffusion: each round is ONE big gather over all
    (offset, cell) pairs plus a min-reduce over the offset axis, instead of
    ~861 tiny per-offset ops.  TPU-friendly: a few MB-scale tensor ops per
    round, fused by XLA.
    """
    cl = config.clustering
    H, V = cl.max_steps_in_row, cl.max_steps_in_column
    R, WCOL = active_w.shape
    n_dr = 2 * V + 1
    K = (H + 1) * n_dr
    PW = WCOL + 2 * H
    PH = R + 2 * V
    inf = jnp.int32(R * WCOL)

    dc_k = (jnp.arange(K, dtype=jnp.int32) // n_dr)[:, None, None]       # (K,1,1)
    dr_k = (jnp.arange(K, dtype=jnp.int32) % n_dr - V)[:, None, None]

    r_i = jnp.arange(R, dtype=jnp.int32)[None, :, None]
    c_i = jnp.arange(WCOL, dtype=jnp.int32)[None, None, :]

    # edge masks: maskL[k, r, wc] = edge from p=(r,wc) to (r+dr, wc-dc)
    word = bits[dc_k[:, 0, 0], (jnp.arange(K) % n_dr) // 32]             # (K, R, B)
    bit = ((word >> ((jnp.arange(K, dtype=jnp.int32) % n_dr) % 32)[:, None, None]) & 1) == 1
    maskL = jnp.concatenate([jnp.zeros((K, R, H), bool), bit], axis=2)   # (K, R, WCOL)
    # reversed mask: edge toward q from source p=(r-dr, wc+dc); read maskL at
    # the source position (zero-padded)
    mpadded = jnp.pad(maskL, ((0, 0), (V, V), (H, H)))
    maskR = mpadded[
        jnp.arange(K)[:, None, None],
        V + r_i - dr_k,
        H + c_i + dc_k,
    ]

    # neighbor flat indices into the (PH, PW) padded label grid
    idxL = (V + r_i + dr_k) * PW + (H + c_i - dc_k)                      # (K, R, WCOL)
    idxR = (V + r_i - dr_k) * PW + (H + c_i + dc_k)

    def sweep(L):
        Lp = jnp.pad(L, ((V, V), (H, H)), constant_values=inf).reshape(-1)
        gl = jnp.where(maskL, Lp[idxL], inf)
        gr = jnp.where(maskR, Lp[idxR], inf)
        pull = jnp.minimum(jnp.min(gl, axis=0), jnp.min(gr, axis=0))
        return jnp.minimum(L, pull)

    post, post_after = _hscan_post(config, bits, R, H)
    return cc_converge(sweep, R, WCOL, L0=L0, post=post, post_after=post_after)


def _window_cc_unrolled(config: Config, bits: jax.Array, active_w: jax.Array, L0,
                        B: int, max_wp: jax.Array) -> jax.Array:
    """Shift-stencil sweep with statically unrolled offsets.

    On TPU, general gathers lower to near-serial loops, so the gather-based
    sweep is catastrophically slow there; static slices of a padded label
    grid are pure VPU work.  All 861 offset masks (forward and reverse) are
    precomputed once; the while-loop body is ~6 static ops per offset.
    """
    cl = config.clustering
    H, V = cl.max_steps_in_row, cl.max_steps_in_column
    R, WCOL = active_w.shape
    n_dr = 2 * V + 1
    inf = jnp.int32(R * WCOL)

    # per-offset forward masks (R, WCOL): edge from p to (r+dr, wc-dc)
    masksL = []
    masksR = []
    zerosH = jnp.zeros((R, H), bool)
    for dc in range(H + 1):
        for dr_idx in range(n_dr):
            word = bits[dc, dr_idx // 32]
            m = ((word >> (dr_idx % 32)) & 1) == 1  # (R, B)
            mf = jnp.concatenate([zerosH, m], axis=1)  # (R, WCOL)
            masksL.append(mf)
            # reverse mask: m at source position (r - dr, wc + dc)
            mp = jnp.pad(mf, ((V, V), (H, H)))
            mr = jax.lax.slice(
                mp, (V - (dr_idx - V), H + dc), (V - (dr_idx - V) + R, H + dc + WCOL)
            )
            masksR.append(mr)

    def sweep(L):
        Lpad = jnp.pad(L, ((V, V), (H, H)), constant_values=inf)
        out = L
        i = 0
        for dc in range(H + 1):
            for dr_idx in range(n_dr):
                nb = jax.lax.slice(
                    Lpad, (dr_idx, H - dc), (dr_idx + R, H - dc + WCOL)
                )
                out = jnp.minimum(out, jnp.where(masksL[i], nb, inf))
                src = jax.lax.slice(
                    Lpad, (2 * V - dr_idx, H + dc), (2 * V - dr_idx + R, H + dc + WCOL)
                )
                out = jnp.minimum(out, jnp.where(masksR[i], src, inf))
                i += 1
        return out

    post, post_after = _hscan_post(config, bits, R, H)
    return cc_converge(sweep, R, WCOL, L0=L0, post=post, post_after=post_after)


def _window_cc_stacked(config: Config, bits: jax.Array, active_w: jax.Array, L0,
                       B: int, max_wp: jax.Array) -> jax.Array:
    """Row-stacked shift-stencil sweep (TPU default).

    The fully unrolled sweep issues ~861*6 tiny (R, WCOL) ops per round and
    is per-op-overhead bound.  Here the 2V+1 row shifts are materialized
    ONCE per sweep as a (n_dr, R, PW) stack of static slices; each column
    offset dc then costs one lane slice + masked min-reduce over the dr
    axis (~8 ops on ~1M-element tensors), for ~170 ops per sweep total.
    """
    cl = config.clustering
    H, V = cl.max_steps_in_row, cl.max_steps_in_column
    R, WCOL = active_w.shape
    n_dr = 2 * V + 1
    ND = H + 1
    inf = jnp.int32(R * WCOL)
    PW = WCOL + 2 * H

    # unpack bits to per-offset forward masks (ND, n_dr, R, WCOL)
    dr_idx = jnp.arange(n_dr, dtype=jnp.int32)
    word = bits[:, dr_idx // 32]                      # (ND, n_dr, R, B)
    m = ((word >> (dr_idx % 32)[None, :, None, None]) & 1) == 1
    maskL = jnp.concatenate([jnp.zeros((ND, n_dr, R, H), bool), m], axis=3)

    # reverse masks at the SOURCE position: rows shifted by -(dr), cols +dc
    mp = jnp.pad(maskL, ((0, 0), (0, 0), (V, V), (H, H)))
    rows = [mp[:, k, 2 * V - k : 2 * V - k + R, :] for k in range(n_dr)]
    mR_rows = jnp.stack(rows, axis=1)                 # (ND, n_dr, R, PW)
    maskR = jnp.stack(
        [
            jax.lax.slice(mR_rows[dc], (0, 0, H + dc), (n_dr, R, H + dc + WCOL))
            for dc in range(ND)
        ],
        axis=0,
    )                                                 # (ND, n_dr, R, WCOL)

    def sweep(L):
        Lpad = jnp.pad(L, ((V, V), (H, H)), constant_values=inf)
        Lrows = jnp.stack(
            [jax.lax.slice(Lpad, (k, 0), (k + R, PW)) for k in range(n_dr)]
        )                                             # (n_dr, R, PW)
        LrowsF = Lrows[::-1]                          # row k -> shift 2V - k
        out = L
        for dc in range(ND):
            nb = jax.lax.slice(Lrows, (0, 0, H - dc), (n_dr, R, H - dc + WCOL))
            out = jnp.minimum(out, jnp.min(jnp.where(maskL[dc], nb, inf), axis=0))
            src = jax.lax.slice(LrowsF, (0, 0, H + dc), (n_dr, R, H + dc + WCOL))
            out = jnp.minimum(out, jnp.min(jnp.where(maskR[dc], src, inf), axis=0))
        return out

    post, post_after = _hscan_post(config, bits, R, H)
    return cc_converge(sweep, R, WCOL, L0=L0, post=post, post_after=post_after)


def _window_cc(config: Config, bits: jax.Array, active_w: jax.Array, L0,
               B: int, max_wp: jax.Array) -> jax.Array:
    """Min-label diffusion + pointer jumping over the window graph.

    Returns converged window-local labels (R, WCOL) where label = flat window
    index of the component's canonical cell.
    """
    cl = config.clustering
    H, V = cl.max_steps_in_row, cl.max_steps_in_column
    R, WCOL = active_w.shape
    wlid = jnp.arange(R * WCOL, dtype=jnp.int32).reshape(R, WCOL)

    n_off = (H + 1) * (2 * V + 1)
    inf = jnp.int32(R * WCOL)  # sentinel larger than any wlid

    def sweep(L):
        Lpad = jnp.pad(L, ((V, V), (H, H)), constant_values=inf)

        def off_body(o, L):
            dc = o // (2 * V + 1)
            dr_idx = o % (2 * V + 1)
            word = jax.lax.dynamic_slice(bits, (dc, dr_idx // 32, 0, 0), (1, 1, R, B))[0, 0]
            m = ((word >> (dr_idx % 32)) & 1).astype(bool)  # (R, B) source mask
            M = jnp.zeros((R, WCOL), bool).at[:, H:].set(m)
            Mpad = jnp.pad(M, ((V, V), (H, H)), constant_values=False)

            # pull-left: L[p] = min(L[p], L[p + (dr, -dc)]) where M[p]
            nb = jax.lax.dynamic_slice(Lpad, (dr_idx, H - dc), (R, WCOL))
            L = jnp.minimum(L, jnp.where(M, nb, inf))
            # pull-right: L[q] = min(L[q], L[q - (dr, -dc)]) where M[q - off]
            src = jax.lax.dynamic_slice(Lpad, (2 * V - dr_idx, H + dc), (R, WCOL))
            ms = jax.lax.dynamic_slice(Mpad, (2 * V - dr_idx, H + dc), (R, WCOL))
            L = jnp.minimum(L, jnp.where(ms, src, inf))
            return L

        upper = (jnp.minimum(max_wp, H) + 1) * (2 * V + 1)

        def cond(c):
            o, L = c
            return o < upper

        def body(c):
            o, L = c
            return o + 1, off_body(o, L)

        _, L = jax.lax.while_loop(cond, body, (jnp.int32(0), L))
        return L

    post, post_after = _hscan_post(config, bits, R, H)
    return cc_converge(sweep, R, WCOL, L0=L0, post=post, post_after=post_after)


def _f32_sort_key(x: jax.Array) -> jax.Array:
    """Monotone bijection f32 -> i32: a <= b  <=>  key(a) <= key(b).

    Lets f32 max-reductions ride an i32 scatter-max so several aggregate
    scatters can merge into ONE (per-op overhead dominates scatter cost in
    the compiled step; scripts in docs/ROUND3_NOTES.md).  Standard radix
    trick: non-negative floats keep their bit pattern, negative floats map
    to INT_MIN - bits (wraparound arithmetic makes -0.0 -> 0 == +0.0).
    """
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b >= 0, b, jnp.int32(-(2 ** 31)) - b)


def _f32_from_key(k: jax.Array) -> jax.Array:
    b = jnp.where(k >= 0, k, jnp.int32(-(2 ** 31)) - k)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


class CompleteResult(NamedTuple):
    state: RingState
    fu_old: jax.Array        # () i32 first_unpublished before completion
    fu_new: jax.Array        # () i32 after
    num_new_clusters: jax.Array  # () i32
    cc_rounds: jax.Array     # () i32 CC fixpoint rounds this batch


def _cut_result(state: RingState, fu_old: jax.Array, tensors) -> CompleteResult:
    """Profiling early-exit: fold a data-dependent scalar from ``tensors``
    into the carried state so the computation up to the cut point cannot be
    dead-code-eliminated, then return without the remaining stages."""
    acc = jnp.float32(0)
    for t in tensors:
        if t.dtype == jnp.bool_:
            t = t.astype(jnp.int32)
        acc = acc + jnp.sum(t).astype(jnp.float32)
    sentinel = (acc == jnp.float32(-1.2345678e-38)).astype(jnp.int32)
    state = dataclasses.replace(state, cluster_counter=state.cluster_counter + sentinel)
    return CompleteResult(
        state=state, fu_old=fu_old, fu_new=fu_old,
        num_new_clusters=jnp.asarray(0, jnp.int32),
        cc_rounds=jnp.asarray(0, jnp.int32),
    )


def associate_and_complete(
    config: Config, state: RingState, inputs: AssocInputs, batch_size: int,
    profile_cut: str = "",
    ring_capacity: int | None = None,
    skip_clear: bool = False,
) -> CompleteResult:
    """Run association (CC update) and completion for a column batch.

    Component state lives in a compact K-slot table (``state.slot_*``): each
    cell stores one slot index, and all per-component reductions (the
    reference's tree combination + completion checks, …cpp:837-974) are
    K-sized or association-window-sized ops.  Nothing here touches arrays at
    ring or live-window scale — on TPU, gathers/scatters cost ~linear in
    their index count, so keeping the irregular ops at 16k/8k scale instead
    of 225k is worth ~4 ms per batch (scripts/microbench_ops.py).

    ``ring_capacity``/``skip_clear`` support the column-sharded halo path
    (parallel/halo.py), which runs this op on a small window-sized scratch
    ring: ``ring_capacity`` overrides the REAL ring capacity used by the
    overflow check (the scratch's own width would trip it constantly), and
    ``skip_clear`` advances the clear bookkeeping without touching cells
    (the wrapper applies the identical gcol-gated clear to the real
    sharded ring; clear columns live a rotation behind the window, outside
    the scratch).
    """
    cl = config.clustering
    H, V = cl.max_steps_in_row, cl.max_steps_in_column
    R = state.num_rows
    rc = state.ring_cols
    B = batch_size
    num_cols = config.range_image.num_columns
    K = cl.max_active_components
    idxK = jnp.arange(K, dtype=jnp.int32)

    (bits, brev, L0, active_w, awcols, alcols, mad, active_b, slotw,
     nbr_stats) = _edge_bits(config, state, inputs, B)
    WCOL = H + B
    if profile_cut == "bits":
        return _cut_result(state, state.first_unpublished, (bits,))

    max_wp = jnp.max(
        jnp.where(
            active_b,
            jnp.minimum(
                jnp.ceil(mad / jnp.float32(2 * math.pi / num_cols)).astype(jnp.int32), H
            ),
            0,
        )
    )
    import os

    from .cc_pallas import pallas_enabled, window_cc_pallas

    def _default_cc_mode() -> str:
        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover
            platform = "cpu"
        # TPU: general gathers lower near-serially -> use the static shift
        # stencil (XLA fuses the unrolled chain; the row-stacked variant
        # measured ~10% slower end-to-end due to materialization traffic);
        # CPU: gathers are fast and the unroll compiles slowly
        return "unrolled" if platform in ("tpu", "axon") else "vectorized"

    mode = os.environ.get("CCT_CC", "") or _default_cc_mode()
    if (pallas_enabled(B) and brev is not None
            and os.environ.get("CCT_PALLAS_CC", "1") == "1"):
        Lw, cc_ok, cc_rounds = window_cc_pallas(
            config, bits, brev, active_w, L0, B, max_wp
        )
    elif mode == "fori":
        Lw, cc_ok, cc_rounds = _window_cc(config, bits, active_w, L0, B, max_wp)
    elif mode == "unrolled":
        Lw, cc_ok, cc_rounds = _window_cc_unrolled(
            config, bits, active_w, L0, B, max_wp
        )
    elif mode == "stacked":
        Lw, cc_ok, cc_rounds = _window_cc_stacked(
            config, bits, active_w, L0, B, max_wp
        )
    else:
        Lw, cc_ok, cc_rounds = _window_cc_vectorized(
            config, bits, active_w, L0, B, max_wp
        )
    if profile_cut == "cc":
        return _cut_result(state, state.first_unpublished, (Lw,))
    if "subcc" in profile_cut:
        # perf probe: bypass the CC fixpoint (labels = seed; garbage output).
        # cc_ok must also be forced, or its consumption by the cc_failed flag
        # keeps the whole while_loop live and the probe measures full CC cost.
        Lw = L0
        cc_ok = jnp.asarray(True)
        cc_rounds = jnp.asarray(0, jnp.int32)


    # ---- window labels -> component slots ---------------------------------
    # Everything keyed "per label" below runs in ID SPACE: flat arrays
    # aligned with the cell-id enumeration, so that at a representative lane
    # the id-space index equals the label value (lab == self_wl) and
    # value-indexed tables (m0, slot_of_label) read elementwise.  Under
    # column-major ids (the default, _use_cm_labels) id space is the
    # TRANSPOSE of the (R, WCOL) storage layout and the batch region is the
    # contiguous id tail [H*R:); under row-major ids it is position space.
    n_wc = R * WCOL
    cm = _use_cm_labels()
    self_wl = jnp.arange(n_wc, dtype=jnp.int32)
    if cm:
        lab = Lw.T.reshape(-1)                # converged labels, id space
        activef = active_w.T.reshape(-1)
        rank_shape = (WCOL, R)
    else:
        lab = Lw.reshape(-1)
        activef = active_w.reshape(-1)
        rank_shape = (R, WCOL)
    lab_b = Lw[:, H:]                         # (R, B) batch labels (storage)
    # batch columns may hold stale slots from one rotation ago (see
    # _edge_bits); only halo cells (the first H window columns) carry
    # slots, so the whole label<->slot linkage runs on R*H-sized arrays
    slot_hf = slotw.reshape(-1)                      # (R*H,)
    active_hf = active_w[:, :H].reshape(-1)
    lab_h = Lw[:, :H].reshape(-1)
    has_slot = active_hf & (slot_hf >= 0)

    fu_old = state.first_unpublished
    newest_gcol = inputs.gcol0 + inputs.n_cols - 1
    has_data = (fu_old >= 0) & (newest_gcol >= fu_old)

    SENT = jnp.int32(K)

    # per-label minimum existing (resolved) slot: the hub of a static edge
    # star connecting every slotted member to the label (FastSV over these
    # edges merges all components the reference would merge, …cpp:795-833)
    rs0 = jnp.where(
        has_slot, jnp.take(state.slot_parent, jnp.maximum(slot_hf, 0)), SENT
    )
    m0 = (
        jnp.full(n_wc, SENT, jnp.int32)
        .at[jnp.where(has_slot, lab_h, n_wc)]
        .min(rs0, mode="drop")
    )
    m0lab = jnp.take(m0, jnp.where(has_slot, lab_h, 0))
    edge_ok = has_slot & (m0lab < rs0)
    ea = jnp.where(edge_ok, rs0, 0)
    eb = jnp.where(edge_ok, m0lab, 0)

    def _chase(p, idx, iters):
        r = idx
        for _ in range(iters):
            r = jnp.take(p, r)
        return r

    def union_cond(c):
        p, changed, it = c
        return changed & (it < 32)

    def union_body(c):
        p, _, it = c
        ra = _chase(p, ea, 2)
        rb = _chase(p, eb, 2)
        lo = jnp.minimum(ra, rb)
        hi = jnp.maximum(ra, rb)
        do = edge_ok & (lo != hi)
        p2 = p.at[jnp.where(do, hi, K)].min(lo, mode="drop")
        p2 = jnp.take(p2, p2)  # K-scale compression every round
        return p2, jnp.any(p2 != p), it + 1

    slot_parent, _, _ = jax.lax.while_loop(
        union_cond, union_body, (state.slot_parent, jnp.any(edge_ok), 0)
    )

    # full path compression (invariant: slot_parent leaves this function
    # fully compressed; _edge_bits and get_columns rely on one-hop resolve)
    def comp_cond(c):
        return c[1]

    def comp_body(c):
        p, _ = c
        p2 = jnp.take(p, p)
        return p2, jnp.any(p2 != p)

    slot_parent, _ = jax.lax.while_loop(
        comp_cond, comp_body, (slot_parent, jnp.asarray(True))
    )
    if profile_cut == "union":
        return _cut_result(state, fu_old, (slot_parent,))

    # ---- batch contributions per window label -----------------------------
    # every new point contributes exactly once, in its ingest batch (halo
    # cells contributed when they were batch cells); reference accumulation
    # …cpp:669-671,818 (finish azimuth) and …cpp:912-936 (columns / count)
    lc0b = inputs.gcol0 % rc
    caz_b = ring_read(state.cont_az, lc0b, B)          # (R, B)
    finish_b = caz_b + mad

    neg_inf = jnp.float32(-jnp.inf)

    # ---- allocate slots for brand-new components --------------------------
    # a label without any slotted member consists purely of batch cells —
    # including its representative (the min member), so an active slotless
    # rep *is* a batch member and no member count is needed here
    is_rep = activef & (lab == self_wl)
    need_new = is_rep & (m0 >= SENT)
    nn2d = need_new.reshape(rank_shape).astype(jnp.int32)
    within = jnp.cumsum(nn2d, axis=0)                  # 2D rank (1D cumsum at
    ctot = within[-1]                                  # n_wc lowers poorly)
    coff = jnp.cumsum(ctot) - ctot
    new_rank = (within + coff[None, :]).reshape(-1)    # 1-based where need_new
    n_new = coff[-1] + ctot[-1]

    free = ~state.slot_live
    free_rank = jnp.cumsum(free.astype(jnp.int32))
    n_free = free_rank[-1]
    slot_overflow = has_data & (n_new > n_free)
    free_compact = (
        jnp.zeros(K, jnp.int32)
        .at[jnp.where(free, free_rank - 1, K)]
        .set(idxK, mode="drop")
    )
    # CCT_AGG: "pack" (default) = 4-in-1 packed scatter-max; "rows" =
    # per-row batched scatters (vmap -> HLO operand_batching_dims) reduced
    # over the row axis; "sort" = one stable sort + segmented scan, then
    # unique-index scatters of the per-run aggregates; "plain" = one
    # scatter per quantity.  All exact.
    agg_mode = os.environ.get("CCT_AGG", "")
    if not agg_mode:
        agg_mode = "pack" if os.environ.get("CCT_AGG_PACK", "1") == "1" else "plain"
    agg_pack = agg_mode != "plain"
    if "subgather" in profile_cut:
        # perf probe: replace the window-scale gathers with elementwise
        # fakes of identical shape/dtype (results are garbage)
        new_slot_l = jnp.clip(new_rank - 1, 0, K - 1)
        slot_of_label = jnp.where(need_new, new_slot_l, jnp.clip(m0, 0, K - 1))
        cs_b2d = jnp.where(active_b, lab_b % K, -1)
    elif agg_pack:
        # ONE gather over the concatenated [free_compact | slot_parent]
        # table: need_new labels read their freshly allocated slot, the
        # rest resolve their min existing slot.  Merging the two takes
        # matters because each irregular op costs ~0.2 ms in the compiled
        # step regardless of size (docs/ROUND3_NOTES.md).
        gidx = jnp.where(
            need_new,
            jnp.clip(new_rank - 1, 0, K - 1),
            K + jnp.clip(m0, 0, K - 1),
        )
        slot_of_label = jnp.take(
            jnp.concatenate([free_compact, slot_parent]), gidx
        )
        new_slot_l = slot_of_label  # == free allocation at need_new lanes
        cs_b2d = jnp.where(active_b, jnp.take(slot_of_label, lab_b), -1)
    else:
        new_slot_l = jnp.take(free_compact, jnp.clip(new_rank - 1, 0, K - 1))

        # final slot per label id (valid where the label has members)
        slot_of_label = jnp.where(
            need_new,
            new_slot_l,
            jnp.take(slot_parent, jnp.clip(m0, 0, K - 1)),
        )

        # ---- write batch cells' slots (and finish azimuths) to the ring ---
        # (slot_of_label is value-indexed, so batch-position labels index it
        # directly — the gather sources R*B lanes, not the full window)
        cs_b2d = jnp.where(active_b, jnp.take(slot_of_label, lab_b), -1)
    wmask = (jnp.arange(B) < inputs.n_cols)[None, :]
    cur_slot = ring_read(state.slot, lc0b, B)
    slot_ring = ring_write(
        state.slot, lc0b,
        jnp.where(wmask, cs_b2d, cur_slot),
    )
    cur_fin = ring_read(state.finish_az, lc0b, B)
    fin_ring = ring_write(
        state.finish_az, lc0b,
        jnp.where(wmask & active_b, finish_b, cur_fin),
    )
    nbr_ring = state.nbr_stats
    if nbr_stats is not None:
        cur_nbr = ring_read(state.nbr_stats, lc0b, B)
        nbr_ring = ring_write(
            state.nbr_stats, lc0b, jnp.where(wmask, nbr_stats, cur_nbr)
        )

    # ---- fold aggregates: demoted canonicals + batch contributions --------
    demote = state.slot_valid & (slot_parent != idxK)

    def fold_demoted(_):
        tgtd = jnp.where(demote, slot_parent, K)
        fin = state.slot_finish.at[tgtd].max(state.slot_finish, mode="drop")
        gmin = state.slot_gmin.at[tgtd].min(state.slot_gmin, mode="drop")
        gmax = state.slot_gmax.at[tgtd].max(state.slot_gmax, mode="drop")
        cnt = state.slot_count.at[tgtd].add(
            jnp.where(demote, state.slot_count, 0), mode="drop"
        )
        # demoted slots stay live (cells still reference them) but become
        # identity-holding forwarders
        return (
            jnp.where(demote, neg_inf, fin),
            jnp.where(demote, I32_MAX, gmin),
            jnp.where(demote, -1, gmax),
            jnp.where(demote, 0, cnt),
        )

    # merges are rare per batch; skip the four K-sized fold scatters when
    # this batch demoted nothing
    fin_t, gmin_t, gmax_t, cnt_t = jax.lax.cond(
        jnp.any(demote),
        fold_demoted,
        lambda _: (state.slot_finish, state.slot_gmin, state.slot_gmax,
                   state.slot_count),
        0,
    )
    valid_t = state.slot_valid & ~demote

    # allocation flips live/valid from the FREE-SLOT side: the slots being
    # allocated are exactly free_compact[0:n_new], so the scatter runs over
    # K lanes instead of the window's 27.9k (the rep write below still needs
    # the per-label values and keeps the window-sourced scatter)
    alloc_idx = jnp.where(idxK < jnp.minimum(n_new, n_free), free_compact, K)
    live_t = state.slot_live.at[alloc_idx].set(True, mode="drop")
    valid_t = valid_t.at[alloc_idx].set(True, mode="drop")
    tgt_new = jnp.where(need_new, new_slot_l, K)
    if cm:
        # id v = c * R + r: the representative is the component's minimum-
        # COLUMN member, so its global column also serves as the new slot's
        # gmin (derived at K scale below)
        rep_glid = (self_wl % R) * rc + (
            inputs.gcol0 - H + self_wl // R
        ) % rc
    else:
        rep_glid = (self_wl // WCOL) * rc + (
            inputs.gcol0 - H + self_wl % WCOL
        ) % rc

    # batch contributions scatter DIRECTLY into the K table keyed by each
    # cell's final slot (one level of batch-sized scatters instead of a
    # per-label reduce followed by a label->K scatter; commutative
    # combiners make the two formulations identical).  Sources are sliced
    # to the batch region — halo lanes never contribute.  Under cm ids the
    # gmin quantity needs NO per-cell scatter at all: batch cells cannot
    # lower an existing slot's gmin (their global columns exceed every
    # previous batch's), and a new slot's gmin is its representative's
    # column, recovered from rep_t at K scale after the scatter.
    cs_b = cs_b2d.reshape(-1)
    cs_idx = jnp.where(cs_b >= 0, cs_b, K)
    gw_b = jnp.broadcast_to(awcols[None, H:], (R, B)).reshape(-1)
    if cm:
        # batch ids are the contiguous tail of id space: rep scatter
        # sources slice to R*B lanes
        nn_s, tgt_s, repv_s = (
            need_new[H * R :], tgt_new[H * R :], rep_glid[H * R :]
        )
    else:
        nn_s, tgt_s, repv_s = need_new, tgt_new, rep_glid
    if "subagg" in profile_cut or "subrep" in profile_cut:
        # perf probe: elementwise fakes keeping cheap deps on the real
        # sources (min(max(x),0) cannot be constant-folded away)
        dep = jnp.minimum(jnp.max(cs_idx), 0)
        fin_t = jnp.maximum(fin_t, jnp.max(finish_b) + dep)
        gmin_t = jnp.minimum(gmin_t, jnp.min(gw_b) - dep)
        gmax_t = jnp.maximum(gmax_t, dep - 1)
        cnt_t = cnt_t + dep
        rep_t = state.slot_rep + jnp.minimum(jnp.max(tgt_s) + jnp.max(repv_s), 0)
    elif agg_mode == "rows":
        # per-ROW batched scatters: vmap over the leading axis lowers to one
        # HLO scatter with operand_batching_dims — independent K-tables,
        # reduced over that axis afterwards (K-sized elementwise).  Exact:
        # max/min/add are associative-commutative and the partials start at
        # the combiner identity.  Experimental alternative to "pack" for
        # backends that vectorize batched scatters across the batch dim.
        ci2 = jnp.where(cs_b2d >= 0, cs_b2d, K)
        fkey2 = _f32_sort_key(finish_b)
        gw2 = jnp.broadcast_to(awcols[None, H:], (R, B))
        fkey_id = _f32_sort_key(jnp.float32(-jnp.inf))

        def row_sc(init, combine):
            def one(i, v):
                t = jnp.full((K,), init, jnp.int32)
                return getattr(t.at[i], combine)(v, mode="drop")
            return jax.vmap(one)

        finp = row_sc(fkey_id, "max")(ci2, fkey2).max(axis=0)
        fin_t = _f32_from_key(jnp.maximum(_f32_sort_key(fin_t), finp))
        if not cm:
            gmin_t = jnp.minimum(
                gmin_t, row_sc(I32_MAX, "min")(ci2, gw2).min(axis=0)
            )
        gmax_t = jnp.maximum(gmax_t, row_sc(-1, "max")(ci2, gw2).max(axis=0))
        cnt_t = cnt_t + row_sc(0, "add")(
            ci2, jnp.where(cs_b2d >= 0, 1, 0)
        ).sum(axis=0)
        tgt2 = jnp.where(nn_s, tgt_s, K).reshape(-1, R if cm else WCOL)
        repv2 = repv_s.reshape(-1, R if cm else WCOL)
        rep_t = jnp.maximum(
            state.slot_rep, row_sc(-1, "max")(tgt2, repv2).max(axis=0)
        )
    elif agg_mode in ("sort", "sortc"):
        # Sort-based aggregation: ONE stable sort of the packed segment-
        # offset keys brings equal slots adjacent; a segmented associative
        # scan reduces each run; only run-END lanes scatter, so the final
        # scatters carry unique_indices=True.  Exact (same monotone i32
        # keys as "pack"; count is the segment-0 run length, any add order).
        # Exists to answer whether duplicate-free scatters lower to a
        # faster TPU emit than the duplicate-heavy packed scatter — the
        # scatter-context probe measures the primitive, this measures the
        # full program (docs/ROUND3_NOTES.md).
        segs = [
            (cs_b, _f32_sort_key(finish_b.reshape(-1)), _f32_sort_key(fin_t)),
        ]
        if not cm:
            segs.append((cs_b, I32_MAX - gw_b, I32_MAX - gmin_t))  # -gmin
        segs.append((cs_b, gw_b, gmax_t))                          # gmax
        segs.append(
            (jnp.where(nn_s, tgt_s, -1), repv_s, state.slot_rep)   # rep
        )
        NSEG = len(segs)
        i_cat = jnp.concatenate([
            jnp.where(idx >= 0, idx + j * K, NSEG * K)
            for j, (idx, _, _) in enumerate(segs)
        ])
        v_cat = jnp.concatenate([v for _, v, _ in segs])
        t_cat = jnp.concatenate([t for _, _, t in segs])
        key, val = jax.lax.sort((i_cat, v_cat), num_keys=1)
        boundary = key[1:] != key[:-1]
        start = jnp.concatenate([jnp.ones((1,), bool), boundary])
        run_end = jnp.concatenate([boundary, jnp.ones((1,), bool)])
        ones = (key < K).astype(jnp.int32)  # segment-0 lanes carry counts

        def _seg_comb(a, b):
            fa, ma, sa = a
            fb, mb, sb = b
            return (
                fa | fb,
                jnp.where(fb, mb, jnp.maximum(ma, mb)),
                jnp.where(fb, sb, sa + sb),
            )

        _, smax, ssum = jax.lax.associative_scan(_seg_comb, (start, val, ones))
        # masked (non-run-end / sentinel) lanes take DISTINCT out-of-bounds
        # indices (NSEG*K + lane) so the unique_indices promise is literally
        # true — XLA documents unique_indices with duplicate indices as
        # implementation-defined even when they are all dropped
        oob = NSEG * K + jnp.arange(key.shape[0], dtype=jnp.int32)
        if agg_mode == "sortc":
            # compact run-end lanes into a SORTED unique prefix (second sort;
            # non-ends move to the ascending OOB tail), so the final scatters
            # get indices_are_sorted AND unique_indices on an NSEG*K-lane
            # source instead of the full concat width.  Distinct real keys
            # <= NSEG*K, so the static prefix holds every run end.
            ckey = jnp.where(run_end, key, oob)
            ckey, smax, ssum = jax.lax.sort((ckey, smax, ssum), num_keys=1)
            key = ckey[: NSEG * K]
            smax = smax[: NSEG * K]
            ssum = ssum[: NSEG * K]
            run_end = jnp.ones(key.shape, bool)
            t_cat = t_cat.at[key].max(
                smax, mode="drop", unique_indices=True, indices_are_sorted=True
            )
        else:
            sidx = jnp.where(run_end, key, oob)
            t_cat = t_cat.at[sidx].max(smax, mode="drop", unique_indices=True)
        fin_t = _f32_from_key(t_cat[:K])
        if cm:
            gmax_t = t_cat[K : 2 * K]
            rep_t = t_cat[2 * K :]
        else:
            gmin_t = I32_MAX - t_cat[K : 2 * K]
            gmax_t = t_cat[2 * K : 3 * K]
            rep_t = t_cat[3 * K :]
        # same unique-OOB trick for the count add (table size K: K + lane is
        # dropped, distinct per lane, and keeps ascending order under sortc)
        cidx = jnp.where(
            run_end & (key < K), key,
            K + jnp.arange(key.shape[0], dtype=jnp.int32),
        )
        cnt_t = cnt_t.at[cidx].add(
            ssum, mode="drop", unique_indices=True,
            indices_are_sorted=(agg_mode == "sortc"),
        )
    elif agg_pack:
        # ONE scatter-max over a concatenated i32 table carries the max/min
        # aggregates (fin through the monotone f32<->i32 sort key; under rm
        # ids also gmin, negated) AND the new-slot representative write
        # (set == max: freed slots reset rep to -1 in completion, so the
        # current value at any allocation target is -1).  The count stays a
        # separate add-scatter.  The merge is exact; it exists because the
        # compiled step pays a ~0.2 ms fixed cost per irregular op while
        # the per-lane cost is ~6.5 ns (docs/ROUND3_NOTES.md).
        # segments: (scatter index base mask, source values, table initial);
        # the table offset of each segment is its position in this list
        segs = [
            (cs_b, _f32_sort_key(finish_b.reshape(-1)), _f32_sort_key(fin_t)),
        ]
        if not cm:
            segs.append((cs_b, I32_MAX - gw_b, I32_MAX - gmin_t))  # -gmin
        segs.append((cs_b, gw_b, gmax_t))                          # gmax
        segs.append(
            (jnp.where(nn_s, tgt_s, -1), repv_s, state.slot_rep)   # rep
        )
        NSEG = len(segs)
        i_cat = jnp.concatenate([
            jnp.where(idx >= 0, idx + j * K, NSEG * K)
            for j, (idx, _, _) in enumerate(segs)
        ])
        v_cat = jnp.concatenate([v for _, v, _ in segs])
        t_cat = jnp.concatenate([t for _, _, t in segs])
        t_cat = t_cat.at[i_cat].max(v_cat, mode="drop")
        fin_t = _f32_from_key(t_cat[:K])
        if cm:
            gmax_t = t_cat[K : 2 * K]
            rep_t = t_cat[2 * K :]
        else:
            gmin_t = I32_MAX - t_cat[K : 2 * K]
            gmax_t = t_cat[2 * K : 3 * K]
            rep_t = t_cat[3 * K :]
        cnt_t = cnt_t.at[cs_idx].add(jnp.where(cs_b >= 0, 1, 0), mode="drop")
    else:
        rep_t = state.slot_rep.at[jnp.where(nn_s, tgt_s, K)].set(
            repv_s, mode="drop"
        )
        fin_t = fin_t.at[cs_idx].max(finish_b.reshape(-1), mode="drop")
        if not cm:
            gmin_t = gmin_t.at[cs_idx].min(gw_b, mode="drop")
        gmax_t = gmax_t.at[cs_idx].max(gw_b, mode="drop")
        cnt_t = cnt_t.at[cs_idx].add(jnp.where(cs_b >= 0, 1, 0), mode="drop")
    if cm and "subagg" not in profile_cut and "subrep" not in profile_cut:
        # new-slot gmin from the representative (cm ids: rep = min-column
        # member).  Exact: existing slots' gmins are strictly below gcol0,
        # so batch cells never lower them; merges fold via fold_demoted.
        is_new_alloc = live_t & ~state.slot_live
        lcol_rep = rep_t % rc
        gmin_new = inputs.gcol0 + (lcol_rep - inputs.gcol0) % rc
        gmin_t = jnp.where(is_new_alloc, gmin_new, gmin_t)

    # ---- completion (…cpp:837-974), all K-sized ---------------------------
    newest = jnp.maximum(newest_gcol, 0) % rc
    cur_min_az = jnp.min(state.cont_az[:, newest])
    ring_start_old = state.ring_start
    clear_bound_old = jnp.where(state.clear_bound >= 0, state.clear_bound, fu_old)

    def completion(ops):
        (live, valid, finished, cid, sp, fin, gmin, gmax, cnt, rep) = ops
        cand = live & valid & ~finished
        finished_new = cand & (
            (fin <= cur_min_az) | ((gmax + 1 - gmin) >= num_cols)
        ) & has_data
        publish = finished_new & (cnt > 5)
        rank = jnp.cumsum(publish.astype(jnp.int32))
        num_new = jnp.where(has_data, rank[-1], 0)
        cid = jnp.where(publish, state.cluster_counter + rank - 1, cid)
        finished = finished | finished_new

        # frontier advance (…cpp:943-959): the minimum runs over all
        # components that were unfinished entering this completion,
        # INCLUDING just-finished ones (one-round publish hold)
        min_required = jnp.min(jnp.where(cand, gmin, I32_MAX))
        min_required = jnp.where(
            min_required == I32_MAX, inputs.gcol0 + inputs.n_cols, min_required
        )
        fu_new = jnp.where(has_data, jnp.maximum(fu_old, min_required), fu_old)

        # free slots whose component's cells have been cleared from the ring
        # (cells of freed slots can no longer be read: cleared cells have
        # slot == -1); forwarding slots are freed with their canonical.
        # ring_start is the ACTUALLY-cleared bound (chunk clears may lag the
        # target; freeing waits for them)
        freed_canon = live & valid & finished & (gmax < ring_start_old)
        freed = live & jnp.take(freed_canon, sp)
        live2 = live & ~freed
        valid2 = valid & ~freed
        finished2 = finished & ~freed
        cid2 = jnp.where(freed, 0, cid)
        sp2 = jnp.where(freed, idxK, sp)
        fin2 = jnp.where(freed, neg_inf, fin)
        gmin2 = jnp.where(freed, I32_MAX, gmin)
        gmax2 = jnp.where(freed, -1, gmax)
        cnt2 = jnp.where(freed, 0, cnt)
        rep2 = jnp.where(freed, -1, rep)
        return (
            live2, valid2, finished2, cid2, sp2, fin2, gmin2, gmax2, cnt2,
            rep2, num_new, fu_new,
        )

    def skip_completion(ops):
        (live, valid, finished, cid, sp, fin, gmin, gmax, cnt, rep) = ops
        return (
            live, valid, finished, cid, sp, fin, gmin, gmax, cnt, rep,
            jnp.asarray(0, jnp.int32), fu_old,
        )

    ops = (
        live_t, valid_t, state.slot_finished, state.slot_cid, slot_parent,
        fin_t, gmin_t, gmax_t, cnt_t, rep_t,
    )
    nth = cl.cluster_point_trees_every_nth_column
    if "subcomp" in profile_cut:
        # perf probe: completion replaced by its skip branch (frontier
        # freezes; output is garbage but shapes/deps are intact)
        outs = skip_completion(ops)
    elif nth <= 1:
        outs = completion(ops)
    else:
        # the reference runs tree combination every nth columns (…cpp:841);
        # at batch granularity completion runs when the batch contains a
        # multiple of nth, or on empty finalization kicks
        end = inputs.gcol0 + inputs.n_cols - 1
        contains_nth = (end // nth) >= (inputs.gcol0 + nth - 1) // nth
        did_complete = ((inputs.n_cols == 0) | contains_nth) & has_data
        outs = jax.lax.cond(did_complete, completion, skip_completion, ops)
    (
        live_o, valid_o, finished_o, cid_o, sp_o, fin_o, gmin_o, gmax_o,
        cnt_o, rep_o, num_new, fu_new,
    ) = outs
    if profile_cut == "completion":
        return _cut_result(state, fu_old, (cid_o, fin_o, cnt_o, fu_new))

    # clear bookkeeping advances EVERY step (not completion-gated): the clear
    # target trails the frontier by one rotation (…cpp:1079) and never passes
    # the PREVIOUS step's frontier (clear_bound): in async mode the host
    # finishes reading [fu_old(k-1), fu_new(k-1)) before step k+1 dispatches,
    # so at step k+1 columns < fu_old(k) are read-complete and clearable.
    # Gating this on completion made the target lag ~2 whole nth rounds,
    # which for nth-gated configs meant clearing effectively never ran and
    # the head silently wrapped over uncleared cells.
    clear_target_new = jnp.where(
        has_data,
        jnp.maximum(
            jnp.maximum(0, jnp.minimum(fu_new - num_cols, clear_bound_old)),
            state.clear_target,
        ),
        state.clear_target,
    )
    clear_bound_new = jnp.where(has_data, fu_old, clear_bound_old)

    # ring reuse check: writing column g reuses the cell of column g - rc,
    # which must already be published — the head catching the unpublished
    # tail is the reference's overflow throw (…cpp:337-344).  fu_old is the
    # pre-completion frontier, i.e. it was advanced at least one step ago.
    # Clearing is deferred (bounded chunks), so additionally require the
    # reused cell to be actually CLEARED (ring_start bound): a published but
    # not-yet-cleared cell still holds a finite distance that would silently
    # pollute the reusing column's occupancy checks during ingest.
    rcap = ring_capacity if ring_capacity is not None else rc
    window_overflow = has_data & (
        (newest_gcol - rcap >= fu_old)
        | ((ring_start_old >= 0) & (newest_gcol - rcap >= ring_start_old))
    )
    # CC non-convergence (64-round cap hit with labels still changing) must be
    # loud, but it is a labeling-correctness failure, not a ring/throughput
    # one — surfacing it as "overflow" would send operators chasing the wrong
    # remediation (slowing the stream cannot help).  Separate flag.
    cc_failed = state.cc_failed | (has_data & ~cc_ok)

    state = dataclasses.replace(
        state,
        slot=slot_ring,
        finish_az=fin_ring,
        nbr_stats=nbr_ring,
        slot_parent=sp_o,
        slot_live=live_o,
        slot_valid=valid_o,
        slot_finished=finished_o,
        slot_cid=cid_o,
        slot_finish=fin_o,
        slot_gmin=gmin_o,
        slot_gmax=gmax_o,
        slot_count=cnt_o,
        slot_rep=rep_o,
        cluster_counter=state.cluster_counter + num_new,
        first_unpublished=fu_new,
        clear_bound=clear_bound_new,
        clear_target=clear_target_new,
        overflow=state.overflow | window_overflow | slot_overflow,
        cc_failed=cc_failed,
    )
    # bounded chunk clear toward the target (O(B) per batch; reference
    # clearColumns, ...cpp:1094-1145, cleared eagerly on the publish thread)
    if "subclear" in profile_cut:
        # perf probe: skip the chunk clear (ring fills with stale cells)
        cleared_to = jnp.minimum(ring_start_old + jnp.minimum(
            jnp.maximum(clear_target_new, 0), 0), ring_start_old)
    elif skip_clear:
        # halo path: advance the bookkeeping exactly as clear_columns_chunk
        # would; the caller clears [ring_start_old, cleared_to) on the real
        # sharded ring with the same gcol gate
        cleared_to = ring_start_old + jnp.clip(
            clear_target_new - ring_start_old, 0, B
        )
    else:
        state, cleared_to = clear_columns_chunk(
            state, ring_start_old, clear_target_new, B
        )
    state = dataclasses.replace(state, ring_start=cleared_to)
    return CompleteResult(
        state=state, fu_old=fu_old, fu_new=fu_new, num_new_clusters=num_new,
        cc_rounds=cc_rounds,
    )

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
  compression, then a FastSV-style union of window components into the global
  parent array through the halo cells.

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
from .state import RingState, clear_columns, ring_read, ring_write

I32_MAX = jnp.iinfo(jnp.int32).max


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
    frozw = take(state.frozen)

    col_ok = (wcols[None, :] >= state.first_unpublished) & (
        wcols[None, :] < inputs.gcol0 + inputs.n_cols
    )
    active_w = (gcolw == wcols[None, :]) & ~ignw & ~frozw & col_ok  # (R, WCOL)

    # batch-point quantities
    xb, yb, zb = xw[:, H:], yw[:, H:], zw[:, H:]
    incb = incw[:, H:]
    distb = distw[:, H:]
    active_b = active_w[:, H:]
    mad = jnp.arcsin(max_d / distb)                       # (R, B)
    wp = jnp.minimum(jnp.ceil(mad / az_width).astype(jnp.int32), H)

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
    return bits, active_w, wcols, lcols, mad, active_b


def cc_converge(sweep_fn, R: int, WCOL: int, max_iters: int = 64) -> jax.Array:
    """Shared CC driver: alternate a sweep with pointer-jump compression
    until the labels are stable."""
    wlid = jnp.arange(R * WCOL, dtype=jnp.int32).reshape(R, WCOL)

    def jump(L):
        f = L.reshape(-1)
        f = jnp.take(f, f)
        f = jnp.take(f, f)
        return f.reshape(R, WCOL)

    def cond(c):
        L, changed, it = c
        return changed & (it < max_iters)

    def body(c):
        L, _, it = c
        L2 = jump(sweep_fn(L))
        return L2, jnp.any(L2 != L), it + 1

    L, _, _ = jax.lax.while_loop(cond, body, (wlid, jnp.asarray(True), 0))
    return L


def _window_cc_vectorized(config: Config, bits: jax.Array, active_w: jax.Array,
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

    return cc_converge(sweep, R, WCOL)


def _window_cc_unrolled(config: Config, bits: jax.Array, active_w: jax.Array,
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

    return cc_converge(sweep, R, WCOL)


def _window_cc_stacked(config: Config, bits: jax.Array, active_w: jax.Array,
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

    return cc_converge(sweep, R, WCOL)


def _window_cc(config: Config, bits: jax.Array, active_w: jax.Array, B: int,
               max_wp: jax.Array) -> jax.Array:
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

    return cc_converge(sweep, R, WCOL)


def _resolve(parent_flat: jax.Array, iters: int = 0) -> jax.Array:
    """Pointer-jump the full parent array to fixpoint."""
    n = parent_flat.shape[0]
    self_idx = jnp.arange(n, dtype=jnp.int32)
    p = jnp.where(parent_flat < 0, self_idx, parent_flat)

    def cond(c):
        p, changed, it = c
        return changed & (it < 64)

    def body(c):
        p, _, it = c
        p2 = jnp.take(p, p)
        return p2, jnp.any(p2 != p), it + 1

    p, _, _ = jax.lax.while_loop(cond, body, (p, jnp.asarray(True), 0))
    return p


class CompleteResult(NamedTuple):
    state: RingState
    fu_old: jax.Array        # () i32 first_unpublished before completion
    fu_new: jax.Array        # () i32 after
    num_new_clusters: jax.Array  # () i32


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
    )


def associate_and_complete(
    config: Config, state: RingState, inputs: AssocInputs, batch_size: int,
    profile_cut: str = "",
) -> CompleteResult:
    """Run association (CC update) and completion for a column batch.

    The global union and all completion reductions operate on a *live
    window* of ``num_columns + B + 2H`` columns starting at the publish
    frontier — every unfrozen cell lives there (unfinished clusters are
    force-finished before spanning a rotation) — instead of the whole ring.
    """
    cl = config.clustering
    H, V = cl.max_steps_in_row, cl.max_steps_in_column
    R = state.num_rows
    rc = state.ring_cols
    B = batch_size
    num_cols = config.range_image.num_columns

    bits, active_w, awcols, alcols, mad, active_b = _edge_bits(config, state, inputs, B)
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
    if pallas_enabled(B):
        Lw = window_cc_pallas(config, bits, active_w, B, max_wp)
    elif mode == "fori":
        Lw = _window_cc(config, bits, active_w, B, max_wp)
    elif mode == "unrolled":
        Lw = _window_cc_unrolled(config, bits, active_w, B, max_wp)
    elif mode == "stacked":
        Lw = _window_cc_stacked(config, bits, active_w, B, max_wp)
    else:
        Lw = _window_cc_vectorized(config, bits, active_w, B, max_wp)
    if profile_cut == "cc":
        return _cut_result(state, state.first_unpublished, (Lw,))

    # association-window glids + converged window roots (as glids)
    glid_a = (jnp.arange(R, dtype=jnp.int32)[:, None] * rc + alcols[None, :])  # (R, WCOL)
    root_glid = jnp.take(glid_a.reshape(-1), Lw.reshape(-1)).reshape(R, WCOL)
    batch_active = active_w[:, H:]

    # ---- live window ----------------------------------------------------
    # the publish frontier can lag the newest column by up to one rotation
    # (force-finish bound, …cpp:912-919) plus the nth-column completion
    # cadence (…cpp:841) plus one batch; the window must cover that lag
    nth = cl.cluster_point_trees_every_nth_column
    WIN = num_cols + B + 2 * H + (nth - 1 if nth > 1 else 0)
    if WIN > rc:
        raise ValueError(
            f"ring buffer too small for the completion live window: {rc} "
            f"columns < {WIN} (num_columns + batch + 2*max_steps_in_row + "
            f"nth-1); increase ring_buffer_revolutions or reduce "
            f"cluster_point_trees_every_nth_column"
        )
    fu_old = state.first_unpublished
    # completion also runs for empty batches (n_cols == 0) as long as a
    # segmented column exists: clusters that finished last batch held the
    # frontier one round (reference one-round delay) and are released here
    newest_gcol = inputs.gcol0 + inputs.n_cols - 1
    has_data = (fu_old >= 0) & (newest_gcol >= fu_old)
    # window base: first column of any *unfinished* component.  The publish
    # frontier itself can lag further (one-round hold of finished clusters,
    # up to ~2*nth columns); published-but-held columns are frozen and need
    # no window coverage.
    win_base_old = jnp.where(state.win_base >= 0, state.win_base, fu_old)
    clear_bound_old = jnp.where(state.clear_bound >= 0, state.clear_bound, fu_old)
    win0 = jnp.maximum(0, jnp.where(has_data, win_base_old, 0))
    # the batch must fit in the window; a violation means the frontier is
    # stuck far beyond the force-finish bound -> surface as overflow
    window_overflow = has_data & (inputs.gcol0 + inputs.n_cols - win0 > WIN)

    wcols = win0 + jnp.arange(WIN, dtype=jnp.int32)
    wlcols = wcols % rc
    win0_lc = win0 % rc

    def widx_of(lid):
        """Translate a global cell lid to a window-flat index (-1 if outside)."""
        r = lid // rc
        l = lid % rc
        rel = (l - win0_lc) % rc
        ok = (lid >= 0) & (rel < WIN)
        return jnp.where(ok, r * WIN + rel, -1)

    def wtake(arr):
        return ring_read(arr, win0_lc, WIN)  # (R, WIN)

    n_w = R * WIN
    self_w = jnp.arange(n_w, dtype=jnp.int32)
    parent_w = widx_of(wtake(state.parent).reshape(-1))
    cell_has_parent = wtake(state.parent).reshape(-1) >= 0

    # new batch points adopt their association-window root; masked entries
    # get an out-of-bounds index and are dropped (never alias a real cell)
    batch_widx = widx_of(glid_a[:, H:].reshape(-1))
    batch_root_widx = widx_of(root_glid[:, H:].reshape(-1))
    upd = batch_active.reshape(-1) & (batch_widx >= 0)
    upd_idx = jnp.where(upd, batch_widx, n_w)
    parent_w = parent_w.at[upd_idx].set(batch_root_widx, mode="drop")
    cell_has_parent = cell_has_parent.at[upd_idx].set(True, mode="drop")

    # halo cells: union(old component, window component) — FastSV iteration
    halo_widx = widx_of(glid_a[:, :H].reshape(-1))
    halo_root_widx = widx_of(root_glid[:, :H].reshape(-1))
    halo_act = active_w[:, :H].reshape(-1) & (halo_widx >= 0) & (halo_root_widx >= 0)

    def union_cond(c):
        p, changed, it = c
        return changed & (it < 32)

    def _resolve_points(p, idx, iters=6):
        """Resolve only the given endpoints by chasing pointers (small
        gathers on the endpoint set instead of full-window jumping).
        Partial resolution is fine: the union scatter-min is monotone and
        the outer change-detection loop finishes the job."""
        r = jnp.take(p, idx)
        for _ in range(iters):
            r = jnp.where(r >= 0, jnp.take(p, jnp.maximum(r, 0)), r)
        return jnp.where(r >= 0, r, idx)

    ha = jnp.where(halo_act, halo_widx, 0)
    hb = jnp.where(halo_act, halo_root_widx, 0)
    hab = jnp.concatenate([ha, hb])  # one joint resolve per iteration
    n_h = ha.shape[0]

    def union_body(c):
        p, _, it = c
        r = _resolve_points(p, hab)
        ra, rb = r[:n_h], r[n_h:]
        lo = jnp.minimum(ra, rb)
        hi = jnp.maximum(ra, rb)
        do = halo_act & (lo != hi)
        new_p = p.at[jnp.where(do, hi, n_w)].min(lo, mode="drop")
        return new_p, jnp.any(do), it + 1

    parent_w, _, _ = jax.lax.while_loop(
        union_cond, union_body, (parent_w, jnp.any(halo_act), 0)
    )
    if profile_cut == "union":
        return _cut_result(state, fu_old, (parent_w,))

    # ---- per-cell clustering fields (window) ----------------------------
    cont_az_w = wtake(state.cont_az).reshape(-1)
    finish_w = wtake(state.finish_az).reshape(-1)
    mad_w = jnp.zeros(n_w, jnp.float32).at[upd_idx].set(mad.reshape(-1), mode="drop")
    is_new = jnp.zeros(n_w, bool).at[upd_idx].set(True, mode="drop")
    finish_w = jnp.where(is_new, cont_az_w + mad_w, finish_w)

    # ---- completion (…cpp:837-974) --------------------------------------
    # the reference runs tree combination every
    # cluster_point_trees_every_nth_column columns (…cpp:841); at batch
    # granularity, completion runs when the batch contains a multiple of nth
    # (always, when nth <= 1) or on empty finalization kicks
    frozen_in = wtake(state.frozen).reshape(-1)
    cid_in = wtake(state.cluster_id).reshape(-1)
    gcol_w = wtake(state.gcol).reshape(-1)
    ring_start_old = state.ring_start

    def completion(ops):
        frozen_w, cid_w, finish_w, parent_w, cell_has_parent = ops
        root_w = _resolve(parent_w)
        col_live = (gcol_w == jnp.broadcast_to(wcols[None, :], (R, WIN)).reshape(-1))
        active = cell_has_parent & ~frozen_w & col_live
        root = jnp.where(active, root_w, self_w)

        newest = jnp.maximum(newest_gcol, 0) % rc
        cur_min_az = jnp.min(state.cont_az[:, newest])

        big_f = jnp.float32(jnp.finfo(jnp.float32).max)
        finish_max = jnp.full(n_w, -big_f).at[root].max(jnp.where(active, finish_w, -big_f))
        gmin = jnp.full(n_w, I32_MAX).at[root].min(jnp.where(active, gcol_w, I32_MAX))
        gmax = jnp.full(n_w, -1).at[root].max(jnp.where(active, gcol_w, -1))
        count = jnp.zeros(n_w, jnp.int32).at[root].add(active.astype(jnp.int32))

        is_root = active & (root == self_w)
        exceeds = (gmax + 1 - gmin) >= num_cols  # force-finish (…cpp:912-919)
        finished_root = is_root & ((finish_max <= cur_min_az) | exceeds)

        publish_root = finished_root & (count > 5)
        # rank via 2D prefix sums: a flat 1D cumsum over R*WIN lowers poorly
        pub2d = publish_root.reshape(R, WIN).astype(jnp.int32)
        within_col = jnp.cumsum(pub2d, axis=0)            # (R, WIN) fast
        col_tot = within_col[-1]                          # (WIN,)
        col_off = jnp.cumsum(col_tot) - col_tot           # exclusive, small
        rank = (within_col + col_off[None, :]).reshape(-1)
        ids = jnp.where(publish_root, state.cluster_counter + rank - 1, 0)
        num_new = jnp.where(has_data, col_off[-1] + col_tot[-1], 0)

        # one member-propagation gather: id and finished flag packed
        packed = jnp.where(finished_root, ids * 2 + 1, 0)
        got = jnp.take(packed, root)
        cell_finished = active & ((got & 1) == 1) & has_data
        cid_w = jnp.where(cell_finished, got >> 1, cid_w)
        frozen_w = frozen_w | cell_finished

        # frontier advance (…cpp:943-959): the minimum runs over ALL current
        # roots including just-finished ones (one-round publish hold)
        min_required = jnp.min(jnp.where(is_root, gmin, I32_MAX))
        min_required = jnp.where(
            min_required == I32_MAX, inputs.gcol0 + inputs.n_cols, min_required
        )
        fu_new = jnp.where(has_data, jnp.maximum(fu_old, min_required), fu_old)
        # next window base: oldest member column over components that remain
        # unfinished (finished ones are frozen and leave the active set)
        wb = jnp.min(jnp.where(is_root & ~finished_root, gmin, I32_MAX))
        wb = jnp.where(wb == I32_MAX, inputs.gcol0 + inputs.n_cols, wb)
        win_base_new = jnp.where(
            has_data, jnp.maximum(win_base_old, wb), win_base_old
        )
        # clear one rotation behind the frontier (…cpp:1079) but never past
        # the *previous* completion's frontier: the host reads [fu_old,
        # fu_new) from the ring after this step returns (one step later in
        # async mode), and with nth > num_cols the frontier can jump further
        # than a rotation in one completion; deferred clears catch up later
        ring_start_new = jnp.where(
            has_data,
            jnp.maximum(
                jnp.maximum(0, jnp.minimum(fu_new - num_cols, clear_bound_old)),
                ring_start_old,
            ),
            ring_start_old,
        )
        clear_bound_new = jnp.where(has_data, fu_old, clear_bound_old)
        return (
            frozen_w, cid_w, num_new, fu_new, ring_start_new, root_w,
            win_base_new, clear_bound_new,
        )

    def skip_completion(ops):
        frozen_w, cid_w, _, parent_w, _ = ops
        # no resolve on skipped batches: write back 1-hop parents (chains
        # grow by at most one per skipped batch; the next completion's
        # resolve compresses them)
        self_or_parent = jnp.where(parent_w >= 0, parent_w, self_w)
        return (
            frozen_w, cid_w, jnp.asarray(0, jnp.int32), fu_old,
            ring_start_old, self_or_parent, state.win_base, state.clear_bound,
        )

    ops = (frozen_in, cid_in, finish_w, parent_w, cell_has_parent)
    if nth <= 1:
        (frozen_w, cid_w, num_new, fu_new, ring_start_new, root_w,
         win_base_new, clear_bound_new) = completion(ops)
        did_complete = jnp.asarray(True)
    else:
        end = inputs.gcol0 + inputs.n_cols - 1
        contains_nth = (end // nth) >= (inputs.gcol0 + nth - 1) // nth
        did_complete = ((inputs.n_cols == 0) | contains_nth) & has_data
        (frozen_w, cid_w, num_new, fu_new, ring_start_new, root_w,
         win_base_new, clear_bound_new) = jax.lax.cond(
            did_complete, completion, skip_completion, ops
        )
    if profile_cut == "completion":
        return _cut_result(
            state, fu_old, (frozen_w, cid_w, root_w, num_new, fu_new)
        )

    # ---- write back ------------------------------------------------------
    def put(arr, flat_vals):
        return ring_write(arr, win0_lc, flat_vals.reshape(R, WIN))

    # keep the original parent where it could not be window-translated
    # (frozen cells whose root slid out of the window)
    orig_parent = wtake(state.parent).reshape(-1)
    # window-flat index -> glid arithmetically (a take(glid_w, root_w) here
    # is a 225k-element gather, ~ms-scale on TPU; this is 4 elementwise ops)
    root_r = root_w // WIN
    root_glid_arith = root_r * rc + (win0_lc + (root_w - root_r * WIN)) % rc
    root_glid_out = jnp.where(
        cell_has_parent,
        jnp.where(parent_w >= 0, root_glid_arith, orig_parent),
        -1,
    )

    def write_completion(arrs):
        cid_arr, froz_arr = arrs
        return put(cid_arr, cid_w), put(froz_arr, frozen_w)

    cluster_id_new, frozen_new = jax.lax.cond(
        did_complete,
        write_completion,
        lambda arrs: arrs,
        (state.cluster_id, state.frozen),
    )
    state = dataclasses.replace(
        state,
        parent=put(state.parent, root_glid_out),
        finish_az=put(state.finish_az, finish_w),
        cluster_id=cluster_id_new,
        frozen=frozen_new,
        cluster_counter=state.cluster_counter + num_new,
        first_unpublished=fu_new,
        win_base=win_base_new,
        clear_bound=clear_bound_new,
        ring_start=ring_start_new,
        overflow=state.overflow | window_overflow,
    )
    # ring_start only advances on completions that moved the frontier a full
    # rotation forward; skip the 21 full-ring masked resets otherwise
    state = jax.lax.cond(
        ring_start_new > ring_start_old,
        lambda s: clear_columns(s, ring_start_old, ring_start_new - 1),
        lambda s: s,
        state,
    )
    return CompleteResult(
        state=state, fu_old=fu_old, fu_new=fu_new, num_new_clusters=num_new
    )

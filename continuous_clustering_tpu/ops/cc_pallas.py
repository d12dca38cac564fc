"""Pallas TPU kernel for the connected-components label sweep.

The hot loop of association is the min-label diffusion over the halo+batch
window: ~(H+1)*(2V+1) neighbor offsets, each a masked shifted min.  The XLA
fallback (`association._window_cc`) launches one op per offset per round;
this kernel runs one *entire sweep* (all offsets, Gauss-Seidel in-place on a
padded VMEM scratch) in a single launch, with labels and edge bitmasks
VMEM-resident.  Pointer-jump compression stays outside (a cheap XLA gather)
between sweeps.

VMEM budget: labels (R+2V, WCOL+2H) i32 + bits (H+1, 2, R, B) i32 — fits
comfortably for B <= ~512 (≈6 MB); larger batches fall back to the XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..config import Config

try:  # pallas is optional at import time (CPU-only environments)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _padded_width(WCOL: int, H: int) -> int:
    """Lane (last-dim) extent rounded to 128 so dynamic rotates lower."""
    return -(-(WCOL + 2 * H) // 128) * 128


def pallas_enabled(B: int) -> bool:
    if not HAVE_PALLAS:
        return False
    mode = os.environ.get("CCT_PALLAS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    # auto: on TPU for VMEM-sized batches.  The kernel lowers since masks
    # went i32 end-to-end (bool vectors hit Mosaic's "Invalid vector
    # register cast" — scripts/pallas_bisect.py) and measured exactly equal
    # outputs at ~3% lower step time than the unrolled XLA sweep.
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return platform in ("tpu", "axon") and B <= 768  # VMEM bound (~12 MB)


def _sweep_kernel(H: int, V: int, R: int, B: int, WCOL: int, n_sweeps: int,
                  bits_ref, brev_ref, upper_ref, occ_ref, dir_ref, l_in_ref,
                  out_ref, chg_ref,
                  lpad_ref, prev_ref, lroll_ref, lroll2_ref):
    """One Gauss-Seidel sweep.

    Mosaic constraints shape the code: dynamic sublane-offset slices are
    unsupported, so the row offset ``dr`` is a *static* unroll (static
    slices at any offset are fine) while the column offset ``dc`` is
    dynamic via lane-axis rotates (circular wrap only touches the INF/zero
    borders, which is exactly what out-of-window reads should see).
    Crucially, masks stay **i32 end-to-end**: bool vectors (jnp.where with
    a bool mask, bool concatenate) hit Mosaic's "Invalid vector register
    cast" in this environment (scripts/pallas_bisect.py); the arithmetic
    select ``m*x + (1-m)*INF`` lowers fine.
    """
    INF = R * WCOL  # python int (jnp scalars get captured as constants)
    n_dr = 2 * V + 1
    PW = _padded_width(WCOL, H)

    # initialize padded scratches: INF/zero borders, payload in the center
    lpad_ref[:, :] = jnp.full((R + 2 * V, PW), INF, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]

    def body(i, _):
        # dc iteration order: ascending, or descending when the driver set
        # dir=1 (CCT_CC_ALT alternates per round: the in-place update chain
        # then runs the other way across column offsets, collapsing zigzag
        # label chains in about half the rounds at zero per-round cost —
        # any sweep order reaches the same monotone min-label fixpoint, and
        # a zero-change sweep certifies convergence regardless of order)
        dc = jnp.where(dir_ref[0, 0] == 1, upper_ref[0, 0] - 1 - i, i)
        # hoist the label rotations: the whole padded grid rotates ONCE per
        # dc in each direction; row offsets then read static sublane slices
        # (two big rolls per dc instead of two per (dc, dr)).  Reads within
        # a dc iteration see the labels as of the dc's start (Jacobi within
        # dc, Gauss-Seidel across dc) — same monotone fixpoint.
        lroll_ref[:, :] = pltpu.roll(lpad_ref[:, :], dc, axis=1)
        lroll2_ref[:, :] = pltpu.roll(lpad_ref[:, :], -dc, axis=1)
        w0 = bits_ref[dc, 0]  # (R, B) — dynamic leading index is fine
        w1 = bits_ref[dc, 1]
        wr0 = brev_ref[dc, 0]  # (R, WCOL) pre-shifted reverse masks
        wr1 = brev_ref[dc, 1]
        # per-bit occupancy (bitwise-OR over the batch, computed once per
        # batch in XLA): most vertical offsets carry no edges at all — the
        # inclination break usually stops within a few rows — so each dr's
        # work is guarded by a scalar bit test.  Forward and reverse
        # occupancy are identical (every edge appears in both directions).
        occ0 = occ_ref[dc, 0]
        occ1 = occ_ref[dc, 1]

        for dr_idx in range(n_dr):  # static unroll over row offsets
            word = w0 if dr_idx < 32 else w1
            occ = occ0 if dr_idx < 32 else occ1

            def dr_work():
                mi = (word >> (dr_idx % 32)) & 1  # (R, B) i32 in {0, 1}
                mfull = jnp.concatenate(
                    [jnp.zeros((R, H), jnp.int32), mi], axis=1
                )  # (R, WCOL) source mask at batch columns

                cur = lpad_ref[V : V + R, H : H + WCOL]

                # pull-left: p pulls (r + dr, wc - dc)
                nb = lroll_ref[dr_idx : dr_idx + R, H : H + WCOL]
                upd = jnp.minimum(cur, mfull * nb + (1 - mfull) * INF)

                # pull-right: q pulls source p at (r - dr, wc + dc); the
                # mask was pre-shifted by the edge-bits kernel
                src = lroll2_ref[
                    2 * V - dr_idx : 2 * V - dr_idx + R, H : H + WCOL
                ]
                rword = wr0 if dr_idx < 32 else wr1
                ms = (rword >> (dr_idx % 32)) & 1
                upd = jnp.minimum(upd, ms * src + (1 - ms) * INF)

                lpad_ref[V : V + R, H : H + WCOL] = upd

            pl.when(((occ >> (dr_idx % 32)) & 1) == 1)(dr_work)
        return 0

    # multiple sweeps per launch: in-place propagation converges fast and
    # every extra sweep avoids a pointer-jump gather + change-detect reduce
    # at HBM scale outside the kernel (those measured as expensive as the
    # sweep itself in the device trace)
    for _ in range(n_sweeps - 1):
        jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)
    prev_ref[V : V + R, H : H + WCOL] = lpad_ref[V : V + R, H : H + WCOL]
    jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)
    out = lpad_ref[V : V + R, H : H + WCOL]
    out_ref[:, :] = out
    # fixpoint detection: did the LAST sweep change anything?
    chg_ref[0, 0] = jnp.sum(
        (out != prev_ref[V : V + R, H : H + WCOL]).astype(jnp.int32)
    )


def sweep_pallas(config: Config, bits: jax.Array, brev: jax.Array,
                 occ: jax.Array, L: jax.Array, max_wp: jax.Array,
                 n_sweeps: int = None, direction=0):
    """n_sweeps Gauss-Seidel sweeps in one launch; returns (labels, changed)
    where changed counts label updates in the final sweep (0 = fixpoint).

    Default 1 sweep per launch; the driver (window_cc_pallas) adds the
    segmented row min-scan and one deferred pointer jump per round — the
    round-4 valid-method batteries' min-maximizer across all three bench
    scenes (docs/ROUND4_NOTES.md knob tables)."""
    if n_sweeps is None:
        n_sweeps = int(os.environ.get("CCT_SWEEPS", "1"))
    cl = config.clustering
    H, V = cl.max_steps_in_row, cl.max_steps_in_column
    R, WCOL = L.shape
    B = WCOL - H
    upper = jnp.minimum(max_wp, H) + 1  # fori over dc; dr is unrolled

    kernel = functools.partial(_sweep_kernel, H, V, R, B, WCOL, n_sweeps)
    PW = _padded_width(WCOL, H)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, WCOL), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bits
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bits_rev
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),    # upper
            pl.BlockSpec((H + 1, 2), memory_space=pltpu.SMEM),  # occupancy
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),    # dc direction
            pl.BlockSpec(memory_space=pltpu.VMEM),            # labels in
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * V, PW), jnp.int32)
            for _ in range(4)  # lpad, prev, lroll, lroll2
        ],
        interpret=os.environ.get("CCT_PALLAS_INTERPRET", "0") == "1",
    )(bits, brev, jnp.asarray(upper, jnp.int32).reshape(1, 1), occ,
      jnp.asarray(direction, jnp.int32).reshape(1, 1), L)


def window_cc_pallas(config: Config, bits: jax.Array, brev: jax.Array,
                     active_w: jax.Array, L0: jax.Array, B: int,
                     max_wp: jax.Array):
    import numpy as _np
    """Drop-in replacement for association._window_cc using the Pallas sweep.

    Each round launches a multi-sweep kernel with an in-kernel fixpoint
    flag; pointer jumping runs only while unconverged (it compresses label
    chains if the in-place propagation stalls on snake-shaped components).

    Returns ``(labels, converged, rounds)`` like ``association.cc_converge``;
    the 64-round cap matches the XLA path, and ``converged`` is False iff
    the cap was hit with labels still changing."""
    R, WCOL = active_w.shape

    # jump strength: number of f = f[f] applications per unconverged round.
    # Each application is a window-scale gather (~as expensive as a sweep
    # launch in-context), but compresses label chains geometrically.
    # Default history: round 4 shipped ONE deferred jump (s1j1a1hs 6.22M
    # min-over-scenes vs the old s1j2's 5.48M, docs/ROUND4_NOTES.md); the
    # round-5 battery composed the segmented COLUMN scan with the row scan
    # and at that point jump-free wins outright (hsvsj0 6.26M vs hs 6.07M,
    # docs/battery_r4c_tpu.jsonl) — chain compression for vertical zigzags
    # now comes from the column scan itself (the snake test's shape), so
    # the jump's gathers no longer buy rounds on any bench scene.
    n_jump = int(os.environ.get("CCT_CC_JUMP", "0"))
    jump_after = int(os.environ.get("CCT_CC_JUMP_AFTER", "1"))
    # alternate the in-kernel dc iteration direction per round: zigzag
    # label chains collapse in about half the rounds at zero per-round
    # cost (measure before defaulting; battery tag s1j2alt)
    alt_dir = os.environ.get("CCT_CC_ALT", "0") == "1"
    from .association import _hscan_post

    H = config.clustering.max_steps_in_row
    post, post_after = _hscan_post(config, bits, R, H)

    def jump(L):
        from .association import _jump_take

        f = L.reshape(-1)
        for _ in range(n_jump):  # n_jump=0 => identity (true jump-free mode)
            f = _jump_take(f, f, R, WCOL)
        return f.reshape(R, WCOL)

    def cond(c):
        L, changed, it = c
        return changed & (it < 64)

    # per-(dc, word) bit occupancy over the whole batch
    occ = jax.lax.reduce(
        bits, _np.int32(0), jax.lax.bitwise_or, (2, 3)
    )

    def body(c):
        L, _, it = c
        direction = (it % 2) if alt_dir else 0
        L2, d = sweep_pallas(config, bits, brev, occ, L, max_wp,
                             direction=direction)
        changed = d[0, 0] > 0
        if post is not None:
            # segmented row min-scan (association._hscan_min): collapses
            # wide flat components the sweep would need many rounds for.
            # At post_after=0 the cond gates only on `changed`, and post is
            # a provable no-op at sweep fixpoint (min-propagation along a
            # subset of real edges), so the branch machinery buys nothing
            # but one skipped application in the final round — optionally
            # apply unconditionally (CCT_CC_POST_NOCOND=1; battery r4c)
            if post_after == 0 and os.environ.get(
                "CCT_CC_POST_NOCOND", "0"
            ) == "1":
                L2 = post(L2, it)
            else:
                L2 = jax.lax.cond(
                    changed & (it >= post_after),
                    lambda l: post(l, it), lambda l: l, L2,
                )
        L3 = jax.lax.cond(changed & (it >= jump_after), jump, lambda l: l, L2)
        return L3, changed, it + 1

    L, changed, it = jax.lax.while_loop(cond, body, (L0, jnp.asarray(True), 0))
    return L, ~changed, it


# ---------------------------------------------------------------------------
# Fused edge-bits (wedge neighbor search) kernel.
#
# association._edge_bits materializes five (H+1, 2V+1, R, B) neighbor stacks
# (~100+ MB of transients at bench shapes) to compute the per-(point, dc)
# reachable-row bitmasks.  Here the five ring fields stay VMEM-resident as
# (R+2V, PW) padded tiles; per column offset dc they are rotated ONCE along
# the lane axis, and the 2V+1 row offsets read static row slices of the
# rotated tiles while the walk's inclination prefix products accumulate in
# registers.  The dc loop is a fori bounded by the batch's max wedge width,
# so far-only scenes skip most offsets entirely.  Masks are i32 end-to-end
# (bool vectors fail Mosaic lowering here — scripts/pallas_bisect.py).
# ---------------------------------------------------------------------------


def _edge_bits_kernel(H: int, V: int, R: int, B: int, WCOL: int,
                      max_d2: float,
                      x_ref, y_ref, z_ref, inc_ref, act_ref,
                      mad_ref, wp_ref, upper_ref,
                      bits_ref, brev_ref,
                      xp, yp, zp, ip, ap, xr, yr, zr, ir, ar):
    n_dr = 2 * V + 1
    PW = _padded_width(WCOL, H)
    PR = R + 2 * V
    nan = float("nan")

    # vertically padded field tiles (payload columns at [H, H+WCOL))
    for ref, src, fill in ((xp, x_ref, nan), (yp, y_ref, nan),
                           (zp, z_ref, nan), (ip, inc_ref, nan)):
        ref[:, :] = jnp.full((PR, PW), fill, jnp.float32)
        ref[V : V + R, H : H + WCOL] = src[:, :]
    ap[:, :] = jnp.zeros((PR, PW), jnp.int32)
    ap[V : V + R, H : H + WCOL] = act_ref[:, :]

    # batch-centered quantities, pre-rolled so batch columns sit at lanes
    # [0, B).  All per-point reads below slice at lane offset 0: Mosaic
    # assigns offset-{0,0} layouts throughout, which the sublane/lane
    # concatenates in the reverse-mask construction require (concat inputs
    # must agree on non-concat-dim offsets; slices at lane 2H carry a
    # lane-40 layout that mismatches the zero fills).
    roll_b = PW - 2 * H  # ≡ -2H (mod PW), kept non-negative
    xb = pltpu.roll(xp[:, :], roll_b, axis=1)[V : V + R, 0:B]
    yb = pltpu.roll(yp[:, :], roll_b, axis=1)[V : V + R, 0:B]
    zb = pltpu.roll(zp[:, :], roll_b, axis=1)[V : V + R, 0:B]
    incb = pltpu.roll(ip[:, :], roll_b, axis=1)[V : V + R, 0:B]
    ab = pltpu.roll(ap[:, :], roll_b, axis=1)[V : V + R, 0:B]
    mad = mad_ref[:, :]
    wp = wp_ref[:, :]

    bits_ref[:, :, :, :] = jnp.zeros((H + 1, 2, R, B), jnp.int32)
    brev_ref[:, :, :, :] = jnp.zeros((H + 1, 2, R, WCOL), jnp.int32)

    def body(dc, _):
        # one lane rotation per field per dc, composed with the -2H batch
        # alignment; row offsets then read static sublane slices of the
        # rotated tiles at lane offset 0 (see layout note above)
        shift = dc + roll_b
        xr[:, :] = pltpu.roll(xp[:, :], shift, axis=1)
        yr[:, :] = pltpu.roll(yp[:, :], shift, axis=1)
        zr[:, :] = pltpu.roll(zp[:, :], shift, axis=1)
        ir[:, :] = pltpu.roll(ip[:, :], shift, axis=1)
        ar[:, :] = pltpu.roll(ap[:, :], shift, axis=1)

        dgt = (dc > 0).astype(jnp.int32)  # scalar: down/dr0 need dc > 0
        gate = (wp >= dc).astype(jnp.int32) * ab

        def ok_at(i):
            ninc = ir[i : i + R, 0:B]
            return 1 - (jnp.abs(ninc - incb) > mad).astype(jnp.int32)

        def edge_at(i, reach):
            nx = xr[i : i + R, 0:B]
            ny = yr[i : i + R, 0:B]
            nz = zr[i : i + R, 0:B]
            na = ar[i : i + R, 0:B]
            dx = nx - xb
            dy = ny - yb
            dz = nz - zb
            close = (dx * dx + dy * dy + dz * dz < max_d2).astype(jnp.int32)
            return reach * close * na * gate

        ok0 = ok_at(V)
        # the up walk starts at ok(-1) for dc == 0 and at ok(0) for dc > 0
        ok0f = 1 - dgt * (1 - ok0)

        # ALL accumulation below is pure SSA on values (python rebinding) —
        # NOT scratch-ref read-modify-write.  The earlier ref-based
        # formulation (zero-fill a scratch, then `ref |= e << i` per row
        # offset) miscompiled on-chip: every emit issued before the third
        # down-walk step was silently dropped (interpret mode and the XLA
        # path agreed; the compiled kernel lost all near-vertical edges),
        # i.e. the zero-fill store was scheduled into the middle of the
        # accumulation chain.  Value dataflow makes the ordering structural.
        emits = []  # (row offset i, (R, B) edge mask)
        # dr = 0 (never an edge in the first column, …cpp:712)
        emits.append((V, edge_at(V, ok0 * dgt)))

        up_acc = ok0f
        for k in range(1, V + 1):
            i = V - k
            up_acc = up_acc * ok_at(i)
            emits.append((i, edge_at(i, up_acc)))

        dn_acc = dgt
        for k in range(1, V + 1):
            i = V + k
            dn_acc = dn_acc * ok_at(i)
            emits.append((i, edge_at(i, dn_acc)))

        w0 = jnp.zeros((R, B), jnp.int32)
        w1 = jnp.zeros((R, B), jnp.int32)
        # reverse-mask strips: bit dr at (q_r, q_wc) = forward edge of the
        # source point (q_r - dr, q_wc + dc); built here so the CC sweep
        # needs no per-(dc, dr) mask rolls at all.  All emits share the
        # column range [2H, 2H+B), so row placement is a sublane-axis
        # concatenate (DUS / .at on values does not lower in Mosaic TC).
        rv0 = jnp.zeros((PR, B), jnp.int32)
        rv1 = jnp.zeros((PR, B), jnp.int32)
        def placed(v, i):
            # v placed at rows [i, i+R) of a (PR, B) strip: offset-0
            # aligned concat (Mosaic rejects concats at unaligned sublane
            # offsets) + static sublane roll.  Rows [R, PR) are zero and
            # i <= PR - R, so the roll wrap-around brings in only zeros.
            base = jnp.concatenate(
                [v, jnp.zeros((PR - R, B), jnp.int32)], axis=0
            )
            return pltpu.roll(base, i, axis=0) if i else base

        for i, e in emits:
            if i < 32:
                w0 = w0 | (e << i)
                rv0 = rv0 | placed(e << i, i)
            else:
                w1 = w1 | (e << (i - 32))
                rv1 = rv1 | placed(e << (i - 32), i)

        bits_ref[dc, 0] = w0
        bits_ref[dc, 1] = w1
        # reverse words: strip batch col b lands at window col (b + H - dc).
        # Place the strip at canvas cols [H, H+B) (window coords start at
        # canvas col 0 here) and roll by -dc; the output slice then starts
        # at lane 0, keeping every concat/store at offset-{0,0} layouts.
        for rv, word in ((rv0, 0), (rv1, 1)):
            canvas = jnp.concatenate(
                [
                    jnp.zeros((PR, H), jnp.int32),
                    rv,
                    jnp.zeros((PR, PW - H - B), jnp.int32),
                ],
                axis=1,
            )
            brev_ref[dc, word] = pltpu.roll(canvas, PW - dc, axis=1)[
                V : V + R, 0:WCOL
            ]
        return 0

    jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)


def edge_bits_pallas(config: Config, xw, yw, zw, incw, active_w, mad, wp,
                     max_wp) -> jax.Array:
    """Fused neighbor-search kernel: returns (bits, bits_rev) — the
    (H+1, 2, R, B) forward edge bitmasks (bit-identical to the XLA
    formulation in ``association._edge_bits``) plus the pre-shifted
    (H+1, 2, R, WCOL) reverse masks the CC sweep's pull-right needs."""
    cl = config.clustering
    H, V = cl.max_steps_in_row, cl.max_steps_in_column
    R, WCOL = active_w.shape
    B = WCOL - H
    PW = _padded_width(WCOL, H)
    PR = R + 2 * V
    upper = jnp.minimum(max_wp, H) + 1
    max_d2 = float(cl.max_distance) * float(cl.max_distance)

    kernel = functools.partial(_edge_bits_kernel, H, V, R, B, WCOL, max_d2)
    f32s = [pltpu.VMEM((PR, PW), jnp.float32) for _ in range(4)]
    i32s = [pltpu.VMEM((PR, PW), jnp.int32)]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((H + 1, 2, R, B), jnp.int32),
            jax.ShapeDtypeStruct((H + 1, 2, R, WCOL), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        + [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=f32s + i32s + f32s + i32s,
        interpret=os.environ.get("CCT_PALLAS_INTERPRET", "0") == "1",
    )(
        xw, yw, zw, incw, active_w.astype(jnp.int32),
        mad, wp, jnp.asarray(upper, jnp.int32).reshape(1, 1),
    )

"""Bisect the Mosaic 'Invalid vector register cast' in the CC sweep kernel.

Compiles a sequence of progressively fuller kernel variants at small shapes
and reports which construct first breaks lowering.  Results feed the
ARCHITECTURE.md Pallas decision (VERDICT item 5).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, V, R, B = 20, 20, 32, 128
WCOL = H + B
PW = -(-(WCOL + 2 * H) // 128) * 128
INF = R * WCOL  # python int: jnp constants get captured by pallas
n_dr = 2 * V + 1


def probe(name, kernel, n_scratch=2):
    bits = jnp.zeros((H + 1, 2, R, B), jnp.int32)
    L = jnp.arange(R * WCOL, dtype=jnp.int32).reshape(R, WCOL)
    upper = jnp.asarray(H + 1, jnp.int32).reshape(1, 1)
    try:
        f = jax.jit(
            lambda b, u, l: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, WCOL), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((R + 2 * V, PW), jnp.int32)
                    for _ in range(n_scratch)
                ],
            )(b, u, l)
        )
        f.lower(bits, upper, L).compile()
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "Mosaic" in l or "nsupported" in l]
        print(f"{name}: FAIL {key[:1] or msg[:120]}", flush=True)
        return False


# V0: scratch init + copy out only
def k0(bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref, mpad_ref):
    lpad_ref[:, :] = jnp.full((R + 2 * V, PW), INF, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]
    out_ref[:, :] = lpad_ref[V : V + R, H : H + WCOL]


# V1: + one static row slice at odd offset + lane roll with STATIC amount
def k1(bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref, mpad_ref):
    lpad_ref[:, :] = jnp.full((R + 2 * V, PW), INF, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]
    a = lpad_ref[3 : 3 + R, :]
    nb = pltpu.roll(a, 5, axis=1)[:, H : H + WCOL]
    out_ref[:, :] = jnp.minimum(lpad_ref[V : V + R, H : H + WCOL], nb)


# V2: + dynamic lane roll amount (fori index)
def k2(bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref, mpad_ref):
    lpad_ref[:, :] = jnp.full((R + 2 * V, PW), INF, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]

    def body(dc, _):
        a = lpad_ref[3 : 3 + R, :]
        nb = pltpu.roll(a, dc, axis=1)[:, H : H + WCOL]
        cur = lpad_ref[V : V + R, H : H + WCOL]
        lpad_ref[V : V + R, H : H + WCOL] = jnp.minimum(cur, nb)
        return 0

    jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)
    out_ref[:, :] = lpad_ref[V : V + R, H : H + WCOL]


# V3: + bit-extracted bool mask from a dynamically indexed bits word
def k3(bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref, mpad_ref):
    lpad_ref[:, :] = jnp.full((R + 2 * V, PW), INF, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]

    def body(dc, _):
        w0 = bits_ref[dc, 0]
        for dr_idx in range(0, n_dr, 17):  # a few static drs
            m = ((w0 >> (dr_idx % 32)) & 1) == 1
            mfull = jnp.concatenate([jnp.zeros((R, H), jnp.bool_), m], axis=1)
            a = lpad_ref[dr_idx : dr_idx + R, :]
            nb = pltpu.roll(a, dc, axis=1)[:, H : H + WCOL]
            cur = lpad_ref[V : V + R, H : H + WCOL]
            lpad_ref[V : V + R, H : H + WCOL] = jnp.minimum(
                cur, jnp.where(mfull, nb, INF)
            )
        return 0

    jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)
    out_ref[:, :] = lpad_ref[V : V + R, H : H + WCOL]


# V3i: same but all-i32 masks (no bool vectors)
def k3i(bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref, mpad_ref):
    lpad_ref[:, :] = jnp.full((R + 2 * V, PW), INF, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]

    def body(dc, _):
        w0 = bits_ref[dc, 0]
        for dr_idx in range(0, n_dr, 17):
            mi = (w0 >> (dr_idx % 32)) & 1  # (R, B) i32
            mfull = jnp.concatenate([jnp.zeros((R, H), jnp.int32), mi], axis=1)
            a = lpad_ref[dr_idx : dr_idx + R, :]
            nb = pltpu.roll(a, dc, axis=1)[:, H : H + WCOL]
            cand = mfull * nb + (1 - mfull) * INF
            cur = lpad_ref[V : V + R, H : H + WCOL]
            lpad_ref[V : V + R, H : H + WCOL] = jnp.minimum(cur, cand)
        return 0

    jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)
    out_ref[:, :] = lpad_ref[V : V + R, H : H + WCOL]


# V4: + the mask scratch write at a lane offset (the pull-right machinery)
def k4(bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref, mpad_ref):
    lpad_ref[:, :] = jnp.full((R + 2 * V, PW), INF, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]
    mpad_ref[:, :] = jnp.zeros((R + 2 * V, PW), jnp.int32)

    def body(dc, _):
        w0 = bits_ref[dc, 0]
        for dr_idx in range(0, n_dr, 17):
            mi = (w0 >> (dr_idx % 32)) & 1
            mpad_ref[V : V + R, 2 * H : 2 * H + B] = mi
            b = lpad_ref[2 * V - dr_idx : 2 * V - dr_idx + R, :]
            src = pltpu.roll(b, -dc, axis=1)[:, H : H + WCOL]
            mrow = mpad_ref[2 * V - dr_idx : 2 * V - dr_idx + R, :]
            ms = pltpu.roll(mrow, -dc, axis=1)[:, H : H + WCOL]
            cand = ms * src + (1 - ms) * INF
            cur = lpad_ref[V : V + R, H : H + WCOL]
            lpad_ref[V : V + R, H : H + WCOL] = jnp.minimum(cur, cand)
        return 0

    jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)
    out_ref[:, :] = lpad_ref[V : V + R, H : H + WCOL]


# V5: f32 compare -> immediate i32 astype -> arithmetic select (the pattern
# an edge-bits kernel needs; NaN must behave like the reference: no break)
def k5(bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref, mpad_ref):
    lpad_ref[:, :] = jnp.full((R + 2 * V, PW), INF, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]

    def body(dc, _):
        cur = lpad_ref[V : V + R, H : H + WCOL]
        f = cur.astype(jnp.float32)
        bad = (jnp.abs(f - 3.0) > 1.5).astype(jnp.int32)
        ok = 1 - bad
        acc = ok
        for k in range(3):  # running prefix product in registers
            nb = pltpu.roll(lpad_ref[k : k + R, :], dc, axis=1)[:, H : H + WCOL]
            okk = 1 - (jnp.abs(nb.astype(jnp.float32)) > 2.0).astype(jnp.int32)
            acc = acc * okk
            cur = jnp.minimum(cur, acc * nb + (1 - acc) * INF)
        lpad_ref[V : V + R, H : H + WCOL] = cur
        return 0

    jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)
    out_ref[:, :] = lpad_ref[V : V + R, H : H + WCOL]


# V6: bit packing (shift by static amount, accumulate words) + f32 scratch
def k6(bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref, mpad_ref):
    lpad_ref[:, :] = jnp.zeros((R + 2 * V, PW), jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]

    def body(dc, _):
        w = jnp.zeros((R, WCOL), jnp.int32)
        for k in range(3):
            nb = pltpu.roll(lpad_ref[k : k + R, :], dc, axis=1)[:, H : H + WCOL]
            bit = (jnp.abs(nb.astype(jnp.float32)) < 5.0).astype(jnp.int32)
            w = w | (bit << k)
        mpad_ref[V : V + R, H : H + WCOL] = w
        return 0

    jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)
    out_ref[:, :] = mpad_ref[V : V + R, H : H + WCOL]


if __name__ == "__main__":
    for name, k in [("V0_init_copy", k0), ("V1_static_slice_roll", k1),
                    ("V2_dynamic_roll", k2), ("V3_bool_mask", k3),
                    ("V3i_i32_mask", k3i), ("V4_mask_scratch", k4),
                    ("V5_cmp_astype_prefix", k5), ("V6_bitpack", k6)]:
        probe(name, k)

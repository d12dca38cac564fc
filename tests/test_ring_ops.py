"""Unit tests for the contiguous ring read/write primitives."""

import numpy as np
import jax.numpy as jnp
import pytest

from continuous_clustering_tpu.ops.state import ring_read, ring_write


def _ref_write(arr, lcol0, vals):
    out = np.array(arr)
    rc = out.shape[1]
    for i in range(vals.shape[1]):
        out[:, (lcol0 + i) % rc] = vals[:, i]
    return out


@pytest.mark.parametrize("lcol0", [0, 3, 7, 9])
@pytest.mark.parametrize("width", [1, 4, 10])
def test_ring_write_matches_reference(lcol0, width):
    rng = np.random.default_rng(lcol0 * 100 + width)
    arr = rng.normal(size=(5, 10)).astype(np.float32)
    vals = rng.normal(size=(5, width)).astype(np.float32)
    got = np.asarray(ring_write(jnp.asarray(arr), jnp.asarray(lcol0), jnp.asarray(vals)))
    np.testing.assert_array_equal(got, _ref_write(arr, lcol0, vals))


def test_ring_write_full_width_wrap():
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(3, 8)).astype(np.float32)
    vals = rng.normal(size=(3, 8)).astype(np.float32)
    for lcol0 in (0, 5):
        got = np.asarray(ring_write(jnp.asarray(arr), jnp.asarray(lcol0), jnp.asarray(vals)))
        np.testing.assert_array_equal(got, _ref_write(arr, lcol0, vals))


def test_ring_write_casts_to_array_dtype():
    arr = jnp.zeros((2, 6), jnp.int32)
    vals = jnp.ones((2, 3), jnp.float32) * 7
    got = ring_write(arr, jnp.asarray(4), vals)
    assert got.dtype == jnp.int32
    np.testing.assert_array_equal(
        np.asarray(got), _ref_write(np.zeros((2, 6), np.int32), 4, np.full((2, 3), 7))
    )


@pytest.mark.parametrize("lcol0", [0, 6, 9])
def test_ring_read_write_roundtrip(lcol0):
    rng = np.random.default_rng(lcol0)
    arr = rng.normal(size=(4, 10)).astype(np.float32)
    vals = rng.normal(size=(4, 7)).astype(np.float32)
    written = ring_write(jnp.asarray(arr), jnp.asarray(lcol0), jnp.asarray(vals))
    back = np.asarray(ring_read(written, jnp.asarray(lcol0), 7))
    np.testing.assert_array_equal(back, vals)


@pytest.mark.parametrize("lcol0", [0, 2, 3, 9])
@pytest.mark.parametrize("width", [1, 4, 7, 10])
def test_ring_read_stack_matches_per_field(lcol0, width):
    """The stacked multi-plane read (one shared wrap correction) must equal
    per-field ring_read bit-for-bit across dtypes, including wraps."""
    from continuous_clustering_tpu.ops.state import ring_read_stack
    import jax

    rng = np.random.default_rng(lcol0 * 10 + width)
    f = rng.normal(size=(4, 10)).astype(np.float32)
    u = rng.integers(0, 2**32, size=(4, 10), dtype=np.uint32)
    i = rng.integers(-50, 50, size=(4, 10)).astype(np.int32)
    b = rng.random((4, 10)) < 0.5
    planes = [jnp.asarray(a) for a in (f, u, i, b)]
    got = np.asarray(ring_read_stack(planes, jnp.asarray(lcol0), width))
    for k, p in enumerate(planes):
        want = ring_read(p, jnp.asarray(lcol0), width)
        if want.dtype in (jnp.float32, jnp.uint32):
            want = jax.lax.bitcast_convert_type(want, jnp.int32)
        else:
            want = want.astype(jnp.int32)
        np.testing.assert_array_equal(got[k], np.asarray(want))

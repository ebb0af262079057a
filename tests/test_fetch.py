"""Packed single-transfer host<->device transport (utils/fetch):
round-trip exactness for float/bool/int leaves, and the mantissa
guards that turn silent int rounding into loud errors."""

import jax.numpy as jnp
import numpy as np
import pytest

from xrslam_tpu.utils.fetch import fetch_packed, put_packed


def test_roundtrip_mixed_dtypes():
    arrays = (
        np.arange(12, dtype=np.float64).reshape(3, 4) * 0.37,
        np.array([True, False, True]),
        np.arange(7, dtype=np.int32) - 3,
        np.float32(2.5) * np.ones((2, 2), np.float32),
    )
    dev = put_packed(arrays)
    back = fetch_packed(dev)
    for a, b in zip(arrays, back):
        assert a.shape == np.asarray(b).shape
        np.testing.assert_array_equal(a, np.asarray(b))


def test_put_packed_rejects_wide_ints():
    # beyond the f32 mantissa with no f64 leaf present -> must raise,
    # not silently round
    big = np.array([1 << 25], dtype=np.int64)
    with pytest.raises(ValueError, match="mantissa"):
        put_packed((np.float32(1.0) * np.ones(2, np.float32), big))
    # exactly representable stays fine
    ok = np.array([(1 << 24) - 1], dtype=np.int64)
    out = put_packed((np.float32(1.0) * np.ones(2, np.float32), ok))
    assert int(np.asarray(out[1])[0]) == (1 << 24) - 1


def test_fetch_packed_rejects_wide_ints():
    import jax

    f32_only = jax.dtypes.canonicalize_dtype(jnp.float64) == jnp.float32
    big_val = (1 << 25) if f32_only else (1 << 54)
    dtype = jnp.int32 if f32_only else jnp.int64
    big = jnp.asarray(np.array([big_val - 1, 3], dtype=np.int64), dtype=dtype)
    small = jnp.asarray(np.array([5, -7], dtype=np.int64), dtype=dtype)
    with pytest.raises(ValueError, match="mantissa"):
        fetch_packed((jnp.ones(3), big))
    a, b = fetch_packed((jnp.ones(3), small))
    np.testing.assert_array_equal(np.asarray(b), [5, -7])

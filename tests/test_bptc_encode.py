"""BC7 synthetic-data encoders (ops/bptc_encode.py): the decode of an
encoded block must equal the predicted closed form, through our own
decoder stack (which is itself golden-tested against the C reference;
decompress-bptc.c:354-512)."""

import numpy as np

from detex_tpu.ops import bptc_encode as E
from detex_tpu.ops import bptc_fast
from detex_tpu.ops.bitops import words_from_bytes


def _decode(words_i32: np.ndarray):
    w = words_from_bytes(
        np.ascontiguousarray(words_i32).view(np.uint8).reshape(-1, 16))
    pix, valid = bptc_fast.decode_bptc_fast(w)
    assert np.asarray(valid).all()
    return np.ascontiguousarray(np.asarray(pix)).astype(np.uint32) \
        .view(np.uint8).reshape(-1, 16, 4)


def test_mode6_gray_roundtrip():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32), np.uint8)
    px = _decode(E.encode_bc7_mode6_gray(img))
    blocks = img.reshape(8, 4, 8, 4).transpose(0, 2, 1, 3).reshape(-1, 16)
    idx = (blocks >> 4).astype(np.int64)
    idx[:, 0] = np.minimum(idx[:, 0], 7)
    exp = E.decode_mode6_gray_value(idx)
    for c in range(3):
        np.testing.assert_array_equal(px[:, :, c], exp)
    assert (px[:, :, 3] == 254).all()


def test_mode5_solid_roundtrip():
    rng = np.random.default_rng(12)
    cols = rng.integers(0, 256, (128, 4), np.uint8)
    px = _decode(E.encode_bc7_mode5_solid(cols))
    exp = E.decode_mode5_solid_value(cols)
    for p in range(16):
        np.testing.assert_array_equal(px[:, p, :], exp)


def test_mode6_matches_env_decode_path():
    """decode_obs (the control/runtime path) on an encoded image
    reproduces the image's quantized grayscale exactly."""
    import jax.numpy as jnp

    from detex_tpu.mpc.runtime import decode_obs

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 16), np.uint8)
    words = E.encode_bc7_mode6_gray(img)
    out = np.asarray(decode_obs(jnp.asarray(words), 16, 16))
    idx = (img >> 4).astype(np.int64)
    # anchor clamp applies to pixel 0 of each 4x4 block
    idx[0::4, 0::4] = np.minimum(idx[0::4, 0::4], 7)
    exp = E.decode_mode6_gray_value(idx)
    np.testing.assert_array_equal(out[:, :, 0], exp)
    np.testing.assert_array_equal(out[:, :, 1], exp)
    np.testing.assert_array_equal(out[:, :, 2], exp)
    assert (out[:, :, 3] == 254).all()

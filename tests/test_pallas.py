"""Pallas kernel tests: run the fused TPU kernels through the Pallas
interpreter on CPU and require bit-exactness against the same golden
vectors (and jnp reference decoders) as the XLA paths."""

import numpy as np
import pytest

from detex_tpu.ops import bptc_fast
from detex_tpu.ops.bitops import words_from_bytes
from detex_tpu.ops.pallas import bptc_pallas

_TILE = 128  # small tile: exercises the grid loop in interpret mode


def _decode(blocks_u8, mode_mask=0xFFFFFFFF, flags=0):
    words = words_from_bytes(blocks_u8)
    pix, valid = bptc_pallas.decode_bptc(words, int(mode_mask), int(flags),
                                         interpret=True, tile=_TILE)
    out = np.asarray(pix).view(np.uint32).view(np.uint8).reshape(
        pix.shape[0], -1)
    valid = np.asarray(valid)
    return np.where(valid[:, None], out, 0).astype(np.uint8), valid


def test_bptc_pallas_goldens(golden):
    g = golden("BPTC")
    for prefix in ("corpus", "random"):
        out, valid = _decode(g[f"{prefix}_blocks"])
        np.testing.assert_array_equal(valid, g[f"{prefix}_valid"])
        np.testing.assert_array_equal(out, g[f"{prefix}_out"])
    vi = 0
    while f"variant{vi}_out" in g:
        out, valid = _decode(g["random_blocks"],
                             int(g[f"variant{vi}_mask"]),
                             int(g[f"variant{vi}_flags"]))
        np.testing.assert_array_equal(valid, g[f"variant{vi}_valid"])
        np.testing.assert_array_equal(out, g[f"variant{vi}_out"])
        vi += 1


def test_bptc_pallas_random_vs_fast():
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, (2048, 16), np.uint8)
    w = words_from_bytes(blocks)
    p0, v0 = bptc_fast.decode_bptc_fast(w)
    p1, v1 = bptc_pallas.decode_bptc(w, interpret=True, tile=_TILE)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_bptc_pallas_planar_and_padding():
    # N not a multiple of the tile exercises the padding path.
    rng = np.random.default_rng(8)
    blocks = rng.integers(0, 256, (1000, 16), np.uint8)
    w = words_from_bytes(blocks)
    p0, v0 = bptc_fast.decode_bptc_fast(w)
    pix, valid = bptc_pallas.decode_bptc_planar(np.asarray(w).T,
                                                interpret=True, tile=_TILE)
    assert pix.shape == (16, 1000)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(pix).T)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(valid))

"""Pallas kernel tests: run the fused TPU kernels through the Pallas
interpreter on CPU and require bit-exactness against the same golden
vectors (and jnp reference decoders) as the XLA paths.

With DETEX_TEST_TPU=1 on a real TPU backend the same tests run the
COMPILED kernels instead (interpret=False), making a green run a
hardware-correctness witness for every family (VERDICT r2 missing #3;
reference analogue: validate.c's role)."""

import functools
import os

import numpy as np
import pytest

from detex_tpu.ops import bc as bcj
from detex_tpu.ops import bptc_fast
from detex_tpu.ops import bptc_float as bfj
from detex_tpu.ops import eac as eacj
from detex_tpu.ops import etc as etcj
from detex_tpu.ops import rgtc as rgj
from detex_tpu.ops.bitops import words_from_bytes
from detex_tpu.ops.pallas import (bc_pallas, bptc_float_pallas,
                                  bptc_pallas, etc_eac_pallas)

_TILE = 128  # small tile: exercises the grid loop in interpret mode

# On a real TPU (DETEX_TEST_TPU=1) run the compiled kernels; elsewhere
# use the Pallas interpreter on CPU.
import jax as _jax
_INTERPRET = not (os.environ.get("DETEX_TEST_TPU")
                  and _jax.default_backend() == "tpu")


def _decode(blocks_u8, mode_mask=0xFFFFFFFF, flags=0):
    words = words_from_bytes(blocks_u8)
    pix, valid = bptc_pallas.decode_bptc(words, int(mode_mask), int(flags),
                                         interpret=_INTERPRET, tile=_TILE)
    out = np.ascontiguousarray(np.asarray(pix)).view(np.uint32) \
        .view(np.uint8).reshape(pix.shape[0], -1)
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
    p1, v1 = bptc_pallas.decode_bptc(w, interpret=_INTERPRET, tile=_TILE)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


# golden family -> (pallas decoder, jnp decoder, block bytes, packer)
_ETC_EAC = {
    "ETC1": (etc_eac_pallas.decode_etc1, etcj.decode_etc1, 8, "u32"),
    "ETC2": (etc_eac_pallas.decode_etc2, etcj.decode_etc2, 8, "u32"),
    "ETC2_PUNCHTHROUGH": (etc_eac_pallas.decode_etc2_punchthrough,
                          etcj.decode_etc2_punchthrough, 8, "u32"),
    "ETC2_EAC": (etc_eac_pallas.decode_etc2_eac, etcj.decode_etc2_eac,
                 16, "u32"),
    "EAC_R11": (etc_eac_pallas.decode_eac_r11, eacj.decode_eac_r11,
                8, "u16"),
    "EAC_RG11": (etc_eac_pallas.decode_eac_rg11, eacj.decode_eac_rg11,
                 16, "u16"),
    "EAC_SIGNED_R11": (etc_eac_pallas.decode_eac_signed_r11,
                       eacj.decode_eac_signed_r11, 8, "i16"),
    "EAC_SIGNED_RG11": (etc_eac_pallas.decode_eac_signed_rg11,
                        eacj.decode_eac_signed_rg11, 16, "i16"),
}


def _pack_kind(pix, kind):
    a = np.ascontiguousarray(np.asarray(pix))
    n = a.shape[0]
    if kind == "u32":
        return a.view(np.uint32).view(np.uint8).reshape(n, -1)
    if kind == "u8":
        return np.ascontiguousarray(
            a.astype(np.uint8).reshape(n, -1))
    if kind == "i16":
        return np.ascontiguousarray(
            a.astype(np.int16).reshape(n, -1)).view(np.uint8)
    return np.ascontiguousarray(
        a.astype(np.uint16).reshape(n, -1)).view(np.uint8)


@pytest.mark.parametrize("family", list(_ETC_EAC))
def test_etc_eac_pallas_goldens(family, golden):
    p_fn, _, _, kind = _ETC_EAC[family]
    g = golden(family)
    for prefix in ("corpus", "random"):
        if f"{prefix}_blocks" not in g:
            continue
        w = words_from_bytes(g[f"{prefix}_blocks"])
        pix, valid = p_fn(w, interpret=_INTERPRET, tile=_TILE)
        out = _pack_kind(pix, kind)
        valid = np.asarray(valid)
        out = np.where(valid[:, None], out, 0).astype(np.uint8)
        np.testing.assert_array_equal(valid, g[f"{prefix}_valid"],
                                      err_msg=f"{family} {prefix}")
        np.testing.assert_array_equal(out, g[f"{prefix}_out"],
                                      err_msg=f"{family} {prefix}")
    vi = 0
    while f"variant{vi}_out" in g:
        w = words_from_bytes(g["random_blocks"])
        pix, valid = p_fn(w, int(g[f"variant{vi}_mask"]),
                          int(g[f"variant{vi}_flags"]),
                          interpret=_INTERPRET, tile=_TILE)
        out = _pack_kind(pix, kind)
        valid = np.asarray(valid)
        out = np.where(valid[:, None], out, 0).astype(np.uint8)
        np.testing.assert_array_equal(valid, g[f"variant{vi}_valid"],
                                      err_msg=f"{family} v{vi}")
        np.testing.assert_array_equal(out, g[f"variant{vi}_out"],
                                      err_msg=f"{family} v{vi}")
        vi += 1


@pytest.mark.parametrize("family", list(_ETC_EAC))
def test_etc_eac_pallas_random_vs_jnp(family):
    p_fn, j_fn, bs, _ = _ETC_EAC[family]
    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, (1500, bs), np.uint8)
    w = words_from_bytes(blocks)
    p0, v0 = j_fn(w)
    p1, v1 = p_fn(w, interpret=_INTERPRET, tile=_TILE)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


@pytest.mark.parametrize("family,signed", [("BPTC_FLOAT", False),
                                           ("BPTC_SIGNED_FLOAT", True)])
def test_bc6h_pallas_goldens(family, signed, golden):
    p_fn = (bptc_float_pallas.decode_bptc_signed_float if signed
            else bptc_float_pallas.decode_bptc_float)
    g = golden(family)
    for prefix in ("corpus", "random"):
        if f"{prefix}_blocks" not in g:
            continue
        w = words_from_bytes(g[f"{prefix}_blocks"])
        pix, valid = p_fn(w, interpret=_INTERPRET, tile=_TILE)
        out = _pack_kind(pix, "u16")
        valid = np.asarray(valid)
        out = np.where(valid[:, None], out, 0).astype(np.uint8)
        np.testing.assert_array_equal(valid, g[f"{prefix}_valid"],
                                      err_msg=f"{family} {prefix}")
        np.testing.assert_array_equal(out, g[f"{prefix}_out"],
                                      err_msg=f"{family} {prefix}")


@pytest.mark.parametrize("signed", [False, True])
def test_bc6h_pallas_random_vs_jnp(signed):
    j_fn = (bfj.decode_bptc_signed_float if signed
            else bfj.decode_bptc_float)
    p_fn = (bptc_float_pallas.decode_bptc_signed_float if signed
            else bptc_float_pallas.decode_bptc_float)
    rng = np.random.default_rng(13)
    blocks = rng.integers(0, 256, (1000, 16), np.uint8)
    w = words_from_bytes(blocks)
    p0, v0 = j_fn(w, 0x2AAA, 0)
    p1, v1 = p_fn(w, 0x2AAA, 0, interpret=_INTERPRET, tile=_TILE)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_bptc_pallas_planar_and_padding():
    # N not a multiple of the tile exercises the padding path.
    rng = np.random.default_rng(8)
    blocks = rng.integers(0, 256, (1000, 16), np.uint8)
    w = words_from_bytes(blocks)
    p0, v0 = bptc_fast.decode_bptc_fast(w)
    pix, valid = bptc_pallas.decode_bptc_planar(np.asarray(w).T,
                                                interpret=_INTERPRET, tile=_TILE)
    assert pix.shape == (16, 1000)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(pix).T)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(valid))


def test_bptc_pallas_all_partitions_vs_jnp():
    """Directed sweep of every partition id through the 2- and
    3-subset modes: exercises the packed anchor-position tree and the
    prefix-popcount anchors-before derivation (bptc_pallas round-3
    table compression) for all 64 psids, not just the random draw."""
    rng = np.random.default_rng(21)
    blocks = []
    for mode, pb_bits in ((0, 4), (1, 6), (2, 6), (3, 6), (7, 6)):
        for psid in range(1 << pb_bits):
            b = rng.integers(0, 256, 16, np.uint8)
            # mode prefix: lowest set bit at `mode`, then psid bits
            bits = (1 << mode) | (psid << (mode + 1))
            b[0] = bits & 0xFF
            if mode + 1 + pb_bits > 8:
                b[1] = (bits >> 8) & 0xFF
            blocks.append(b)
    blocks = np.stack(blocks)
    w = words_from_bytes(blocks)
    p0, v0 = bptc_fast.decode_bptc_fast(w)
    p1, v1 = bptc_pallas.decode_bptc(w, interpret=_INTERPRET,
                                     tile=_TILE)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


# golden family -> (pallas decoder, jnp decoder, block bytes, packer)
_BC_RGTC = {
    "BC1": (bc_pallas.decode_bc1, bcj.decode_bc1, 8, "u32"),
    "BC1A": (bc_pallas.decode_bc1a, bcj.decode_bc1a, 8, "u32"),
    "BC2": (bc_pallas.decode_bc2, bcj.decode_bc2, 16, "u32"),
    "BC3": (bc_pallas.decode_bc3, bcj.decode_bc3, 16, "u32"),
    "RGTC1": (bc_pallas.decode_rgtc1, rgj.decode_rgtc1, 8, "u8"),
    "RGTC2": (bc_pallas.decode_rgtc2, rgj.decode_rgtc2, 16, "u8"),
    "SIGNED_RGTC1": (bc_pallas.decode_signed_rgtc1,
                     rgj.decode_signed_rgtc1, 8, "i16"),
    "SIGNED_RGTC2": (bc_pallas.decode_signed_rgtc2,
                     rgj.decode_signed_rgtc2, 16, "i16"),
}


@pytest.mark.parametrize("family", list(_BC_RGTC))
def test_bc_rgtc_pallas_goldens(family, golden):
    p_fn, _, _, kind = _BC_RGTC[family]
    g = golden(family)
    for prefix in ("corpus", "random"):
        if f"{prefix}_blocks" not in g:
            continue
        w = words_from_bytes(g[f"{prefix}_blocks"])
        pix, valid = p_fn(w, interpret=_INTERPRET, tile=_TILE)
        out = _pack_kind(pix, kind)
        valid = np.asarray(valid)
        out = np.where(valid[:, None], out, 0).astype(np.uint8)
        np.testing.assert_array_equal(valid, g[f"{prefix}_valid"],
                                      err_msg=f"{family} {prefix}")
        np.testing.assert_array_equal(out, g[f"{prefix}_out"],
                                      err_msg=f"{family} {prefix}")
    vi = 0
    while f"variant{vi}_out" in g:
        w = words_from_bytes(g["random_blocks"])
        pix, valid = p_fn(w, int(g[f"variant{vi}_mask"]),
                          int(g[f"variant{vi}_flags"]),
                          interpret=_INTERPRET, tile=_TILE)
        out = _pack_kind(pix, kind)
        valid = np.asarray(valid)
        out = np.where(valid[:, None], out, 0).astype(np.uint8)
        np.testing.assert_array_equal(valid, g[f"variant{vi}_valid"],
                                      err_msg=f"{family} v{vi}")
        np.testing.assert_array_equal(out, g[f"variant{vi}_out"],
                                      err_msg=f"{family} v{vi}")
        vi += 1


@pytest.mark.parametrize("family", list(_BC_RGTC))
def test_bc_rgtc_pallas_random_vs_jnp(family):
    p_fn, j_fn, bs, _ = _BC_RGTC[family]
    rng = np.random.default_rng(17)
    blocks = rng.integers(0, 256, (1500, bs), np.uint8)
    w = words_from_bytes(blocks)
    for flags in (0, 1, 2, 4):
        p0, v0 = j_fn(w, 0xFFFFFFFF, flags)
        p1, v1 = p_fn(w, 0xFFFFFFFF, flags, interpret=_INTERPRET,
                      tile=_TILE)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1),
                                      err_msg=f"{family} fl={flags}")
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1),
                                      err_msg=f"{family} fl={flags}")


# --- packed-payload entry points (the engine's decode path) ----------
# family -> (packed decoder, golden family, block bytes, payload bytes)
_PACKED = {
    "RGTC1": (bc_pallas.decode_rgtc1_packed, 8, 16),
    "RGTC2": (bc_pallas.decode_rgtc2_packed, 16, 32),
    "SIGNED_RGTC1": (bc_pallas.decode_signed_rgtc1_packed, 8, 32),
    "SIGNED_RGTC2": (bc_pallas.decode_signed_rgtc2_packed, 16, 64),
    "EAC_R11": (etc_eac_pallas.decode_eac_r11_packed, 8, 32),
    "EAC_SIGNED_R11": (etc_eac_pallas.decode_eac_signed_r11_packed,
                       8, 32),
    "EAC_RG11": (etc_eac_pallas.decode_eac_rg11_packed, 16, 64),
    "EAC_SIGNED_RG11": (etc_eac_pallas.decode_eac_signed_rg11_packed,
                        16, 64),
    "BPTC_FLOAT": (bptc_float_pallas.decode_bptc_float_packed, 16, 128),
    "BPTC_SIGNED_FLOAT": (bptc_float_pallas.decode_bptc_signed_float_packed,
                          16, 128),
}


@pytest.mark.parametrize("family", list(_PACKED))
def test_packed_payload_vs_goldens(family, golden):
    """The packed kernels' little-endian byte stream must equal the
    golden native pixel bytes exactly — the packed word layout IS the
    reference pixel_buffer layout (detex.h:879-930), with zero write
    amplification (payload bytes asserted too)."""
    p_fn, _bs, payload = _PACKED[family]
    g = golden(family)
    for prefix in ("corpus", "random"):
        if f"{prefix}_blocks" not in g:
            continue
        w = words_from_bytes(g[f"{prefix}_blocks"])
        pk, valid = p_fn(w, interpret=_INTERPRET, tile=_TILE)
        assert pk.shape[1] * 4 == payload, \
            f"{family}: {pk.shape[1] * 4} B/block != payload {payload}"
        out = np.ascontiguousarray(np.asarray(pk)).view(np.uint32) \
            .view(np.uint8).reshape(pk.shape[0], -1)
        valid = np.asarray(valid)
        out = np.where(valid[:, None], out, 0).astype(np.uint8)
        np.testing.assert_array_equal(valid, g[f"{prefix}_valid"],
                                      err_msg=f"{family} {prefix}")
        np.testing.assert_array_equal(out, g[f"{prefix}_out"],
                                      err_msg=f"{family} {prefix}")

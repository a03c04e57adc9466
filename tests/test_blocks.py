"""Bit-exact golden tests for all block-decoder families.

Each decoder's native array output is packed to the reference's
pixel-buffer byte layout and compared byte-for-byte against the golden
vectors produced by the compiled C reference (tools/gen_goldens.py).
"""

import functools

import jax
import numpy as np
import pytest

from detex_tpu.ops import bc, bptc, bptc_fast, bptc_float, eac, etc, rgtc
from detex_tpu.ops.bitops import words_from_bytes


def _pack_u32(pix):
    return np.ascontiguousarray(np.asarray(pix)).view(np.uint32) \
        .view(np.uint8).reshape(pix.shape[0], -1)


def _pack_u8(pix):
    return np.ascontiguousarray(
        np.asarray(pix).astype(np.uint8)).reshape(pix.shape[0], -1)


def _pack_i16(pix):
    return np.ascontiguousarray(
        np.asarray(pix).astype(np.int16).reshape(pix.shape[0], -1)) \
        .view(np.uint8)


def _pack_u16(pix):
    return np.ascontiguousarray(
        np.asarray(pix).astype(np.uint16).reshape(pix.shape[0], -1)) \
        .view(np.uint8)


# family -> (decoder, packer)
FAMILIES = {
    "BC1": (bc.decode_bc1, _pack_u32),
    "BC1A": (bc.decode_bc1a, _pack_u32),
    "BC2": (bc.decode_bc2, _pack_u32),
    "BC3": (bc.decode_bc3, _pack_u32),
    "RGTC1": (rgtc.decode_rgtc1, _pack_u8),
    "RGTC2": (rgtc.decode_rgtc2, _pack_u8),
    "SIGNED_RGTC1": (rgtc.decode_signed_rgtc1, _pack_i16),
    "SIGNED_RGTC2": (rgtc.decode_signed_rgtc2, _pack_i16),
    "BPTC": (bptc.decode_bptc, _pack_u32),
    "BPTC_FAST": (bptc_fast.decode_bptc_fast, _pack_u32),
    "BPTC_FLOAT": (bptc_float.decode_bptc_float, _pack_u16),
    "BPTC_SIGNED_FLOAT": (bptc_float.decode_bptc_signed_float, _pack_u16),
    "ETC1": (etc.decode_etc1, _pack_u32),
    "ETC2": (etc.decode_etc2, _pack_u32),
    "ETC2_PUNCHTHROUGH": (etc.decode_etc2_punchthrough, _pack_u32),
    "ETC2_EAC": (etc.decode_etc2_eac, _pack_u32),
    "EAC_R11": (eac.decode_eac_r11, _pack_u16),
    "EAC_RG11": (eac.decode_eac_rg11, _pack_u16),
    "EAC_SIGNED_R11": (eac.decode_eac_signed_r11, _pack_i16),
    "EAC_SIGNED_RG11": (eac.decode_eac_signed_rg11, _pack_i16),
}


@functools.lru_cache(maxsize=None)
def _jitted(family):
    # mode_mask/flags are traced runtime scalars: one compile per
    # family covers every mask/flag variant.
    return jax.jit(FAMILIES[family][0])


def run_decoder(family, blocks_u8, mode_mask=0xFFFFFFFF, flags=0):
    _, pack = FAMILIES[family]
    words = words_from_bytes(blocks_u8)
    pix, valid = _jitted(family)(words, np.uint32(mode_mask),
                                 np.uint32(flags))
    out_bytes = pack(pix)
    valid = np.asarray(valid)
    # invalid blocks are zero-filled, mirroring texture.c:90-93
    out_bytes = np.where(valid[:, None], out_bytes, 0).astype(np.uint8)
    return out_bytes, valid


def check_family(golden, family):
    # BPTC_FAST is an alternate implementation validated against the
    # same goldens as BPTC.
    g = golden("BPTC" if family == "BPTC_FAST" else family)
    for prefix in ("corpus", "random"):
        if f"{prefix}_blocks" not in g:
            continue
        out, valid = run_decoder(family, g[f"{prefix}_blocks"])
        np.testing.assert_array_equal(valid, g[f"{prefix}_valid"],
                                      err_msg=f"{family} {prefix} valid")
        np.testing.assert_array_equal(out, g[f"{prefix}_out"],
                                      err_msg=f"{family} {prefix} pixels")
    vi = 0
    while f"variant{vi}_out" in g:
        mask = int(g[f"variant{vi}_mask"])
        flags = int(g[f"variant{vi}_flags"])
        out, valid = run_decoder(family, g["random_blocks"], mask, flags)
        np.testing.assert_array_equal(valid, g[f"variant{vi}_valid"],
                                      err_msg=f"{family} v{vi} valid")
        np.testing.assert_array_equal(out, g[f"variant{vi}_out"],
                                      err_msg=f"{family} v{vi} pixels")
        if f"variant{vi}_corpus_out" in g:
            out, valid = run_decoder(family, g["corpus_blocks"], mask, flags)
            np.testing.assert_array_equal(
                valid, g[f"variant{vi}_corpus_valid"])
            np.testing.assert_array_equal(out, g[f"variant{vi}_corpus_out"])
        vi += 1


@pytest.mark.parametrize("family", list(FAMILIES))
def test_block_decode_bit_exact(golden, family):
    check_family(golden, family)


def test_swar_clamp_biased_exhaustive_lane():
    """The ETC SWAR saturating clamp (etc_eac_pallas._swar_clamp_biased)
    must clamp every 10-bit lane value in [0, 1023] to [256, 511]
    independently per lane, for all three lanes at once."""
    import jax.numpy as jnp

    from detex_tpu.ops.pallas import etc_eac_pallas as EP

    vals = np.arange(1024, dtype=np.int64)
    want = np.clip(vals, 256, 511)
    # Sweep each lane with the other two lanes pinned at edge values.
    for other in (0, 256, 511, 1023):
        for lane in range(3):
            lanes = [np.full(1024, other, np.int64)] * 3
            lanes[lane] = vals
            packed = jnp.asarray(
                (lanes[0] | (lanes[1] << 10) | (lanes[2] << 20))
                .astype(np.int32))
            out = np.asarray(EP._swar_clamp_biased(packed)).astype(np.int64)
            got = (out >> (10 * lane)) & 0x3FF
            np.testing.assert_array_equal(got, want, err_msg=f"lane {lane}"
                                          f" other={other}")
            for ol in range(3):
                if ol == lane:
                    continue
                np.testing.assert_array_equal(
                    (out >> (10 * ol)) & 0x3FF,
                    np.clip(other, 256, 511), err_msg=f"bleed {ol}")

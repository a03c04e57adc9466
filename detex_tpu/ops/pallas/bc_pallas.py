"""BC1/BC1A/BC2/BC3 + RGTC (BC4/BC5, signed/unsigned) as fused Pallas
TPU kernels.

The pure-XLA jnp paths for these static-layout families already fuse
reasonably (1.0-1.5e9 blocks/s), but their formats are far simpler
than BC7 — a fused single-pass VPU kernel puts them at the HBM wall
instead.  Same contract and bit-exact semantics as ops.bc / ops.rgtc
(reference: decompress-bc.c:23-240, decompress-rgtc.c:26-147); the
shared plumbing mirrors etc_eac_pallas (blocks on (sublane, lane),
one VMEM-resident pass per tile).

Design notes:
  * BC1 palettes are built per block and packed as four RGBA8 words,
    so the per-pixel work is a 2-bit extract + one 4-way select of an
    already-packed pixel (~7 VPU ops/pixel — HBM-bound at that rate).
  * the truncating divisions use exhaustively-verified multiply-shift
    magics: //3 = *683>>11 (x<=2047), //7 = *9363>>16 (x<=1785),
    //5 = *13108>>16 (x<=1275); BC2's 4-bit alpha scale 255/15 is
    exactly *17.
  * the BC3/RGTC 3-bit code stream sits at STATIC offsets (bit 16+3i
    of a 64-bit block), so extraction is constant shifts — no funnel
    machinery needed.
  * the 8-entry alpha/luma palette is built once per block (incl. the
    signed [-127,127] -> [-32768,32767] mapping, applied to 8 palette
    entries instead of 16 pixels), then PACKED (u8: 4 entries/word,
    16-bit: 2/word) so each pixel does one cmpsel + a variable
    byte/halfword shift instead of a 7-cmpsel select tree.
  * outputs are the TRUE payload, packed little-endian — identical
    bytes to the reference pixel_buffer layouts (detex.h:879-930).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detex_tpu.ops import bc as BCJ
from detex_tpu.ops import rgtc as RGJ
from detex_tpu.ops.pallas import use_interpret

_FULL = 0xFFFFFFFF

# Exhaustive verification of the division magics over their ranges.
_x = np.arange(2048)
assert np.array_equal((_x * 683) >> 11, _x // 3)
_x = np.arange(1786)
assert np.array_equal((_x * 9363) >> 16, _x // 7)
_x = np.arange(1276)
assert np.array_equal((_x * 13108) >> 16, _x // 5)
assert np.array_equal((np.arange(16) * 17), np.arange(16) * 255 // 15)
# Signed RGTC mapping: (k*65535)//254 == 258*k + [k>=85] + [k>=170]
# + [k>=254] for k in [0, 254].
_k = np.arange(255)
assert np.array_equal(
    (_k * 65535) // 254,
    258 * _k + (_k >= 85) + (_k >= 170) + (_k >= 254))
del _x, _k


def _shr(x, n):
    return lax.shift_right_logical(x, n)


def _shl(x, n):
    return lax.shift_left(x, n)


def _div3(x):
    return _shr(x * 683, 11)


def _div7(x):
    return _shr(x * 9363, 16)


def _div5(x):
    return _shr(x * 13108, 16)


def _sel4(p, idx):
    """Select p[idx] from a 4-entry list by a 2-bit vector index."""
    b0 = (idx & 1) != 0
    lo = jnp.where(b0, p[1], p[0])
    hi = jnp.where(b0, p[3], p[2])
    return jnp.where((idx & 2) != 0, hi, lo)


def _pack_pal8_u8(p):
    """8 u8-valued entries -> two packed words (entries 0-3, 4-7)."""
    lo = p[0] | _shl(p[1], 8) | _shl(p[2], 16) | _shl(p[3], 24)
    hi = p[4] | _shl(p[5], 8) | _shl(p[6], 16) | _shl(p[7], 24)
    return lo, hi


def _sel8_packed_u8(palo, pahi, code):
    """p[code] for a u8 palette packed 4-per-word: ONE cmpsel + a
    variable byte shift instead of the 7-cmpsel select tree (the
    RGTC/BC3-alpha kernels are compute-bound, not HBM-bound — see
    BASELINE round-4 table — so retiring selects is the lever)."""
    w = jnp.where((code & 4) != 0, pahi, palo)
    return _shr(w, _shl(code & 3, 3)) & 0xFF


def _pack_pal8_u16(p):
    """8 16-bit-valued entries -> four packed words (pairs)."""
    return [(p[2 * i] & 0xFFFF) | _shl(p[2 * i + 1], 16)
            for i in range(4)]


def _sel8_packed_u16(pw, code):
    """p[code] for a 16-bit palette packed 2-per-word: 3 cmpsel + a
    variable half-word shift instead of 7 cmpsel.  Returns the raw
    16-bit pattern (caller sign-extends if needed)."""
    w = _sel4(pw, _shr(code, 1))
    return _shr(w, _shl(code & 1, 4)) & 0xFFFF


def _expand_565(colors):
    """(8, L) int32 word -> 6 channel endpoint vectors (<<3 / <<2
    shift-only expansion, decompress-bc.c:34-39)."""
    b0 = _shl(colors & 0x1F, 3)
    g0 = _shl(_shr(colors, 5) & 0x3F, 2)
    r0 = _shl(_shr(colors, 11) & 0x1F, 3)
    b1 = _shl(_shr(colors, 16) & 0x1F, 3)
    g1 = _shl(_shr(colors, 21) & 0x3F, 2)
    r1 = _shl(_shr(colors, 27) & 0x1F, 3)
    return r0, g0, b0, r1, g1, b1


def _mix4(a, b):
    """Always-4-color palette entries 2/3: truncating /3."""
    return _div3(2 * a + b), _div3(a + 2 * b)


def _bc1_channels(colors):
    """(opaque, r[4], g[4], b[4]) with mode-selected entries 2/3
    (decompress-bc.c:41-53)."""
    r0, g0, b0, r1, g1, b1 = _expand_565(colors)
    opaque = (colors & 0xFFFF) > _shr(colors, 16)

    def mix(a, b):
        four_2, four_3 = _mix4(a, b)
        three_2 = _shr(a + b, 1)
        return (jnp.where(opaque, four_2, three_2),
                jnp.where(opaque, four_3, 0))

    r2, r3 = mix(r0, r1)
    g2, g3 = mix(g0, g1)
    b2, b3 = mix(b0, b1)
    return opaque, (r0, r1, r2, r3), (g0, g1, g2, g3), (b0, b1, b2, b3)


def _pack_palette(r, g, b, a):
    return [r[k] | _shl(g[k], 8) | _shl(b[k], 16) | _shl(a[k], 24)
            for k in range(4)]


def _codes3(w0, w1):
    """16 3-bit codes of the 48-bit stream at bit 16 — static offsets
    (decompress-rgtc.c:29-58)."""
    codes = []
    for i in range(16):
        start = 16 + 3 * i
        if start + 3 <= 32:
            v = _shr(w0, start)
        elif start >= 32:
            v = _shr(w1, start - 32)
        else:
            v = _shr(w0, start) | _shl(w1, 32 - start)
        codes.append(v & 7)
    return codes


def _luma_palette8(w0, *, signed: bool):
    """8-entry interpolated palette of a BC3-alpha/RGTC channel, built
    per block (decompress-bc.c:210-235 / decompress-rgtc.c:35-56 +
    signed mapping 124-126).  Returns (palette, valid_or_None)."""
    l0 = w0 & 0xFF
    l1 = _shr(w0, 8) & 0xFF
    valid = None
    if signed:
        l0 = l0 - jnp.where(l0 >= 128, 256, 0)
        l1 = l1 - jnp.where(l1 >= 128, 256, 0)
        valid = ~((l0 == -127) & (l1 == -128))
        l0 = jnp.maximum(l0, -127)
        l1 = jnp.maximum(l1, -127)
    seven = l0 > l1

    def div_t(x, div):
        if not signed:
            return div(x)
        mag = div(jnp.abs(x))
        return jnp.where(x < 0, -mag, mag)

    lo_c, hi_c = (-127, 127) if signed else (0, 0xFF)
    pal = [l0, l1]
    for code in range(2, 8):
        v7 = div_t((8 - code) * l0 + (code - 1) * l1, _div7)
        if code == 6:
            v5 = jnp.full_like(l0, lo_c)
        elif code == 7:
            v5 = jnp.full_like(l0, hi_c)
        else:
            v5 = div_t((6 - code) * l0 + (code - 1) * l1, _div5)
        pal.append(jnp.where(seven, v7, v5))
    if signed:
        # [-127,127] -> [-32768,32767] on the 8 palette entries
        # instead of 16 pixels; exact floor of (k*65535)/254 (verified
        # above).
        def mp(v):
            k = v + 127
            return (258 * k + (k >= 85) + (k >= 170) + (k >= 254)
                    - 32768)
        pal = [mp(v) for v in pal]
    return pal, valid


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _bc1_kernel(scal_ref, words_ref, pix_ref, valid_ref, *, bc1a: bool):
    colors, idxw = words_ref[0], words_ref[1]
    opaque, r, g, b = _bc1_channels(colors)
    if bc1a:
        alpha3 = jnp.where(opaque, 0xFF, 0)
        a = (jnp.full_like(colors, 0xFF),) * 3 + (alpha3,)
    else:
        a = (jnp.full_like(colors, 0xFF),) * 4
    pal = _pack_palette(r, g, b, a)
    for i in range(16):
        pix_ref[i] = _sel4(pal, _shr(idxw, 2 * i) & 3)
    fl = scal_ref[1]
    valid = jnp.ones(colors.shape, bool)
    if bc1a:
        valid = valid & ~(((fl & 0x4) != 0) & opaque)      # NON_OPAQUE
        valid = valid & ~(((fl & 0x2) != 0) & ~opaque)     # OPAQUE
    valid_ref[...] = valid.astype(jnp.int32)


def _bc23_kernel(scal_ref, words_ref, pix_ref, valid_ref, *, bc3: bool):
    aw0, aw1, colors, idxw = (words_ref[i] for i in range(4))
    r0, g0, b0, r1, g1, b1 = _expand_565(colors)
    r = (r0, r1) + _mix4(r0, r1)
    g = (g0, g1) + _mix4(g0, g1)
    b = (b0, b1) + _mix4(b0, b1)
    zero = jnp.zeros_like(colors)
    pal = _pack_palette(r, g, b, (zero,) * 4)   # alpha added per pixel
    if bc3:
        apal, _ = _luma_palette8(aw0, signed=False)
        apalo, apahi = _pack_pal8_u8(apal)
        codes = _codes3(aw0, aw1)
    for i in range(16):
        rgb = _sel4(pal, _shr(idxw, 2 * i) & 3)
        if bc3:
            a = _sel8_packed_u8(apalo, apahi, codes[i])
        else:
            # BC2 explicit 4-bit alpha: *255/15 == *17 exactly.
            a4 = _shr(aw0 if i < 8 else aw1, (4 * i) % 32) & 0xF
            a = _shl(a4, 4) | a4
        pix_ref[i] = rgb | _shl(a, 24)
    fl = scal_ref[1]
    valid = jnp.ones(colors.shape, bool)
    valid = valid & ~(((fl & 0x1) != 0)
                      & ~((colors & 0xFFFF) > _shr(colors, 16)))
    if bc3:
        a0 = aw0 & 0xFF
        a1 = _shr(aw0, 8) & 0xFF
        valid = valid & ~(((fl & 0x2) != 0) & (a0 > a1))
    valid_ref[...] = valid.astype(jnp.int32)


def _rgtc1_kernel(scal_ref, words_ref, pix_ref, valid_ref, *,
                  signed: bool):
    """Output is the TRUE payload, packed little-endian:
    unsigned = R8 pixels 4-per-word (4 words/block, 16 B — the
    reference's pixel_buffer layout, decompress-rgtc.c:26-60);
    signed = SIGNED_R16 pixels 2-per-word (8 words/block, 32 B)."""
    w0, w1 = words_ref[0], words_ref[1]
    pal, valid = _luma_palette8(w0, signed=signed)
    codes = _codes3(w0, w1)
    if signed:
        pw = _pack_pal8_u16(pal)
        px = [_sel8_packed_u16(pw, codes[i]) for i in range(16)]
        for w in range(8):
            # select already masks to the 16-bit pattern
            pix_ref[w] = px[2 * w] | _shl(px[2 * w + 1], 16)
    else:
        palo, pahi = _pack_pal8_u8(pal)
        px = [_sel8_packed_u8(palo, pahi, codes[i]) for i in range(16)]
        for w in range(4):
            pix_ref[w] = px[4 * w] | _shl(px[4 * w + 1], 8) \
                | _shl(px[4 * w + 2], 16) | _shl(px[4 * w + 3], 24)
    if valid is None:
        valid = jnp.ones(w0.shape, bool)
    valid_ref[...] = valid.astype(jnp.int32)


def _rgtc2_kernel(scal_ref, words_ref, pix_ref, valid_ref, *,
                  signed: bool):
    """Packed true payload: unsigned = RG8 2 pixels/word (8 words,
    32 B/block); signed = SIGNED_RG16 1 pixel/word (16 words, 64 B) —
    byte-identical to the reference's channel-interleaved buffers
    (decompress-rgtc.c:72-77 at shift=1)."""
    rw0, rw1, gw0, gw1 = (words_ref[i] for i in range(4))
    rpal, valid_r = _luma_palette8(rw0, signed=signed)
    gpal, valid_g = _luma_palette8(gw0, signed=signed)
    rcodes = _codes3(rw0, rw1)
    gcodes = _codes3(gw0, gw1)
    if signed:
        rpw = _pack_pal8_u16(rpal)
        gpw = _pack_pal8_u16(gpal)
        for i in range(16):
            # R low 16 bits, G high 16 (signed values as u16 patterns)
            pix_ref[i] = _sel8_packed_u16(rpw, rcodes[i]) \
                | _shl(_sel8_packed_u16(gpw, gcodes[i]), 16)
    else:
        rlo, rhi = _pack_pal8_u8(rpal)
        glo, ghi = _pack_pal8_u8(gpal)
        r = [_sel8_packed_u8(rlo, rhi, rcodes[i]) for i in range(16)]
        g = [_sel8_packed_u8(glo, ghi, gcodes[i]) for i in range(16)]
        for w in range(8):
            pix_ref[w] = r[2 * w] | _shl(g[2 * w], 8) \
                | _shl(r[2 * w + 1], 16) | _shl(g[2 * w + 1], 24)
    if valid_r is None:
        valid = jnp.ones(rw0.shape, bool)
    else:
        valid = valid_r & valid_g
    valid_ref[...] = valid.astype(jnp.int32)


# ---------------------------------------------------------------------------
# pallas_call plumbing (mirrors etc_eac_pallas)
# ---------------------------------------------------------------------------

def _to_i32_scalar(x):
    if isinstance(x, (int, np.integer)):
        return ((int(x) & 0xFFFFFFFF) ^ 0x80000000) - 0x80000000
    return x


@functools.partial(jax.jit,
                   static_argnames=("kernel_name", "tile", "interpret"))
def _call(words_planar, scal, kernel_name: str, tile: int,
          interpret: bool):
    kernel, n_words, n_out = _KERNELS[kernel_name]
    n = words_planar.shape[1]
    n_pad = -(-n // (8 * tile)) * (8 * tile)
    wp = jnp.pad(words_planar, ((0, 0), (0, n_pad - n)))
    ell = n_pad // 8
    wp = wp.reshape(n_words, 8, ell)
    pix, valid = pl.pallas_call(
        kernel,
        grid=(ell // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_words, 8, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_out, 8, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_out, 8, ell), jnp.int32),
            jax.ShapeDtypeStruct((8, ell), jnp.int32),
        ],
        interpret=interpret,
    )(scal, wp)
    return (pix.reshape(n_out, n_pad)[:, :n],
            valid.reshape(n_pad)[:n] != 0)


# name -> (kernel, input words/block, OUTPUT words/block).  Output
# word counts are the true payload widths (detex.h:879-930 pixel
# sizes): RGTC1 16 B, SIGNED_RGTC1/RGTC2 32 B, SIGNED_RGTC2 64 B.
_KERNELS = {
    "bc1": (functools.partial(_bc1_kernel, bc1a=False), 2, 16),
    "bc1a": (functools.partial(_bc1_kernel, bc1a=True), 2, 16),
    "bc2": (functools.partial(_bc23_kernel, bc3=False), 4, 16),
    "bc3": (functools.partial(_bc23_kernel, bc3=True), 4, 16),
    "rgtc1": (functools.partial(_rgtc1_kernel, signed=False), 2, 4),
    "signed_rgtc1": (functools.partial(_rgtc1_kernel, signed=True), 2, 8),
    "rgtc2": (functools.partial(_rgtc2_kernel, signed=False), 4, 8),
    "signed_rgtc2": (functools.partial(_rgtc2_kernel, signed=True), 4, 16),
}


def _decode_planar(kernel_name, words_planar, mode_mask, flags, tile,
                   interpret):
    if interpret is None:
        interpret = use_interpret()
    scal = jnp.asarray([_to_i32_scalar(mode_mask), _to_i32_scalar(flags)],
                       jnp.int32)
    return _call(words_planar, scal, kernel_name, tile, interpret)


def _make_decoder(kernel_name):
    def planar(words_planar, mode_mask=_FULL, flags=0, *, tile=512,
               interpret=None):
        return _decode_planar(kernel_name, words_planar, mode_mask, flags,
                              tile, interpret)

    def rows(words, mode_mask=_FULL, flags=0, **kw):
        pix, valid = planar(words.T, mode_mask, flags, **kw)
        return pix.T, valid

    return planar, rows


decode_bc1_planar, decode_bc1 = _make_decoder("bc1")
decode_bc1a_planar, decode_bc1a = _make_decoder("bc1a")
decode_bc2_planar, decode_bc2 = _make_decoder("bc2")
decode_bc3_planar, decode_bc3 = _make_decoder("bc3")
decode_rgtc1_planar, decode_rgtc1_packed = _make_decoder("rgtc1")
decode_signed_rgtc1_planar, decode_signed_rgtc1_packed = \
    _make_decoder("signed_rgtc1")
decode_rgtc2_planar, decode_rgtc2_packed = _make_decoder("rgtc2")
decode_signed_rgtc2_planar, decode_signed_rgtc2_packed = \
    _make_decoder("signed_rgtc2")


# --- packed <-> per-pixel-value converters (jnp; fuse under jit) -----

def _unpack_u8x4(pk):
    """(N, k) packed 4xu8 words -> (N, 4k) u8 values as i32."""
    lanes = [(lax.shift_right_logical(pk, s) & 0xFF) for s in
             (0, 8, 16, 24)]
    return jnp.stack(lanes, axis=-1).reshape(pk.shape[0], -1)


def _unpack_u16x2(pk, signed):
    lo = pk & 0xFFFF
    hi = lax.shift_right_logical(pk, 16)
    if signed:
        lo = (lo << 16) >> 16
        hi = (hi << 16) >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(pk.shape[0], -1)


def _pack_u8x4(vals):
    """(N, 4k) u8-valued -> (N, k) packed words (little-endian)."""
    v = (vals & 0xFF).reshape(vals.shape[0], -1, 4)
    return (v[:, :, 0] | (v[:, :, 1] << 8) | (v[:, :, 2] << 16)
            | (v[:, :, 3] << 24))


def _pack_u16x2(vals):
    v = (vals & 0xFFFF).reshape(vals.shape[0], -1, 2)
    return v[:, :, 0] | (v[:, :, 1] << 16)


def decode_rgtc1(words, mode_mask=_FULL, flags=0, **kw):
    """Back-compat per-pixel view: (N, 16) R8 values as i32."""
    pk, valid = decode_rgtc1_packed(words, mode_mask, flags, **kw)
    return _unpack_u8x4(pk), valid


def decode_signed_rgtc1(words, mode_mask=_FULL, flags=0, **kw):
    pk, valid = decode_signed_rgtc1_packed(words, mode_mask, flags, **kw)
    return _unpack_u16x2(pk, True), valid


def decode_rgtc2(words, mode_mask=_FULL, flags=0, **kw):
    pk, valid = decode_rgtc2_packed(words, mode_mask, flags, **kw)
    rg = _unpack_u8x4(pk)                       # (N, 32) r,g interleaved
    return rg.reshape(rg.shape[0], 16, 2), valid


def decode_signed_rgtc2(words, mode_mask=_FULL, flags=0, **kw):
    pk, valid = decode_signed_rgtc2_packed(words, mode_mask, flags, **kw)
    rg = _unpack_u16x2(pk, True)
    return rg.reshape(rg.shape[0], 16, 2), valid


# jnp-oracle packed fallbacks (CPU path of the *_packed_auto
# dispatchers): bit-identical packed words from the jnp decoders.

def _rgtc1_jnp_packed(words, mode_mask=_FULL, flags=0):
    vals, valid = RGJ.decode_rgtc1(words, mode_mask, flags)
    return _pack_u8x4(vals), valid


def _signed_rgtc1_jnp_packed(words, mode_mask=_FULL, flags=0):
    vals, valid = RGJ.decode_signed_rgtc1(words, mode_mask, flags)
    return _pack_u16x2(vals), valid


def _rgtc2_jnp_packed(words, mode_mask=_FULL, flags=0):
    vals, valid = RGJ.decode_rgtc2(words, mode_mask, flags)
    return _pack_u8x4(vals.reshape(vals.shape[0], 32)), valid


def _signed_rgtc2_jnp_packed(words, mode_mask=_FULL, flags=0):
    vals, valid = RGJ.decode_signed_rgtc2(words, mode_mask, flags)
    return _pack_u16x2(vals.reshape(vals.shape[0], 32)), valid


def _auto(pallas_fn, jnp_fn, best_tile: int = 512):
    def fn(words, mode_mask=_FULL, flags=0):
        if jax.default_backend() == "tpu":
            tile = best_tile if words.shape[0] >= 8 * best_tile else 128
            return pallas_fn(words, mode_mask, flags, tile=tile,
                             interpret=False)
        return jnp_fn(words, mode_mask, flags)
    return fn


# best_tile defaults re-swept after the round-4 packed-output +
# packed-palette-select rework (tools/tile_sweep.py; the optimum moves
# with register pressure).
decode_bc1_auto = _auto(decode_bc1, BCJ.decode_bc1, best_tile=1024)
decode_bc1a_auto = _auto(decode_bc1a, BCJ.decode_bc1a)
decode_bc2_auto = _auto(decode_bc2, BCJ.decode_bc2)
decode_bc3_auto = _auto(decode_bc3, BCJ.decode_bc3, best_tile=256)
decode_rgtc1_auto = _auto(decode_rgtc1, RGJ.decode_rgtc1, best_tile=1024)
decode_rgtc2_auto = _auto(decode_rgtc2, RGJ.decode_rgtc2, best_tile=256)
decode_signed_rgtc1_auto = _auto(decode_signed_rgtc1,
                                 RGJ.decode_signed_rgtc1, best_tile=256)
decode_signed_rgtc2_auto = _auto(decode_signed_rgtc2,
                                 RGJ.decode_signed_rgtc2, best_tile=1024)

# Packed-payload autos (the engine's decode path): rows of packed
# payload words straight from the kernel — no post-kernel unpack, no
# write amplification.
decode_rgtc1_packed_auto = _auto(decode_rgtc1_packed, _rgtc1_jnp_packed,
                                 best_tile=1024)
decode_rgtc2_packed_auto = _auto(decode_rgtc2_packed, _rgtc2_jnp_packed,
                                 best_tile=256)
decode_signed_rgtc1_packed_auto = _auto(decode_signed_rgtc1_packed,
                                        _signed_rgtc1_jnp_packed,
                                        best_tile=256)
decode_signed_rgtc2_packed_auto = _auto(decode_signed_rgtc2_packed,
                                        _signed_rgtc2_jnp_packed,
                                        best_tile=1024)

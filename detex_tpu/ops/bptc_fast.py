"""BC7 decoder, single-pass unified variant.

Bit-exact alternative to ops.bptc.decode_bptc that avoids decoding all
8 modes: every per-mode constant (precisions, stream offsets, anchored
index offsets) is a static table *indexed by the block's mode*, so one
generic extraction pass decodes the whole batch.  ~8x less arithmetic
than compute-all-modes at the cost of a few small gathers.

Semantics identical to ops.bptc (decompress-bptc.c:354-512), including
the mode-6 dead second p-bit quirk; validated by the same goldens.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from detex_tpu import formats as F
from detex_tpu.ops.bitops import (dyn_field, dyn_field_vw, has_flag,
                                  mask_bit, pack_rgba8)
from detex_tpu.ops.bptc import (_ANCHOR2, _ANCHOR2OF3, _ANCHOR3, _AP, _APP,
                                _CP, _CPP, _HAS_PBITS, _IB, _IB2, _ISB,
                                _MODE_STATIC, _NS, _P2, _P3, _PB, _RB,
                                _WEIGHTS, _extract_mode, _mode_layout)

# ---------------------------------------------------------------------------
# Static per-mode tables (all indexed by mode 0..7; gathered per block).
# ---------------------------------------------------------------------------

_LAY = [_mode_layout(m) for m in range(8)]

_T_NS = np.array(_NS, np.int32)
_T_PB = np.array(_PB, np.int32)
_T_PB_START = np.array([_LAY[m]["pb"] for m in range(8)], np.int32)
_T_RB = np.array(_RB, np.int32)
_T_RB_START = np.array([_LAY[m]["rb"] for m in range(8)], np.int32)
_T_ISB_START = np.array([_LAY[m]["isb"] for m in range(8)], np.int32)
_T_IS_MODE4 = np.array([m == 4 for m in range(8)], bool)
_T_CP = np.array(_CP, np.int32)
_T_CPP = np.array(_CPP, np.int32)
_T_AP = np.array(_AP, np.int32)
_T_APP = np.array(_APP, np.int32)
_T_IB = np.array(_IB, np.int32)
_T_IB2 = np.array(_IB2, np.int32)
_T_INDEX_START = np.array([_LAY[m]["index"] for m in range(8)], np.int32)
_T_SEC_START = np.array([_MODE_STATIC[m]["sec_start"] for m in range(8)],
                        np.int32)

# Endpoint bit offsets: (8, 4 components, 3 subsets, 2 endpoints).
_T_EP_OFF = np.zeros((8, 4, 3, 2), np.int32)
for _m in range(8):
    for _c in range(3):
        for _j in range(_NS[_m]):
            for _k in range(2):
                _T_EP_OFF[_m, _c, _j, _k] = (
                    _LAY[_m]["ep"]
                    + _c * _NS[_m] * 2 * _CP[_m]
                    + (_j * 2 + _k) * _CP[_m])
    if _AP[_m]:
        for _j in range(_NS[_m]):
            for _k in range(2):
                _T_EP_OFF[_m, 3, _j, _k] = (
                    _LAY[_m]["alpha"] + (_j * 2 + _k) * _AP[_m])

# P-bit offsets and a zero-force mask: (8, 3 subsets, 2 endpoints).
_T_PBIT_OFF = np.zeros((8, 3, 2), np.int32)
_T_PBIT_ZERO = np.ones((8, 3, 2), bool)     # True -> p-bit forced 0
for _m in range(8):
    if not _HAS_PBITS[_m]:
        continue
    for _j in range(_NS[_m]):
        for _k in range(2):
            if _m == 1:
                # shared per subset (decompress-bptc.c:297-306)
                _T_PBIT_OFF[_m, _j, _k] = _LAY[_m]["pbit"] + _j
                _T_PBIT_ZERO[_m, _j, _k] = False
            elif _m == 6 and _k == 1:
                # dead bit-64 read (see ops.bptc mode-6 quirk)
                _T_PBIT_ZERO[_m, _j, _k] = True
            else:
                _T_PBIT_OFF[_m, _j, _k] = (_LAY[_m]["pbit"]
                                           + _j * 2 + _k)
                _T_PBIT_ZERO[_m, _j, _k] = False

# Subset-index tables: (3, 64, 16) for NS=1/2/3.
_T_SUBSET = np.stack([np.zeros((64, 16), np.int32), _P2, _P3])

# Anchor positions per partition: (64, 3) = [second-of-two,
# second-of-three, third-of-three] (bptc-tables.c:157-188).
_T_ANCHORS = np.stack([_ANCHOR2, _ANCHOR2OF3, _ANCHOR3], axis=1) \
    .astype(np.int32)

_FULL = 0xFFFFFFFF

# The aWeight tables are exactly round(64*i / (2^bits - 1)), i.e.
# (64*i + c) // d with (c, d) = (1,3), (3,7), (7,15) for 2/3/4-bit
# indices (verified against bptc-tables.c:190-201) — so interpolation
# weights need no table lookups at all.
_W_C = np.zeros(5, np.int32)
_W_D = np.ones(5, np.int32)
_W_C[2:5] = (1, 3, 7)
_W_D[2:5] = (3, 7, 15)
for _bits, _tab in _WEIGHTS.items():
    _calc = (64 * np.arange(len(_tab)) + _W_C[_bits]) // _W_D[_bits]
    assert np.array_equal(_calc, _tab), (_bits, _calc, _tab)


def _weights(idx, bits):
    """Interpolation weight for index `idx` at `bits` precision."""
    c = jnp.where(bits == 2, 1, jnp.where(bits == 3, 3, 7))
    d = jnp.where(bits == 2, 3, jnp.where(bits == 3, 7, 15))
    return (64 * idx + c[:, None]) // d[:, None]


def decode_bptc_fast(words, mode_mask: int = _FULL, flags: int = 0):
    """Single-pass BC7 decode; same contract as ops.bptc.decode_bptc."""
    n = words.shape[0]
    mode_raw = _extract_mode(words)
    mode = jnp.maximum(mode_raw, 0)          # clamp for safe gathers

    t = lambda a: jnp.asarray(a)[mode]       # noqa: E731  per-block gather
    ns = t(_T_NS)
    psid = dyn_field_vw(words, t(_T_PB_START), t(_T_PB), 6)
    rot = dyn_field_vw(words, t(_T_RB_START), t(_T_RB), 2)
    isb = jnp.where(jnp.asarray(_T_IS_MODE4)[mode],
                    dyn_field(words, t(_T_ISB_START), 1), 0)

    # --- endpoints: (N, 4, 3, 2) raw values -----------------------------
    ep_off = jnp.asarray(_T_EP_OFF)[mode]                  # (N,4,3,2)
    cw = t(_T_CP)[:, None, None, None]
    aw = t(_T_AP)[:, None, None, None]
    widths = jnp.concatenate(
        [jnp.broadcast_to(cw, (n, 3, 3, 2)),
         jnp.broadcast_to(aw, (n, 1, 3, 2))], axis=1)
    raw = dyn_field_vw(words, ep_off, widths, 8)

    pbit_off = jnp.asarray(_T_PBIT_OFF)[mode]              # (N,3,2)
    pbit = dyn_field(words, pbit_off, 1)
    pbit = jnp.where(jnp.asarray(_T_PBIT_ZERO)[mode], 0, pbit)

    cpp = t(_T_CPP)[:, None, None, None]
    app = t(_T_APP)[:, None, None, None]
    pp = jnp.concatenate(
        [jnp.broadcast_to(cpp, (n, 3, 3, 2)),
         jnp.broadcast_to(app, (n, 1, 3, 2))], axis=1)
    p = jnp.concatenate(
        [jnp.broadcast_to(cw, (n, 3, 3, 2)),
         jnp.broadcast_to(aw, (n, 1, 3, 2))], axis=1)
    has_p = (pp > p)
    v = jnp.where(has_p, (raw << 1) | pbit[:, None], raw)
    shift = (8 - pp).astype(jnp.uint32)
    v = (v.astype(jnp.uint32) << shift).astype(jnp.int32)
    v = v | (v.astype(jnp.uint32) >> pp.astype(jnp.uint32)) \
        .astype(jnp.int32)
    # alpha lanes: 0xFF when the mode has no alpha (modes 0-3)
    no_alpha = (t(_T_AP) == 0)[:, None, None]
    ep = v.at[:, 3].set(jnp.where(no_alpha, 0xFF, v[:, 3]))

    # --- subsets + index streams -----------------------------------------
    # Anchor positions and within-stream offsets are computed
    # arithmetically (no (8,64,16) table gathers): each anchor pixel
    # stores one less bit, so offset(i) = IB*i - #anchors before i.
    subset = jnp.asarray(_T_SUBSET)[ns - 1, psid]          # (N,16)
    anchors = jnp.asarray(_T_ANCHORS)[psid]                # (N,3)
    a2 = jnp.where(ns == 2, anchors[:, 0], anchors[:, 1])[:, None]
    a3 = anchors[:, 2][:, None]
    i16 = jnp.arange(16, dtype=jnp.int32)[None, :]
    has2 = (ns >= 2)[:, None]
    has3 = (ns == 3)[:, None]
    is_anchor = (i16 == 0) | (has2 & (i16 == a2)) | (has3 & (i16 == a3))
    before = ((i16 > 0).astype(jnp.int32)
              + (has2 & (a2 < i16)).astype(jnp.int32)
              + (has3 & (a3 < i16)).astype(jnp.int32))

    ib = t(_T_IB)
    ib2 = t(_T_IB2)

    def stream(start, width):
        off = start[:, None] + width[:, None] * i16 - before
        full = (1 << width)[:, None] - 1
        anch = (1 << jnp.maximum(width - 1, 0))[:, None] - 1
        mask = jnp.where(is_anchor, anch, full)
        return jnp.bitwise_and(dyn_field(words, off, 4), mask)

    prim = stream(t(_T_INDEX_START), ib)
    sec = stream(t(_T_SEC_START), ib2)

    has_sec = (ib2 > 0)[:, None]
    isb_m = (isb != 0)[:, None]
    color_idx = jnp.where(has_sec & isb_m, sec, prim)
    alpha_idx = jnp.where(has_sec, jnp.where(isb_m, prim, sec), prim)
    color_bits = jnp.where((ib2 > 0) & (isb != 0), ib2, ib + isb)
    alpha_bits = jnp.where(ib2 > 0,
                           jnp.where(isb != 0, ib, ib2), ib)

    # --- interpolate -----------------------------------------------------
    w_c = _weights(color_idx, color_bits)
    w_a = _weights(alpha_idx, alpha_bits)

    def chan(c, w):
        e0 = jnp.take_along_axis(
            ep[:, c, :, 0], subset, axis=1)
        e1 = jnp.take_along_axis(
            ep[:, c, :, 1], subset, axis=1)
        return ((64 - w) * e0 + w * e1 + 32) >> 6

    r = chan(0, w_c)
    g = chan(1, w_c)
    b = chan(2, w_c)
    a = chan(3, w_a)

    rotm = rot[:, None]
    new_r = jnp.where(rotm == 1, a, r)
    new_g = jnp.where(rotm == 2, a, g)
    new_b = jnp.where(rotm == 3, a, b)
    new_a = jnp.where(rotm == 1, r,
                      jnp.where(rotm == 2, g,
                                jnp.where(rotm == 3, b, a)))
    pix = pack_rgba8(new_r, new_g, new_b, new_a)

    valid = (mode_raw >= 0) & mask_bit(mode_mask, mode_raw)
    valid = valid & ~(has_flag(flags, F.FLAG_OPAQUE_ONLY)
                      & (mode_raw >= 4))
    valid = valid & ~(has_flag(flags, F.FLAG_NON_OPAQUE_ONLY)
                      & (mode_raw < 4))
    return pix, valid

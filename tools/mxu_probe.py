"""MXU offload experiment (VERDICT r4 missing #1 / next-round #1).

Question: can the otherwise-idle MXU beat the VPU select trees for the
BC7 partition/anchor table gathers?

The formulation that fits the hardware: the Pallas kernel's (8, L)
sublane x lane block layout cannot feed a dot without per-sublane
relayouts, so the MXU variant hoists the gather OUT of the kernel into
an XLA one-hot bf16 matmul stage
    onehot(q) (N, 192) @ table (192, 6 bytes) -> pre-gathered words,
(table values are bytes, so bf16 is exact) fused into the same jit;
the modified kernel reads the two pre-gathered words (sub32, ancpos)
as an extra (2, N) input and drops the three select trees
(~137 VPU ops/block: 31+8 ns2 tree+spread, 63 ns3 tree, 31+2 anchor
tree, 2 ns selects).

Cost side: +8 B/block HBM input, one dot of 64k x 192 x 6 with N=6
(<5% MXU lane utilization), and the one-hot materialization XLA fuses
into the dot operand.

Usage: python tools/mxu_probe.py [--rounds 3] [--tiles 256,512]
Verifies bit-exactness of the variant against the production kernel,
then interleaved A/B marginal-rate timing (long-interval method).
"""

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detex_tpu.ops import bptc_fast as BF
from detex_tpu.ops.pallas import bptc_pallas as BP
from detex_tpu.ops.pallas.bptc_pallas import (_MODEC, _extract_mode_v,
                                              _shl, _shr, _vmask)

N = 1 << 16

# ---------------------------------------------------------------------------
# The one-hot-matmul gather stage (XLA, rides the MXU)
# ---------------------------------------------------------------------------

_NS_T = np.asarray(BF._T_NS)
_PB_T = np.asarray(BF._T_PB)

# table rows indexed q = (ns-1)*64 + psid: 4 bytes of SUB32 + 2 bytes
# of packed anchor positions (a0 | a1<<4 | a2<<8; psid-dependent only,
# replicated over the ns strata).
_SUB32_FULL = np.asarray(BP._SUB32).view(np.uint32)
_ANCH = np.asarray(BF._T_ANCHORS).astype(np.uint32)
_POS64 = _ANCH[:, 0] | (_ANCH[:, 1] << 4) | (_ANCH[:, 2] << 8)
_TABLE = np.zeros((192, 6), np.uint8)
for _i in range(4):
    _TABLE[:, _i] = (_SUB32_FULL >> (8 * _i)) & 0xFF
_TABLE[:, 4] = np.tile(_POS64 & 0xFF, 3)
_TABLE[:, 5] = np.tile(_POS64 >> 8, 3)
_TABLE_BF16 = jnp.asarray(_TABLE.astype(np.float32), jnp.bfloat16)


def _mode_of(w0):
    b0 = w0 & 0xFF
    mode = jnp.full(b0.shape, 0, jnp.int32)
    found = jnp.zeros(b0.shape, bool)
    for i in range(8):
        hit = ((b0 & (1 << i)) != 0) & ~found
        mode = jnp.where(hit, i, mode)
        found = found | hit
    return mode


def pregather(words_planar):
    """(4, N) words -> (2, N) int32: [sub32, pos12] via one-hot matmul."""
    w0 = words_planar[0]
    mode = _mode_of(w0)
    ns = jnp.asarray(_NS_T, jnp.int32)[mode]          # tiny 8-gather: XLA
    pb_w = jnp.asarray(_PB_T, jnp.int32)[mode]
    psid = _shr(w0, mode + 1) & (_shl(jnp.ones_like(pb_w), pb_w) - 1)
    q = (ns - 1) * 64 + psid
    onehot = (q[:, None] == jnp.arange(192, dtype=jnp.int32)[None, :]) \
        .astype(jnp.bfloat16)
    by = lax.dot(onehot, _TABLE_BF16,
                 preferred_element_type=jnp.float32).astype(jnp.int32)
    sub32 = by[:, 0] | _shl(by[:, 1], 8) | _shl(by[:, 2], 16) \
        | _shl(by[:, 3], 24)
    pos = by[:, 4] | _shl(by[:, 5], 8)
    return jnp.stack([sub32, pos])


# ---------------------------------------------------------------------------
# Kernel variant: identical to bptc_pallas._bc7_kernel except the three
# partition/anchor select trees are replaced by the pre-gathered input.
# ---------------------------------------------------------------------------

def _bc7_kernel_pre(scal_ref, words_ref, pre_ref, pix_ref, valid_ref):
    w = [words_ref[i] for i in range(4)]

    def funnel(lo, hi, bit):
        return _shr(lo, bit) | _shl(_shl(hi, 1), 31 - bit)

    def dynf(start, width: int):
        w0 = _shr(start, 5)
        bit = start & 31
        lo = jnp.where(w0 == 0, w[0],
                       jnp.where(w0 == 1, w[1],
                                 jnp.where(w0 == 2, w[2], w[3])))
        hi = jnp.where(w0 == 0, w[1],
                       jnp.where(w0 == 1, w[2], w[3]))
        return funnel(lo, hi, bit) & ((1 << width) - 1)

    def window64(start):
        w0 = _shr(start, 5)
        bit = start & 31
        zero = jnp.zeros_like(start)
        lo0 = jnp.where(w0 == 0, w[0],
                        jnp.where(w0 == 1, w[1],
                                  jnp.where(w0 == 2, w[2], w[3])))
        lo1 = jnp.where(w0 == 0, w[1],
                        jnp.where(w0 == 1, w[2],
                                  jnp.where(w0 == 2, w[3], zero)))
        lo2 = jnp.where(w0 == 0, w[2],
                        jnp.where(w0 == 1, w[3], zero))
        return funnel(lo0, lo1, bit), funnel(lo1, lo2, bit)

    mode_raw = _extract_mode_v(w[0] & 0xFF)
    mode = jnp.maximum(mode_raw, 0)

    def msel(tab):
        out = jnp.full(mode.shape, int(tab[7]), jnp.int32)
        for m in range(6, -1, -1):
            out = jnp.where(mode == m, int(tab[m]), out)
        return out

    mc = msel(_MODEC)
    ns = mc & 3
    pb_w = _shr(mc, 2) & 7
    cp, cpp = _shr(mc, 5) & 7, _shr(mc, 8) & 0xF
    ap, app = _shr(mc, 12) & 0xF, _shr(mc, 16) & 0xF
    ib, ib2 = _shr(mc, 20) & 7, _shr(mc, 23) & 3
    has_pb = _shr(mc, 25) & 1
    is_m1 = mode == 1
    is_m4 = mode == 4
    is_m6 = mode == 6

    pb_start = mode + 1
    rb_w = jnp.where(is_m4 | (mode == 5), 2, 0)
    isb_start = pb_start + pb_w + rb_w
    ep_base = isb_start + jnp.where(is_m4, 1, 0)
    ns2 = ns * 2
    alpha_base = ep_base + cp * ns * 6
    pbit_base = alpha_base + ap * ns2
    index_start = pbit_base + has_pb * jnp.where(is_m1, 2, ns2)
    sec_start = index_start + ib * 16 - ns

    rot = _shr(w[0], pb_start + pb_w) & _vmask(rb_w)
    isb = jnp.where(is_m4, _shr(w[0], isb_start) & 1, 0)

    # === the experiment: pre-gathered partition/anchor data =========
    sub32 = pre_ref[0]
    pos = pre_ref[1]
    one_v = jnp.ones_like(pos)
    anc16 = jnp.where(ns == 2, _shl(one_v, pos & 0xF),
                      jnp.where(ns == 3,
                                _shl(one_v, _shr(pos, 4) & 0xF)
                                | _shl(one_v, _shr(pos, 8)), 0)) | 1
    # ================================================================

    s = anc16
    s = (s | _shl(s, 8)) & 0x00FF00FF
    s = (s | _shl(s, 4)) & 0x0F0F0F0F
    s = (s | _shl(s, 2)) & 0x33333333
    s = (s | _shl(s, 1)) & 0x55555555
    bef32 = s * 0x55555555 - s

    no_alpha = ap == 0
    pball = dynf(pbit_base, 8)
    pbit = [[None, None] for _ in range(3)]
    for j in range(3):
        for k in range(2):
            idx = jnp.where(is_m1, j, j * 2 + k)
            pb = _shr(pball, idx) & 1
            if k == 1:
                pb = jnp.where(is_m6, 0, pb)
            pbit[j][k] = pb
    ep = [[[None, None] for _ in range(3)] for _ in range(4)]
    for c in range(4):
        pp = app if c == 3 else cpp
        p = ap if c == 3 else cp
        stride = ap if c == 3 else cp
        has_p = pp > p
        pmask = _vmask(p)
        shift_up = (8 - pp) & 31
        if c == 3:
            base = alpha_base
        else:
            base = ep_base + c * ns2 * cp
        wlo, whi = window64(base)
        for j in range(3):
            for k in range(2):
                raw = wlo & pmask
                if not (j == 2 and k == 1):
                    wlo = funnel(wlo, whi, stride)
                    whi = _shr(whi, stride)
                v = jnp.where(has_p, _shl(raw, 1) | pbit[j][k], raw)
                v = _shl(v, shift_up)
                v = v | _shr(v, pp)
                if c == 3:
                    v = jnp.where(no_alpha, 0xFF, v)
                ep[c][j][k] = v & 0xFF

    rb_base = [_shl(ep[0][j][0] | _shl(ep[2][j][0], 16), 6) + 0x200020
               for j in range(3)]
    rb_d = [(ep[0][j][1] | _shl(ep[2][j][1], 16))
            - (ep[0][j][0] | _shl(ep[2][j][0], 16)) for j in range(3)]
    g_base = [_shl(ep[1][j][0], 6) + 32 for j in range(3)]
    g_d = [ep[1][j][1] - ep[1][j][0] for j in range(3)]
    a_base = [_shl(ep[3][j][0], 6) + 32 for j in range(3)]
    a_d = [ep[3][j][1] - ep[3][j][0] for j in range(3)]

    has_sec = ib2 > 0
    isb_on = isb != 0
    color_bits = jnp.where(has_sec & isb_on, ib2, ib + isb)
    alpha_bits = jnp.where(has_sec, jnp.where(isb_on, ib, ib2), ib)

    def wmagic(bits):
        mul = jnp.where(bits == 2, 683, jnp.where(bits == 3, 9363, 34953))
        sh = jnp.where(bits == 2, 11, jnp.where(bits == 3, 16, 19))
        c = jnp.where(bits == 2, 1, jnp.where(bits == 3, 3, 7))
        return mul, sh, c

    wc_mul, wc_sh, wc_c = wmagic(color_bits)
    wa_mul, wa_sh, wa_c = wmagic(alpha_bits)
    wc_mul64, wc_cm = _shl(wc_mul, 6), wc_c * wc_mul
    wa_mul64, wa_cm = _shl(wa_mul, 6), wa_c * wa_mul
    p_lo, p_hi = window64(index_start)
    s_lo, s_hi = window64(sec_start)
    sel_ci = has_sec & isb_on
    sel_ai = has_sec & ~isb_on

    c_lo = jnp.where(sel_ci, s_lo, p_lo)
    c_hi = jnp.where(sel_ci, s_hi, p_hi)
    a_lo = jnp.where(sel_ai, s_lo, p_lo)
    a_hi = jnp.where(sel_ai, s_hi, p_hi)
    c_step = jnp.where(sel_ci, ib2, ib)
    a_step = jnp.where(sel_ai, ib2, ib)
    full_c = _vmask(c_step)
    full_a = _vmask(a_step)

    s_r = jnp.where(rot == 1, 24, 0)
    s_g = jnp.where(rot == 2, 24, 8)
    s_b = jnp.where(rot == 3, 24, 16)
    s_a = jnp.where(rot == 0, 24, _shl(rot - 1, 3))

    ci_cur = jnp.zeros_like(ib)
    ai_cur = jnp.zeros_like(ib)
    for i in range(16):
        subset = _shr(sub32, 2 * i) & 3
        before = _shr(bef32, 2 * i) & 3
        anch_bit = _shr(anc16, i) & 1

        off_c = ci_cur - before
        hi_c = off_c >= 32
        color_idx = funnel(jnp.where(hi_c, c_hi, c_lo),
                           jnp.where(hi_c, 0, c_hi), off_c & 31) \
            & _shr(full_c, anch_bit)
        off_a = ai_cur - before
        hi_a = off_a >= 32
        alpha_idx = funnel(jnp.where(hi_a, a_hi, a_lo),
                           jnp.where(hi_a, 0, a_hi), off_a & 31) \
            & _shr(full_a, anch_bit)
        if i < 15:
            ci_cur = ci_cur + c_step
            ai_cur = ai_cur + a_step

        w_c = _shr(color_idx * wc_mul64 + wc_cm, wc_sh)
        w_a = _shr(alpha_idx * wa_mul64 + wa_cm, wa_sh)

        def sel3(vals):
            return jnp.where(subset == 1, vals[1],
                             jnp.where(subset == 2, vals[2], vals[0]))

        v_rb = sel3(rb_base) + w_c * sel3(rb_d)
        r = _shr(v_rb, 6) & 0xFF
        b = _shr(v_rb, 22) & 0xFF
        g = (sel3(g_base) + w_c * sel3(g_d)) >> 6
        a = (sel3(a_base) + w_a * sel3(a_d)) >> 6
        pix_ref[i] = (_shl(r, s_r) | _shl(g, s_g) | _shl(b, s_b)
                      | _shl(a, s_a))

    mm = jnp.broadcast_to(scal_ref[0], mode.shape)
    fl = scal_ref[1]
    mm_bit = _shr(mm, jnp.clip(mode_raw, 0, 31)) & 1
    valid = (mode_raw >= 0) & (mm_bit != 0)
    valid = valid & ~(((fl & 0x2) != 0) & (mode_raw >= 4))
    valid = valid & ~(((fl & 0x4) != 0) & (mode_raw < 4))
    valid_ref[...] = valid.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile",))
def decode_mxu(words_planar, tile: int):
    n = words_planar.shape[1]
    pre = pregather(words_planar)
    n_pad = -(-n // (8 * tile)) * (8 * tile)
    wp = jnp.pad(words_planar, ((0, 0), (0, n_pad - n)))
    pp = jnp.pad(pre, ((0, 0), (0, n_pad - n)))
    ell = n_pad // 8
    wp = wp.reshape(4, 8, ell)
    pp = pp.reshape(2, 8, ell)
    scal = jnp.asarray([-1, 0], jnp.int32)
    pix, valid = pl.pallas_call(
        _bc7_kernel_pre,
        grid=(ell // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, 8, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, 8, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, 8, ell), jnp.int32),
            jax.ShapeDtypeStruct((8, ell), jnp.int32),
        ],
    )(scal, wp, pp)
    return pix.reshape(16, n_pad)[:, :n], valid.reshape(n_pad)[:n] != 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tiles", default="256,512")
    args = ap.parse_args()

    rng = np.random.default_rng(42)
    blocks = rng.integers(0, 256, (N, 16), np.uint8)
    modes = rng.integers(0, 8, N)
    blocks[:, 0] = ((1 << modes)
                    | (blocks[:, 0] & (0xFF << (modes + 1)))).astype(np.uint8)
    words = jax.device_put(jnp.asarray(
        np.ascontiguousarray(blocks).view(np.uint32).astype(np.int64)
        .astype(np.int32)).T.copy())

    # Bit-exactness of the variant vs the production kernel.
    pix_a, val_a = jax.jit(functools.partial(
        BP.decode_bptc_planar, tile=256, interpret=False))(words)
    pix_b, val_b = decode_mxu(words, tile=256)
    assert np.array_equal(np.asarray(val_a), np.asarray(val_b))
    assert np.array_equal(np.asarray(pix_a), np.asarray(pix_b))
    print("bit-exact: ok", flush=True)

    LO, HI = 200, 2200

    def make_timer(fn):
        @jax.jit
        def run(x, iters):
            def body(i, acc):
                out, valid = fn(x ^ i)
                return acc ^ out[0, 0] ^ valid[0].astype(jnp.int32)
            return lax.fori_loop(0, iters, body, jnp.int32(0))

        def t(it):
            int(run(words, jnp.int32(it)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                int(run(words, jnp.int32(it)))
                ts.append(time.perf_counter() - t0)
            return ts
        return t

    for tile in (int(t) for t in args.tiles.split(",")):
        ta = make_timer(functools.partial(BP.decode_bptc_planar,
                                          tile=tile, interpret=False))
        tb = make_timer(functools.partial(decode_mxu, tile=tile))
        ras, rbs = [], []
        for _ in range(args.rounds):
            a_lo, b_lo = min(ta(LO)), min(tb(LO))
            a_hi = sorted(ta(HI))[1]
            b_hi = sorted(tb(HI))[1]
            ras.append(N * (HI - LO) / (a_hi - a_lo))
            rbs.append(N * (HI - LO) / (b_hi - b_lo))
        ratios = sorted(b / a for a, b in zip(ras, rbs))
        print(json.dumps({
            "tile": tile,
            "vpu_best": round(max(ras), -6),
            "mxu_best": round(max(rbs), -6),
            "ratio_best": round(max(rbs) / max(ras), 3),
            "round_ratios": [round(r, 3) for r in ratios],
        }), flush=True)


if __name__ == "__main__":
    main()

"""Mosaic in-kernel lane-interleave feasibility probe (round 5).

The honest pipeline harness showed the tiled->linear assembly is the
entire fused-pipeline overhead (PROFILE.md round 5): XLA-side forms
move 16-byte granules through HBM at 25-45% DMA efficiency.  The
structural fix is writing image-layout rows from INSIDE the kernel:
out_row_py[s, 4l+px] = v[4*py+px][s, l] — a 4-way lane interleave in
VMEM.

This probe measures whether Mosaic lowers a 4-way lane interleave at
useful speed, two ways, on a trivial kernel (so interleave cost
dominates):

  planar : read (16, 8, L) int32, add 1, write (16, 8, L)  [baseline]
  stack  : same, but write (4, 8, 4L) rows built with
           jnp.stack([...], axis=-1).reshape(8, 4L)
  repeat : same rows built with pltpu.repeat stretch + iota selects

Correctness is asserted against numpy before timing.

RESULTS (v5e, 2026-08-21): every lane-interleave formulation fails.
  stack+reshape(8,4L), jnp.repeat stretch, broadcast_to stretch,
  strided ref stores o[py,:,px::4]    -> Mosaic compile error;
  stack to a (8,T,4) minor-dim out    -> compiles, bit-correct, but
  64x SLOWER than the planar baseline (1.15e8 vs 7.4e9 blocks/s on a
  trivial kernel) — Mosaic scalarizes the minor-dim relayout.
Conclusion: in-kernel linear assembly is not viable on this Mosaic;
the XLA-side strided slice-concat (57% of kernel, PROFILE.md round 5)
stands, and the TPU-native answer for consumers who can take it is
the TILED layout (99% of kernel; detexDecompressTextureTiled
analogue, texture.c:77-98).

Usage: python tools/interleave_probe.py
"""

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

N = 1 << 16
TILE = 256


def _kernel_planar(x_ref, o_ref):
    for p in range(16):
        o_ref[p] = x_ref[p] + 1


def _interleave_stack(vs):
    """4 x (8, L) -> (8, 4L) via stack+reshape."""
    s = jnp.stack(vs, axis=-1)                   # (8, L, 4)
    return s.reshape(s.shape[0], s.shape[1] * 4)


def _interleave_repeat(vs):
    """4 x (8, L) -> (8, 4L) via jnp.repeat stretch + iota select."""
    r = [jnp.repeat(v, 4, axis=1) for v in vs]     # each (8, 4L)
    idx = lax.broadcasted_iota(jnp.int32, r[0].shape, 1) & 3
    out = r[0]
    for k in (1, 2, 3):
        out = jnp.where(idx == k, r[k], out)
    return out


def _kernel_rows_strided(x_ref, o_ref):
    """Strided ref stores: o[py, :, px::4] = v."""
    for py in range(4):
        for px in range(4):
            o_ref[py, :, px::4] = x_ref[4 * py + px] + 1


def _kernel_rows(x_ref, o_ref, *, interleave):
    vs = [x_ref[p] + 1 for p in range(16)]
    for py in range(4):
        o_ref[py] = interleave(vs[4 * py:4 * py + 4])


@functools.partial(jax.jit, static_argnames=("mode",))
def run_once(x, mode):
    ell = x.shape[2]
    if mode == "planar":
        return pl.pallas_call(
            _kernel_planar,
            grid=(ell // TILE,),
            in_specs=[pl.BlockSpec((16, 8, TILE), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((16, 8, TILE), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, 8, ell), jnp.int32),
        )(x)
    if mode == "strided":
        kern = _kernel_rows_strided
    else:
        interleave = {"stack": _interleave_stack,
                      "repeat": _interleave_repeat}[mode]
        kern = functools.partial(_kernel_rows, interleave=interleave)
    return pl.pallas_call(
        kern,
        grid=(ell // TILE,),
        in_specs=[pl.BlockSpec((16, 8, TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, 8, 4 * TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 8, 4 * ell), jnp.int32),
    )(x)


def main():
    rng = np.random.default_rng(0)
    ell = N // 8
    xh = rng.integers(0, 1 << 30, (16, 8, ell), np.int64).astype(np.int32)
    x = jax.device_put(xh)

    # correctness vs numpy
    want_rows = np.empty((4, 8, 4 * ell), np.int32)
    for py in range(4):
        for px in range(4):
            want_rows[py, :, px::4] = xh[4 * py + px] + 1
    results = {}
    for mode in ("planar", "stack", "repeat", "strided"):
        try:
            out = np.asarray(run_once(x, mode))
            if mode != "planar":
                assert np.array_equal(out, want_rows), f"{mode} WRONG"
            ok = True
        except Exception as e:
            results[mode] = {"error": str(e)[:200]}
            ok = False
        if not ok:
            continue

        @jax.jit
        def loop(x, iters, mode=mode):
            def body(i, carry):
                img, acc = carry
                new = run_once(x ^ i, mode)
                return new, acc ^ new[0, 0, 0]
            z = jnp.zeros(run_once(x, mode).shape, jnp.int32)
            img, acc = lax.fori_loop(0, iters, body, (z, jnp.int32(0)))
            return acc ^ img[0, 0, 0]

        def t(it):
            int(loop(x, jnp.int32(it)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                int(loop(x, jnp.int32(it)))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]
        lo, hi = 300, 3300
        rate = N * (hi - lo) / (t(hi) - t(lo))
        results[mode] = {"blocks_per_s": round(rate, -6)}
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()

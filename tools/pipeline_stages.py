"""Per-stage variant timing of the fused device texture pipeline
(VERDICT r4 missing #2 / next-round #4).

HARNESS NOTE (round 5): the loop body's full image is the fori_loop
CARRY, so every iteration must truly materialize the output to HBM.
Consuming only a scalar slice of the image is NOT a valid harness:
measured on v5e, `out.reshape(-1)[0]` lets XLA elide the assembly
relayout entirely (rates equal the no-assembly variant), while
`out[0,0,0]` leaves the transpose unfused at ~10 GB/s — the same
program measures 1.96e9 vs 8.0e7 blocks/s depending on that one
expression.  The carry harness matches the real
decompress_texture_linear_device contract (image is the jit output).

Variants, all from the planar kernel:

  kernel    : planar decode only, (16, N) carried            [baseline]
  rows      : + pix.T to (N, 16) carried
  tiled     : + where(valid), (16, N) carried (the tiled-output cost)
  sliceconc : + rows + where + (hb,wb,4,4) slice-per-row + concat
              assembly                                        [r4 engine]
  trans     : + where + (4,4,hb,wb)->(hb,4,wb,4) transpose   [r5 engine]
  full      : engine._device_pipeline as shipped

Usage: python tools/pipeline_stages.py [--family etc2_eac|bc1]
           [--rounds 2]
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

N = 1 << 16                      # 1024x1024 texture
HB = WB = 256


def get_family(name):
    from detex_tpu.ops.pallas import bc_pallas, etc_eac_pallas
    if name == "etc2_eac":
        return etc_eac_pallas.decode_etc2_eac_planar, 16, 256
    if name == "bc1":
        return bc_pallas.decode_bc1_planar, 8, 1024
    raise SystemExit(f"unknown family {name}")


def build_variants(planar_fn, tile):
    fn = functools.partial(planar_fn, tile=tile, interpret=False)

    def kernel(wp):
        pix, valid = fn(wp)
        return pix

    def rows(wp):
        pix, valid = fn(wp)
        return pix.T

    def tiled(wp):
        pix, valid = fn(wp)
        return jnp.where(valid[None, :], pix.astype(jnp.uint32),
                         jnp.uint32(0))

    def sliceconc(wp):
        pix, valid = fn(wp)
        v = jnp.where(valid[:, None], pix.T.astype(jnp.uint32),
                      jnp.uint32(0))
        tiles = v.reshape(HB, WB, 4, 4)
        rows_ = [tiles[:, :, py, :].reshape(HB, 1, WB * 4)
                 for py in range(4)]
        return jnp.concatenate(rows_, axis=1).reshape(HB * 4, WB * 4)

    def trans(wp):
        pix, valid = fn(wp)
        z = jnp.where(valid[None, :], pix.astype(jnp.uint32),
                      jnp.uint32(0))
        return z.reshape(4, 4, HB, WB).transpose(2, 0, 3, 1) \
            .reshape(HB * 4, WB * 4)

    return {"kernel": kernel, "rows": rows, "tiled": tiled,
            "sliceconc": sliceconc, "trans": trans}


def full_pipeline(tex_fmt):
    from detex_tpu import convert_device as CD
    from detex_tpu import engine
    from detex_tpu import formats as F
    return engine._device_pipeline(tex_fmt, F.RGBA8, WB, HB, WB * 4,
                                   HB * 4, CD.hdr_params_key())


def make_timer(g, words):
    """Carry-the-image harness: the image IS the loop carry (true HBM
    materialization each iteration); a scalar xor chain forces the
    iteration ordering."""
    out0 = jax.eval_shape(g, jax.ShapeDtypeStruct(words.shape,
                                                  words.dtype))

    @jax.jit
    def run(x, iters):
        init_img = jnp.zeros(out0.shape, out0.dtype)

        def body(i, carry):
            img, acc = carry
            new = g(x ^ i)
            return new, acc ^ new.reshape(-1)[0].astype(jnp.int32)
        img, acc = lax.fori_loop(0, iters, body,
                                 (init_img, jnp.int32(0)))
        return acc ^ img.reshape(-1)[0].astype(jnp.int32)

    def t(it):
        int(run(words, jnp.int32(it)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(words, jnp.int32(it)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="etc2_eac")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--lo", type=int, default=300)
    ap.add_argument("--hi", type=int, default=3300)
    args = ap.parse_args()

    from detex_tpu import formats as F
    planar_fn, bb, tile = get_family(args.family)
    tex_fmt = {"etc2_eac": F.ETC2_EAC, "bc1": F.BC1}[args.family]

    rng = np.random.default_rng(1)
    blocks = rng.integers(0, 256, (N, bb), np.uint8)
    words_rows = jax.device_put(jnp.asarray(
        np.ascontiguousarray(blocks).view(np.uint32).astype(np.int64)
        .astype(np.int32)))
    words_planar = jax.device_put(jnp.asarray(np.ascontiguousarray(
        np.asarray(words_rows).T)))

    variants = build_variants(planar_fn, tile)
    pipe, pipe_planar = full_pipeline(tex_fmt)
    timers = {k: make_timer(g, words_planar)
              for k, g in variants.items()}
    timers["full"] = make_timer(
        lambda w: pipe(w, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)),
        words_planar if pipe_planar else words_rows)

    rates = {k: [] for k in timers}
    for _ in range(args.rounds):
        for k, t in timers.items():
            tlo = t(args.lo)
            thi = t(args.hi)
            rates[k].append(N * (args.hi - args.lo) / (thi - tlo))
    out = {"family": args.family, "tile": tile,
           "rates_blocks_per_s": {k: round(max(v), -6)
                                  for k, v in rates.items()}}
    k0 = out["rates_blocks_per_s"]["kernel"]
    out["pct_of_kernel"] = {k: round(100 * v / k0, 1)
                            for k, v in out["rates_blocks_per_s"].items()}
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()

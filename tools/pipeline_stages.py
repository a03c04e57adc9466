"""Per-stage variant timing of the fused device texture pipeline
(VERDICT r4 missing #2 / next-round #4).

The ETC2_EAC 1024x1024 device pipeline runs at half its own raw
kernel's rate; this tool times the pipeline's stages and assembly
variants so the dominant stage is attackable:

  kernel   : planar decode only (16, N) out                [baseline]
  rows     : + pix.T to (N, 16)                            [r4 pipeline's
                                                            decoder entry]
  rows+w   : + where(valid) zero-fill
  full     : engine._device_pipeline (r4 shipping path)
  v_stack  : planar + where + per-(py,px) plane slices, px interleave
             by stack(-1), py rows by stack(1)
  v_trans  : planar + where + reshape(4,4,hb,wb) transpose(2,0,3,1)
  v_tiled  : planar + where only (tiled output, no linear relayout —
             what detexDecompressTextureTiled needs)

All variants are timed with the long-interval median method
(tools/method_probe.py) in one process, interleaved per round.

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

    def rows_w(wp):
        pix, valid = fn(wp)
        return jnp.where(valid[:, None], pix.T.astype(jnp.uint32),
                         jnp.uint32(0))

    def v_stack(wp):
        pix, valid = fn(wp)
        z = jnp.where(valid[None, :], pix.astype(jnp.uint32),
                      jnp.uint32(0))                    # (16, N) planar
        planes = z.reshape(4, 4, HB, WB)                # (py, px, hb, wb)
        rows_ = [jnp.stack([planes[py, px] for px in range(4)],
                           axis=-1).reshape(HB, WB * 4)
                 for py in range(4)]
        return jnp.stack(rows_, axis=1).reshape(HB * 4, WB * 4)

    def v_trans(wp):
        pix, valid = fn(wp)
        z = jnp.where(valid[None, :], pix.astype(jnp.uint32),
                      jnp.uint32(0))
        return z.reshape(4, 4, HB, WB).transpose(2, 0, 3, 1) \
            .reshape(HB * 4, WB * 4)

    def v_tiled(wp):
        pix, valid = fn(wp)
        return jnp.where(valid[None, :], pix.astype(jnp.uint32),
                         jnp.uint32(0))

    return {"kernel": kernel, "rows": rows, "rows+w": rows_w,
            "v_stack": v_stack, "v_trans": v_trans, "v_tiled": v_tiled}


def full_pipeline(tex_fmt):
    from detex_tpu import convert_device as CD
    from detex_tpu import engine
    from detex_tpu import formats as F
    return engine._device_pipeline(tex_fmt, F.RGBA8, WB, HB, WB * 4,
                                   HB * 4, CD.hdr_params_key())


def make_timer(g, words, planar_in: bool):
    @jax.jit
    def run(x, iters):
        def body(i, acc):
            out = g(x ^ i)
            return acc ^ out.reshape(-1)[0].astype(jnp.int32)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

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
    timers = {k: make_timer(g, words_planar, True)
              for k, g in variants.items()}
    timers["full"] = make_timer(
        lambda w: pipe(w, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)),
        words_planar if pipe_planar else words_rows, pipe_planar)

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

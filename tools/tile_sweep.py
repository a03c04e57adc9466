"""Block-tile sweep for the fused Pallas decode kernels (re-tune after
kernel changes; feeds the *_auto best_tile defaults and PROFILE.md).

Usage: python tools/tile_sweep.py [FAMILY ...] [--tiles 128,256,512]
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

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402
from jax import lax             # noqa: E402

from detex_tpu.ops.pallas import (bc_pallas,  # noqa: E402
                                  bptc_float_pallas, bptc_pallas,
                                  etc_eac_pallas)

N = 1 << 16
# Long-interval method (tools/method_probe.py, round 5): rates from
# short windows swing 10%+ with tunnel RPC jitter.  For fast families
# (>= 1e10 blocks/s) even this HI is ~70 ms — rely on the median and
# the min-subtracted lo point.
LO, HI = 500, 10500

FAMILIES = {
    "BC7": (bptc_pallas.decode_bptc_planar, 16),
    "BC6H": (bptc_float_pallas.decode_bptc_float_planar, 16),
    "ETC1": (etc_eac_pallas.decode_etc1_planar, 8),
    "ETC2": (etc_eac_pallas.decode_etc2_planar, 8),
    "ETC2_PT": (etc_eac_pallas.decode_etc2_punchthrough_planar, 8),
    "ETC2_EAC": (etc_eac_pallas.decode_etc2_eac_planar, 16),
    "EAC_R11": (etc_eac_pallas.decode_eac_r11_planar, 8),
    "EAC_RG11": (etc_eac_pallas.decode_eac_rg11_planar, 16),
    "BC1": (bc_pallas.decode_bc1_planar, 8),
    "BC1A": (bc_pallas.decode_bc1a_planar, 8),
    "BC2": (bc_pallas.decode_bc2_planar, 16),
    "BC3": (bc_pallas.decode_bc3_planar, 16),
    "RGTC1": (bc_pallas.decode_rgtc1_planar, 8),
    "RGTC2": (bc_pallas.decode_rgtc2_planar, 16),
    "SIGNED_RGTC1": (bc_pallas.decode_signed_rgtc1_planar, 8),
    "SIGNED_RGTC2": (bc_pallas.decode_signed_rgtc2_planar, 16),
}


def rate(family: str, tile: int) -> float:
    fn, bb = FAMILIES[family]
    rng = np.random.default_rng(42)
    blocks = rng.integers(0, 256, (N, bb), np.uint8)
    words = jax.device_put(jnp.asarray(
        np.ascontiguousarray(blocks).view(np.uint32).astype(np.int64)
        .astype(np.int32)).T.copy())
    call = functools.partial(fn, tile=tile, interpret=False)

    @jax.jit
    def run(x, iters):
        def body(i, acc):
            out, valid = call(x ^ i)
            return acc ^ out.reshape(-1)[0].astype(jnp.int32) \
                ^ valid[0].astype(jnp.int32)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    def t(it, pick):
        int(run(words, it))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(words, it))
            ts.append(time.perf_counter() - t0)
        return min(ts) if pick == "min" else sorted(ts)[1]

    return N * (HI - LO) / (t(HI, "med") - t(LO, "min"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*", default=list(FAMILIES))
    ap.add_argument("--tiles", default="128,256,512")
    args = ap.parse_args()
    tiles = [int(t) for t in args.tiles.split(",")]
    for family in args.families:
        rates = {t: rate(family, t) for t in tiles}
        best = max(rates, key=rates.get)
        print(json.dumps({
            "family": family,
            "rates": {str(t): f"{r:.3g}" for t, r in rates.items()},
            "best_tile": best,
            "best_blocks_per_s": f"{rates[best]:.4g}",
        }), flush=True)


if __name__ == "__main__":
    main()

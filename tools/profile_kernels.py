"""Per-kernel roofline profile: sustained throughput of every Pallas
decode kernel vs the HBM speed-of-light bound (SURVEY.md §5 tracing /
BASELINE.md speed-of-light accounting).

Each kernel's effective bytes/block = compressed input + decoded output
(the kernels stream each exactly once).  Output bytes are the TRUE
payload widths (detex.h:879-930 pixel sizes) — the kernels emit packed
payload words since round 4, so no %-of-SoL figure counts padding as
useful traffic (VERDICT r3 weak #1).  Sustained rates use the
two-point marginal method from bench.py (all iterations inside one
jitted fori_loop, scalar fetched to host, fixed dispatch overhead
cancelled).

Usage: python tools/profile_kernels.py [--out PROFILE.md]
"""

import argparse
import functools
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

from detex_tpu.ops.bitops import words_from_bytes          # noqa: E402
from detex_tpu.ops.pallas import (bc_pallas,                # noqa: E402
                                  bptc_float_pallas, bptc_pallas,
                                  etc_eac_pallas)

N = 1 << 16
# Long-interval median method (tools/method_probe.py, round 5)
LO, HI = 500, 5500

# HBM bandwidth per chip (GB/s), by platform version substring.
HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0, "v4": 1228.0,
            "v6": 1640.0}


def hbm_bandwidth():
    d = jax.devices()[0]
    name = getattr(d, "device_kind", "").lower()
    for k, v in HBM_GBPS.items():
        if k in name:
            return v
    return 819.0


def sustained(fn, x):
    @functools.partial(jax.jit, static_argnames="iters")
    def run(x, iters):
        def body(i, acc):
            out, valid = fn(x ^ i)
            return acc ^ out.reshape(-1)[0].astype(jnp.int32) \
                ^ valid[0].astype(jnp.int32)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    def t(it, pick):
        int(run(x, it))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(x, it))
            ts.append(time.perf_counter() - t0)
        return min(ts) if pick == "min" else sorted(ts)[1]

    return N * (HI - LO) / (t(HI, "med") - t(LO, "min"))


# kernel -> (planar decode fn, block bytes, TRUE-payload output bytes
# per block; every kernel writes exactly this many pixel bytes since
# the round-4 packed-output rework).
KERNELS = {
    "BC7": (functools.partial(bptc_pallas.decode_bptc_planar, tile=256),
            16, 64 + 4),
    "BC6H": (functools.partial(bptc_float_pallas.decode_bptc_float_planar,
                               tile=256), 16, 32 * 4 + 4),
    "ETC1": (functools.partial(etc_eac_pallas.decode_etc1_planar, tile=1024),
             8, 64 + 4),
    "ETC2": (functools.partial(etc_eac_pallas.decode_etc2_planar, tile=256),
             8, 64 + 4),
    "ETC2_EAC": (functools.partial(etc_eac_pallas.decode_etc2_eac_planar,
                                   tile=256), 16, 64 + 4),
    "EAC_R11": (functools.partial(etc_eac_pallas.decode_eac_r11_planar,
                                  tile=1024), 8, 32 + 4),
    "EAC_RG11": (functools.partial(etc_eac_pallas.decode_eac_rg11_planar,
                                   tile=512), 16, 64 + 4),
    "BC1": (functools.partial(bc_pallas.decode_bc1_planar, tile=1024),
            8, 64 + 4),
    "BC3": (functools.partial(bc_pallas.decode_bc3_planar, tile=256),
            16, 64 + 4),
    "RGTC1": (functools.partial(bc_pallas.decode_rgtc1_planar, tile=1024),
              8, 16 + 4),
    "RGTC2": (functools.partial(bc_pallas.decode_rgtc2_planar, tile=256),
              16, 32 + 4),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write a markdown table to this file")
    args = ap.parse_args()

    bw = hbm_bandwidth()
    dev = jax.devices()[0]
    rows = []
    rng = np.random.default_rng(0)
    for name, (fn, bb, ob) in KERNELS.items():
        blocks = rng.integers(0, 256, (N, bb), np.uint8)
        wp = jax.device_put(np.asarray(words_from_bytes(blocks)).T.copy())
        rate = sustained(fn, wp)
        eff_bytes = bb + ob
        gbps = rate * eff_bytes / 1e9
        sol = bw * 1e9 / eff_bytes
        rows.append((name, rate, gbps, 100.0 * rate / sol))
        print(f"{name:10s} {rate:.3e} blocks/s  {gbps:7.1f} GB/s "
              f"({rows[-1][3]:5.1f}% of HBM SoL)")

    if args.out:
        lines = [
            f"# Kernel roofline profile ({dev.device_kind}, "
            f"HBM ~{bw:.0f} GB/s)\n",
            "\n| Kernel | blocks/s | effective GB/s | % of HBM "
            "speed-of-light |\n",
            "|---|---|---|---|\n",
        ]
        for name, rate, gbps, pct in rows:
            lines.append(f"| {name} | {rate:.3e} | {gbps:.1f} "
                         f"| {pct:.1f}% |\n")
        Path(args.out).write_text("".join(lines))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Measurement-method experiment (VERDICT r4 missing #3): does a much
longer timed interval + median-of-reps collapse the 1.6-1.9x same-binary
swing that the round-4 bench method showed on this tunnel?

Compares, in ONE process, alternating over several rounds:
  short  : the round-4 bench.py method — marginal rate between 50 and
           1050 iterations, best-of-5 reps (timed interval ~30 ms at
           2e9 blocks/s, the same order as tunnel RPC jitter)
  long   : marginal rate between 1000 and 11000 iterations,
           median-of-reps (timed interval ~330 ms, amortizing per-call
           transport noise ~10x further)
plus the clock canary before every round, so the "rate tracks the
canary" claim (BASELINE.md:197, contradicted by BENCH_r04) gets a
same-process test: if long-rate is stable while the canary moves, the
canary does not probe the states that matter and the claim dies.

Usage: python tools/method_probe.py [--rounds 6] [--tile 256]
Prints one JSON line per round and a summary.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 1 << 16


def make_run(tile):
    from detex_tpu.ops.pallas import bptc_pallas

    rng = np.random.default_rng(42)
    blocks = rng.integers(0, 256, (N, 16), np.uint8)
    modes = rng.integers(0, 8, N)
    blocks[:, 0] = ((1 << modes)
                    | (blocks[:, 0] & (0xFF << (modes + 1)))).astype(np.uint8)
    words = jax.device_put(jnp.asarray(
        np.ascontiguousarray(blocks).view(np.uint32).astype(np.int64)
        .astype(np.int32)).T.copy())

    @jax.jit
    def run(x, iters):
        def body(i, acc):
            out, valid = bptc_pallas.decode_bptc_planar(
                x ^ i, tile=tile, interpret=False)
            return acc ^ out.reshape(-1)[0] ^ valid[0].astype(jnp.int32)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    return run, words


def measure(run, words, lo, hi, reps, pick):
    def t(it):
        int(run(words, jnp.int32(it)))      # warm this trip count
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(run(words, jnp.int32(it)))
            ts.append(time.perf_counter() - t0)
        return ts
    tlo = min(t(lo))
    this = t(hi)
    rates = sorted(N * (hi - lo) / (th - tlo) for th in this)
    if pick == "best":
        return rates[-1]
    return rates[len(rates) // 2]


def canary():
    import bench
    return bench.clock_canary()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--sleep", type=float, default=0.0,
                    help="seconds between rounds (span the session "
                         "states the bimodality lives in)")
    args = ap.parse_args()

    run, words = make_run(args.tile)
    # Warm both trip-count programs before any timing.
    int(run(words, jnp.int32(1)))

    shorts, longs, canaries = [], [], []
    for r in range(args.rounds):
        if r and args.sleep:
            time.sleep(args.sleep)
        c = canary()
        s = measure(run, words, 50, 1050, 5, "best")
        lg = measure(run, words, 1000, 11000, 3, "median")
        shorts.append(s)
        longs.append(lg)
        canaries.append(c)
        print(json.dumps({"round": r, "canary_gops": round(c, 1),
                          "short_best": round(s, -6),
                          "long_median": round(lg, -6)}), flush=True)

    def spread(v):
        return round(100 * (max(v) - min(v)) / max(v), 1)

    print(json.dumps({
        "summary": True, "tile": args.tile,
        "short": {"min": min(shorts), "max": max(shorts),
                  "spread_pct": spread(shorts)},
        "long": {"min": min(longs), "max": max(longs),
                 "spread_pct": spread(longs)},
        "canary": {"min": round(min(canaries), 1),
                   "max": round(max(canaries), 1),
                   "spread_pct": spread(canaries)},
    }), flush=True)


if __name__ == "__main__":
    main()

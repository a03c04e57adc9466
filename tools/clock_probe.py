"""Characterize the tunnel chip's clock states: run bench.py's fixed
synthetic canary kernel repeatedly and print one JSON line per sample
(rate + wall time), then a summary (min/max/modes).  Evidence behind
the "bimodal chip" benchmarking discipline (PROFILE.md round 4).

Usage: python tools/clock_probe.py [--samples 30] [--sleep 2]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import jax                      # noqa: E402,F401
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402

from bench import canary_runner  # noqa: E402  (the SAME kernel bench.py
#                                  records as canary_gops — comparable)


def make_runner():
    run, x, n_ops = canary_runner()

    def sample(lo=20, hi=220):
        def t(it):
            int(run(x, jnp.int32(it)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                int(run(x, jnp.int32(it)))
                best = min(best, time.perf_counter() - t0)
            return best
        dt = t(hi) - t(lo)
        return (hi - lo) * x.size * n_ops / dt / 1e9

    return sample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=30)
    ap.add_argument("--sleep", type=float, default=2.0)
    args = ap.parse_args()

    sample = make_runner()
    sample()                               # warm the compile
    rates = []
    t0 = time.time()
    for i in range(args.samples):
        r = sample()
        rates.append(r)
        print(json.dumps({"t_s": round(time.time() - t0, 1),
                          "canary_gops": round(r, 1)}), flush=True)
        time.sleep(args.sleep)
    rates = np.asarray(rates)
    med = float(np.median(rates))
    lo_state = rates[rates < 0.8 * rates.max()]
    print(json.dumps({
        "summary": {
            "n": len(rates),
            "min": round(float(rates.min()), 1),
            "median": round(med, 1),
            "max": round(float(rates.max()), 1),
            "max_over_min": round(float(rates.max() / rates.min()), 2),
            "pct_below_0.8max": round(100 * len(lo_state) / len(rates), 1),
        }
    }))


if __name__ == "__main__":
    main()

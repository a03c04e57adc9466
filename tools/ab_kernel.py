"""Same-process A/B of the BC7 Pallas kernel against another git
revision of bptc_pallas.py: loads the old module side by side, then
measures both with the marginal-rate method in ONE process, so chip
clock / tunnel variance (10-20% between sessions on this setup)
cancels out of the ratio.  This is the harness behind the round-3
BASELINE rows (1.688 -> 1.774 -> 2.00 -> 2.13e9 blocks/s).

Usage:
  python tools/ab_kernel.py [REV] [--tiles 256,512]
REV defaults to HEAD~1; the working tree is always "new".
"""

import argparse
import functools
import importlib.util
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N, LO, HI = 1 << 16, 50, 1050


def load_rev(rev: str):
    src = subprocess.check_output(
        ["git", "-C", str(REPO), "show",
         f"{rev}:detex_tpu/ops/pallas/bptc_pallas.py"])
    with tempfile.NamedTemporaryFile("wb", suffix=".py",
                                     delete=False) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("bptc_pallas_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def rate(mod, words, tile: int) -> float:
    fn = functools.partial(mod.decode_bptc_planar, tile=tile,
                           interpret=False)

    @jax.jit
    def run(x, iters):
        def body(i, acc):
            out, valid = fn(x ^ i)
            return acc ^ out.reshape(-1)[0].astype(jnp.int32) \
                ^ valid[0].astype(jnp.int32)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    def t(it):
        int(run(words, it))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(words, it))
            best = min(best, time.perf_counter() - t0)
        return best

    return N * (HI - LO) / (t(HI) - t(LO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rev", nargs="?", default="HEAD~1")
    ap.add_argument("--tiles", default="256,512")
    args = ap.parse_args()

    old = load_rev(args.rev)
    from detex_tpu.ops.pallas import bptc_pallas as new

    rng = np.random.default_rng(42)
    blocks = rng.integers(0, 256, (N, 16), np.uint8)
    words = jax.device_put(jnp.asarray(
        np.ascontiguousarray(blocks).view(np.uint32).astype(np.int64)
        .astype(np.int32)).T.copy())

    for tile in (int(t) for t in args.tiles.split(",")):
        ro = rate(old, words, tile)
        rn = rate(new, words, tile)
        print(f"tile {tile}: {args.rev} {ro:.3e}  worktree {rn:.3e}  "
              f"ratio {rn / ro:.3f}", flush=True)


if __name__ == "__main__":
    main()

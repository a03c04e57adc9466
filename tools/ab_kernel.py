"""Same-process A/B of a Pallas decode kernel against another git
revision of its module: loads the old module side by side, then
measures both with the marginal-rate method in ONE process,
interleaved old/new per tile, so chip clock / tunnel variance (10-20%
between sessions, and several % within a session on this setup)
cancels out of the ratio.  This is the harness behind the round-3/4
BASELINE rows.

Usage:
  python tools/ab_kernel.py [REV] [--tiles 256,512]
      [--module bptc_pallas] [--fn decode_bptc_planar] [--bytes 16]
REV defaults to HEAD~1; the working tree is always "new".

Examples:
  python tools/ab_kernel.py HEAD --module bc_pallas \
      --fn decode_rgtc1_planar --bytes 8
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

# Long-interval method (tools/method_probe.py, round 5): the
# timed interval must dwarf tunnel RPC jitter for stable rates.
N, LO, HI = 1 << 16, 500, 5500


def load_rev(rev: str, module: str):
    src = subprocess.check_output(
        ["git", "-C", str(REPO), "show",
         f"{rev}:detex_tpu/ops/pallas/{module}.py"])
    with tempfile.NamedTemporaryFile("wb", suffix=".py",
                                     delete=False) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location(f"{module}_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_timer(mod, fn_name, words, tile: int):
    fn = functools.partial(getattr(mod, fn_name), tile=tile,
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
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(words, it))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]                   # median-of-3

    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rev", nargs="?", default="HEAD~1")
    ap.add_argument("--tiles", default="256,512")
    ap.add_argument("--module", default="bptc_pallas")
    ap.add_argument("--fn", default="decode_bptc_planar")
    ap.add_argument("--bytes", type=int, default=16,
                    help="compressed block bytes")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    old = load_rev(args.rev, args.module)
    import importlib
    new = importlib.import_module(f"detex_tpu.ops.pallas.{args.module}")

    rng = np.random.default_rng(42)
    blocks = rng.integers(0, 256, (N, args.bytes), np.uint8)
    words = jax.device_put(jnp.asarray(
        np.ascontiguousarray(blocks).view(np.uint32).astype(np.int64)
        .astype(np.int32)).T.copy())

    for tile in (int(t) for t in args.tiles.split(",")):
        to = make_timer(old, args.fn, words, tile)
        tn = make_timer(new, args.fn, words, tile)
        # The tunnel chip flips between performance states (observed
        # ~1.6x bimodality within a session): alternate full A/B
        # rounds and report every ratio plus the BEST rate per side —
        # best-vs-best compares the same machine state.
        ros, rns = [], []
        for _ in range(args.rounds):
            o_lo, n_lo = to(LO), tn(LO)
            o_hi, n_hi = to(HI), tn(HI)
            ros.append(N * (HI - LO) / (o_hi - o_lo))
            rns.append(N * (HI - LO) / (n_hi - n_lo))
        ratios = sorted(rn / ro for ro, rn in zip(ros, rns))
        med = ratios[len(ratios) // 2]
        print(f"{args.fn} tile {tile}: {args.rev} best {max(ros):.3e}  "
              f"worktree best {max(rns):.3e}  "
              f"best-ratio {max(rns) / max(ros):.3f}  "
              f"round-ratios {[f'{r:.2f}' for r in ratios]} med {med:.3f}",
              flush=True)


if __name__ == "__main__":
    main()

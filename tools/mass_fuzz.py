"""Mass randomized bit-exactness sweep: every decode family, device
kernels vs the independent C++ oracle, at production scale (default
1M blocks/family ~ 19M blocks total).

The corpus tests pin 256 blocks/family and the per-round bench
witnesses 64k BC7 blocks; this sweep is the wide-net version — random
bitstrings (valid-mode prefixes where a random prefix would be an
invalid block: BC7 mode byte, BC6H reserved codes) through
engine.decode_blocks on the default device AND through the threaded
native oracle (detex_tpu.native), comparing validity masks everywhere
and pixel bytes on valid blocks (invalid blocks' pixel content is
unspecified; callers zero-fill in the target format, texture.c:90-93).

Usage: python tools/mass_fuzz.py [--blocks 1048576] [--chunk 262144]
           [FAMILY ...]
Prints one line per family and a summary; exits non-zero on any
miscompare.
"""

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import numpy as np

from detex_tpu import engine
from detex_tpu import formats as F

FAMILIES = {
    "BC1": (F.BC1, 8, None), "BC1A": (F.BC1A, 8, None),
    "BC2": (F.BC2, 16, None), "BC3": (F.BC3, 16, None),
    "RGTC1": (F.RGTC1, 8, None),
    "SIGNED_RGTC1": (F.SIGNED_RGTC1, 8, None),
    "RGTC2": (F.RGTC2, 16, None),
    "SIGNED_RGTC2": (F.SIGNED_RGTC2, 16, None),
    "BPTC": (F.BPTC, 16, "bc7"),
    "BPTC_FLOAT": (F.BPTC_FLOAT, 16, "bc6h"),
    "BPTC_SIGNED_FLOAT": (F.BPTC_SIGNED_FLOAT, 16, "bc6h"),
    "ETC1": (F.ETC1, 8, None), "ETC2": (F.ETC2, 8, None),
    "ETC2_PUNCHTHROUGH": (F.ETC2_PUNCHTHROUGH, 8, None),
    "ETC2_EAC": (F.ETC2_EAC, 16, None),
    "EAC_R11": (F.EAC_R11, 8, None),
    "EAC_SIGNED_R11": (F.EAC_SIGNED_R11, 8, None),
    "EAC_RG11": (F.EAC_RG11, 16, None),
    "EAC_SIGNED_RG11": (F.EAC_SIGNED_RG11, 16, None),
}


def gen_blocks(rng, n, bb, fixup):
    blocks = rng.integers(0, 256, (n, bb), np.uint8)
    if fixup == "bc7":
        modes = rng.integers(0, 8, n)
        blocks[:, 0] = ((1 << modes)
                        | (blocks[:, 0] & (0xFF << (modes + 1)))
                        ).astype(np.uint8)
    elif fixup == "bc6h":
        blocks[:, 0] = ((blocks[:, 0] & 0xFC)
                        | rng.integers(0, 2, n)).astype(np.uint8)
    return blocks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*", default=list(FAMILIES))
    ap.add_argument("--blocks", type=int, default=1 << 20)
    ap.add_argument("--chunk", type=int, default=1 << 18)
    args = ap.parse_args()

    rng = np.random.default_rng(20260821)
    total = 0
    bad = []
    t_all = time.perf_counter()
    for name in args.families:
        fmt, bb, fixup = FAMILIES[name]
        n_done = 0
        t0 = time.perf_counter()
        while n_done < args.blocks:
            n = min(args.chunk, args.blocks - n_done)
            blocks = gen_blocks(rng, n, bb, fixup)
            ours, ov = engine.decode_blocks(fmt, blocks)
            want, wv = engine.decode_blocks(fmt, blocks,
                                            backend="native")
            if not np.array_equal(ov, wv):
                bad.append((name, "valid-mask",
                            int(np.sum(ov != wv))))
                break
            if not np.array_equal(ours[wv], want[wv]):
                diff = np.any(ours[wv] != want[wv], axis=1)
                bad.append((name, "pixels", int(diff.sum())))
                break
            n_done += n
        total += n_done
        print(f"  {name:20s} {n_done:>9,d} blocks "
              f"({int(np.sum(~wv)):,d} invalid in last chunk) "
              f"{'BIT-EXACT' if not bad or bad[-1][0] != name else 'MISCOMPARE'} "
              f"[{time.perf_counter() - t0:.1f}s]", flush=True)
        if bad and bad[-1][0] == name:
            break
    dt = time.perf_counter() - t_all
    if bad:
        print(f"FAILED: {bad}")
        sys.exit(1)
    print(f"ALL BIT-EXACT: {total:,d} random blocks across "
          f"{len(args.families)} families in {dt:.0f}s "
          f"(device={engine.LAST_BACKEND or 'jax'})")


if __name__ == "__main__":
    main()

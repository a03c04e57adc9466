"""Benchmark runner: BC7 (BPTC) batched decode throughput on the
default device, compared against the single-threaded C reference on the
host CPU.

Prints ONE JSON line:
  {"metric": "bc7_decode_blocks_per_s", "value": N, "unit": "blocks/s",
   "vs_baseline": ratio}

vs_baseline is ours / C-reference (detexDecompressTextureLinear over the
same blocks, RGBA8 output, -O2), measured on this machine.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import jax
import numpy as np

N_BLOCKS = 1 << 16        # 64k blocks = a 1024x1024 texture
N_WARMUP = 2
N_ITERS = 20


def bench_ours(blocks_u8: np.ndarray) -> float:
    from detex_tpu.ops import bptc_fast
    from detex_tpu.ops.bitops import words_from_bytes

    words = jax.device_put(words_from_bytes(blocks_u8))
    fn = jax.jit(lambda w: bptc_fast.decode_bptc_fast(w))
    for _ in range(N_WARMUP):
        jax.block_until_ready(fn(words))
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = fn(words)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITERS
    return blocks_u8.shape[0] / dt


def bench_reference(blocks_u8: np.ndarray) -> float:
    """Single-thread C reference via detexDecompressTextureLinear."""
    try:
        from refbind import Reference
        from detex_tpu import formats as F
    except Exception:
        return 0.0
    ref = Reference()
    side_blocks = int(np.sqrt(blocks_u8.shape[0]))
    n = side_blocks * side_blocks
    data = np.ascontiguousarray(blocks_u8[:n]).reshape(-1)
    w = h = side_blocks * 4
    # warmup
    ref.decompress_texture_linear(F.BPTC, data, w, h, F.RGBA8)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        ref.decompress_texture_linear(F.BPTC, data, w, h, F.RGBA8)
    dt = (time.perf_counter() - t0) / iters
    return n / dt


def main():
    rng = np.random.default_rng(42)
    # Random bitstrings with a valid, uniformly random mode prefix (our
    # decoder computes all 8 modes and selects, so our throughput is
    # mode-independent; the C baseline's per-mode paths differ).
    blocks = rng.integers(0, 256, size=(N_BLOCKS, 16), dtype=np.uint8)
    modes = rng.integers(0, 8, size=N_BLOCKS)
    blocks[:, 0] = ((1 << modes)
                    | (blocks[:, 0] & (0xFF << (modes + 1)))).astype(
                        np.uint8)

    ours = bench_ours(blocks)
    baseline = bench_reference(blocks)
    vs = ours / baseline if baseline > 0 else 0.0
    print(json.dumps({
        "metric": "bc7_decode_blocks_per_s",
        "value": round(ours, 1),
        "unit": "blocks/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()

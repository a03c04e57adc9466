"""Benchmark runner: BC7 (BPTC) batched decode throughput on the
default device, compared against the single-threaded C reference on the
host CPU.

Prints ONE JSON line:
  {"metric": "bc7_decode_blocks_per_s", "value": N, "unit": "blocks/s",
   "vs_baseline": ratio}

vs_baseline is ours / C-reference (detexDecompressTextureLinear over the
same blocks, RGBA8 output, -O2), measured on this machine.

Measurement method (round 5, after tools/method_probe.py): the timed
interval is ~330 ms of device work (marginal rate between 1,000 and
11,000 fori_loop iterations) and the reported rate is the MEDIAN of
the hi-repetitions.  The round-4 method (30 ms interval, best-of-5)
swung 10% on the same binary in one process while this method holds
1.4% over the same minutes — the historical 1.6-1.9x "bimodality" was
transport/timing noise on intervals comparable to tunnel RPC jitter,
NOT chip clock state (PROFILE.md "measurement method").

Also writes BENCH_FAMILIES.json — the same marginal-rate method over
every decode family (the reference's whole validate.c:31-57 corpus
surface, not just BC7) — unless DETEX_BENCH_FAMILIES=0.
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
# Marginal rate between two iteration counts cancels fixed
# dispatch/RPC overhead; the interval must be LONG relative to RPC
# jitter (~10 ms on this tunnel) for the rate to be stable.
N_ITERS_LO = 1000
N_ITERS_HI = 11000


def _median_rate(run, n_blocks, lo, hi, reps=3):
    """Marginal blocks/s between trip counts lo and hi: min-of-reps at
    lo (the baseline overhead), median-of-reps at hi (the signal).
    `run(iters)` must fetch a scalar (true device sync)."""
    def t(it):
        run(it)                               # warm this trip count
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(it)
            ts.append(time.perf_counter() - t0)
        return ts
    tlo = min(t(lo))
    rates = sorted(n_blocks * (hi - lo) / (th - tlo) for th in t(hi))
    return rates[len(rates) // 2], rates


def bench_ours(blocks_u8: np.ndarray):
    """Pallas fused BC7 kernel, planar layout.

    All N_ITERS decodes run inside ONE jitted fori_loop whose scalar
    result is fetched to the host: remote/async dispatch cannot fake
    the timing (device sync is forced by the fetch), and XLA cannot
    CSE the iterations because each one perturbs the input words.

    The block tile is autotuned over {128, 256, 512}; iters stays
    TRACED (axon compiles static trip counts very slowly, and one
    compile per tile serves both measurement points).
    """
    import functools

    import jax.numpy as jnp
    from jax import lax

    from detex_tpu.ops.bitops import words_from_bytes
    from detex_tpu.ops.pallas import bptc_pallas

    words_planar = jax.device_put(
        np.asarray(words_from_bytes(blocks_u8)).T.copy())

    @functools.partial(jax.jit, static_argnames=("tile",))
    def run(wp, iters, tile):
        def body(i, acc):
            pix, valid = bptc_pallas.decode_bptc_planar(
                wp ^ i, tile=tile, interpret=False)
            # reshape(-1)[0], NOT pix[0, 0]: the 2D scalar slice of a
            # pallas output costs ~10% extra (measured round 5); the
            # flat form adds nothing and cannot elide the opaque
            # pallas computation.
            return acc ^ pix.reshape(-1)[0] ^ valid[0].astype(jnp.int32)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    n = blocks_u8.shape[0]
    results = {}
    for tile in (128, 256, 512):
        med, rates = _median_rate(
            lambda it, tile=tile: int(run(words_planar, it, tile)),
            n, N_ITERS_LO, N_ITERS_HI)
        results[tile] = (med, rates)
    best_tile = max(results, key=lambda t: results[t][0])
    med, rates = results[best_tile]
    return med, {"tile": best_tile,
                 "spread_pct": round(
                     100 * (rates[-1] - rates[0]) / rates[-1], 2)}


CANARY_OPS_PER_ITER = 256                     # adds+xors per element


def canary_runner():
    """The FIXED synthetic canary kernel (pure int32 arithmetic chain,
    no decode logic), shared with tools/clock_probe.py.  Returns
    (run(x, iters) -> scalar, x, ops_per_iter)."""
    import jax.numpy as jnp  # noqa: F401
    from jax import lax

    x = jax.device_put(np.arange(8 * 65536, dtype=np.int32)
                       .reshape(8, 65536))

    @jax.jit
    def run(x, iters):
        def body(i, acc):
            v = acc ^ i
            for k in range(CANARY_OPS_PER_ITER // 2):
                v = (v + (v >> 7)) ^ (k + 1)
            return v
        return lax.fori_loop(0, iters, body, x)[0, 0]

    return run, x, CANARY_OPS_PER_ITER


def clock_canary() -> float:
    """Ambient-condition record ONLY.  tools/method_probe.py (round 5)
    showed the canary swinging 30% while the long-interval kernel rate
    held 1.4%, with NO correlation — the canary does NOT normalize
    decode rates and the round-4 "rate tracks the canary" claim
    (BASELINE.md) is retracted.  It is still recorded so a pathological
    session (e.g. a saturated tunnel) is visible in the artifact.
    Unit: 1e9 int32 ops/s."""
    import jax.numpy as jnp

    run, x, ops = canary_runner()

    def t(it):
        int(run(x, jnp.int32(it)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(x, jnp.int32(it)))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = 20, 220
    dt = t(hi) - t(lo)
    return (hi - lo) * x.size * ops / dt / 1e9


def witness_correctness(blocks_u8: np.ndarray, tile: int = 512) -> str:
    """Bit-compare ONE full batch from the compiled device kernel
    against the C reference oracle, so every recorded BENCH number is
    also a hardware-correctness witness (reference analogue:
    validate.c:188-222's role).  `tile` must be the tile the timing
    used — tile changes grid/padding, so witnessing any other tile
    would witness a different binary.

    Returns "ok", "skipped (no oracle)", or raises on miscompare.
    """
    import jax.numpy as jnp  # noqa: F401

    from detex_tpu.ops.bitops import words_from_bytes
    from detex_tpu.ops.pallas import bptc_pallas

    try:
        from refbind import Reference
        ref = Reference()
    except Exception as e:
        return f"skipped (no oracle: {e})"

    words_planar = jax.device_put(
        np.asarray(words_from_bytes(blocks_u8)).T.copy())
    pix, valid = jax.jit(
        lambda wp: bptc_pallas.decode_bptc_planar(wp, tile=tile,
                                                  interpret=False)
    )(words_planar)
    # np.ascontiguousarray: device fetches can come back F-order, and
    # astype(order='K') preserves that — .view needs C-contiguity.
    ours = np.ascontiguousarray(np.asarray(pix).T).astype(np.uint32) \
        .view(np.uint8).reshape(blocks_u8.shape[0], 64)
    ours_valid = np.asarray(valid)
    want, want_valid = ref.decode_blocks("BPTC", blocks_u8)
    if not np.array_equal(ours_valid, want_valid):
        raise AssertionError(
            f"BC7 valid-mask miscompare on device: "
            f"{np.sum(ours_valid != want_valid)} blocks differ")
    # Invalid blocks are zero-filled by the oracle (texture.c:90-93);
    # compare pixels only where the block decoded.
    bad = np.nonzero(np.any(ours[want_valid] != want[want_valid], axis=1))[0]
    if bad.size:
        raise AssertionError(
            f"BC7 pixel miscompare on device: {bad.size} of "
            f"{int(want_valid.sum())} valid blocks differ "
            f"(first block index {bad[0]})")
    return "ok"


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
    # warmup decode, then one timed pass: a single 64k-block decode
    # runs ~30 s single-threaded, plenty for a stable rate.
    ref.decompress_texture_linear(F.BPTC, data, w, h, F.RGBA8)
    t0 = time.perf_counter()
    ref.decompress_texture_linear(F.BPTC, data, w, h, F.RGBA8)
    dt = time.perf_counter() - t0
    return n / dt


# ---------------------------------------------------------------------------
# All-family sweep (VERDICT r4 next-round #5): one driver-visible
# artifact per round with EVERY family's rate, so a regression in any
# kernel is visible without archaeology.  Reference surface analogue:
# the whole validate.c:31-57 corpus, not one format.
# ---------------------------------------------------------------------------

def _family_table():
    from detex_tpu.ops.pallas import (bc_pallas, bptc_float_pallas,
                                      bptc_pallas, etc_eac_pallas)
    import functools as ft
    bf = bptc_float_pallas.decode_bptc_float_planar
    # name -> (planar fn, block bytes, best v5e tile, block fixup)
    return {
        "BC1": (bc_pallas.decode_bc1_planar, 8, 1024, None),
        "BC1A": (bc_pallas.decode_bc1a_planar, 8, 512, None),
        "BC2": (bc_pallas.decode_bc2_planar, 16, 512, None),
        "BC3": (bc_pallas.decode_bc3_planar, 16, 256, None),
        "RGTC1": (bc_pallas.decode_rgtc1_planar, 8, 1024, None),
        "SIGNED_RGTC1": (bc_pallas.decode_signed_rgtc1_planar, 8, 512,
                         None),
        "RGTC2": (bc_pallas.decode_rgtc2_planar, 16, 256, None),
        "SIGNED_RGTC2": (bc_pallas.decode_signed_rgtc2_planar, 16, 1024,
                         None),
        "BPTC": (bptc_pallas.decode_bptc_planar, 16, 256, "bc7_mode"),
        # 256, not 512: the honest tile sweep moved BC6H's optimum
        # (2.46e9 @ 256 vs 2.33e9 @ 512; the 512 choice was
        # short-method noise) — matches the engine's auto tile.
        "BPTC_FLOAT": (bf, 16, 256, "bc6h_mode"),
        "BPTC_SIGNED_FLOAT": (ft.partial(bf, signed=True), 16, 256,
                              "bc6h_mode"),
        "ETC1": (etc_eac_pallas.decode_etc1_planar, 8, 1024, None),
        "ETC2": (etc_eac_pallas.decode_etc2_planar, 8, 256, None),
        "ETC2_PUNCHTHROUGH": (
            etc_eac_pallas.decode_etc2_punchthrough_planar, 8, 256, None),
        "ETC2_EAC": (etc_eac_pallas.decode_etc2_eac_planar, 16, 256,
                     None),
        "EAC_R11": (etc_eac_pallas.decode_eac_r11_planar, 8, 1024, None),
        "EAC_SIGNED_R11": (etc_eac_pallas.decode_eac_signed_r11_planar,
                           8, 512, None),
        "EAC_RG11": (etc_eac_pallas.decode_eac_rg11_planar, 16, 512,
                     None),
        "EAC_SIGNED_RG11": (
            etc_eac_pallas.decode_eac_signed_rg11_planar, 16, 256, None),
    }


def _family_blocks(rng, bb, fixup):
    blocks = rng.integers(0, 256, (N_BLOCKS, bb), np.uint8)
    if fixup == "bc7_mode":
        modes = rng.integers(0, 8, N_BLOCKS)
        blocks[:, 0] = ((1 << modes)
                        | (blocks[:, 0] & (0xFF << (modes + 1)))
                        ).astype(np.uint8)
    elif fixup == "bc6h_mode":
        # reserved 5-bit codes fail the block; force 2-bit modes 0/1
        blocks[:, 0] = ((blocks[:, 0] & 0xFC)
                        | rng.integers(0, 2, N_BLOCKS)).astype(np.uint8)
    return blocks


def bench_families(canary_gops: float):
    """Per-family marginal rates with the long-interval method; the
    iteration counts adapt per family so the timed interval stays
    ~300 ms whether the kernel runs at 2e9 or 1.4e10 blocks/s."""
    import functools

    import jax.numpy as jnp
    from jax import lax

    out = {"n_blocks": N_BLOCKS, "unit": "blocks/s",
           "method": ("marginal rate over a ~300 ms in-dispatch "
                      "interval, median of 3; tools/method_probe.py"),
           "canary_gops_ambient": round(canary_gops, 1),
           "platform": jax.devices()[0].platform, "families": {}}
    rng = np.random.default_rng(7)
    for name, (fn, bb, tile, fixup) in _family_table().items():
        blocks = _family_blocks(rng, bb, fixup)
        words = jax.device_put(np.ascontiguousarray(
            np.ascontiguousarray(blocks).view(np.uint32)
            .astype(np.int64).astype(np.int32).T))

        @functools.partial(jax.jit, static_argnames=())
        def run(wp, iters, fn=fn, tile=tile):
            def body(i, acc):
                pix, valid = fn(wp ^ i, tile=tile, interpret=False)
                return acc ^ pix.reshape(-1)[0].astype(jnp.int32) \
                    ^ valid[0].astype(jnp.int32)
            return lax.fori_loop(0, iters, body, jnp.int32(0))

        def call(it):
            return int(run(words, jnp.int32(it)))

        # rough MARGINAL rate estimate (RPC overhead cancels) ->
        # iters for a ~300 ms interval, clamped to keep any one
        # family's sweep under ~1 s of device time
        def best(it):
            call(it)
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                call(it)
                b = min(b, time.perf_counter() - t0)
            return b
        est = N_BLOCKS * 128 / max(best(144) - best(16), 1e-9)
        hi_iters = min(max(int(0.3 * est / N_BLOCKS), 200), 150_000)
        lo_iters = max(hi_iters // 10, 20)
        med, rates = _median_rate(call, N_BLOCKS, lo_iters, hi_iters)
        out["families"][name] = {
            "blocks_per_s": round(med, -6), "tile": tile,
            "spread_pct": round(100 * (rates[-1] - rates[0])
                                / rates[-1], 2)}
        print(f"  {name}: {med:.3e} blocks/s", file=sys.stderr,
              flush=True)
    return out


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

    canary = clock_canary()
    ours, detail = bench_ours(blocks)
    # Witness the WINNING tile: same tile -> same compiled binary as
    # the one the timing ran (the compilation cache serves it back).
    correctness = witness_correctness(blocks, tile=detail["tile"])
    baseline = bench_reference(blocks)

    # Print the headline line BEFORE the (long) family sweep so a
    # driver-side timeout during the sweep cannot lose the metric; the
    # sweep itself writes only to BENCH_FAMILIES.json + stderr.
    vs = ours / baseline if baseline > 0 else 0.0
    print(json.dumps({
        "metric": "bc7_decode_blocks_per_s",
        "value": round(ours, 1),
        "unit": "blocks/s",
        "vs_baseline": round(vs, 3),
        "tile": detail["tile"],
        "spread_pct": detail["spread_pct"],
        "correctness": correctness,
        "canary_gops": round(canary, 1),
    }), flush=True)

    if os.environ.get("DETEX_BENCH_FAMILIES", "1") != "0":
        try:
            fam = bench_families(canary)
            (REPO / "BENCH_FAMILIES.json").write_text(
                json.dumps(fam, indent=1) + "\n")
        except Exception as e:
            print(f"family sweep failed: {e}", file=sys.stderr,
                  flush=True)


if __name__ == "__main__":
    main()

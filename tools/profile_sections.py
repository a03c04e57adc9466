"""Per-family VPU op census + achieved-ALU-roofline accounting
(VERDICT r2 item 4: give ETC2 / ETC2_EAC / BC6H / EAC_RG11 the BC7
treatment).

For every fused Pallas decode kernel this tool:

  1. traces the kernel body to its jaxpr and counts the elementwise
     VPU ops it executes per block, split by issue class
     (mul / add-sub / shift / logical / compare-select), weighting
     each primitive by the element count of its output tile;
  2. measures the sustained decode rate on the current device
     (two-point marginal method, same as bench.py);
  3. reports achieved elementwise ops/s against the MEASURED per-class
     VPU roofline (tools/probe: dependent int32 chains sustain
     ~1.7 Tops/s mul-heavy, ~2.6 Tops/s logical-heavy on v5e), i.e.
     the class-weighted peak for that kernel's own op mix.

A kernel at >=70% of its mix-weighted ALU peak is compute-saturated:
the remaining HBM headroom cannot be bought without removing
arithmetic.  Output feeds the PROFILE.md table.

Usage: python tools/profile_sections.py [FAMILY ...] [--no-measure]
"""

import argparse
import functools
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402
from jax import lax             # noqa: E402

from detex_tpu.ops.pallas import (bptc_float_pallas,  # noqa: E402
                                  bptc_pallas, etc_eac_pallas)

N = 1 << 16
# Long-interval median method (tools/method_probe.py, round 5)
LO, HI = 500, 5500

# Issue classes and their measured sustained element rates on v5e
# (dependent-chain Pallas probes, ops/s; see PROFILE.md preamble).
CLASS_PEAK = {
    "mul": 1.7e12,
    "addsub": 2.6e12,
    "shift": 2.1e12,
    "logical": 2.6e12,
    "cmpsel": 2.6e12,
}

_CLASS_OF = {
    "mul": "mul",
    "add": "addsub", "sub": "addsub", "neg": "addsub",
    "shift_left": "shift", "shift_right_logical": "shift",
    "shift_right_arithmetic": "shift",
    "and": "logical", "or": "logical", "xor": "logical", "not": "logical",
    "eq": "cmpsel", "ne": "cmpsel", "lt": "cmpsel", "le": "cmpsel",
    "gt": "cmpsel", "ge": "cmpsel", "select_n": "cmpsel",
    "min": "cmpsel", "max": "cmpsel",
}

# family -> (planar fn maker, block bytes, out bytes/block, tile)
FAMILIES = {
    "BC7": (lambda t: functools.partial(bptc_pallas.decode_bptc_planar,
                                        tile=t), 16, 64, 256),
    "BC6H": (lambda t: functools.partial(
        bptc_float_pallas.decode_bptc_float_planar, tile=t), 16, 128, 256),
    "ETC1": (lambda t: functools.partial(
        etc_eac_pallas.decode_etc1_planar, tile=t), 8, 64, 512),
    "ETC2": (lambda t: functools.partial(
        etc_eac_pallas.decode_etc2_planar, tile=t), 8, 64, 256),
    "ETC2_EAC": (lambda t: functools.partial(
        etc_eac_pallas.decode_etc2_eac_planar, tile=t), 16, 64, 256),
    "EAC_R11": (lambda t: functools.partial(
        etc_eac_pallas.decode_eac_r11_planar, tile=t), 8, 32, 1024),
    "EAC_RG11": (lambda t: functools.partial(
        etc_eac_pallas.decode_eac_rg11_planar, tile=t), 16, 64, 512),
}


def _find_pallas_eqns(jaxpr, out=None):
    out = [] if out is None else out
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(eqn)
        for v in eqn.params.values():
            if hasattr(v, "eqns"):
                _find_pallas_eqns(v, out)
            elif hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                _find_pallas_eqns(v.jaxpr, out)
    return out


def _census(jaxpr, counts, mul=1):
    """Accumulate per-class element-op counts over a kernel jaxpr.
    Loops (scan/fori encoded as scan) multiply by their trip count."""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("scan", "while"):
            trips = eqn.params.get("length", 1) if name == "scan" else 1
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                _census(inner.jaxpr if hasattr(inner, "jaxpr") else inner,
                        counts, mul * trips)
            continue
        if name in ("cond",):
            for br in eqn.params.get("branches", ()):
                _census(br.jaxpr if hasattr(br, "jaxpr") else br,
                        counts, mul)
            continue
        for v in eqn.params.values():
            if hasattr(v, "eqns"):
                _census(v, counts, mul)
            elif hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                _census(v.jaxpr, counts, mul)
        cls = _CLASS_OF.get(name)
        if cls is None:
            continue
        n_elem = 1
        for d in eqn.outvars[0].aval.shape:
            n_elem *= d
        counts[cls] += n_elem * mul
    return counts


def op_census(family: str):
    """Per-block element-op counts by class for one kernel family."""
    make, bb, ob, tile = FAMILIES[family]
    fn = make(tile)
    words = jnp.zeros((bb // 4, tile * 8), jnp.int32)
    closed = jax.make_jaxpr(lambda x: fn(x, interpret=True))(words)
    eqns = _find_pallas_eqns(closed.jaxpr)
    assert eqns, f"no pallas_call found for {family}"
    counts = defaultdict(int)
    for eqn in eqns:
        inner = eqn.params["jaxpr"]
        _census(inner, counts)
    # Every kernel's program block covers (8 sublanes x tile lanes) =
    # 8*tile texture blocks (the planar _call reshapes N -> (8, N/8)
    # and tiles the lane axis); with the trace at N = 8*tile the grid
    # is exactly ONE program.
    per_block = {k: v / (8 * tile) for k, v in counts.items()}
    return per_block


def sustained(family: str) -> float:
    make, bb, ob, tile = FAMILIES[family]
    fn = make(tile)
    rng = np.random.default_rng(42)
    blocks = rng.integers(0, 256, (N, bb), np.uint8)
    words = jax.device_put(jnp.asarray(
        np.ascontiguousarray(blocks).view(np.uint32).astype(np.int64)
        .astype(np.int32)).T.copy())

    # iters stays TRACED (single compile serves both points; static
    # trip counts compile slowly through the axon toolchain).
    @jax.jit
    def run(x, iters):
        def body(i, acc):
            out, valid = fn(x ^ i, interpret=False)
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


def _mix_probe_kernel(census, tile):
    """Synthetic Pallas kernel executing `census` (per-block per-class
    op counts) on the same (8, tile) int32 tiles as the decoders, with
    4-way ILP and per-issue-varying constants (nothing foldable).  Its
    sustained rate IS the demonstrated ALU roofline for this op mix."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sched = []
    for cls, n in census.items():
        sched += [cls] * int(round(n))
    # Interleave classes so no single port is hammered in a burst.
    rng = np.random.default_rng(0)
    rng.shuffle(sched)

    def kernel(x_ref, out_ref):
        acc = [x_ref[i] for i in range(4)]
        k = 0
        for cls in sched:
            i = k & 3
            j = (k + 1) & 3
            c = np.int32((0x9E3779B1 * (k + 1)) & 0x7FFFFFFF)
            if cls == "mul":
                acc[i] = acc[i] * np.int32(c | 1)
            elif cls == "addsub":
                acc[i] = acc[i] + (acc[j] if k & 4 else c)
            elif cls == "shift":
                acc[i] = _ilshift(acc[i], (k % 31) + 1) if k & 4 \
                    else _irshift(acc[i], (k % 31) + 1)
            elif cls == "logical":
                acc[i] = acc[i] ^ (acc[j] if k & 4 else c)
            else:                                   # cmpsel
                if k & 4:
                    acc[i] = jnp.where(acc[i] > acc[j], acc[i], acc[j])
                else:
                    acc[i] = jnp.maximum(acc[i], c)
            k += 1
        out_ref[...] = acc[0] ^ acc[1] ^ acc[2] ^ acc[3]

    def call(x):
        n = x.shape[1]
        ell = n // 8
        xr = x.reshape(4, 8, ell)
        return pl.pallas_call(
            kernel,
            grid=(ell // tile,),
            in_specs=[pl.BlockSpec((4, 8, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, ell), jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(xr)

    return call


def _ilshift(x, n):
    return lax.shift_left(x, jnp.int32(n))


def _irshift(x, n):
    return lax.shift_right_logical(x, jnp.int32(n))


def probe_rate(census, tile) -> float:
    """Blocks/s of the mix-probe kernel (the demonstrated roofline)."""
    call = _mix_probe_kernel(census, tile)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(-2**31, 2**31, (4, N), np.int64)
                    .astype(np.int32))

    @jax.jit
    def run(x, iters):
        def body(i, acc):
            out = call(x ^ i)
            return acc ^ out.reshape(-1)[0]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*",
                    default=["ETC2", "ETC2_EAC", "BC6H", "EAC_RG11"])
    ap.add_argument("--no-measure", action="store_true",
                    help="op census only (no TPU timing)")
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the mix-probe roofline measurement")
    args = ap.parse_args()
    for family in args.families:
        census = op_census(family)
        total = sum(census.values())
        tile = FAMILIES[family][3]
        row = {
            "family": family,
            "ops_per_block": {k: round(v, 1) for k, v in census.items()},
            "total_ops_per_block": round(total, 1),
        }
        if not args.no_measure:
            rate = sustained(family)
            row["measured_blocks_per_s"] = f"{rate:.3g}"
            row["achieved_ops_per_s"] = f"{rate * total:.3g}"
            print(json.dumps(row), flush=True)
            if not args.no_probe:
                peak = probe_rate(census, tile)
                print(json.dumps({
                    "family": family,
                    "mix_probe_blocks_per_s": f"{peak:.3g}",
                    "pct_of_demonstrated_roofline": round(
                        100 * rate / peak, 1),
                }), flush=True)
        else:
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

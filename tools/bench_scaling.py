"""MPPI solves/s vs device count (north-star scaling measurement).

Runs the sharded MPPI step (shard_map over 'dp', psum weight reduction
— detex_tpu/mpc/mppi.py) at the north-star problem size (8192 rollouts,
H=32, latent-128 MLP dynamics) over 1/2/4/8 devices with the SAME
global batch (strong scaling) and reports solves/s + parallel
efficiency.

On real multi-chip TPU hardware this is the BASELINE.md >=90%-scaling
number.  On a single host it runs on the virtual CPU mesh
(--xla_force_host_platform_device_count): the devices then share one
socket's cores, so solves/s cannot improve with n — what the virtual
run measures is the *partitioning overhead* of the collectives
(efficiency ~1.0 means the sharded program wastes nothing vs the
unsharded one on equal silicon).

Usage: python tools/bench_scaling.py [--devices 1,2,4,8] [--iters 8]
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

# Default to the virtual CPU mesh (a lone TPU chip cannot scale); set
# DETEX_BENCH_TPU=1 to measure on real multi-chip hardware.
_ON_TPU = bool(os.environ.get("DETEX_BENCH_TPU"))
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import jax  # noqa: E402

if not _ON_TPU:
    # The environment's sitecustomize force-registers the TPU platform
    # via jax.config; pin back to CPU (same dance as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from detex_tpu.mpc import dynamics as D  # noqa: E402
from detex_tpu.mpc import mppi  # noqa: E402


def bench_one(n_dev: int, cfg: mppi.MPPIConfig, dcfg: D.DynamicsConfig,
              iters: int) -> float:
    """Seconds per sharded MPPI solve on an n_dev-device dp mesh."""
    mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev, 1),
                ("dp", "tp"))
    key = jax.random.PRNGKey(0)
    params = D.init_params(key, dcfg)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    z0 = jnp.zeros((dcfg.latent_dim,), jnp.float32)
    goal = jnp.ones((dcfg.latent_dim,), jnp.float32)
    nominal = jnp.zeros((cfg.horizon, cfg.action_dim), jnp.float32)

    def dyn(z, u):
        return D.dynamics_apply(params, z, u, dcfg)

    def cost(z, u, t):
        return jnp.sum((z - goal[None]) ** 2, axis=-1) \
            + 0.1 * jnp.sum(u ** 2, axis=-1)

    step = functools.partial(mppi.mppi_step, dynamics=dyn, cost=cost,
                             cfg=cfg, rollout_axis="dp", mesh=mesh)

    # `n` stays a TRACED scalar: the fori_loop lowers to one while
    # loop and a single compile serves every iteration count (the
    # axon toolchain's compile time grows with static trip counts —
    # iters=55 took ~390s to compile vs ~10s for iters=5).
    @jax.jit
    def run(key, nominal, n):
        def body(i, carry):
            key, nom = carry
            key, sub = jax.random.split(key)
            nom, _ = step(sub, nominal=nom, z0=z0)
            return (key, nom)
        key, nom = jax.lax.fori_loop(0, n, body, (key, nominal))
        return nom[0, 0]

    # Marginal rate between two iteration counts (same methodology as
    # bench.py / bench_control_step.py): fixed dispatch/RPC overhead
    # cancels.  Through the axon tunnel a single run() call carries
    # ~60-90 ms of RPC, which at iters=8 used to misreport the 1.5 ms
    # solve as ~13 ms (VERDICT r2 weak #2/#7).
    def timed(n):
        float(run(key, nominal, n))            # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(key, nominal, n))        # scalar fetch = true sync
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = iters, 5 * iters
    return (timed(hi) - timed(lo)) / (hi - lo)


def bench_lqt(n_dev: int, h: int, n: int, m: int, iters: int) -> float:
    """Seconds per horizon-sharded parallel-LQT backward (the
    long-context analogue, SURVEY §7 hard part 4): the H+1 value
    elements shard over the 'sp' mesh axis; communication is one
    all_gather of n_dev chunk totals regardless of H."""
    from jax.sharding import Mesh as _Mesh

    from detex_tpu.mpc import parallel_lqr as plqr

    rng = np.random.default_rng(0)
    f = jnp.asarray(np.eye(n) + 0.02 * rng.standard_normal((h, n, n)),
                    jnp.float32)
    l = jnp.asarray(0.2 * rng.standard_normal((h, n, m)), jnp.float32)
    c = jnp.asarray(0.1 * rng.standard_normal((h, n)), jnp.float32)
    q = jnp.asarray(np.broadcast_to(np.eye(n), (h, n, n)), jnp.float32)
    qv = jnp.asarray(rng.standard_normal((h, n)), jnp.float32)
    r = jnp.asarray(np.broadcast_to(np.eye(m), (h, m, m)), jnp.float32)
    rv = jnp.asarray(rng.standard_normal((h, m)), jnp.float32)
    mm = jnp.zeros((h, m, n), jnp.float32)
    pt = jnp.asarray(2.0 * np.eye(n), jnp.float32)
    pv = jnp.asarray(rng.standard_normal(n), jnp.float32)
    prob = (f, l, c, q, qv, r, rv, mm, pt, pv)

    if n_dev == 1:
        fn = jax.jit(lambda *a: plqr.lqt_backward_parallel(*a))
    else:
        mesh = _Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev),
                     ("sp",))
        fn = jax.jit(lambda *a, _m=mesh:
                     plqr.lqt_backward_parallel_sharded(*a, mesh=_m,
                                                        axis="sp"))

    @jax.jit
    def run(cv, k):
        def body(i, acc):
            p, eta = fn(f, l, cv + acc * 0, q, qv, r, rv, mm, pt, pv)
            return acc + eta[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(n):
        float(run(c, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(c, n))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = iters, 5 * iters
    return (timed(hi) - timed(lo)) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rollouts", type=int, default=8192)
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument("--lqt", action="store_true",
                    help="bench the horizon-sharded parallel-LQT "
                         "backward instead of MPPI")
    ap.add_argument("--lqt-horizon", type=int, default=4096)
    ap.add_argument("--state-dim", type=int, default=16)
    ap.add_argument("--action-dim", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=0,
                    help="dynamics hidden dim (0 = 512 on TPU, 256 on "
                         "the virtual CPU mesh)")
    args = ap.parse_args()

    on_cpu = jax.devices()[0].platform == "cpu"
    counts = [int(c) for c in args.devices.split(",")
              if int(c) <= len(jax.devices())]

    if args.lqt:
        rows = []
        t1 = None
        for n in counts:
            dt = bench_lqt(n, args.lqt_horizon, args.state_dim,
                           args.action_dim, args.iters)
            if t1 is None:
                t1 = dt
            eff = t1 / dt / (n / counts[0])
            rows.append({"devices": n,
                         "ms_per_backward": round(dt * 1e3, 3),
                         "efficiency_vs_linear": round(eff, 3)})
            print(json.dumps(rows[-1]), flush=True)
        print(json.dumps({"platform": jax.devices()[0].platform,
                          "metric": "lqt_backward_horizon_sharded",
                          "horizon": args.lqt_horizon,
                          "state_dim": args.state_dim, "rows": rows}))
        return
    cfg = mppi.MPPIConfig(n_rollouts=args.rollouts, horizon=args.horizon,
                          action_dim=8)
    # North-star rollout shapes always; on the virtual CPU mesh shrink
    # the MLP + use f32 (bf16 matmuls are emulated and ~20x slower on
    # this host CPU, which would swamp the collective overhead signal).
    hidden = args.hidden or (256 if on_cpu else 512)
    dcfg = D.DynamicsConfig(
        latent_dim=128, action_dim=8, hidden_dim=hidden,
        compute_dtype=jnp.float32 if on_cpu else jnp.bfloat16)

    rows = []
    t1 = None
    for n in counts:
        dt = bench_one(n, cfg, dcfg, args.iters)
        if t1 is None:
            t1 = dt
        eff = t1 / dt / (n / counts[0])
        rows.append({"devices": n, "ms_per_solve": round(dt * 1e3, 3),
                     "solves_per_s": round(1.0 / dt, 2),
                     "efficiency_vs_linear": round(eff, 3)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "n_rollouts": cfg.n_rollouts,
                      "horizon": cfg.horizon, "rows": rows}))


if __name__ == "__main__":
    main()

"""Full north-star control step benchmark (BASELINE.md config 5).

Times the fused control step — BC7 obs decode (Pallas) -> conv latent
encode -> MPPI (8192 rollouts x H=32) -> optional iLQR refinement —
against the 10 ms real-time budget, on the default device (the real
TPU chip under axon).

Methodology matches bench.py: the whole iteration loop runs inside one
jitted fori_loop whose scalar result is fetched (true sync through the
remote tunnel), reported as the marginal rate between two iteration
counts so fixed dispatch overhead cancels.

Usage: python tools/bench_control_step.py [--ilqr 0 2] [--parallel-lqr]
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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from detex_tpu.mpc import dynamics as D  # noqa: E402
from detex_tpu.mpc import mppi as M  # noqa: E402
from detex_tpu.mpc.runtime import ControllerConfig, control_step  # noqa: E402

ITERS_LO = 5
ITERS_HI = 55


def bench(cfg: ControllerConfig) -> float:
    """Seconds per control step."""
    dcfg = cfg.dynamics
    key = jax.random.PRNGKey(0)
    params = D.init_params(key, dcfg)
    rng = np.random.default_rng(0)
    n_blocks = (dcfg.image_size // 4) ** 2
    obs_words = jnp.asarray(
        rng.integers(-2**31, 2**31, (n_blocks, 4), np.int64)
        .astype(np.int32))
    nominal = jnp.zeros((cfg.mppi.horizon, cfg.mppi.action_dim),
                        jnp.float32)
    goal_z = jnp.zeros((dcfg.latent_dim,), jnp.float32)
    step = functools.partial(control_step, cfg=cfg)

    # iters stays TRACED: one while-loop compile serves both counts
    # (static trip counts compile minutes-slow through this toolchain).
    @jax.jit
    def run(params, nominal, key, obs_words, goal_z, iters):
        def body(i, carry):
            key, nom = carry
            key, sub = jax.random.split(key)
            action, nom, diag = step(params, nom, sub,
                                     obs_words ^ i, goal_z)
            return (key, nom)
        key, nom = jax.lax.fori_loop(0, iters, body, (key, nominal))
        return nom[0, 0]

    def timed(iters):
        float(run(params, nominal, key, obs_words, goal_z, iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, nominal, key, obs_words, goal_z, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = timed(ITERS_HI) - timed(ITERS_LO)
    return dt / (ITERS_HI - ITERS_LO)


def bench_wallclock(cfg: ControllerConfig, pipelined: bool,
                    n_steps: int = 100) -> float:
    """Host-in-the-loop seconds per control step: each step() call
    uploads a fresh observation and (sync) blocks for the action or
    (pipelined) blocks only for the previous step's action — measuring
    how much of the device time the one-step pipeline hides
    (SURVEY §2.2 PP row).  Includes per-dispatch transport overhead,
    so absolute numbers depend on how the chip is attached."""
    from detex_tpu.mpc.runtime import Controller, PipelinedController
    dcfg = cfg.dynamics
    params = D.init_params(jax.random.PRNGKey(0), dcfg)
    goal = jnp.zeros((dcfg.latent_dim,), jnp.float32)
    rng = np.random.default_rng(0)
    n_blocks = (dcfg.image_size // 4) ** 2
    obs = [rng.integers(-2**31, 2**31, (n_blocks, 4), np.int64)
           .astype(np.int32) for _ in range(8)]
    ctl_cls = PipelinedController if pipelined else Controller
    ctl = ctl_cls(params, goal, cfg, seed=0)
    for i in range(4):                      # warm (compile)
        ctl.step(obs[i % 8])
    t0 = time.perf_counter()
    for i in range(n_steps):
        ctl.step(obs[i % 8])
    if pipelined:
        ctl.flush()
    return (time.perf_counter() - t0) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ilqr", type=int, nargs="*", default=[0, 2])
    ap.add_argument("--rollouts", type=int, default=8192)
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument("--wallclock", action="store_true",
                    help="host-in-the-loop sync vs pipelined steps/s")
    args = ap.parse_args()

    if args.wallclock:
        cfg = ControllerConfig(
            mppi=M.MPPIConfig(n_rollouts=args.rollouts,
                              horizon=args.horizon, action_dim=8))
        for pipelined in (False, True):
            dt = bench_wallclock(cfg, pipelined)
            print(json.dumps({
                "metric": "control_step_wallclock_ms",
                "pipelined": pipelined,
                "ms_per_step": round(dt * 1e3, 3),
                "steps_per_s": round(1.0 / dt, 1),
                "platform": jax.devices()[0].platform,
            }), flush=True)
        return

    for n_ilqr in args.ilqr:
        variants = [(False, "seq")] if n_ilqr == 0 else \
            [(False, "seq"), (True, "parallel-lqt")]
        for par, name in variants:
            cfg = ControllerConfig(
                mppi=M.MPPIConfig(n_rollouts=args.rollouts,
                                  horizon=args.horizon, action_dim=8),
                n_ilqr_iterations=n_ilqr, ilqr_parallel=par)
            dt = bench(cfg)
            print(json.dumps({
                "metric": "control_step_ms",
                "ilqr_iterations": n_ilqr,
                "backward": name if n_ilqr else "n/a",
                "ms_per_step": round(dt * 1e3, 3),
                "solves_per_s": round(1.0 / dt, 1),
                "within_10ms_budget": dt <= 0.010,
                "platform": jax.devices()[0].platform,
            }), flush=True)


if __name__ == "__main__":
    main()

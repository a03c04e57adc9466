"""Diagnose the sharded-vs-unsharded MPPI step gap (VERDICT r2 item 1).

Times the SAME MPPI solve (8192 rollouts x H=32, latent-128/hidden-512
bf16 dynamics) under identical marginal-rate methodology in three
programs:

  unsharded  : mppi_step(rollout_axis=None)
  shard_map  : mppi_step(rollout_axis='dp', mesh=1-device mesh)
  gspmd      : mppi_step(rollout_axis='dp') under an ambient mesh

Any difference between rows is pure program overhead (shard_map
lowering, pcast, collectives), not methodology.
"""

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from detex_tpu.mpc import dynamics as D  # noqa: E402
from detex_tpu.mpc import mppi  # noqa: E402

ITERS_LO = 5
ITERS_HI = 55


def bench_variant(variant: str) -> float:
    cfg = mppi.MPPIConfig(n_rollouts=8192, horizon=32, action_dim=8)
    dcfg = D.DynamicsConfig(latent_dim=128, action_dim=8, hidden_dim=512,
                            compute_dtype=jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    key = jax.random.PRNGKey(0)
    params = D.init_params(key, dcfg)
    z0 = jnp.zeros((dcfg.latent_dim,), jnp.float32)
    goal = jnp.ones((dcfg.latent_dim,), jnp.float32)
    nominal = jnp.zeros((cfg.horizon, cfg.action_dim), jnp.float32)

    def dyn(z, u):
        return D.dynamics_apply(params, z, u, dcfg)

    def cost(z, u, t):
        return jnp.sum((z - goal[None]) ** 2, axis=-1) \
            + 0.1 * jnp.sum(u ** 2, axis=-1)

    if variant == "unsharded":
        step = functools.partial(mppi.mppi_step, dynamics=dyn, cost=cost,
                                 cfg=cfg)
    elif variant == "shard_map":
        step = functools.partial(mppi.mppi_step, dynamics=dyn, cost=cost,
                                 cfg=cfg, rollout_axis="dp", mesh=mesh)
    elif variant == "gspmd":
        step = functools.partial(mppi.mppi_step, dynamics=dyn, cost=cost,
                                 cfg=cfg, rollout_axis="dp")
    else:
        raise ValueError(variant)

    @functools.partial(jax.jit, static_argnames="n")
    def run(key, nominal, n):
        def body(i, carry):
            key, nom = carry
            key, sub = jax.random.split(key)
            nom, _ = step(sub, nominal=nom, z0=z0)
            return (key, nom)
        key, nom = jax.lax.fori_loop(0, n, body, (key, nominal))
        return nom[0, 0]

    if variant == "gspmd":
        jax.sharding.set_mesh(mesh)

    def timed(iters):
        t0 = time.perf_counter()
        float(run(key, nominal, iters))
        print(f"  [{variant}] iters={iters} compile+warm "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(key, nominal, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = timed(ITERS_HI) - timed(ITERS_LO)
    return dt / (ITERS_HI - ITERS_LO)


def main():
    for variant in sys.argv[1:] or ["unsharded", "shard_map", "gspmd"]:
        dt = bench_variant(variant)
        print(json.dumps({"variant": variant,
                          "ms_per_solve": round(dt * 1e3, 3),
                          "solves_per_s": round(1.0 / dt, 1),
                          "platform": jax.devices()[0].platform}),
              flush=True)


if __name__ == "__main__":
    main()

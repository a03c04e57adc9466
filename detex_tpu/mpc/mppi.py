"""MPPI (Model Predictive Path Integral) sampling MPC — batched, sharded.

New TPU-native component (no reference counterpart).  K rollouts of
horizon H are evaluated in parallel: the rollout batch shards over the
mesh "dp" axis; the importance-weight normalization is a psum over that
axis, so multi-chip MPPI is the single-chip program + two collectives.

    u*_t = sum_k w_k eps_k,t / sum_k w_k,   w_k = exp(-(S_k - min S)/T)
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    n_rollouts: int = 8192
    horizon: int = 32
    action_dim: int = 8
    temperature: float = 1.0
    noise_sigma: float = 0.3
    action_low: float = -1.0
    action_high: float = 1.0


def rollout_costs(dynamics: Callable, cost: Callable, z0: jnp.ndarray,
                  controls: jnp.ndarray, terminal_cost: Callable = None):
    """Evaluate per-rollout trajectory costs.

    dynamics: (z, u) -> z'     batched over leading axis
    cost:     (z, u, t) -> (K,) stage costs
    z0: (latent,) or (K, latent); controls: (K, H, action_dim)
    Returns (K,) total costs."""
    k = controls.shape[0]
    if z0.ndim == 1:
        z0 = jnp.broadcast_to(z0[None, :], (k, z0.shape[0]))

    def step(carry, inp):
        z, acc = carry
        u, t = inp
        c = cost(z, u, t)
        z_next = dynamics(z, u)
        return (z_next, acc + c), None

    ts = jnp.arange(controls.shape[1])
    (z_final, total), _ = jax.lax.scan(
        step, (z0, jnp.zeros((k,), jnp.float32)),
        (jnp.swapaxes(controls, 0, 1), ts))
    if terminal_cost is not None:
        total = total + terminal_cost(z_final)
    return total


def mppi_step(key, nominal: jnp.ndarray, z0: jnp.ndarray,
              dynamics: Callable, cost: Callable, cfg: MPPIConfig,
              terminal_cost: Callable = None):
    """One MPPI update of the nominal control sequence.

    nominal: (H, A); returns (new_nominal (H, A), diagnostics dict).
    All reductions are jnp.sum/min over the rollout axis — under pjit
    with the rollout batch sharded on "dp", XLA lowers them to psums
    over ICI automatically.
    """
    h, a = nominal.shape
    eps = jax.random.normal(key, (cfg.n_rollouts, h, a), jnp.float32) \
        * cfg.noise_sigma
    controls = jnp.clip(nominal[None] + eps, cfg.action_low,
                        cfg.action_high)
    costs = rollout_costs(dynamics, cost, z0, controls, terminal_cost)
    beta = jnp.min(costs)
    w = jnp.exp(-(costs - beta) / cfg.temperature)
    w_sum = jnp.sum(w)
    # Weighted average of the *clipped* perturbed controls.
    new_nominal = jnp.einsum("k,kha->ha", w, controls) / w_sum
    diagnostics = {
        "min_cost": beta,
        "mean_cost": jnp.mean(costs),
        "ess": (w_sum * w_sum) / jnp.sum(w * w),
    }
    return new_nominal, diagnostics


def receding_horizon_shift(nominal: jnp.ndarray) -> jnp.ndarray:
    """Shift the plan one step: drop u_0, repeat the last action."""
    return jnp.concatenate([nominal[1:], nominal[-1:]], axis=0)

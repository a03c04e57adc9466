"""MPC engine tests: iLQR matches the analytic LQR solution, MPPI
improves cost on a toy problem, the dynamics train step learns, and the
whole thing shards over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detex_tpu.mpc import dynamics as D
from detex_tpu.mpc import ilqr, mppi
from detex_tpu.parallel import make_mesh


def _lin_dynamics(a, b):
    return lambda x, u: a @ x + b @ u


def test_ilqr_matches_lqr():
    # LQR problem: iLQR must converge to the Riccati solution in one
    # iteration (dynamics linear, costs quadratic).
    n, m, h = 4, 2, 20
    rng = np.random.default_rng(0)
    a = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)),
                    jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((n, m)), jnp.float32)
    q = jnp.eye(n, dtype=jnp.float32)
    r = 0.1 * jnp.eye(m, dtype=jnp.float32)

    def cost(x, u, t):
        return 0.5 * (x @ q @ x + u @ r @ u)

    def terminal(x):
        return 0.5 * x @ q @ x

    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    us0 = jnp.zeros((h, m), jnp.float32)
    xs, us, total = jax.jit(
        lambda x0, us0: ilqr.ilqr_solve(_lin_dynamics(a, b), cost,
                                        terminal, x0, us0,
                                        ilqr.ILQRConfig(n_iterations=3))
    )(x0, us0)

    # Reference: discrete-time Riccati recursion in numpy (float64).
    an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
    qn, rn = np.asarray(q, np.float64), np.asarray(r, np.float64)
    p = qn.copy()
    gains = []
    for _ in range(h):
        k = np.linalg.solve(rn + bn.T @ p @ bn, bn.T @ p @ an)
        p = qn + an.T @ p @ (an - bn @ k)
        gains.append(k)
    gains = gains[::-1]
    x = np.asarray(x0, np.float64)
    expected_cost = 0.0
    for t in range(h):
        u = -gains[t] @ x
        expected_cost += 0.5 * (x @ qn @ x + u @ rn @ u)
        x = an @ x + bn @ u
    expected_cost += 0.5 * x @ qn @ x
    assert float(total) == pytest.approx(expected_cost, rel=1e-3)


def test_mppi_improves_and_converges():
    # Toy latent: double integrator in 2D, target at origin.
    dt = 0.1

    def dyn(z, u):
        pos, vel = z[:, :2], z[:, 2:]
        vel2 = vel + dt * u
        return jnp.concatenate([pos + dt * vel2, vel2], axis=-1)

    def cost(z, u, t):
        return jnp.sum(z[:, :2] ** 2, axis=-1) \
            + 0.1 * jnp.sum(u ** 2, axis=-1)

    cfg = mppi.MPPIConfig(n_rollouts=1024, horizon=16, action_dim=2,
                          noise_sigma=1.0, temperature=0.1,
                          action_low=-10.0, action_high=10.0)
    z0 = jnp.asarray([2.0, -1.0, 0.0, 0.0], jnp.float32)
    nominal = jnp.zeros((cfg.horizon, cfg.action_dim), jnp.float32)
    key = jax.random.PRNGKey(0)

    def plan_cost(nom):
        return float(mppi.rollout_costs(dyn, cost, z0, nom[None])[0])

    c0 = plan_cost(nominal)
    step = jax.jit(lambda k, nom: mppi.mppi_step(k, nom, z0, dyn, cost,
                                                 cfg))
    for i in range(30):
        key, sub = jax.random.split(key)
        nominal, diag = step(sub, nominal)
    c1 = plan_cost(nominal)
    assert np.isfinite(float(diag["ess"]))

    # The optimum for this horizon (via iLQR on the unbatched problem).
    def dyn1(x, u):
        return dyn(x[None], u[None])[0]

    def cost1(x, u, t):
        return cost(x[None], u[None], t)[0]

    _, _, opt_cost = jax.jit(lambda: ilqr.ilqr_solve(
        dyn1, cost1, lambda x: jnp.float32(0.0), z0, nominal,
        ilqr.ILQRConfig(n_iterations=5)))()
    assert c1 < c0, (c0, c1)
    # MPPI should land within 15% of the iLQR optimum.
    assert c1 < 1.15 * float(opt_cost), (c1, float(opt_cost))


def test_dynamics_train_step_learns():
    cfg = D.DynamicsConfig(image_size=16, conv_features=(8, 16),
                           latent_dim=16, action_dim=4, hidden_dim=32)
    key = jax.random.PRNGKey(0)
    params = D.init_params(key, cfg)
    opt = D.make_optimizer(1e-3)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    batch = {
        "obs": jnp.asarray(rng.integers(0, 256, (8, 16, 16, 4)), jnp.uint8),
        "action": jnp.asarray(rng.standard_normal((8, 4)), jnp.float32),
        "next_obs": jnp.asarray(rng.integers(0, 256, (8, 16, 16, 4)),
                                jnp.uint8),
    }
    step = jax.jit(lambda p, s, b: D.train_step(p, s, b, cfg, opt))
    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


def test_mppi_sharded_over_mesh():
    # The MPPI rollout batch shards over the dp axis of an 8-device
    # CPU mesh and produces the same plan as single-device.
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh((8, 1))

    dt = 0.1

    def dyn(z, u):
        pos, vel = z[:, :2], z[:, 2:]
        vel2 = vel + dt * u
        return jnp.concatenate([pos + dt * vel2, vel2], axis=-1)

    def cost(z, u, t):
        return jnp.sum(z[:, :2] ** 2, axis=-1) \
            + 0.1 * jnp.sum(u ** 2, axis=-1)

    cfg = mppi.MPPIConfig(n_rollouts=1024, horizon=8, action_dim=2)
    z0 = jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)
    nominal = jnp.zeros((cfg.horizon, cfg.action_dim), jnp.float32)
    key = jax.random.PRNGKey(7)

    plain = jax.jit(lambda k, nom: mppi.mppi_step(k, nom, z0, dyn, cost,
                                                  cfg))
    with mesh:
        sharded_out, _ = plain(key, nominal)
    plain_out, _ = plain(key, nominal)
    np.testing.assert_allclose(np.asarray(sharded_out),
                               np.asarray(plain_out), rtol=2e-5,
                               atol=2e-6)


def test_pipelined_controller_matches_synchronous():
    """PipelinedController returns the synchronous controller's actions
    with exactly one step of lag (same keys, same plans) — the overlap
    changes latency, never the computation (SURVEY §2.2 PP row)."""
    import numpy as np

    from detex_tpu.mpc import dynamics as D
    from detex_tpu.mpc import mppi as M
    from detex_tpu.mpc.runtime import (Controller, ControllerConfig,
                                       PipelinedController)

    dcfg = D.DynamicsConfig(image_size=16, conv_features=(8, 16),
                            latent_dim=16, action_dim=4, hidden_dim=32)
    cfg = ControllerConfig(
        dynamics=dcfg,
        mppi=M.MPPIConfig(n_rollouts=32, horizon=4, action_dim=4))
    params = D.init_params(jax.random.PRNGKey(0), dcfg)
    goal = jnp.zeros((dcfg.latent_dim,), jnp.float32)
    rng = np.random.default_rng(0)
    n_blocks = (dcfg.image_size // 4) ** 2
    obs_seq = [rng.integers(-2**31, 2**31, (n_blocks, 4),
                            np.int64).astype(np.int32)
               for _ in range(4)]

    sync = Controller(params, goal, cfg, seed=7)
    pipe = PipelinedController(params, goal, cfg, seed=7)

    sync_actions = [sync.step(o) for o in obs_seq]
    pipe_actions = [pipe.step(o) for o in obs_seq]
    assert pipe_actions[0] is None
    for t in range(1, len(obs_seq)):
        np.testing.assert_array_equal(pipe_actions[t],
                                      sync_actions[t - 1])
    np.testing.assert_array_equal(pipe.flush(), sync_actions[-1])

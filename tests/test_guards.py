"""Determinism + NaN-guard tests (SURVEY.md §5 determinism row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detex_tpu.utils import guards


def test_checked_raises_on_nan():
    @guards.checked
    def bad(x):
        return jnp.log(x)        # log(0) -> -inf, log(-1) -> nan

    with pytest.raises(Exception):
        bad(jnp.float32(-1.0))


def test_checked_passes_finite():
    @guards.checked
    def good(x):
        return jnp.log(x) + 1.0

    assert np.isfinite(float(good(jnp.float32(2.0))))


def test_assert_all_finite():
    guards.assert_all_finite({"a": jnp.ones((3,))})
    with pytest.raises(FloatingPointError):
        guards.assert_all_finite(
            {"a": jnp.asarray([1.0, np.nan])}, "params")


def test_controller_same_seed_determinism():
    """Two controller instances with the same seed produce bitwise
    identical action sequences (functional determinism — the analogue
    of the reference's thread-confinement safety, SURVEY §5)."""
    from detex_tpu.mpc import dynamics as D
    from detex_tpu.mpc import mppi as M
    from detex_tpu.mpc.runtime import Controller, ControllerConfig

    dcfg = D.DynamicsConfig(image_size=16, conv_features=(8, 16),
                            latent_dim=16, action_dim=4, hidden_dim=32)
    cfg = ControllerConfig(
        dynamics=dcfg,
        mppi=M.MPPIConfig(n_rollouts=32, horizon=4, action_dim=4))
    params = D.init_params(jax.random.PRNGKey(0), dcfg)
    goal = jnp.zeros((dcfg.latent_dim,), jnp.float32)
    rng = np.random.default_rng(0)
    n_blocks = (dcfg.image_size // 4) ** 2
    obs = [rng.integers(-2**31, 2**31, (n_blocks, 4), np.int64)
           .astype(np.int32) for _ in range(3)]

    runs = []
    for _ in range(2):
        ctl = Controller(params, goal, cfg, seed=3)
        runs.append([ctl.step(o) for o in obs])
    assert guards.tree_equal(runs[0], runs[1])


def test_mppi_step_nan_guarded():
    """The MPPI update stays finite under checkify float checks on a
    well-posed problem (guards.checked composes with the solver)."""
    from detex_tpu.mpc import mppi as M

    cfg = M.MPPIConfig(n_rollouts=16, horizon=4, action_dim=2)
    dyn = lambda z, u: z * 0.9 + u.sum(-1, keepdims=True) * 0.1
    cost = lambda z, u, t: (z ** 2).sum(-1) + (u ** 2).sum(-1)

    @guards.checked
    def run(key):
        nominal = jnp.zeros((cfg.horizon, cfg.action_dim))
        z0 = jnp.ones((1,))
        new_nominal, diag = M.mppi_step(key, nominal, z0, dyn, cost, cfg)
        return new_nominal

    out = run(jax.random.PRNGKey(0))
    guards.assert_all_finite(out, "mppi nominal")

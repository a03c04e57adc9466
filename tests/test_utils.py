"""Checkpoint/resume determinism + metrics tests."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np

from detex_tpu.mpc import dynamics as D
from detex_tpu.utils import checkpoint as ckpt
from detex_tpu.utils.metrics import MetricsLogger, Timer


def test_checkpoint_roundtrip(tmp_path):
    cfg = D.DynamicsConfig(image_size=16, conv_features=(8,),
                           latent_dim=8, action_dim=2, hidden_dim=16)
    key = jax.random.PRNGKey(3)
    params = D.init_params(key, cfg)
    opt = D.make_optimizer()
    opt_state = opt.init(params)
    nominal = jnp.ones((4, 2), jnp.float32)
    state = ckpt.controller_state(params, opt_state, nominal, key, 17)
    path = tmp_path / "ck"
    ckpt.save(str(path), state)
    restored = ckpt.restore(str(path), state)
    flat_a, _ = jax.tree.flatten(state)
    flat_b, _ = jax.tree.flatten(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_deterministic_resume(tmp_path):
    # Same restored key -> identical MPPI plans after resume.
    from detex_tpu.mpc import mppi

    def dyn(z, u):
        return z + 0.1 * jnp.pad(u, ((0, 0), (0, 2)))

    def cost(z, u, t):
        return jnp.sum(z ** 2, axis=-1)

    cfg = mppi.MPPIConfig(n_rollouts=64, horizon=4, action_dim=2)
    z0 = jnp.ones((4,), jnp.float32)
    nominal = jnp.zeros((4, 2), jnp.float32)
    key = jax.random.PRNGKey(5)
    state = {"nominal": nominal, "key": key}
    ckpt.save(str(tmp_path / "s"), state)
    r = ckpt.restore(str(tmp_path / "s"), state)
    out1, _ = mppi.mppi_step(jnp.asarray(r["key"]), jnp.asarray(
        r["nominal"]), z0, dyn, cost, cfg)
    out2, _ = mppi.mppi_step(key, nominal, z0, dyn, cost, cfg)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_metrics_logger():
    buf = io.StringIO()
    log = MetricsLogger(buf)
    with Timer() as t:
        pass
    log.log(0, loss=1.5, solves_per_s=100.0, step_s=t.elapsed_s)
    rec = json.loads(buf.getvalue())
    assert rec["step"] == 0 and rec["loss"] == 1.5
    assert "step_s" in rec
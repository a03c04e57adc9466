"""Training-loop driver tests: loss decreases on the synthetic visual
env over the sharded mesh; checkpoint/resume is deterministic; the
DCN/ICI host mesh machinery composes with shard_map reductions."""

import io

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from detex_tpu.mpc import dynamics as D
from detex_tpu.mpc.train_loop import SyntheticVisualEnv, TrainConfig, train
from detex_tpu.parallel import distributed
from detex_tpu.utils.metrics import MetricsLogger

_CFG = TrainConfig(
    dynamics=D.DynamicsConfig(image_size=16, conv_features=(8, 16),
                              latent_dim=32, action_dim=4, hidden_dim=64),
    batch_size=32, n_steps=30, mesh_shape=(4, 2))


def test_train_loss_decreases(tmp_path):
    stream = io.StringIO()
    _, _, last = train(
        TrainConfig(**{**_CFG.__dict__,
                       "checkpoint_dir": str(tmp_path / "ck")}),
        metrics=MetricsLogger(stream))
    lines = stream.getvalue().strip().splitlines()
    first = float(__import__("json").loads(lines[0])["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_train_compressed_obs_loss_decreases():
    """North-star training path: the env emits BC7 blocks and the
    jitted train step decodes them in-graph (VERDICT r2 item 5)."""
    stream = io.StringIO()
    cfg = TrainConfig(**{**_CFG.__dict__, "compressed_obs": True})
    _, _, last = train(cfg, metrics=MetricsLogger(stream))
    lines = stream.getvalue().strip().splitlines()
    first = float(__import__("json").loads(lines[0])["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_train_compressed_matches_predecoded():
    """Training on BC7 words == training on the pre-decoded images of
    those words: the in-graph decode is bit-exact, so the loss
    trajectories must be identical."""
    from detex_tpu.mpc.runtime import decode_obs_batch

    cfg = TrainConfig(**{**_CFG.__dict__, "n_steps": 6,
                         "compressed_obs": True})
    s = cfg.dynamics.image_size
    env_words = SyntheticVisualEnv(cfg.dynamics, cfg.seed,
                                   compressed=True)

    class PreDecodedEnv:
        """Same env, observations decoded host-side before the step."""

        def sample_batch(self, rng, batch_size):
            b = env_words.sample_batch(rng, batch_size)
            return {
                "obs": np.asarray(
                    decode_obs_batch(jnp.asarray(b["obs_words"]), s, s),
                    np.int32),
                "next_obs": np.asarray(
                    decode_obs_batch(jnp.asarray(b["next_obs_words"]),
                                     s, s), np.int32),
                "action": b["action"],
            }

    s1 = io.StringIO()
    s2 = io.StringIO()
    train(cfg, metrics=MetricsLogger(s1), env=env_words)
    cfg_raw = TrainConfig(**{**cfg.__dict__, "compressed_obs": False})
    train(cfg_raw, metrics=MetricsLogger(s2), env=PreDecodedEnv())
    json = __import__("json")
    l1 = [json.loads(x)["loss"] for x in s1.getvalue().splitlines()]
    l2 = [json.loads(x)["loss"] for x in s2.getvalue().splitlines()]
    assert l1 == l2, (l1, l2)


def test_train_resume_matches_straight_run(tmp_path):
    # run 30 steps straight
    _, _, loss_straight = train(_CFG, metrics=MetricsLogger(io.StringIO()))
    # run 20 steps with a checkpoint at step 20, then resume to 30
    cfg20 = TrainConfig(**{**_CFG.__dict__, "n_steps": 20,
                           "checkpoint_every": 20,
                           "checkpoint_dir": str(tmp_path / "ck")})
    train(cfg20, metrics=MetricsLogger(io.StringIO()))
    cfg30 = TrainConfig(**{**_CFG.__dict__,
                           "checkpoint_every": 0,
                           "checkpoint_dir": str(tmp_path / "ck")})
    _, _, loss_resumed = train(cfg30, metrics=MetricsLogger(io.StringIO()))
    np.testing.assert_allclose(loss_resumed, loss_straight,
                               rtol=2e-4, atol=2e-5)


def test_host_mesh_psum():
    distributed.initialize()          # no-op single process
    mesh = distributed.make_host_mesh()
    assert mesh.axis_names == ("dcn", "ici")
    assert mesh.devices.shape[0] == 1   # single process

    n = mesh.devices.size
    x = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)

    @jax.jit
    def total(x):
        def f(xs):
            local = jnp.sum(xs)
            s = jax.lax.psum(local, "ici")     # on-host reduce first
            return jax.lax.psum(s, "dcn")[None]
        return shard_map(f, mesh=mesh, in_specs=P(("dcn", "ici")),
                         out_specs=P(("dcn", "ici")))(x)

    out = total(x)
    np.testing.assert_allclose(np.asarray(out)[0], x.sum())

"""Multi-chip MPPI sharding: the rollout batch must actually partition.

VERDICT.md round-1 gap #1: the docstring claimed dp-sharding but nothing
asserted it.  These tests run on the virtual 8-device CPU mesh
(SURVEY.md §4 point 5) and assert:

  * the shard_map path bit-matches the single-device path (same global
    noise) within fp reduction tolerance,
  * the compiled HLO contains all-reduce collectives AND the per-device
    rollout shapes are K/n_dp (i.e. the batch is partitioned, not
    replicated),
  * the GSPMD (with_sharding_constraint) path matches too,
  * the full control_step composes with the sharded MPPI on a dp x tp
    mesh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from detex_tpu.mpc import dynamics as D
from detex_tpu.mpc import mppi
from detex_tpu.mpc.runtime import ControllerConfig, control_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

K, H, A, N_STATE = 64, 8, 4, 6
CFG = mppi.MPPIConfig(n_rollouts=K, horizon=H, action_dim=A,
                      noise_sigma=0.5, temperature=0.7)


def _toy_problem():
    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.standard_normal((N_STATE, N_STATE)) * 0.3
                    + np.eye(N_STATE), jnp.float32)
    l = jnp.asarray(rng.standard_normal((N_STATE, A)) * 0.2, jnp.float32)
    goal = jnp.asarray(rng.standard_normal(N_STATE), jnp.float32)

    def dyn(z, u):
        return z @ f.T + u @ l.T

    def cost(z, u, t):
        return jnp.sum((z - goal) ** 2, axis=-1) + 0.1 * jnp.sum(
            u ** 2, axis=-1)

    z0 = jnp.asarray(rng.standard_normal(N_STATE), jnp.float32)
    nominal = jnp.asarray(rng.standard_normal((H, A)) * 0.1, jnp.float32)
    return dyn, cost, z0, nominal


def _mesh(dp, tp=1):
    dev = np.array(jax.devices()[:dp * tp]).reshape(dp, tp)
    return Mesh(dev, ("dp", "tp"))


def test_shardmap_matches_unsharded():
    dyn, cost, z0, nominal = _toy_problem()
    key = jax.random.PRNGKey(3)
    ref_nom, ref_diag = jax.jit(functools.partial(
        mppi.mppi_step, dynamics=dyn, cost=cost, cfg=CFG))(
        key, nominal=nominal, z0=z0)
    for dp in (2, 4, 8):
        mesh = _mesh(dp)
        step = jax.jit(functools.partial(
            mppi.mppi_step, dynamics=dyn, cost=cost, cfg=CFG,
            rollout_axis="dp", mesh=mesh))
        out_nom, out_diag = step(key, nominal=nominal, z0=z0)
        np.testing.assert_allclose(np.asarray(out_nom),
                                   np.asarray(ref_nom), rtol=2e-5,
                                   atol=2e-6)
        np.testing.assert_allclose(float(out_diag["ess"]),
                                   float(ref_diag["ess"]), rtol=2e-5)
        np.testing.assert_allclose(float(out_diag["min_cost"]),
                                   float(ref_diag["min_cost"]), rtol=2e-5)


def test_shardmap_hlo_is_partitioned():
    """The compiled per-device program must hold only K/dp rollouts and
    reduce with all-reduce (i.e. real partitioning, not replication)."""
    dyn, cost, z0, nominal = _toy_problem()
    key = jax.random.PRNGKey(3)
    mesh = _mesh(4)
    step = jax.jit(functools.partial(
        mppi.mppi_step, dynamics=dyn, cost=cost, cfg=CFG,
        rollout_axis="dp", mesh=mesh))
    txt = step.lower(key, nominal=nominal, z0=z0).compile().as_text()
    assert "all-reduce" in txt
    local = K // 4
    # Local controls tensor (K/dp, H, A) must appear; the full (K, H, A)
    # batch must never materialize inside a compute op.  (The global
    # noise tensor f32[64,8,4] exists only as the pre-shard_map rng
    # output, which XLA partitions; check the scan-carried local shape.)
    assert f"f32[{local},{H},{A}]" in txt


def test_hierarchical_dcn_ici_matches_unsharded():
    """Rollouts sharded over a 2-level ('dcn', 'ici') mesh: the psum
    chain reduces over ICI first, then DCN (only the O(H*A) partial
    crosses the host axis) — result matches the single-device step."""
    dyn, cost, z0, nominal = _toy_problem()
    key = jax.random.PRNGKey(3)
    ref_nom, ref_diag = jax.jit(functools.partial(
        mppi.mppi_step, dynamics=dyn, cost=cost, cfg=CFG))(
        key, nominal=nominal, z0=z0)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("dcn", "ici"))
    step = jax.jit(functools.partial(
        mppi.mppi_step, dynamics=dyn, cost=cost, cfg=CFG,
        rollout_axis=("dcn", "ici"), mesh=mesh))
    out_nom, out_diag = step(key, nominal=nominal, z0=z0)
    np.testing.assert_allclose(np.asarray(out_nom), np.asarray(ref_nom),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(out_diag["min_cost"]),
                               float(ref_diag["min_cost"]), rtol=2e-5)
    # Two distinct reduction stages must exist in the compiled HLO:
    # an 'ici' all-reduce within each host group and a 'dcn'
    # all-reduce across them (replica_groups {0..3}{4..7} then
    # {0,4}{1,5}...).
    txt = step.lower(key, nominal=nominal, z0=z0).compile().as_text()
    import re
    groups = set(re.findall(
        r"all-reduce[^\n]*replica_groups=(\{\{[0-9,{}]*\}\})", txt))
    assert "{{0,1,2,3},{4,5,6,7}}" in groups, groups   # ICI stage
    assert "{{0,4},{1,5},{2,6},{3,7}}" in groups, groups  # DCN stage


def test_gspmd_constraint_matches_unsharded():
    dyn, cost, z0, nominal = _toy_problem()
    key = jax.random.PRNGKey(5)
    ref_nom, _ = jax.jit(functools.partial(
        mppi.mppi_step, dynamics=dyn, cost=cost, cfg=CFG))(
        key, nominal=nominal, z0=z0)
    mesh = _mesh(8)
    step = jax.jit(functools.partial(
        mppi.mppi_step, dynamics=dyn, cost=cost, cfg=CFG,
        rollout_axis="dp"))
    with jax.sharding.set_mesh(mesh):
        out_nom, _ = step(key, nominal=nominal, z0=z0)
    np.testing.assert_allclose(np.asarray(out_nom), np.asarray(ref_nom),
                               rtol=2e-5, atol=2e-6)


def test_gspmd_costs_sharding_inspected():
    """Assert via inspect_array_sharding that the per-rollout costs are
    partitioned over dp under the GSPMD path."""
    dyn, cost, z0, nominal = _toy_problem()
    mesh = _mesh(8)
    seen = []

    def probe_cost(z, u, t):
        c = cost(z, u, t)
        jax.debug.inspect_array_sharding(
            c, callback=lambda s: seen.append(s))
        return c

    step = jax.jit(functools.partial(
        mppi.mppi_step, dynamics=dyn, cost=probe_cost, cfg=CFG,
        rollout_axis="dp"))
    with jax.sharding.set_mesh(mesh):
        out, _ = step(jax.random.PRNGKey(0), nominal=nominal, z0=z0)
        jax.block_until_ready(out)
    assert seen, "inspect_array_sharding callback never fired"
    s = seen[0]
    # Cost vector is (K,) sharded over the 8-way dp axis.
    assert getattr(s, "spec", None) is not None
    assert s.spec == P("dp"), f"costs not dp-sharded: {s}"


def test_control_step_sharded_matches():
    """Full decode->encode->MPPI step on a dp x tp mesh == single-device
    result (same key; tp-sharded params)."""
    dcfg = D.DynamicsConfig(image_size=16, conv_features=(8, 16),
                            latent_dim=32, action_dim=4, hidden_dim=64)
    ccfg = ControllerConfig(
        dynamics=dcfg,
        mppi=mppi.MPPIConfig(n_rollouts=64, horizon=4, action_dim=4))
    ccfg_sharded = ControllerConfig(
        dynamics=dcfg,
        mppi=mppi.MPPIConfig(n_rollouts=64, horizon=4, action_dim=4),
        rollout_axis="dp")
    key = jax.random.PRNGKey(0)
    params = D.init_params(key, dcfg)
    rng = np.random.default_rng(0)
    obs_words = jnp.asarray(rng.integers(-2**31, 2**31, (16, 4),
                                         np.int64).astype(np.int32))
    nominal = jnp.zeros((4, 4), jnp.float32)
    goal_z = jnp.zeros((32,), jnp.float32)

    a_ref, nom_ref, _ = jax.jit(functools.partial(
        control_step, cfg=ccfg))(params, nominal, key, obs_words, goal_z)

    mesh = _mesh(4, 2)
    sharded_params = jax.device_put(params, D.param_shardings(mesh, dcfg))
    step = jax.jit(functools.partial(control_step, cfg=ccfg_sharded,
                                     mesh=mesh))
    with mesh:
        a_s, nom_s, _ = step(sharded_params, nominal, key, obs_words,
                             goal_z)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_ref),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(nom_s), np.asarray(nom_ref),
                               rtol=3e-5, atol=3e-6)


def test_sharded_decode_no_collectives():
    """decode_blocks_sharded: block decode sharded over 'dp' must be
    bit-identical to the unsharded decode and compile to a program
    with ZERO collectives (blocks are independent, texture.c:85-96 —
    scale-out decode costs no communication)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    from detex_tpu import engine, formats as F
    from detex_tpu.ops.bitops import words_from_bytes

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("dp", "tp"))
    rng = np.random.default_rng(3)
    for fmt, bs in ((F.BPTC, 16), (F.RGTC1, 8)):
        blocks = rng.integers(0, 256, (512, bs), np.uint8)
        words = words_from_bytes(blocks)
        pix_s, valid_s = engine.decode_blocks_sharded(fmt, words, mesh)
        pix_u, valid_u = engine.decode_blocks_device(fmt, words)
        np.testing.assert_array_equal(np.asarray(pix_s),
                                      np.asarray(pix_u))
        np.testing.assert_array_equal(np.asarray(valid_s),
                                      np.asarray(valid_u))

        idx = F.compressed_index(fmt)
        mesh_key = (tuple(d.id for d in mesh.devices.ravel()),
                    tuple(mesh.shape.items()))
        fn = engine._sharded_decoder(idx, mesh_key, "dp")
        txt = fn.lower(words, np.uint32(0xFFFFFFFF),
                       np.uint32(0)).compile().as_text()
        for coll in ("all-reduce", "all-gather", "reduce-scatter",
                     "collective-permute", "all-to-all"):
            assert coll not in txt, f"{coll} in sharded decode HLO"

"""Analytic collective-volume assertions (VERDICT r2 item 6).

The multi-chip scaling argument that needs no hardware: the bytes the
sharded programs move over the mesh are

  * MPPI (shard_map over 'dp'): O(H*A + scalars) — independent of the
    rollout count K.  Each chip reduces its local rollouts to one
    (H, A) weighted-control sum plus three scalars; the psum/pmin pair
    is the ONLY inter-chip traffic (mppi.py:_mppi_update).
  * parallel LQT (shard_map over 'sp'): O(n_dev * element) —
    independent of the horizon H.  The three-phase block scan
    exchanges exactly one all_gather of per-chunk totals
    (parallel_lqr.py:lqt_backward_parallel_sharded).

These tests parse the compiled HLO and sum the result bytes of every
collective op, then assert the totals do not change when K (resp. H)
is scaled 4x.  Replication or a K-dependent reduce would fail
immediately.
"""

import functools
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from detex_tpu.mpc import mppi
from detex_tpu.mpc import parallel_lqr as plqr

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "s16": 2, "s8": 1, "u64": 8, "u32": 4,
                "u16": 2, "u8": 1, "pred": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def collective_bytes(hlo_text: str):
    """Sum of result bytes over every collective instruction in the
    compiled HLO; returns (total_bytes, [(op, bytes), ...])."""
    ops = []
    pat = re.compile(
        r"=\s+(.*?)\s+(" + "|".join(_COLLECTIVES) + r")(?:-start)?\(")
    shape_pat = re.compile(r"(\w+)\[([0-9,]*)\]")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if not m:
            continue
        restype, op = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in shape_pat.findall(restype):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        ops.append((op, nbytes))
    return sum(b for _, b in ops), ops


def _mppi_hlo(k: int, h: int = 8, a: int = 4, dp: int = 4) -> str:
    cfg = mppi.MPPIConfig(n_rollouts=k, horizon=h, action_dim=a)
    mesh = Mesh(np.array(jax.devices()[:dp]).reshape(dp, 1),
                ("dp", "tp"))
    rng = np.random.default_rng(0)
    fm = jnp.asarray(np.eye(6) + 0.1 * rng.standard_normal((6, 6)),
                     jnp.float32)
    lm = jnp.asarray(0.2 * rng.standard_normal((6, a)), jnp.float32)

    def dyn(z, u):
        return z @ fm.T + u @ lm.T

    def cost(z, u, t):
        return jnp.sum(z ** 2, axis=-1) + 0.1 * jnp.sum(u ** 2, axis=-1)

    step = jax.jit(functools.partial(
        mppi.mppi_step, dynamics=dyn, cost=cost, cfg=cfg,
        rollout_axis="dp", mesh=mesh))
    z0 = jnp.zeros((6,), jnp.float32)
    nominal = jnp.zeros((h, a), jnp.float32)
    return step.lower(jax.random.PRNGKey(0), nominal=nominal,
                      z0=z0).compile().as_text()


def test_mppi_collective_bytes_independent_of_k():
    h, a = 8, 4
    txt_small = _mppi_hlo(k=64, h=h, a=a)
    txt_big = _mppi_hlo(k=256, h=h, a=a)
    bytes_small, ops_small = collective_bytes(txt_small)
    bytes_big, ops_big = collective_bytes(txt_big)
    assert ops_small, "no collectives found in sharded MPPI HLO"
    assert bytes_small == bytes_big, (ops_small, ops_big)
    # The payload is the (H, A) weighted-control sum + a handful of
    # scalars: well under 2x the analytic H*A*4 floor, and nowhere
    # near the K-proportional 64*H*A*4 a replicated reduce would move.
    analytic_floor = h * a * 4
    assert bytes_small < 4 * analytic_floor + 256, ops_small
    # No collective shape may carry the rollout axis.
    for line in txt_big.splitlines():
        if any(c in line for c in _COLLECTIVES) and "=" in line:
            assert "[256" not in line.split("(")[0], line


def test_lqt_collective_bytes_independent_of_h():
    n, m, sp = 6, 4, 4
    mesh = Mesh(np.array(jax.devices()[:sp]).reshape(sp), ("sp",))

    def hlo(h: int) -> str:
        rng = np.random.default_rng(1)
        f = jnp.asarray(np.broadcast_to(np.eye(n), (h, n, n)),
                        jnp.float32)
        l = jnp.asarray(0.1 * rng.standard_normal((h, n, m)),
                        jnp.float32)
        c = jnp.zeros((h, n), jnp.float32)
        q = jnp.asarray(np.broadcast_to(np.eye(n), (h, n, n)),
                        jnp.float32)
        qv = jnp.zeros((h, n), jnp.float32)
        r = jnp.asarray(np.broadcast_to(np.eye(m), (h, m, m)),
                        jnp.float32)
        rv = jnp.zeros((h, m), jnp.float32)
        mm = jnp.zeros((h, m, n), jnp.float32)
        pt = jnp.asarray(np.eye(n), jnp.float32)
        pv = jnp.zeros((n,), jnp.float32)
        # gather_output=False: the in-pipeline mode where P/eta stay
        # horizon-sharded — all communication is then algorithmic.
        # (gather_output=True adds exactly the unavoidable output
        # replication, which is O(H) by definition of the result.)
        fn = jax.jit(lambda *args: plqr.lqt_backward_parallel_sharded(
            *args, mesh=mesh, axis="sp", gather_output=False))
        return fn.lower(f, l, c, q, qv, r, rv, mm, pt,
                        pv).compile().as_text()

    bytes_small, ops_small = collective_bytes(hlo(64))
    bytes_big, ops_big = collective_bytes(hlo(256))
    assert ops_small, "no collectives found in sharded LQT HLO"
    assert bytes_small == bytes_big, (ops_small, ops_big)
    # One all_gather of n_dev chunk-total elements: each element is a
    # few (n, n)/(n,) f32 blocks — bounded by n_dev * 4 * (3*n*n + 2*n)
    # bytes and NOT proportional to H (H=256 local chunks would be
    # 64x larger).
    per_elem = 4 * (3 * n * n + 2 * n)
    assert bytes_small <= 2 * sp * per_elem, ops_small

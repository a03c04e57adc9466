"""Parallel (associative-scan) LQR vs the sequential Riccati recursion."""

import jax
import jax.numpy as jnp
import numpy as np

from detex_tpu.mpc import parallel_lqr as plqr


def _random_lqr(h, n, m, seed=0, time_varying=True):
    rng = np.random.default_rng(seed)
    if time_varying:
        f = np.eye(n) + 0.05 * rng.standard_normal((h, n, n))
        l = 0.2 * rng.standard_normal((h, n, m))
    else:
        f = np.broadcast_to(np.eye(n)
                            + 0.05 * rng.standard_normal((n, n)),
                            (h, n, n)).copy()
        l = np.broadcast_to(0.2 * rng.standard_normal((n, m)),
                            (h, n, m)).copy()
    c = 0.1 * rng.standard_normal((h, n))
    q = np.broadcast_to(np.eye(n), (h, n, n)).copy()
    r = np.broadcast_to(0.5 * np.eye(m), (h, m, m)).copy()
    qt = 2.0 * np.eye(n)
    return (jnp.asarray(f, jnp.float32), jnp.asarray(l, jnp.float32),
            jnp.asarray(c, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.asarray(r, jnp.float32), jnp.asarray(qt, jnp.float32))


def _sequential_value(f, l, c, q, r, qt):
    """Reference Riccati recursion (float64) with linear terms."""
    h, n, _ = f.shape
    f64 = np.asarray(f, np.float64)
    l64 = np.asarray(l, np.float64)
    c64 = np.asarray(c, np.float64)
    q64 = np.asarray(q, np.float64)
    r64 = np.asarray(r, np.float64)
    p = np.asarray(qt, np.float64)
    v = np.zeros(n)
    ps = [p]
    vs = [v]
    for t in range(h - 1, -1, -1):
        ft, lt, ct = f64[t], l64[t], c64[t]
        quu = r64[t] + lt.T @ p @ lt
        qux = lt.T @ p @ ft
        qu = lt.T @ (p @ ct + v)
        k = np.linalg.solve(quu, qux)
        kff = np.linalg.solve(quu, qu)
        p_new = q64[t] + ft.T @ p @ ft - qux.T @ k
        v_new = ft.T @ (p @ ct + v) - qux.T @ kff
        p = 0.5 * (p_new + p_new.T)
        v = v_new
        ps.append(p)
        vs.append(v)
    return np.stack(ps[::-1]), np.stack(vs[::-1])


def test_parallel_value_matches_riccati():
    f, l, c, q, r, qt = _random_lqr(32, 4, 2)
    p_par, eta_par = jax.jit(plqr.lqr_backward_parallel)(f, l, c, q, r, qt)
    p_seq, v_seq = _sequential_value(f, l, c, q, r, qt)
    np.testing.assert_allclose(np.asarray(p_par), p_seq, rtol=2e-4,
                               atol=2e-4)
    # value gradient at x: P x + v corresponds to eta = -v
    np.testing.assert_allclose(np.asarray(-eta_par), v_seq, rtol=2e-4,
                               atol=2e-4)


def test_parallel_solve_trajectory_optimal():
    # Full solve: the parallel trajectory must match the sequential
    # gains rollout.
    f, l, c, q, r, qt = _random_lqr(16, 4, 2, seed=3)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(4),
                     jnp.float32)
    xs, us = jax.jit(plqr.lqr_solve_parallel)(f, l, c, q, r, qt, x0)
    # sequential reference rollout
    p_seq, v_seq = _sequential_value(f, l, c, q, r, qt)
    f64 = np.asarray(f, np.float64)
    l64 = np.asarray(l, np.float64)
    c64 = np.asarray(c, np.float64)
    r64 = np.asarray(r, np.float64)
    x = np.asarray(x0, np.float64)
    for t in range(16):
        p_next, v_next = p_seq[t + 1], v_seq[t + 1]
        quu = r64[t] + l64[t].T @ p_next @ l64[t]
        u = -np.linalg.solve(
            quu, l64[t].T @ (p_next @ (f64[t] @ x + c64[t]) + v_next))
        np.testing.assert_allclose(np.asarray(us[t]), u, rtol=2e-3,
                                   atol=2e-3)
        x = f64[t] @ x + l64[t] @ u + c64[t]
        np.testing.assert_allclose(np.asarray(xs[t + 1]), x, rtol=2e-3,
                                   atol=2e-3)


def test_parallel_long_horizon_stable():
    # H=512 log-depth scan stays finite and symmetric.
    f, l, c, q, r, qt = _random_lqr(512, 4, 2, seed=5,
                                    time_varying=False)
    p_par, eta = jax.jit(plqr.lqr_backward_parallel)(f, l, c, q, r, qt)
    p0 = np.asarray(p_par[0])
    assert np.isfinite(p0).all()
    np.testing.assert_allclose(p0, p0.T, atol=1e-3)

def _random_lqt(h, n, m, seed=0):
    rng = np.random.default_rng(seed)
    f = np.eye(n) + 0.05 * rng.standard_normal((h, n, n))
    l = 0.2 * rng.standard_normal((h, n, m))
    c = 0.1 * rng.standard_normal((h, n))
    qh = rng.standard_normal((h, n, n))
    q = 0.1 * qh @ qh.transpose(0, 2, 1) + np.eye(n)
    qv = rng.standard_normal((h, n))
    rh = rng.standard_normal((h, m, m))
    r = 0.1 * rh @ rh.transpose(0, 2, 1) + np.eye(m)
    rv = rng.standard_normal((h, m))
    mm = 0.2 * rng.standard_normal((h, m, n))
    pt = 2.0 * np.eye(n)
    pv = rng.standard_normal(n)
    to32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return tuple(to32(a) for a in (f, l, c, q, qv, r, rv, mm, pt, pv))


def _sequential_lqt(f, l, c, q, qv, r, rv, mm, pt, pv):
    """f64 Riccati with linear + cross terms; returns P, p, K, kff."""
    h, n, _ = f.shape
    a = [np.asarray(x, np.float64) for x in
         (f, l, c, q, qv, r, rv, mm)]
    f, l, c, q, qv, r, rv, mm = a
    p = np.asarray(pt, np.float64)
    pv_ = np.asarray(pv, np.float64)
    ps, pvs, ks, kffs = [p], [pv_], [], []
    for t in range(h - 1, -1, -1):
        quu = r[t] + l[t].T @ p @ l[t]
        qux = mm[t] + l[t].T @ p @ f[t]
        qu = rv[t] + l[t].T @ (p @ c[t] + pv_)
        qx = qv[t] + f[t].T @ (p @ c[t] + pv_)
        qxx = q[t] + f[t].T @ p @ f[t]
        k = np.linalg.solve(quu, qux)
        kff = np.linalg.solve(quu, qu)
        p = qxx - qux.T @ k
        p = 0.5 * (p + p.T)
        pv_ = qx - qux.T @ kff
        ps.insert(0, p)
        pvs.insert(0, pv_)
        ks.insert(0, k)
        kffs.insert(0, kff)
    return np.stack(ps), np.stack(pvs), np.stack(ks), np.stack(kffs)


def test_lqt_backward_matches_sequential():
    prob = _random_lqt(24, 5, 3, seed=11)
    p_par, eta = jax.jit(plqr.lqt_backward_parallel)(*prob)
    p_seq, pv_seq, k_seq, kff_seq = _sequential_lqt(*prob)
    np.testing.assert_allclose(np.asarray(p_par), p_seq, rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(-eta), pv_seq, rtol=3e-4,
                               atol=3e-4)
    f, l, c, q, qv, r, rv, mm, pt, pv = prob
    k_par, kff_par = jax.jit(plqr.lqt_gains)(f, l, c, r, rv, mm,
                                             p_par[1:], eta[1:])
    np.testing.assert_allclose(np.asarray(k_par), k_seq, rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(kff_par), kff_seq, rtol=3e-4,
                               atol=3e-4)


def test_lqt_sharded_matches_unsharded():
    """Horizon-sharded block scan over the 8-device mesh == single
    device, including the identity-padding path (H+1 % n_dev != 0)."""
    import pytest
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    for h in (31, 32, 64):   # 32 -> pad 0 (33 % 8 != 0 actually), vary
        prob = _random_lqt(h, 5, 3, seed=h)
        p_ref, eta_ref = jax.jit(plqr.lqt_backward_parallel)(*prob)
        for n_dev in (2, 4, 8):
            mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev),
                        ("sp",))
            fn = jax.jit(lambda *a, mesh=mesh:
                         plqr.lqt_backward_parallel_sharded(
                             *a, mesh=mesh, axis="sp"))
            p_s, eta_s = fn(*prob)
            np.testing.assert_allclose(np.asarray(p_s),
                                       np.asarray(p_ref), rtol=2e-4,
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(eta_s),
                                       np.asarray(eta_ref), rtol=2e-4,
                                       atol=2e-4)


def test_ilqr_parallel_matches_sequential():
    """ilqr_solve(parallel=True) == sequential scan backward on a
    nonlinear pendulum-like problem."""
    from detex_tpu.mpc import ilqr

    def dyn(x, u):
        theta, omega = x[0], x[1]
        omega2 = omega + 0.1 * (u[0] - jnp.sin(theta) - 0.1 * omega)
        return jnp.stack([theta + 0.1 * omega2, omega2])

    def cost(x, u, t):
        return jnp.sum(x ** 2) + 0.1 * jnp.sum(u ** 2)

    def term(x):
        return 10.0 * jnp.sum(x ** 2)

    x0 = jnp.asarray([1.5, 0.0], jnp.float32)
    us0 = jnp.zeros((20, 1), jnp.float32)
    xs_a, us_a, c_a = jax.jit(lambda: ilqr.ilqr_solve(
        dyn, cost, term, x0, us0,
        ilqr.ILQRConfig(n_iterations=8)))()
    xs_b, us_b, c_b = jax.jit(lambda: ilqr.ilqr_solve(
        dyn, cost, term, x0, us0,
        ilqr.ILQRConfig(n_iterations=8, parallel=True)))()
    c_init = ilqr.trajectory_cost(cost, term,
                                  ilqr._rollout(dyn, x0, us0), us0)
    assert float(c_a) < float(c_init)  # it actually optimized
    np.testing.assert_allclose(float(c_b), float(c_a), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(us_b), np.asarray(us_a),
                               rtol=5e-3, atol=5e-3)

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
"""Parallel (log-depth) LQR via associative scan.

The long-horizon scaling analogue of sequence parallelism (SURVEY.md §5
"long-context"): the Riccati backward pass is a sequential recursion of
depth H; reformulated as an associative combination of conditional
value-function elements it runs in O(log H) depth with
jax.lax.associative_scan, and the elementwise combines batch onto the
MXU.  (Cf. Särkkä & García-Fernández, temporal parallelization of LQR.)

Element (A, b, C, eta, J) represents the optimal cost-to-go between two
times conditioned on both endpoint states; combination eliminates the
intermediate state:

  A12 = A2 M A1            M  = (I + C1 J2)^{-1}
  b12 = A2 M (b1 + C1 eta2) + b2
  C12 = A2 M C1 A2' + C2
  e12 = A1' N (eta2 - J2 b1) + eta1     N = (I + J2 C1)^{-1}
  J12 = A1' N J2 A1 + J1

For time-invariant or time-varying linear dynamics x' = F x + L u + c
with stage cost 0.5 x'X x + 0.5 u'U u, the suffix-combined element at
time k gives the value Hessian P_k = J_k* and value gradient -eta_k*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(e1, e2):
    """Associative combination; e1 covers the earlier interval."""
    a1, b1, c1, eta1, j1 = e1
    a2, b2, c2, eta2, j2 = e2
    n = a1.shape[-1]
    eye = jnp.eye(n, dtype=a1.dtype)
    m = jnp.linalg.solve(eye + c1 @ j2, eye)
    nmat = jnp.linalg.solve(eye + j2 @ c1, eye)
    a12 = a2 @ m @ a1
    b12 = (a2 @ m @ (b1[..., None] + c1 @ eta2[..., None]))[..., 0] + b2
    c12 = a2 @ m @ c1 @ jnp.swapaxes(a2, -1, -2) + c2
    eta12 = (jnp.swapaxes(a1, -1, -2)
             @ nmat @ (eta2[..., None] - j2 @ b1[..., None]))[..., 0] + eta1
    j12 = jnp.swapaxes(a1, -1, -2) @ nmat @ j2 @ a1 + j1
    return a12, b12, c12, eta12, j12


_combine_v = jax.vmap(_combine)


def lqr_backward_parallel(f_mat, l_mat, c_vec, x_cost, u_cost, x_terminal):
    """Backward value functions for a (time-varying) LQR in parallel.

    f_mat (H, n, n), l_mat (H, n, m), c_vec (H, n), x_cost (H, n, n),
    u_cost (H, m, m), x_terminal (n, n).
    Returns (P (H+1, n, n), eta (H+1, n)) with P_k the value Hessian at
    time k (P_H = x_terminal) and value gradient -eta_k."""
    h, n, _ = f_mat.shape
    u_inv = jnp.linalg.inv(u_cost)
    c_elem = l_mat @ u_inv @ jnp.swapaxes(l_mat, -1, -2)
    elems = (
        jnp.concatenate([f_mat, jnp.zeros((1, n, n), f_mat.dtype)]),
        jnp.concatenate([c_vec, jnp.zeros((1, n), f_mat.dtype)]),
        jnp.concatenate([c_elem, jnp.zeros((1, n, n), f_mat.dtype)]),
        jnp.zeros((h + 1, n), f_mat.dtype),
        jnp.concatenate([x_cost, x_terminal[None]]),
    )
    # reverse=True feeds the combiner (suffix, element) = (later,
    # earlier); our _combine expects (earlier, later).
    combined = jax.lax.associative_scan(
        lambda a, b: _combine_v(b, a), elems, reverse=True)
    _, _, _, eta, j = combined
    return j, eta


def lqr_gains_from_value(f_mat, l_mat, c_vec, u_cost, p_next, eta_next):
    """Feedback/feedforward gains from the next-step value function:
    u_k = -K_k x_k - k_k."""
    lt = jnp.swapaxes(l_mat, -1, -2)
    quu = u_cost + lt @ p_next @ l_mat
    k_fb = jnp.linalg.solve(quu, lt @ p_next @ f_mat)
    rhs = lt @ (p_next @ c_vec[..., None] - eta_next[..., None])
    k_ff = jnp.linalg.solve(quu, rhs)[..., 0]
    return k_fb, k_ff


def lqr_solve_parallel(f_mat, l_mat, c_vec, x_cost, u_cost, x_terminal,
                       x0):
    """Full parallel LQR solve: returns (xs (H+1, n), us (H, m)).

    All heavy math is the log-depth associative scan plus one batched
    gains solve; the final rollout is the only sequential part."""
    p_all, eta_all = lqr_backward_parallel(f_mat, l_mat, c_vec, x_cost,
                                           u_cost, x_terminal)
    k_fb, k_ff = lqr_gains_from_value(f_mat, l_mat, c_vec, u_cost,
                                      p_all[1:], eta_all[1:])

    def step(x, inp):
        f_t, l_t, c_t, kfb_t, kff_t = inp
        u = -(kfb_t @ x) - kff_t
        x_next = f_t @ x + l_t @ u + c_t
        return x_next, (x, u)

    _, (xs, us) = jax.lax.scan(step, x0,
                               (f_mat, l_mat, c_vec, k_fb, k_ff))
    xs = jnp.concatenate([xs[1:], (f_mat[-1] @ xs[-1]
                                   + l_mat[-1] @ us[-1]
                                   + c_vec[-1])[None]], axis=0)
    xs = jnp.concatenate([x0[None], xs], axis=0)
    return xs, us

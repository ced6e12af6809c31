"""L4 — DARE / LQR utilities.

Reference semantics (``duffing.py:583-613``): fixed-point DARE iteration
(500 iters, sup-norm tolerance 0.01) and the gain
``K = pinv(B'XB + R)(B'XA)`` applied as ``u = -K x``.

Two solvers:
  - :func:`solve_dare_iter` — the reference's fixed-point recursion, kept
    for parity (branch-free: runs the full fixed iteration count; extra
    iterations past the reference's early break only tighten the fixpoint).
  - :func:`solve_dare_doubling` — structure-preserving doubling, O(log)
    iterations of small matmuls; the production path (used per-scenario
    under vmap for terminal-cost synthesis, where 500 sequential GEMMs per
    step would dominate).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.linalg import gj_solve, spd_inverse


def solve_dare_iter(
    a: Array, b: Array, q: Array, r: Array, iters: int = 500
) -> Array:
    """Fixed-point DARE iteration (duffing.py:583-599 semantics)."""
    r = jnp.atleast_2d(jnp.asarray(r, dtype=a.dtype))

    def body(x, _):
        btx = b.T @ x
        gain = jnp.linalg.pinv(r + btx @ b) @ (btx @ a)
        x_new = a.T @ x @ a - (a.T @ x @ b) @ gain + q
        return x_new, None

    x, _ = jax.lax.scan(body, q, None, length=iters)
    return x


def solve_dare_doubling(
    a: Array, b: Array, q: Array, r: Array, iters: int = 30
) -> Array:
    """Structure-preserving doubling algorithm (SDA) for the DARE.

    Converges quadratically; ~25 iterations reach f64 machine precision for
    these 8-21 dim systems while staying a fixed-length ``lax.scan`` of
    small matmuls (MXU-friendly, vmappable over scenario batches).
    """
    r = jnp.atleast_2d(jnp.asarray(r, dtype=a.dtype))
    g0 = b @ (spd_inverse(r) @ b.T)
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)

    def body(carry, _):
        ak, gk, hk = carry
        w = gj_solve(eye + gk @ hk, ak)  # (I + G H)^-1 A
        a_next = ak @ w
        g_next = gk + ak @ gk @ gj_solve(eye + hk @ gk, ak.T)
        h_next = hk + w.T @ hk @ ak
        return (a_next, g_next, h_next), None

    (ak, gk, hk), _ = jax.lax.scan(body, (a, g0, q), None, length=iters)
    return hk


def dlqr_gain(a: Array, b: Array, q: Array, r: Array, p: Array) -> Array:
    """LQR gain from a DARE solution: ``K = pinv(B'PB + R)(B'PA)``
    (duffing.py:601-613); control law ``u = -K x``."""
    r = jnp.atleast_2d(jnp.asarray(r, dtype=a.dtype))
    btp = b.T @ p
    # r + B'PB is SPD (r PD, P PSD): spd_inverse == pinv here and avoids
    # the TPU SVD custom call on the per-step terminal-synthesis path
    return spd_inverse(r + btp @ b) @ (btp @ a)


def dlqr(a: Array, b: Array, q: Array, r: Array, method: str = "doubling"):
    """Return (K, P). ``method='iter'`` matches reference fixed-point
    semantics; ``'doubling'`` is the fast default."""
    if method == "iter":
        p = solve_dare_iter(a, b, q, r)
    else:
        p = solve_dare_doubling(a, b, q, r)
    return dlqr_gain(a, b, q, r, p), p


def controllability_rank(a: Array, b: Array) -> Array:
    """rank([B AB ... A^{n-1}B]) (duffing.py:659-665 sanity check)."""
    n = a.shape[-1]

    def body(pb, _):
        return a @ pb, pb

    _, blocks = jax.lax.scan(body, b, None, length=n)
    ctrb = jnp.concatenate(jnp.moveaxis(blocks, 0, 0), axis=-1)  # (n, n*m)
    return jnp.linalg.matrix_rank(ctrb)


def solve_dlyap_doubling(a: Array, q: Array, iters: int = 30) -> Array:
    """Discrete Lyapunov equation P = A' P A + Q by doubling:
    P_{j+1} = P_j + M_j' P_j M_j, M_{j+1} = M_j^2 (converges for stable A).
    Fixed-length scan of small matmuls — vmappable."""

    def body(carry, _):
        p, m = carry
        return (p + m.T @ p @ m, m @ m), None

    (p, _), _ = jax.lax.scan(body, (q, a), None, length=iters)
    return p

"""L4 — single-shooting MPC cost (the Python reference's solver target).

Reference (``duffing.py:540-581``): roll ``z+ = [A B][z;u] + d`` over
Np steps (Nc decision moves, tail holds the last move), cost
``100 * sum ||y - r||^2 + 1e-4 * sum u^2`` with
``y = C z`` (Duffing/RBF) or ``y = z`` vs an *encoded* reference
(``vanderpol.py:456-475`` lifted tracking).

The cost is a convex quadratic in the input sequence; the closed-loop
engine solves the *equivalent condensed QP* exactly (SURVEY §7.4). This
module keeps the shooting form for (a) parity calibration against the
scipy L-BFGS-B oracle and (b) gradient-based solves of the same objective
(:func:`solve_shooting_pgd` — projected gradient with jax.grad, a
TPU-friendly stand-in for scipy.optimize.minimize with box bounds).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..types import LinearModel


def shooting_cost(
    u_seq: Array,  # (Nc, m)
    model: LinearModel,
    z0: Array,  # (nz,)
    r: Array,  # (Np, py)
    np_horizon: int,
    track_lifted: bool = False,
    q_weight: float = 100.0,
    r_weight: float = 1e-4,
    d: Optional[Array] = None,
) -> Array:
    """The reference's cost function, vectorized via ``lax.scan``."""
    nc = u_seq.shape[0]
    # tail holds the last input (duffing.py:561-570)
    tail = jnp.broadcast_to(u_seq[-1], (np_horizon - nc, u_seq.shape[1]))
    u_full = jnp.concatenate([u_seq, tail], axis=0)
    offset = jnp.zeros_like(z0) if d is None else d

    def body(z, inp):
        u, r_k = inp
        z_next = model.A @ z + model.B @ u + offset
        y = z_next if track_lifted else model.C @ z_next
        err = y - r_k
        return z_next, jnp.sum(err * err)

    _, errs = jax.lax.scan(body, z0, (u_full, r))
    return q_weight * jnp.sum(errs) + r_weight * jnp.sum(u_seq * u_seq)


class PGDConfig(NamedTuple):
    iters: int = 200
    lr: float = 0.05
    momentum: float = 0.9  # Nesterov


def solve_shooting_pgd(
    model: LinearModel,
    z0: Array,
    r: Array,
    nc: int,
    np_horizon: int,
    lo: Array,
    hi: Array,
    cfg: PGDConfig = PGDConfig(),
    track_lifted: bool = False,
    q_weight: float = 100.0,
    r_weight: float = 1e-4,
    u_init: Optional[Array] = None,
) -> Array:
    """Projected (Nesterov-accelerated) gradient descent on the shooting
    cost with box bounds — fixed iteration count, fully jittable/vmappable."""
    m = model.B.shape[-1]
    u = jnp.zeros((nc, m), dtype=z0.dtype) if u_init is None else u_init
    grad_fn = jax.grad(
        lambda uu: shooting_cost(
            uu, model, z0, r, np_horizon, track_lifted, q_weight, r_weight
        )
    )

    def body(carry, _):
        u, v = carry
        g = grad_fn(u + cfg.momentum * v)
        v_new = cfg.momentum * v - cfg.lr * g
        u_new = jnp.clip(u + v_new, lo, hi)
        return (u_new, u_new - u), None

    (u, _), _ = jax.lax.scan(body, (u, jnp.zeros_like(u)), None, length=cfg.iters)
    return u

"""Local-linearization baseline (autodiff replaces symbolic Jacobians).

Reference capability (``duffing.py:615-622, 691-706``: sympy
``Jacobian('x1 x2 uu', [...])`` + subs; ``Revise_2/Koopman_update.m:169-177``
MATLAB ``jacobian``): linearize the true nonlinear dynamics at an operating
point to get a locally-linear MPC model, used as the comparison baseline
against the Koopman lift.

TPU-first: the Jacobian comes from ``jax.jacfwd`` on the plant's vector
field / step map — exact to machine precision, jittable, vmappable over
batches of linearization points (no symbolic toolbox involved).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..types import LinearModel
from .base import System, make_step


def linearize_continuous(
    system: System, x: Array, u: Array, theta: Any = None
) -> Tuple[Array, Array]:
    """(A_c, B_c) = (df/dx, df/du) of the continuous vector field at (x, u)."""
    if system.f is None:
        raise ValueError("system has no continuous vector field")
    theta = system.theta0 if theta is None else theta
    t0 = jnp.asarray(0.0, dtype=x.dtype)
    a_c = jax.jacfwd(lambda xx: system.f(t0, xx, u, theta))(x)
    b_c = jax.jacfwd(lambda uu: system.f(t0, x, uu, theta))(u)
    return a_c, b_c


def linearize_discrete(
    system: System,
    x: Array,
    u: Array,
    h: float = 0.05,
    theta: Any = None,
    integrator: str = "rk4",
) -> LinearModel:
    """Exact Jacobian of the one-step map ``x+ = F(x, u)`` (RK4 chain or
    discrete map) at (x, u): ``A = dF/dx``, ``B = dF/du``, ``C = I`` —
    directly usable by the condensed-QP engine as a locally-linear MPC
    model (the reference's baseline controller)."""
    theta = system.theta0 if theta is None else theta
    step = make_step(system, h, integrator)
    a = jax.jacfwd(lambda xx: step(xx, u, theta))(x)
    b = jax.jacfwd(lambda uu: step(x, uu, theta))(u)
    c = jnp.eye(system.n, dtype=x.dtype)
    return LinearModel(A=a, B=b, C=c)


def affine_residual(
    system: System,
    x: Array,
    u: Array,
    model: LinearModel,
    h: float = 0.05,
    theta: Any = None,
    integrator: str = "rk4",
) -> Array:
    """Affine offset d = F(x0, u0) - A x0 - B u0 so the local model predicts
    ``x+ ≈ A x + B u + d`` exactly at the linearization point."""
    theta = system.theta0 if theta is None else theta
    step = make_step(system, h, integrator)
    return step(x, u, theta) - model.A @ x - model.B @ u


def batch_linearize_discrete(system, xs, us, h=0.05, theta=None, integrator="rk4"):
    """vmapped linearization over a batch of operating points."""
    return jax.vmap(
        lambda x, u: linearize_discrete(system, x, u, h, theta, integrator)
    )(xs, us)

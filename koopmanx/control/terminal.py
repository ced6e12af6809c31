"""L4 — terminal-cost synthesis & stability monitors (Revise_2 capability).

The reference re-certifies stability every control step by solving an
LMI/SDP with YALMIP (``Revise_2/Koopman_update.m:314-381``): find
``gamma, Q1, Y1`` s.t. the quasi-infinite-horizon decrease LMI holds, then
``K = Y1/Q1``, ``P = gamma inv(Q1)``, and inject ``C P C'`` (or full P)
into the terminal block of the QP cost.

No TPU SDP solver exists, and the LMI in question is exactly the (bounded-
real reformulation of the) discrete Riccati inequality — its analytic
central solution is the DARE (SURVEY §7.4 mitigation (a)). The TPU-native
default therefore synthesizes the terminal pair per step from the DARE:

  P = DARE(A, B, Q_lift, R),  K = -dlqr(A, B, Q_lift, R)

which is batchable over 10^4 scenarios via ``vmap`` of
:func:`koopmanx.control.dare.solve_dare_doubling`. An LMI-faithful
ADMM/SCS-style conic path is provided in :mod:`koopmanx.control.lmi` for
parity experiments.

The per-step monitors the reference plots are reproduced as pure functions:
  - one-step prediction residual eps = ||x+ - C (A z + B u)||
    (Revise_2/Koopman_update.m:253)
  - Lyapunov value V = psi(x - r)' P psi(x - r) and decrease
    (Revise_2/Koopman_update.m:382-385, 510-518)
  - gamma margin and invariant-ellipsoid radius (Revise_2:385, 521-535)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from ..types import LinearModel
from .dare import dlqr_gain, solve_dare_doubling


class TerminalCert(NamedTuple):
    p: Array  # terminal cost (nz, nz)
    k: Array  # terminal controller gain (m, nz), u = -K z
    gamma: Array  # ellipsoid level (scalar) — trace-based proxy


def synthesize_terminal(
    model: LinearModel, q_lift: Array, r: Array, iters: int = 30
) -> TerminalCert:
    """DARE-based terminal certificate for the current (online-updated)
    model. Replaces the per-step YALMIP solvesdp call; for a stabilizable
    (A, B) the DARE P satisfies the same decrease LMI with equality."""
    p = solve_dare_doubling(model.A, model.B, q_lift, r, iters=iters)
    k = dlqr_gain(model.A, model.B, q_lift, r, p)
    gamma = jnp.trace(p)
    return TerminalCert(p=p, k=k, gamma=gamma)


def prediction_residual(
    model: LinearModel, z: Array, u: Array, x_next: Array
) -> Array:
    """eps = ||x+ - C (A z + B u)|| (Revise_2/Koopman_update.m:253)."""
    z_pred = model.A @ z + model.B @ u
    return jnp.linalg.norm(x_next - model.C @ z_pred)


def lifted_residual(model: LinearModel, z: Array, u: Array, z_next: Array) -> Array:
    """||z+ - (A z + B u)|| — the lifted one-step model error."""
    return jnp.linalg.norm(z_next - (model.A @ z + model.B @ u))


def lyapunov_value(p: Array, psi_err: Array) -> Array:
    """V = psi(x - r)' P psi(x - r) (Revise_2/Koopman_update.m:382-384)."""
    return psi_err @ p @ psi_err


def ellipsoid_radius(p: Array, c: Array, gamma: Array) -> Array:
    """Radius matrix chol(C P C' / gamma) whose unit-ball preimage is the
    invariant-ellipsoid section plotted at Revise_2/Koopman_update.m:521-535."""
    cpc = c @ p @ c.T
    return jnp.linalg.cholesky(cpc / gamma)


def compensator_term(
    model: LinearModel, k: Array, z: Array, u: Array, z_next: Array
) -> Array:
    """K (zeta - (A z + B u)) — the residual-feedback compensator the
    reference logs per step (Revise_2/Koopman_update.m:251)."""
    return k @ (z_next - (model.A @ z + model.B @ u))


def gamma_margin(
    p: Array, c: Array, gamma: Array, psi_err: Array, x_err: Array
) -> Array:
    """gamma - (V - x_err' C P C' x_err) — the invariant-set margin series
    (Revise_2/Koopman_update.m:385)."""
    v = psi_err @ p @ psi_err
    cpc = c @ p @ c.T
    return gamma - (v - x_err @ cpc @ x_err)

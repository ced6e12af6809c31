"""LMI terminal-cost synthesis — the Revise_2 SDP, solved TPU-natively.

The reference re-certifies stability every control step by solving, with
YALMIP (``Revise_2/Koopman_update.m:314-357``):

  find   gamma, X1 (m x m), Q1 (N x N), Y1 (m x N)
  s.t.   LMI0 = [X1 Y1; Y1' Q1]                      >= 0
         LMI1 = [1 psi'; psi Q1]                     >= 0.01 I
         LMI2 = [Q1          (A Q1 + B Y1)'  (sqrtQ Q1)'  (sqrtR Y1)';
                 A Q1+B Y1    Q1              0            0;
                 sqrtQ Q1     0               gamma I      0;
                 sqrtR Y1     0               0            gamma I ]  >= 0
         Q1 >= 0,  X1(j,j) <= u_max^2
  min    gamma

then recovers ``K = Y1/Q1``, ``P = gamma inv(Q1)``
(``Revise_2/Koopman_update.m:361-381``). LMI2 is the Schur-complement form
of the quasi-infinite-horizon decrease condition; LMI1 anchors
``psi = liftFun(x - r)`` inside the invariant ellipsoid; LMI0/X1 encode the
input bound on the terminal controller.

No off-the-shelf SDP solver runs on TPU. This module solves the problem as
a smooth penalized program — differentiable eigenvalue penalties

  pen(M) = sum relu(margin - eig_i(M))^2     (via jnp.linalg.eigh)

minimized over (gamma, X1, Q1, Y1) with Adam at a fixed iteration count
(branch-free, jittable, vmappable over scenario batches), warm-started from
the DARE solution (which satisfies the decrease LMI with equality, so the
penalty starts near-feasible). The production default remains the direct
DARE synthesis (:mod:`koopmanx.control.terminal`); this path exists for
Revise_2 parity and for genuinely constrained terminal sets.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..types import LinearModel
from ..ops.linalg import spd_inverse
from .dare import dlqr_gain, solve_dare_doubling, solve_dlyap_doubling


class LMIResult(NamedTuple):
    p: Array  # terminal cost P = gamma inv(Q1)
    k: Array  # terminal gain K = Y1 inv(Q1)
    gamma: Array
    q1: Array
    feasibility: Array  # max PSD violation across the LMIs (<=0 feasible)


class _Vars(NamedTuple):
    gamma_raw: Array  # gamma = softplus(gamma_raw)
    x1: Array
    q1_raw: Array  # Q1 = sym(q1_raw)
    y1: Array


def _sym(m: Array) -> Array:
    return 0.5 * (m + jnp.swapaxes(m, -1, -2))


def _eig_penalty(m: Array, margin: float = 0.0) -> Array:
    """sum relu(margin - lambda_i)^2 — zero iff M >= margin*I."""
    w = jnp.linalg.eigvalsh(_sym(m))
    return jnp.sum(jax.nn.relu(margin - w) ** 2)


def _min_eig(m: Array) -> Array:
    return jnp.min(jnp.linalg.eigvalsh(_sym(m)))


def _build_lmis(
    v: _Vars,
    a: Array,
    b: Array,
    sqrt_q: Array,
    sqrt_r: Array,
    psi: Array,
    u_max: float,
):
    nlift = a.shape[-1]
    m = b.shape[-1]
    gamma = jax.nn.softplus(v.gamma_raw)
    q1 = _sym(v.q1_raw)
    x1 = _sym(v.x1)
    y1 = v.y1
    dtype = a.dtype

    lmi0 = jnp.block([[x1, y1], [y1.T, q1]])
    lmi1 = jnp.block(
        [[jnp.ones((1, 1), dtype), psi[None, :]], [psi[:, None], q1]]
    )
    aq_by = a @ q1 + b @ y1
    z_nn = jnp.zeros((nlift, nlift), dtype)
    z_nm = jnp.zeros((nlift, m), dtype)
    lmi2 = jnp.block(
        [
            [q1, aq_by.T, (sqrt_q @ q1).T, (sqrt_r @ y1).T],
            [aq_by, q1, z_nn, z_nm],
            [sqrt_q @ q1, z_nn, gamma * jnp.eye(nlift, dtype=dtype), z_nm],
            [(sqrt_r @ y1), z_nm.T, z_nm.T, gamma * jnp.eye(m, dtype=dtype)],
        ]
    )
    input_slack = u_max**2 - jnp.diag(x1)  # >= 0 required
    return gamma, q1, x1, y1, lmi0, lmi1, lmi2, input_slack


def solve_terminal_lmi(
    model: LinearModel,
    q_lift: Array,
    r: Array,
    psi: Array,
    u_max: float = 2.0,
    iters: int = 300,
    lr: float = 5e-2,
    penalty: float = 1e3,
    margin: float = 1e-2,
    lyapunov_correct: bool = True,
) -> LMIResult:
    """Solve the Revise_2 terminal LMI for the current model.

    ``psi`` is the lifted tracking error ``liftFun(x - r)``
    (Revise_2/Koopman_update.m:331). Fixed-iteration Adam on
    ``gamma + penalty * (PSD violations)``; warm start from the DARE pair.

    With ``lyapunov_correct`` (default) the returned ``P`` is re-derived
    from the solved gain ``K`` via the exact discrete Lyapunov equation
    ``P = (A+BK)' P (A+BK) + Q + K'RK`` — the decrease certificate then
    holds *by construction* (the penalized program's small residual PSD
    violations would otherwise be amplified by ``inv(Q1)``), and ``gamma``
    is lifted to cover the anchor: ``gamma = max(gamma, psi' P psi)``.
    """
    a, b = model.A, model.B
    nlift = a.shape[-1]
    m = b.shape[-1]
    dtype = a.dtype
    r_mat = jnp.atleast_2d(jnp.asarray(r, dtype))
    sqrt_q = jnp.sqrt(jnp.maximum(q_lift, 0.0)) if q_lift.ndim == 2 else jnp.diag(
        jnp.sqrt(jnp.maximum(q_lift, 0.0))
    )
    # matrix sqrt of a diagonal-ish Q_lift: the reference uses sqrtm of a
    # diagonal matrix (Revise_2:340), i.e. elementwise sqrt on the diagonal
    sqrt_q = jnp.where(
        jnp.eye(nlift, dtype=bool), jnp.sqrt(jnp.maximum(q_lift, 0.0)), 0.0
    ) if q_lift.ndim == 2 else sqrt_q
    sqrt_r = jnp.sqrt(r_mat)

    # ---- DARE warm start: P satisfies the decrease LMI with equality ----
    p0 = solve_dare_doubling(a, b, q_lift, r_mat)
    k0 = -dlqr_gain(a, b, q_lift, r_mat, p0)  # u = K z convention (ref :361)
    gamma0 = jnp.maximum(psi @ p0 @ psi, 1.0) * 2.0
    q1_0 = gamma0 * spd_inverse(p0, eps=1e-6)
    y1_0 = k0 @ q1_0
    x1_0 = jnp.diag(jnp.minimum(jnp.diag(y1_0 @ (spd_inverse(q1_0) @ y1_0.T)) * 1.5 + 1e-3, u_max**2 * 0.9))
    # stable softplus^-1: y + log(1 - exp(-y)) (≈ y for large y)
    g0 = jnp.maximum(gamma0, 1e-3)
    g_raw0 = g0 + jnp.log1p(-jnp.exp(-g0))
    v0 = _Vars(gamma_raw=g_raw0, x1=x1_0, q1_raw=q1_0, y1=y1_0)

    def objective(v: _Vars) -> Array:
        gamma, q1, x1, y1, lmi0, lmi1, lmi2, slack = _build_lmis(
            v, a, b, sqrt_q, sqrt_r, psi, u_max
        )
        pen = (
            _eig_penalty(lmi0)
            + _eig_penalty(lmi1, margin)
            + _eig_penalty(lmi2)
            + _eig_penalty(q1, 1e-6)
            + jnp.sum(jax.nn.relu(-slack) ** 2)
        )
        return gamma + penalty * pen

    opt = optax.adam(lr)

    def step(carry, _):
        v, opt_state = carry
        g = jax.grad(objective)(v)
        updates, opt_state = opt.update(g, opt_state)
        v = optax.apply_updates(v, updates)
        return (v, opt_state), None

    (v, _), _ = jax.lax.scan(step, (v0, opt.init(v0)), None, length=iters)

    gamma, q1, x1, y1, lmi0, lmi1, lmi2, slack = _build_lmis(
        v, a, b, sqrt_q, sqrt_r, psi, u_max
    )
    feas = jnp.maximum(
        jnp.maximum(-_min_eig(lmi0), -_min_eig(lmi2)),
        jnp.maximum(margin - _min_eig(lmi1), jnp.max(jax.nn.relu(-slack))),
    )
    q1_inv = spd_inverse(q1, eps=1e-9)
    k_out = y1 @ q1_inv
    p_out = gamma * q1_inv
    if lyapunov_correct:
        acl = a + b @ k_out
        q_cl = q_lift + k_out.T @ r_mat @ k_out
        p_out = solve_dlyap_doubling(acl, q_cl)
        gamma = jnp.maximum(gamma, psi @ p_out @ psi * 1.001)
        # Re-assert the input-bound certificate against the RETURNED pair:
        # the Schur-minimal X1 for (Q1_eff = gamma P^{-1}, Y1 = K Q1_eff)
        # is K Q1_eff K' = gamma K P^{-1} K', and LMI0 + the X1(j,j)
        # bound (Revise_2/Koopman_update.m:350-353) require its diagonal
        # <= u_max^2. The correction replaces P (and lifts gamma), so the
        # pre-correction X1 no longer certifies — fold any violation into
        # the reported feasibility residual.
        x1_min_diag = gamma * jnp.diag(
            k_out @ (spd_inverse(p_out, eps=1e-9) @ k_out.T)
        )
        feas = jnp.maximum(
            feas, jnp.max(jax.nn.relu(x1_min_diag - u_max**2))
        )
    return LMIResult(
        p=p_out,
        k=k_out,
        gamma=gamma,
        q1=q1,
        feasibility=feas,
    )

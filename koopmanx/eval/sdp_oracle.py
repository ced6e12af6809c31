"""Ground-truth oracle for the Revise_2 terminal SDP — test-only.

The reference solves, per step, with YALMIP (``Revise_2/Koopman_update.m:
314-357``):

  min gamma  s.t.  LMI0 = [X1 Y1; Y1' Q1]              >= 0
                   LMI1 = [1 psi'; psi Q1]             >= 0
                   LMI2 = [Q1        (A Q1 + B Y1)'  (sqrtQ Q1)'  (sqrtR Y1)'
                           A Q1+B Y1  Q1              0           0
                           sqrtQ Q1   0               gamma I     0
                           sqrtR Y1   0               0           gamma I] >= 0
                   Q1 >= 0,  X1(j,j) <= u_max^2

This module provides the *exact* optimum of that SDP (no SDP solver
needed) plus a feasibility checker for candidate solutions, both in plain
NumPy float64 and firewalled from the production engine exactly like
:mod:`koopmanx.eval.oracle` — nothing here is imported by anything under
``koopmanx`` outside tests/tools.

Why the optimum is analytic (Kothare, Balakrishnan & Morari 1996, the LMI
this is lifted from): substituting ``P = gamma Q1^{-1}``, ``K = Y1 Q1^{-1}``
and taking Schur complements turns the constraints into

  LMI2  <=>  (A+BK)' P (A+BK) - P + Q + K'RK  <= 0      (decrease)
  LMI1  <=>  psi' P psi <= gamma                         (anchor in ellipsoid)
  LMI0  <=>  X1 >= K Q1 K'   (so min X1(j,j) = gamma (K P^{-1} K')_{jj})

For ANY (P, K) satisfying the decrease inequality, V(x) = x'Px telescopes
to an upper bound on the infinite-horizon cost under the policy u = Kx,
which is itself lower-bounded by the optimal cost:  P >= P_dare.  Hence
gamma >= psi' P psi >= psi' P_dare psi, and the bound is ATTAINED by
(P, K) = (P_dare, K_dare), gamma* = psi' P_dare psi (LMI2 holds with
equality — still feasible for the non-strict inequality).  Whenever the
input-bound row is slack at that point (gamma* (K P_dare^{-1} K')_{jj}
<= u_max^2), gamma* is therefore the exact SDP optimum.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import numpy as np
import scipy.linalg


class SDPSolution(NamedTuple):
    gamma: float  # numerically-optimal gamma of the full SDP
    q1: np.ndarray
    y1: np.ndarray
    x1: np.ndarray
    gap_bound: float  # barrier duality-gap bound nu/t at termination
    newton_decrements: list  # per-outer-iteration final Newton decrement


class SDPOptimum(NamedTuple):
    gamma: float  # the exact SDP optimum (when input_bound_slack)
    p: np.ndarray  # P_dare
    k: np.ndarray  # K_dare in the u = K z convention (ref :361)
    input_bound_slack: bool  # gamma* is only certified optimal when True


def terminal_sdp_optimum(
    a: np.ndarray,
    b: np.ndarray,
    q: np.ndarray,
    r: np.ndarray,
    psi: np.ndarray,
    u_max: float = np.inf,
) -> SDPOptimum:
    """Exact optimum of the Revise_2 terminal SDP (see module docstring).

    Uses scipy's ``solve_discrete_are`` (float64 LAPACK, CPU) as the
    independent ground-truth Riccati solve — a different algorithm and
    library from the production doubling iteration in
    :mod:`koopmanx.control.dare`.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    q = np.asarray(q, np.float64)
    r = np.atleast_2d(np.asarray(r, np.float64))
    psi = np.asarray(psi, np.float64)
    # solve_discrete_are requires detectability of (A, Q^{1/2}); the
    # Revise_2 Q_lift is rank-deficient (diag([q q 0 ...])), so regularize
    # by a tiny eps and Richardson-refine with the exact Riccati map.
    eps = 1e-9 * max(np.trace(q), 1.0)
    p = scipy.linalg.solve_discrete_are(a, b, q + eps * np.eye(a.shape[0]), r)
    for _ in range(50):  # fixed-point polish on the UNregularized equation
        btpb = r + b.T @ p @ b
        p_new = a.T @ p @ a - a.T @ p @ b @ np.linalg.solve(btpb, b.T @ p @ a) + q
        p_new = 0.5 * (p_new + p_new.T)
        if np.max(np.abs(p_new - p)) < 1e-12 * max(np.max(np.abs(p)), 1.0):
            p = p_new
            break
        p = p_new
    k_lqr = np.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)
    k = -k_lqr  # u = K z convention
    gamma = float(psi @ p @ psi)
    slack = True
    if np.isfinite(u_max) and gamma > 0:
        x1_min = gamma * np.diag(k @ np.linalg.solve(p, k.T))
        slack = bool(np.all(x1_min <= u_max**2 + 1e-9))
    return SDPOptimum(gamma=gamma, p=p, k=k, input_bound_slack=slack)


def check_reference_lmis(
    a: np.ndarray,
    b: np.ndarray,
    q: np.ndarray,
    r: np.ndarray,
    psi: np.ndarray,
    u_max: float,
    gamma: float,
    p: np.ndarray,
    k: np.ndarray,
    x1: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Verify a candidate (gamma, P, K) against the REFERENCE's LMI set.

    Maps back to the YALMIP variables via ``Q1 = gamma P^{-1}``,
    ``Y1 = K Q1`` and, unless given, the Schur-minimal
    ``X1 = Y1 Q1^{-1} Y1'``. Returns the minimum eigenvalue of each LMI
    (>= 0 means feasible) and the input-bound slack
    ``min_j (u_max^2 - X1(j,j))``.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    q = np.asarray(q, np.float64)
    r = np.atleast_2d(np.asarray(r, np.float64))
    psi = np.asarray(psi, np.float64)
    p = np.asarray(p, np.float64)
    k = np.atleast_2d(np.asarray(k, np.float64))
    gamma = float(gamma)
    nlift = a.shape[0]
    m = b.shape[1]

    q1 = gamma * np.linalg.inv(p)
    q1 = 0.5 * (q1 + q1.T)
    y1 = k @ q1
    if x1 is None:
        x1 = y1 @ np.linalg.solve(q1, y1.T)
        x1 = 0.5 * (x1 + x1.T)

    sqrt_q = np.diag(np.sqrt(np.maximum(np.diag(q), 0.0)))
    sqrt_r = scipy.linalg.sqrtm(r).real

    lmi0 = np.block([[x1, y1], [y1.T, q1]])
    lmi1 = np.block([[np.ones((1, 1)), psi[None, :]], [psi[:, None], q1]])
    aq_by = a @ q1 + b @ y1
    z_nn = np.zeros((nlift, nlift))
    z_nm = np.zeros((nlift, m))
    lmi2 = np.block(
        [
            [q1, aq_by.T, (sqrt_q @ q1).T, (sqrt_r @ y1).T],
            [aq_by, q1, z_nn, z_nm],
            [sqrt_q @ q1, z_nn, gamma * np.eye(nlift), z_nm],
            [sqrt_r @ y1, z_nm.T, z_nm.T, gamma * np.eye(m)],
        ]
    )
    return {
        "lmi0_min_eig": float(np.linalg.eigvalsh(0.5 * (lmi0 + lmi0.T)).min()),
        "lmi1_min_eig": float(np.linalg.eigvalsh(0.5 * (lmi1 + lmi1.T)).min()),
        "lmi2_min_eig": float(np.linalg.eigvalsh(0.5 * (lmi2 + lmi2.T)).min()),
        "q1_min_eig": float(np.linalg.eigvalsh(q1).min()),
        "input_bound_slack": float((u_max**2 - np.diag(x1)).min()),
        "lmi2_scale": float(np.abs(lmi2).max()),
    }


# ---------------------------------------------------------------------------
# Full numeric SDP solve (binding-input-bound ground truth)
# ---------------------------------------------------------------------------
#
# When the input bound BINDS, gamma* = psi' P_dare psi is only a LOWER bound
# on the SDP optimum and the analytic shortcut above cannot certify the
# production solver's detuned-DARE gamma. This solves the full SDP
#
#   min gamma  over (gamma, X1, Q1, Y1)
#   s.t. LMI0, LMI1, LMI2 >= 0, Q1 >= 0, X1(j,j) <= u_max^2
#
# numerically: log-det barrier path following (the textbook interior-point
# method for SDPs — Boyd & Vandenberghe ch. 11) with damped Newton steps.
# The objective is linear and every constraint enters through a log-det /
# log barrier, so the centering problems are self-concordant and Newton
# converges with the standard guarantees; the duality-gap bound at barrier
# parameter t is nu/t with nu = total barrier degree (sum of LMI sizes +
# number of scalar inequalities). Gradients/Hessians are exact via jax
# autodiff on host CPU float64 (the variable count is ~70 for the Revise_2
# sizes, so the dense Newton solve is trivial). Test-only, like the rest of
# this module. Reference objective: min gamma,
# /root/reference/Revise_2/Koopman_update.m:355.


def _sym_indices(n: int):
    iu = np.triu_indices(n)
    return iu


def terminal_sdp_solve(
    a: np.ndarray,
    b: np.ndarray,
    q: np.ndarray,
    r: np.ndarray,
    psi: np.ndarray,
    u_max: float,
    mu: float = 5.0,
    gap_tol: float = 1e-7,
    newton_tol: float = 1e-11,
    max_newton: int = 80,
) -> SDPSolution:
    """Numeric optimum of the FULL Revise_2 terminal SDP (see block comment).

    Returns gamma with a duality-gap certificate ``gap_bound`` (the true
    optimum lies in [gamma - gap_bound, gamma]). Self-check: on a slack
    input bound this must reproduce ``terminal_sdp_optimum``'s analytic
    gamma* (gated in tests/test_lmi.py).
    """
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    cpu = jax.local_devices(backend="cpu")[0]

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    q = np.asarray(q, np.float64)
    r = np.atleast_2d(np.asarray(r, np.float64))
    psi = np.asarray(psi, np.float64)
    nlift, m = a.shape[0], b.shape[1]
    sqrt_q = np.diag(np.sqrt(np.maximum(np.diag(q), 0.0)))
    sqrt_r = scipy.linalg.sqrtm(r).real

    iu_x = _sym_indices(m)
    iu_q = _sym_indices(nlift)
    nx, nq = iu_x[0].size, iu_q[0].size

    def unpack(v):
        gamma = v[0]
        x1 = jnp.zeros((m, m), v.dtype).at[iu_x].set(v[1 : 1 + nx])
        x1 = x1 + jnp.triu(x1, 1).T
        q1 = jnp.zeros((nlift, nlift), v.dtype).at[iu_q].set(
            v[1 + nx : 1 + nx + nq]
        )
        q1 = q1 + jnp.triu(q1, 1).T
        y1 = v[1 + nx + nq :].reshape(m, nlift)
        return gamma, x1, q1, y1

    sq = jnp.asarray(sqrt_q)
    sr = jnp.asarray(sqrt_r)
    aj = jnp.asarray(a)
    bj = jnp.asarray(b)
    psij = jnp.asarray(psi)

    def lmis(v):
        gamma, x1, q1, y1 = unpack(v)
        lmi0 = jnp.block([[x1, y1], [y1.T, q1]])
        lmi1 = jnp.block(
            [[jnp.ones((1, 1), v.dtype), psij[None, :]], [psij[:, None], q1]]
        )
        aq_by = aj @ q1 + bj @ y1
        z_nn = jnp.zeros((nlift, nlift), v.dtype)
        z_nm = jnp.zeros((nlift, m), v.dtype)
        lmi2 = jnp.block(
            [
                [q1, aq_by.T, (sq @ q1).T, (sr @ y1).T],
                [aq_by, q1, z_nn, z_nm],
                [sq @ q1, z_nn, gamma * jnp.eye(nlift, dtype=v.dtype), z_nm],
                [sr @ y1, z_nm.T, z_nm.T, gamma * jnp.eye(m, dtype=v.dtype)],
            ]
        )
        slack = u_max**2 - jnp.diag(x1)
        return gamma, lmi0, lmi1, lmi2, q1, slack

    def barrier(v, t):
        gamma, lmi0, lmi1, lmi2, q1, slack = lmis(v)
        ld = (
            jnp.linalg.slogdet(lmi0)[1]
            + jnp.linalg.slogdet(lmi1)[1]
            + jnp.linalg.slogdet(lmi2)[1]
            + jnp.linalg.slogdet(q1)[1]
            + jnp.sum(jnp.log(slack))
        )
        return t * gamma - ld

    def min_eig_all(v):
        _, lmi0, lmi1, lmi2, q1, slack = lmis(v)
        return min(
            float(np.linalg.eigvalsh(np.asarray(x)).min())
            for x in (lmi0, lmi1, lmi2, q1)
        ), float(np.asarray(slack).min())

    with jax.default_device(cpu):
        grad_f = jax.jit(jax.grad(barrier))
        hess_f = jax.jit(jax.hessian(barrier))

        # ---- strictly feasible start: an R-detuned DARE candidate with
        # inflated gamma and a mid-box X1 (the DARE point itself sits ON
        # the LMI2 boundary — decrease equality — so it cannot seed an
        # interior method) ----
        v0 = None
        for s in 2.0 ** np.arange(1, 16):
            p_s = scipy.linalg.solve_discrete_are(
                a, b, q + 1e-9 * max(np.trace(q), 1.0) * np.eye(nlift),
                s * r,
            )
            k_s = -np.linalg.solve(s * r + b.T @ p_s @ b, b.T @ p_s @ a)
            gamma_s = float(psi @ p_s @ psi) * 1.5 + 1e-3
            q1_s = gamma_s * np.linalg.inv(p_s)
            q1_s = 0.5 * (q1_s + q1_s.T)
            y1_s = k_s @ q1_s
            x1_lo = y1_s @ np.linalg.solve(q1_s, y1_s.T)
            if np.any(np.diag(x1_lo) >= u_max**2):
                continue  # gain still too hot for a strict input bound
            x1_s = 0.5 * (x1_lo + u_max**2 * np.eye(m))
            cand = np.concatenate(
                [[gamma_s], x1_s[iu_x], q1_s[iu_q], y1_s.ravel()]
            )
            me, sl = min_eig_all(jnp.asarray(cand))
            if me > 1e-10 and sl > 1e-10:
                v0 = cand
                break
        if v0 is None:
            raise RuntimeError(
                "no strictly feasible start found (input bound may be "
                "infeasible for every stabilizing gain)"
            )

        nu = (m + nlift) + (nlift + 1) + (3 * nlift + m) + nlift + m
        v = jnp.asarray(v0)
        t = max(nu / max(abs(float(v[0])), 1.0), 1.0)
        decs = []
        while True:
            # ---- damped Newton centering at this t ----
            lam2 = np.inf
            for _ in range(max_newton):
                g = np.asarray(grad_f(v, t))
                h = np.asarray(hess_f(v, t))
                # tiny Tikhonov: exact Hessians of log-det barriers are PD
                # on the interior but can be near-singular at the path end
                dx = np.linalg.solve(
                    h + 1e-12 * np.eye(h.shape[0]) * max(1.0, np.abs(h).max()),
                    -g,
                )
                lam2 = float(-g @ dx)
                if lam2 / 2 < newton_tol:
                    break
                alpha = 1.0
                f0 = float(barrier(v, t))
                for _ in range(60):
                    v_try = v + alpha * jnp.asarray(dx)
                    me, sl = min_eig_all(v_try)
                    if me > 0 and sl > 0 and float(
                        barrier(v_try, t)
                    ) < f0 - 1e-4 * alpha * lam2:
                        v = v_try
                        break
                    alpha *= 0.5
                else:
                    break  # line search stalled — accept current center
            decs.append(lam2)
            if nu / t < gap_tol * max(abs(float(v[0])), 1.0):
                break
            t *= mu

        gamma, x1, q1, y1 = unpack(v)
        return SDPSolution(
            gamma=float(gamma),
            q1=np.asarray(q1),
            y1=np.asarray(y1),
            x1=np.asarray(x1),
            gap_bound=float(nu / t),
            newton_decrements=decs,
        )

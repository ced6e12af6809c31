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

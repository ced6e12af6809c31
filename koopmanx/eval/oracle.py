"""Float64 NumPy oracle of the reference semantics (test fixture engine).

The reference publishes no numbers (BASELINE.md), so correctness is defined
by *numerical parity with its algorithms*. This module re-states those
algorithms (from their math, in plain NumPy, independent of the JAX
implementation) so tests can compare the TPU engine against a slow,
obviously-correct implementation:

  - RK4 chains exactly as ``data_generate.py:24-30`` (and the MATLAB k1-k4
    variant, ``Revise_2/Koopman_update.m:21-25``);
  - EDMD pinv fits as ``duffing.py:167-177`` / ``Tank_System.m:92-99``;
  - rank-one RLS recursions as ``duffing.py:927-953``;
  - condensed prediction matrices via the explicit matrix-power loops of
    ``Tank_System.m:129-144``;
  - box/inequality QPs via scipy (quadprog semantics stand-in).

Nothing here is imported by the production engine.
"""
from __future__ import annotations

import numpy as np


def rk4(f, h, matlab_k4: bool = False):
    def step(x, u):
        k1 = f(x, u)
        k2 = f(x + 0.5 * h * k1, u)
        k3 = f(x + 0.5 * h * k2, u)
        k4 = f(x + h * (k1 if matlab_k4 else k3), u)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    return step


def duffing_f(d=-0.5, k1=1.0, k3=-1.0):
    return lambda x, u: np.array([x[1], d * x[1] + k1 * x[0] + k3 * x[0] ** 3 + u[0]])


def vdp_f(a=2.0, b=2.0, c=-10.0, d=-0.8):
    return lambda x, u: np.array(
        [a * x[1], b * x[1] + c * x[0] ** 2 * x[1] + d * x[0] + u[0]]
    )


def tank_step(c=(0.5, 0.4, 0.2, 0.3)):
    c1, c2, c3, c4 = c

    def step(x, u):
        x = np.maximum(x, 0.0)
        s1, s2 = np.sqrt(x[0]), np.sqrt(x[1])
        out = np.array([x[0] - c1 * s1 + c2 * u[0], x[1] + c3 * s1 - c4 * s2])
        return np.maximum(out, 0.0)

    return step


def edmd_pinv(zx, zy, u, x):
    """Column-major reference fit: K = Zy' pinv([Zx'; U']), C = X' pinv(Zx').

    Inputs row-major (S, d); returns (A, B, C)."""
    v = np.concatenate([zx, u], axis=1).T  # (N+m, S)
    k = zy.T @ np.linalg.pinv(v)
    n_lift = zx.shape[1]
    a, b = k[:, :n_lift], k[:, n_lift:]
    c = x.T @ np.linalg.pinv(zx.T)
    return a, b, c


def rls_ab_step(k_a, inv_g, z, u, z_next, lam=1.0):
    v = np.concatenate([z, u])[:, None]  # (d, 1)
    gv = inv_g @ v
    inv_g = (inv_g - (gv @ gv.T) / (lam + float((v.T @ gv).item()))) / lam
    k_a = k_a + z_next[:, None] @ v.T
    return k_a, inv_g


def rls_c_step(bar_x, bar_q, z, x_target, lam=1.0):
    v = z[:, None]
    qv = bar_q @ v
    bar_q = (bar_q - (qv @ qv.T) / (lam + float((v.T @ qv).item()))) / lam
    bar_x = bar_x + x_target[:, None] @ v.T
    return bar_x, bar_q


def prediction_matrices_loop(a, b, c, cy, n_horizon):
    """F1/F2 via the explicit loops of Tank_System.m:129-144."""
    cyc = cy @ c
    py, m = cyc.shape[0], b.shape[1]
    f1 = np.zeros((n_horizon * py, a.shape[0]))
    markov = []
    g = cyc.copy()
    for j in range(n_horizon):
        markov.append(g @ b)  # Cy C A^j B
        g = g @ a
        f1[j * py : (j + 1) * py] = g  # Cy C A^{j+1}
    f2 = np.zeros((n_horizon * py, n_horizon * m))
    for i in range(n_horizon):
        for j in range(i + 1):
            f2[i * py : (i + 1) * py, j * m : (j + 1) * m] = markov[i - j]
    return f1, f2


def condensed_cost(f1, f2, qbar, rbar, z0, yr):
    h = f2.T @ qbar @ f2 + rbar
    h = 0.5 * (h + h.T)
    q = 2.0 * f2.T @ qbar @ (f1 @ z0 - yr)
    return 2.0 * h, q


def solve_qp_scipy(p, q, a, l, u, x0=None):
    """High-accuracy QP oracle via scipy SLSQP/minimize (quadprog stand-in)."""
    from scipy.optimize import LinearConstraint, minimize

    nx = p.shape[0]
    cons = LinearConstraint(a, l, u)
    res = minimize(
        lambda x: 0.5 * x @ p @ x + q @ x,
        np.zeros(nx) if x0 is None else x0,
        jac=lambda x: p @ x + q,
        constraints=[cons],
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12},
    )
    return res.x


def solve_box_qp_scipy(p, q, lo, hi, x0=None):
    from scipy.optimize import minimize

    nx = p.shape[0]
    res = minimize(
        lambda x: 0.5 * x @ p @ x + q @ x,
        np.zeros(nx) if x0 is None else x0,
        jac=lambda x: p @ x + q,
        bounds=[(lo_i, hi_i) for lo_i, hi_i in zip(np.broadcast_to(lo, (nx,)), np.broadcast_to(hi, (nx,)))],
        method="L-BFGS-B",
        options={"maxiter": 1000, "ftol": 1e-15, "gtol": 1e-12},
    )
    return res.x

"""Golden-trajectory parity harness vs the reference semantics.

Reproduces the reference's *exact* experimental protocol in float64 NumPy —
same legacy ``np.random.seed`` streams, same RK4, same encoder weights,
same EDMD pinv fit, same scipy L-BFGS-B MPC solve, same RLS recursions —
to produce oracle trajectories, then the test suite asserts the JAX engine
(fed identical data/weights) matches within tolerance (BASELINE.md
"closed-loop trajectory parity" criterion).

Protocol being replicated (all /root/reference/duffing.py):
  - data: ``np.random.seed(101)``; ``u0 = 4*rand(N, NT) - 2``;
    ``x0 = 4*rand(n, NT) - 2`` (data_generate.py:33-41), RK4 h=0.05,
    trajectory-major reorder (data_generate.py:63-78);
  - EDMD: ``K = Phi_Y pinv([Phi_X; U])``, ``C = X pinv(Phi_X)`` (:167-177);
  - MPC: L-BFGS-B on the Np=Nc=10 shooting cost, bounds ±2, zero start
    (:776-778 — pastRes is never updated, so every solve starts at 0);
  - plant: RK4 Duffing from x0=[-2,-2] (:650);
  - online update: RLS on [A B] (init 1e4 I) and C (init 100 I), pairing
    the NEXT state with the current lift (:927-953);
  - the i>100 parameter switch in this script is inert (SURVEY §2.1).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from . import oracle


def generate_duffing_data(
    seed: int = 101, n_step: int = 100, n_traj: int = 100
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Replicate data_generate.duffing_generate() streams exactly.

    Returns column-major (n, S), (n, S), (m, S) float64 arrays in the
    reference's trajectory-major reordered layout.
    """
    n, m, h = 2, 1, 0.05
    rng = np.random
    rng.seed(seed)
    u0 = 4.0 * rng.rand(n_step, n_traj) - 2.0
    x0 = 4.0 * rng.rand(n, n_traj) - 2.0

    f = lambda x, u: np.array([x[1], -0.5 * x[1] + x[0] - x[0] ** 3 + u])
    # vectorized over the trajectory axis
    fv = lambda x, u: np.stack([x[1], -0.5 * x[1] + x[0] - x[0] ** 3 + u])

    def rk4v(x, u):
        k1 = fv(x, u)
        k2 = fv(x + 0.5 * h * k1, u)
        k3 = fv(x + 0.5 * h * k2, u)
        k4 = fv(x + h * k3, u)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    x = x0.copy()
    xs, ys, us = [], [], []
    for i in range(n_step):
        x_next = rk4v(x, u0[i])
        xs.append(x.copy())
        ys.append(x_next.copy())
        us.append(u0[i].copy())
        x = x_next
    # time-major blocks -> trajectory-major (data_generate.py:63-78)
    X = np.concatenate(xs, axis=1)  # (n, T*NT) time-major
    Y = np.concatenate(ys, axis=1)
    U = np.stack(us).reshape(1, -1)
    idx = np.array(
        [i + j * n_traj for i in range(n_traj) for j in range(n_step)]
    )
    return X[:, idx], Y[:, idx], U[:, idx]


def encoder_forward(params: List[Tuple[np.ndarray, np.ndarray]], x: np.ndarray):
    """ReLU MLP forward, columns of x are samples. params: [(W, b), ...]."""
    h = x
    for w, b in params[:-1]:
        h = np.maximum(w @ h + b[:, None], 0.0)
    w, b = params[-1]
    return w @ h + b[:, None]


def load_encoder_np(path: str) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Load encoder weights ((out,in)/(out,)) as float64 NumPy from .mat or
    the reference torch pickle."""
    if path.endswith(".mat"):
        import scipy.io as sio

        raw = sio.loadmat(path)
        out = []
        i = 1
        while f"W{i}" in raw:
            out.append(
                (
                    np.asarray(raw[f"W{i}"], dtype=np.float64),
                    np.asarray(raw[f"b{i}"], dtype=np.float64).ravel(),
                )
            )
            i += 1
        return out
    from ..lifts.io import load_torch_autoencoder

    enc, _ = load_torch_autoencoder(path, dtype=None)
    return [
        (np.asarray(w, dtype=np.float64), np.asarray(b, dtype=np.float64))
        for w, b in enc
    ]


def edmd_fit_np(enc, X, Y, U):
    """duffing.py:152-177 fit. Inputs column-major (n, S)."""
    zx = encoder_forward(enc, X)  # (Nlift, S)
    zy = encoder_forward(enc, Y)
    v = np.concatenate([zx, U], axis=0)
    k = zy @ np.linalg.pinv(v)
    nlift = zx.shape[0]
    a, b = k[:, :nlift], k[:, nlift:]
    c = X @ np.linalg.pinv(zx)
    return a, b, c


def mpc_solve_lbfgsb(
    a, b, c, z0, r, horizon, bounds, q_weight=100.0, r_weight=1e-4
):
    """scipy L-BFGS-B on the shooting cost (duffing.py:540-581, :776-778):
    zero start each step."""
    from scipy.optimize import minimize

    ab = np.concatenate([a, b], axis=1)

    def cost(u_seq):
        z = z0.copy()
        total = 0.0
        for i, u in enumerate(u_seq):
            z = ab @ np.concatenate([z, [u]])
            y = c @ z
            err = y - r[:, i]
            total += np.sum(err * err)
        return q_weight * total + r_weight * np.sum(u_seq * u_seq)

    res = minimize(cost, np.zeros(horizon), bounds=bounds)
    return res.x


def duffing_closed_loop_oracle(
    enc,
    a0,
    b0,
    c0,
    steps: int = 150,
    horizon: int = 10,
    update: bool = True,
    x_init=(-2.0, -2.0),
    u_bound: float = 2.0,
):
    """The reference's closed loop 2 (duffing.py:823-1012) in NumPy f64.

    Returns (logX (steps, 2), logU (steps, 1))."""
    rk4 = oracle.rk4(oracle.duffing_f(), 0.05)
    bounds = [(-u_bound, u_bound)] * horizon
    nlift = a0.shape[0]

    a, b, c = a0.copy(), b0.copy(), c0.copy()
    x = np.asarray(x_init, dtype=np.float64)
    k_a = np.zeros((nlift, nlift + 1))
    inv_g = 1e4 * np.eye(nlift + 1)
    bar_x = np.zeros((2, nlift))
    bar_q = 100.0 * np.eye(nlift)
    log_x, log_u = [], []
    r = np.zeros((2, horizon))
    r[0, :] = 1.0

    for i in range(steps):
        z = encoder_forward(enc, x[:, None]).ravel()
        u_seq = mpc_solve_lbfgsb(a, b, c, z, r, horizon, bounds)
        u = np.array([u_seq[0]])
        x_next = rk4(x, u)
        log_x.append(x.copy())
        log_u.append(u.copy())
        if update:
            z_next = encoder_forward(enc, x_next[:, None]).ravel()
            k_a, inv_g = oracle.rls_ab_step(k_a, inv_g, z, u, z_next)
            bar_x, bar_q = oracle.rls_c_step(bar_x, bar_q, z, x_next)
            k_ext = k_a @ inv_g
            a = k_ext[:, :nlift]
            b = k_ext[:, nlift:]
            c = bar_x @ bar_q
        x = x_next
    return np.stack(log_x), np.stack(log_u)


def duffing_closed_loop_oracle_qp(
    enc,
    a0,
    b0,
    c0,
    steps: int = 150,
    horizon: int = 10,
    update: bool = True,
    x_init=(-2.0, -2.0),
    u_bound: float = 2.0,
    q_weight: float = 100.0,
    r_weight: float = 1e-4,
):
    """The Duffing closed loop with the shooting problem solved as the
    EXACT condensed QP (scipy SLSQP-refined active-set, ``oracle.
    solve_box_qp_scipy``) instead of L-BFGS-B — same convex problem as
    duffing.py:540-581 at its true optimum. This pins the ENGINE (QP
    build + ADMM + RLS + plant) at tight tolerance, separating engine
    bugs from the reference solver's stopping-short noise (the L-BFGS-B
    oracle above stays as the documented solver-difference measurement).

    Returns (logX (steps, 2), logU (steps, 1))."""
    rk4_step = oracle.rk4(oracle.duffing_f(), 0.05)
    nlift = a0.shape[0]

    a, b, c = a0.copy(), b0.copy(), c0.copy()
    x = np.asarray(x_init, dtype=np.float64)
    k_a = np.zeros((nlift, nlift + 1))
    inv_g = 1e4 * np.eye(nlift + 1)
    bar_x = np.zeros((2, nlift))
    bar_q = 100.0 * np.eye(nlift)
    log_x, log_u = [], []
    r = np.zeros((horizon, 2))
    r[:, 0] = 1.0
    yr = r.reshape(-1)
    qbar = q_weight * np.eye(2 * horizon)
    rbar = r_weight * np.eye(horizon)

    for i in range(steps):
        z = encoder_forward(enc, x[:, None]).ravel()
        f1, f2 = oracle.prediction_matrices_loop(a, b, c, np.eye(2), horizon)
        p_qp, q_qp = oracle.condensed_cost(f1, f2, qbar, rbar, z, yr)
        u_seq = oracle.solve_box_qp_scipy(p_qp, q_qp, -u_bound, u_bound)
        u = np.array([u_seq[0]])
        x_next = rk4_step(x, u)
        log_x.append(x.copy())
        log_u.append(u.copy())
        if update:
            z_next = encoder_forward(enc, x_next[:, None]).ravel()
            k_a, inv_g = oracle.rls_ab_step(k_a, inv_g, z, u, z_next)
            bar_x, bar_q = oracle.rls_c_step(bar_x, bar_q, z, x_next)
            k_ext = k_a @ inv_g
            a = k_ext[:, :nlift]
            b = k_ext[:, nlift:]
            c = bar_x @ bar_q
        x = x_next
    return np.stack(log_x), np.stack(log_u)


def vdp_closed_loop_oracle_qp(
    enc,
    a0,
    b0,
    steps: int = 60,
    horizon: int = 10,
    update: bool = True,
    switch_step: int = 10**9,
    x_init=(-2.0, -2.0),
    u_bound: float = 6.0,
    c_rls_init: float = 1e5,
    ab_rls_init: float = 1e5,
    q_weight: float = 100.0,
    r_weight: float = 1e-4,
):
    """vanderpol.py's lifted-tracking loop with the EXACT condensed QP
    (C = I over the lift, encoded reference) — the exact-optimum analog of
    :func:`vdp_closed_loop_oracle`, pinning the engine's
    ``track_lifted`` path at tight tolerance."""
    h = 0.05
    nominal = oracle.vdp_f()
    switched = oracle.vdp_f(a=1.0, b=-3.0, c=-10.0, d=-3.0)
    nlift = a0.shape[0]

    r_state = np.array([1.0, 0.0])
    r_lift = encoder_forward(enc, r_state[:, None]).ravel()
    yr = np.tile(r_lift, horizon)
    qbar = q_weight * np.eye(nlift * horizon)
    rbar = r_weight * np.eye(horizon)
    c_eye = np.eye(nlift)

    a, b = a0.copy(), b0.copy()
    x = np.asarray(x_init, dtype=np.float64)
    k_a = np.zeros((nlift, nlift + 1))
    inv_g = ab_rls_init * np.eye(nlift + 1)
    bar_x = np.zeros((2, nlift))
    bar_q = c_rls_init * np.eye(nlift)
    log_x, log_u = [], []
    f = nominal
    for i in range(steps):
        z = encoder_forward(enc, x[:, None]).ravel()
        f1, f2 = oracle.prediction_matrices_loop(a, b, c_eye, c_eye, horizon)
        p_qp, q_qp = oracle.condensed_cost(f1, f2, qbar, rbar, z, yr)
        u_seq = oracle.solve_box_qp_scipy(p_qp, q_qp, -u_bound, u_bound)
        u = np.array([u_seq[0]])
        step_fn = oracle.rk4(f, h)
        x_next = step_fn(x, u)
        log_x.append(x.copy())
        log_u.append(u.copy())
        if update:
            z_next = encoder_forward(enc, x_next[:, None]).ravel()
            k_a, inv_g = oracle.rls_ab_step(k_a, inv_g, z, u, z_next)
            bar_x, bar_q = oracle.rls_c_step(bar_x, bar_q, z, x_next)
            k_ext = k_a @ inv_g
            a = k_ext[:, :nlift]
            b = k_ext[:, nlift:]
        if i > switch_step:
            f = switched
        x = x_next
    return np.stack(log_x), np.stack(log_u)


def generate_vdp_data(
    seed: int = 101, n_step: int = 100, n_traj: int = 100
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Replicate data_generate.vanderpol_generate() streams exactly
    (data_generate.py:81-152: same U[-2,2] excitation protocol, VDP field)."""
    n, h = 2, 0.05
    rng = np.random
    rng.seed(seed)
    u0 = 4.0 * rng.rand(n_step, n_traj) - 2.0
    x0 = 4.0 * rng.rand(n, n_traj) - 2.0

    fv = lambda x, u: np.stack(
        [2.0 * x[1], 2.0 * x[1] - 10.0 * x[0] ** 2 * x[1] - 0.8 * x[0] + u]
    )

    def rk4v(x, u):
        k1 = fv(x, u)
        k2 = fv(x + 0.5 * h * k1, u)
        k3 = fv(x + 0.5 * h * k2, u)
        k4 = fv(x + h * k3, u)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    x = x0.copy()
    xs, ys, us = [], [], []
    for i in range(n_step):
        x_next = rk4v(x, u0[i])
        xs.append(x.copy())
        ys.append(x_next.copy())
        us.append(u0[i].copy())
        x = x_next
    X = np.concatenate(xs, axis=1)
    Y = np.concatenate(ys, axis=1)
    U = np.stack(us).reshape(1, -1)
    idx = np.array(
        [i + j * n_traj for i in range(n_traj) for j in range(n_step)]
    )
    return X[:, idx], Y[:, idx], U[:, idx]


def mpc_solve_lbfgsb_lifted(
    a, b, z0, r_lift, horizon, bounds, q_weight=100.0, r_weight=1e-4
):
    """L-BFGS-B on the lifted-tracking shooting cost (vanderpol.py:456-487:
    y = z compared against the encoded reference, zero start)."""
    from scipy.optimize import minimize

    ab = np.concatenate([a, b], axis=1)

    def cost(u_seq):
        z = z0.copy()
        total = 0.0
        for i, u in enumerate(u_seq):
            z = ab @ np.concatenate([z, [u]])
            err = z - r_lift[:, i]
            total += np.sum(err * err)
        return q_weight * total + r_weight * np.sum(u_seq * u_seq)

    res = minimize(cost, np.zeros(horizon), bounds=bounds)
    return res.x


def vdp_closed_loop_oracle(
    enc,
    a0,
    b0,
    c0,
    steps: int = 70,
    horizon: int = 10,
    update: bool = True,
    switch_step: int = 100,
    x_init=(-2.0, -2.0),
    u_bound: float = 6.0,
    c_rls_init: float = 1e5,
    ab_rls_init: float = 1e5,
):
    """vanderpol.py's closed loop 2 (:746-951) in NumPy f64: lifted
    tracking of the encoded constant reference [1, 0], live parameter
    switch (:923-931 rebuilds the RK4 chain when i > 100 — effective from
    the NEXT iteration), RLS inits 1e5 (:874, :888)."""
    h = 0.05
    nominal = oracle.vdp_f()
    switched = oracle.vdp_f(a=1.0, b=-3.0, c=-10.0, d=-3.0)
    bounds = [(-u_bound, u_bound)] * horizon
    nlift = a0.shape[0]

    r_state = np.array([1.0, 0.0])
    r_lift_col = encoder_forward(enc, r_state[:, None]).ravel()
    r_lift = np.tile(r_lift_col[:, None], (1, horizon))

    a, b = a0.copy(), b0.copy()
    x = np.asarray(x_init, dtype=np.float64)
    k_a = np.zeros((nlift, nlift + 1))
    inv_g = ab_rls_init * np.eye(nlift + 1)
    bar_x = np.zeros((2, nlift))
    bar_q = c_rls_init * np.eye(nlift)
    log_x, log_u = [], []
    f = nominal
    for i in range(steps):
        z = encoder_forward(enc, x[:, None]).ravel()
        u_seq = mpc_solve_lbfgsb_lifted(a, b, z, r_lift, horizon, bounds)
        u = np.array([u_seq[0]])
        step_fn = oracle.rk4(f, h)
        x_next = step_fn(x, u)
        log_x.append(x.copy())
        log_u.append(u.copy())
        if update:
            z_next = encoder_forward(enc, x_next[:, None]).ravel()
            k_a, inv_g = oracle.rls_ab_step(k_a, inv_g, z, u, z_next)
            bar_x, bar_q = oracle.rls_c_step(bar_x, bar_q, z, x_next)
            k_ext = k_a @ inv_g
            a = k_ext[:, :nlift]
            b = k_ext[:, nlift:]
        if i > switch_step:  # rebuilt at end of body -> next step switched
            f = switched
        x = x_next
    return np.stack(log_x), np.stack(log_u)


def tank_closed_loop_oracle(
    lift_fn,
    a0,
    b0,
    c0,
    steps: int = 60,
    horizon: int = 20,
    q_weight: float = 10.0,
    r_weight: float = 1e-3,
    du_bound: float = 0.5,
    u_bounds=(-8.0, 8.0),
    switch_step: int = 100,
    update: bool = True,
    rls_init: float = 1e4,
    rls_state0=None,
):
    """Tank_System.m's serve loop in NumPy f64: Δu-augmented condensed QP
    (prediction matrices via the explicit power loops, :129-144), exact
    QP solves (quadprog semantics via scipy), input-magnitude constraint on
    U0 + Δu_0 (:147-150, 182-186), scratch RLS with 'same' C-pairing
    (:233-263), per-step controller rebuild (:272-290), plant switch
    (:194-203). ``lift_fn(x)->z`` must be the same dictionary the engine
    uses (pass in the jitted dictionary evaluated via numpy bridge).

    Data/RNG streams are NOT MATLAB's (rng(55) is not replicable in
    NumPy); parity is engine-vs-oracle on identical inputs, not vs MATLAB.

    ``rls_state0`` — optional ``(k_a, inv_g, bar_x, bar_q)`` warm start
    (e.g. from the batch Grams, the Revise_2/Koopman_update.m:264-265
    protocol) replacing the scaled-identity scratch init.
    """
    from . import oracle as _oracle

    nominal = _oracle.tank_step()
    switched = _oracle.tank_step((0.53, 0.3, 0.1, 0.35))
    nlift = a0.shape[0]
    n, m = 2, 1
    cy = np.array([[0.0, 1.0]])

    a, b, c = a0.copy(), b0.copy(), c0.copy()
    x = np.zeros(2)
    u0 = np.zeros(1)
    if rls_state0 is not None:
        k_a, inv_g, bar_x, bar_q = (
            np.array(v, dtype=np.float64) for v in rls_state0
        )
    else:
        k_a = np.zeros((nlift, nlift + m))
        inv_g = rls_init * np.eye(nlift + m)
        bar_x = np.zeros((n, nlift))
        bar_q = rls_init * np.eye(nlift)
    log_x, log_u = [], []
    qbar = q_weight * np.eye(horizon)
    rbar = r_weight * np.eye(horizon)
    yr = np.ones(horizon)
    plant = nominal

    for i in range(steps):
        # Δu augmentation of the CURRENT model (Tank_System.m:265-268)
        a_aug = np.block([[a, b], [np.zeros((m, nlift)), np.eye(m)]])
        b_aug = np.vstack([b, np.eye(m)])
        c_aug = np.hstack([c, np.zeros((n, m))])
        z = lift_fn(x)
        zq = np.concatenate([z, u0])
        f1, f2 = _oracle.prediction_matrices_loop(a_aug, b_aug, c_aug, cy, horizon)
        p_qp, q_qp = _oracle.condensed_cost(f1, f2, qbar, rbar, zq, yr)
        # rows: Δu boxes + input magnitude on the first move
        a_rows = np.vstack([np.eye(horizon), np.eye(1, horizon)])
        lo = np.concatenate([-du_bound * np.ones(horizon), [u_bounds[0] - u0[0]]])
        hi = np.concatenate([du_bound * np.ones(horizon), [u_bounds[1] - u0[0]]])
        du = _oracle.solve_qp_scipy(p_qp, q_qp, a_rows, lo, hi)[:m]
        u0 = np.clip(u0 + du, *u_bounds)
        if i > switch_step:
            plant = switched
        x_next = plant(x, u0)
        log_x.append(x.copy())
        log_u.append(u0.copy())
        if update:
            z_next = lift_fn(x_next)
            k_a, inv_g = _oracle.rls_ab_step(k_a, inv_g, z, u0, z_next)
            bar_x, bar_q = _oracle.rls_c_step(bar_x, bar_q, z, x)  # 'same'
            k_ext = k_a @ inv_g
            a = k_ext[:, :nlift]
            b = k_ext[:, nlift:]
            c = bar_x @ bar_q
        x = x_next
    return np.stack(log_x), np.stack(log_u)

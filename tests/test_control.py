import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx.control import (
    ADMMConfig,
    augment_delta_u,
    condensed_qp,
    dlqr,
    prediction_matrices,
    shooting_cost,
    solve_box_qp,
    solve_dare_doubling,
    solve_dare_iter,
    solve_qp,
    solve_shooting_pgd,
    weight_bar,
)
from koopmanx.eval import oracle
from koopmanx.types import LinearModel, QPData


def _random_model(key, nz=5, m=1, p=2):
    ka, kb, kc = jax.random.split(key, 3)
    a = 0.3 * jax.random.normal(ka, (nz, nz), dtype=jnp.float64)
    a = a + 0.5 * jnp.eye(nz)
    b = jax.random.normal(kb, (nz, m), dtype=jnp.float64)
    c = jax.random.normal(kc, (p, nz), dtype=jnp.float64)
    return LinearModel(A=a, B=b, C=c)


def test_prediction_matrices_match_loop_oracle():
    model = _random_model(jax.random.PRNGKey(0))
    cy = jnp.array([[0.0, 1.0]], dtype=jnp.float64)
    pred = prediction_matrices(model, horizon=7, cy=cy)
    f1, f2 = oracle.prediction_matrices_loop(
        np.asarray(model.A), np.asarray(model.B), np.asarray(model.C),
        np.asarray(cy), 7,
    )
    np.testing.assert_allclose(np.asarray(pred.f1), f1, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(pred.f2), f2, rtol=1e-10)


def test_markov_methods_are_equivalent():
    model = _random_model(jax.random.PRNGKey(3))
    cy = jnp.array([[0.0, 1.0]], dtype=jnp.float64)
    # include exact powers of two — the ladder-boundary case where the dag
    # build under-allocated (advisor round-1 high finding) — plus odd mids.
    for horizon in (1, 2, 4, 7, 8, 13, 16, 20):
        ref = prediction_matrices(model, horizon, cy, method="scan")
        for method in ("doubling", "assoc", "dag"):
            got = prediction_matrices(model, horizon, cy, method=method)
            np.testing.assert_allclose(
                np.asarray(got.f1), np.asarray(ref.f1), rtol=1e-9, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(got.f2), np.asarray(ref.f2), rtol=1e-9, atol=1e-12
            )


def test_delta_u_augmentation():
    model = _random_model(jax.random.PRNGKey(1), nz=4, m=2, p=2)
    aug = augment_delta_u(model)
    assert aug.A.shape == (6, 6)
    assert aug.B.shape == (6, 2)
    assert aug.C.shape == (2, 6)
    # augmented dynamics: [z; u]+ = [Az + Bu + BΔ; u + Δ]
    z = jnp.arange(4.0)
    u = jnp.array([1.0, -1.0])
    du = jnp.array([0.5, 0.2])
    zu = jnp.concatenate([z, u])
    nxt = aug.A @ zu + aug.B @ du
    expected_z = model.A @ z + model.B @ (u + du)
    np.testing.assert_allclose(np.asarray(nxt[:4]), np.asarray(expected_z), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(nxt[4:]), np.asarray(u + du), rtol=1e-10)


def test_weight_bar_terminal_injection():
    q = jnp.eye(2, dtype=jnp.float64) * 10
    qbar = weight_bar(q, 4, terminal=jnp.full((2, 2), 7.0, dtype=jnp.float64))
    assert qbar.shape == (8, 8)
    np.testing.assert_allclose(np.asarray(qbar[:2, :2]), 10 * np.eye(2))
    np.testing.assert_allclose(np.asarray(qbar[-2:, -2:]), 7.0 * np.ones((2, 2)))


def test_box_qp_matches_scipy():
    rng = np.random.RandomState(0)
    nx = 10
    for trial in range(3):
        m = rng.randn(nx, nx)
        p = m @ m.T + 0.5 * np.eye(nx)
        q = rng.randn(nx)
        sol = solve_box_qp(
            jnp.asarray(p), jnp.asarray(q), -1.0, 1.0,
            ADMMConfig(iters=400, rho=1.0),
        )
        expected = oracle.solve_box_qp_scipy(p, q, -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(sol.x), expected, atol=2e-5)


def test_general_qp_matches_scipy():
    rng = np.random.RandomState(1)
    nx, nc = 8, 3
    m = rng.randn(nx, nx)
    p = m @ m.T + np.eye(nx)
    q = rng.randn(nx)
    a_extra = rng.randn(nc, nx)
    a = np.concatenate([np.eye(nx), a_extra], axis=0)
    l = np.concatenate([-2 * np.ones(nx), -1 * np.ones(nc)])
    u = np.concatenate([2 * np.ones(nx), 1 * np.ones(nc)])
    qp = QPData(*[jnp.asarray(v) for v in (p, q, a, l, u)])
    sol = solve_qp(qp, ADMMConfig(iters=600, rho=1.0))
    expected = oracle.solve_qp_scipy(p, q, a, l, u)
    np.testing.assert_allclose(np.asarray(sol.x), expected, atol=5e-5)
    assert float(sol.primal_res) < 1e-6


def test_condensed_qp_solution_tracks():
    """End-to-end L4 sanity: for a stable SISO lifted model tracking r=1,
    the condensed QP's optimal input sequence drives predicted outputs to r."""
    a = jnp.array([[0.9]])
    b = jnp.array([[0.5]])
    c = jnp.array([[1.0]])
    model = LinearModel(A=a, B=b, C=c)
    n = 10
    pred = prediction_matrices(model, n)
    qbar = weight_bar(jnp.eye(1, dtype=jnp.float64) * 10, n)
    rbar = jnp.eye(n, dtype=jnp.float64) * 1e-3
    z0 = jnp.array([0.0])
    yr = jnp.ones(n, dtype=jnp.float64)
    qp = condensed_qp(pred, z0, yr, qbar, rbar, -2.0, 2.0)
    sol = solve_qp(qp, ADMMConfig(iters=300))
    y_pred = np.asarray(pred.f2) @ np.asarray(sol.x)
    assert abs(y_pred[-1] - 1.0) < 0.05
    # steady-state input for y=1: u* = (1 - 0.9) / 0.5 = 0.2
    np.testing.assert_allclose(np.asarray(sol.x)[-1], 0.2, atol=0.05)


def test_dare_iter_matches_scipy():
    from scipy.linalg import solve_discrete_are

    rng = np.random.RandomState(2)
    a = np.array([[0.9, 0.1], [0.0, 0.8]])
    b = np.array([[0.0], [1.0]])
    q = np.eye(2)
    r = np.array([[0.1]])
    expected = solve_discrete_are(a, b, q, r)
    p_iter = solve_dare_iter(jnp.asarray(a), jnp.asarray(b), jnp.asarray(q), jnp.asarray(r))
    p_dbl = solve_dare_doubling(jnp.asarray(a), jnp.asarray(b), jnp.asarray(q), jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(p_iter), expected, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p_dbl), expected, rtol=1e-9)


def test_dlqr_stabilizes():
    a = jnp.array([[1.1, 0.2], [0.0, 0.9]])
    b = jnp.array([[0.0], [1.0]])
    k, p = dlqr(a, b, jnp.eye(2, dtype=jnp.float64), jnp.asarray([[0.5]]))
    acl = np.asarray(a - b @ k)
    eig = np.abs(np.linalg.eigvals(acl))
    assert (eig < 1.0).all()


def test_shooting_cost_equals_manual_rollout():
    model = _random_model(jax.random.PRNGKey(2), nz=3, m=1, p=2)
    z0 = jnp.array([0.1, -0.2, 0.3], dtype=jnp.float64)
    u_seq = jnp.array([[0.5], [-0.5], [0.2]], dtype=jnp.float64)
    r = jnp.zeros((3, 2), dtype=jnp.float64)
    cost = shooting_cost(u_seq, model, z0, r, np_horizon=3)
    # manual float64 rollout (duffing.py:546-581 semantics)
    a, b, c = (np.asarray(v) for v in (model.A, model.B, model.C))
    z = np.asarray(z0)
    total = 0.0
    for u in np.asarray(u_seq):
        z = a @ z + b @ u
        total += np.sum((c @ z) ** 2)
    expected = 100 * total + 1e-4 * np.sum(np.asarray(u_seq) ** 2)
    np.testing.assert_allclose(float(cost), expected, rtol=1e-10)


def test_shooting_pgd_matches_condensed_qp():
    """The shooting-cost PGD solver and the condensed QP solve the same
    convex problem — their optima must agree (SURVEY §7.4 parity strategy)."""
    model = _random_model(jax.random.PRNGKey(3), nz=3, m=1, p=1)
    model = LinearModel(A=0.8 * model.A / jnp.max(jnp.abs(jnp.linalg.eigvals(model.A))).real, B=model.B, C=model.C)
    n = 5
    z0 = jnp.array([0.5, -0.5, 0.2], dtype=jnp.float64)
    r = jnp.ones((n, 1), dtype=jnp.float64)
    u_pgd = solve_shooting_pgd(
        model, z0, r, nc=n, np_horizon=n, lo=-2.0, hi=2.0,
        cfg=__import__("koopmanx.control.shooting", fromlist=["PGDConfig"]).PGDConfig(iters=3000, lr=1e-4),
    )
    pred = prediction_matrices(model, n)
    qbar = weight_bar(jnp.eye(1, dtype=jnp.float64) * 100, n)
    rbar = jnp.eye(n, dtype=jnp.float64) * 1e-4
    qp = condensed_qp(pred, z0, jnp.ones(n, dtype=jnp.float64), qbar, rbar, -2.0, 2.0)
    sol = solve_qp(qp, ADMMConfig(iters=500))
    np.testing.assert_allclose(np.asarray(u_pgd).ravel(), np.asarray(sol.x), atol=1e-2)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx.control.lmi import solve_terminal_lmi
from koopmanx.types import LinearModel


@pytest.fixture(scope="module")
def small_model():
    # a stable controllable lifted pair
    a = jnp.array(
        [[0.9, 0.1, 0.0], [0.0, 0.85, 0.1], [0.05, 0.0, 0.8]], dtype=jnp.float64
    )
    b = jnp.array([[0.1], [0.3], [0.05]], dtype=jnp.float64)
    c = jnp.eye(3, dtype=jnp.float64)[:2]
    return LinearModel(A=a, B=b, C=c)


def test_lmi_synthesis_feasible_and_stabilizing(small_model):
    q = jnp.diag(jnp.array([10.0, 10.0, 0.0], dtype=jnp.float64))
    r = jnp.array([[0.01]], dtype=jnp.float64)
    psi = jnp.array([0.3, -0.2, 0.1], dtype=jnp.float64)
    res = solve_terminal_lmi(small_model, q, r, psi, u_max=2.0, iters=400)
    assert np.isfinite(float(res.gamma))
    # feasibility residual small (penalized program converged)
    assert float(res.feasibility) < 1e-2, float(res.feasibility)
    # recovered K stabilizes A + B K
    acl = np.asarray(small_model.A + small_model.B @ res.k)
    assert np.abs(np.linalg.eigvals(acl)).max() < 1.0
    # P positive definite
    assert np.linalg.eigvalsh(np.asarray(res.p)).min() > 0


def test_lmi_decrease_condition(small_model):
    """The recovered (P, K) satisfies the quasi-infinite-horizon decrease
    (A+BK)' P (A+BK) - P + Q + K'RK <= small  — the property the
    reference's LMI2 certifies (Revise_2/Koopman_update.m:336-345)."""
    q = jnp.diag(jnp.array([10.0, 10.0, 0.0], dtype=jnp.float64))
    r = jnp.array([[0.01]], dtype=jnp.float64)
    psi = jnp.array([0.1, 0.1, 0.0], dtype=jnp.float64)
    res = solve_terminal_lmi(small_model, q, r, psi, u_max=2.0, iters=400)
    a, b = np.asarray(small_model.A), np.asarray(small_model.B)
    k, p = np.asarray(res.k), np.asarray(res.p)
    acl = a + b @ k
    dec = acl.T @ p @ acl - p + np.asarray(q) + k.T @ np.asarray(r) @ k
    assert np.linalg.eigvalsh(dec).max() < 1e-1, np.linalg.eigvalsh(dec).max()


def test_lmi_ellipsoid_contains_anchor(small_model):
    """LMI1 semantics: psi' Q1^{-1} psi <= 1, i.e. the anchor point lies in
    the invariant ellipsoid (psi' P psi <= gamma)."""
    q = jnp.diag(jnp.array([10.0, 10.0, 0.0], dtype=jnp.float64))
    r = jnp.array([[0.01]], dtype=jnp.float64)
    psi = jnp.array([0.5, -0.4, 0.2], dtype=jnp.float64)
    res = solve_terminal_lmi(small_model, q, r, psi, u_max=2.0, iters=400)
    v = float(psi @ res.p @ psi)
    assert v <= float(res.gamma) * 1.05, (v, float(res.gamma))

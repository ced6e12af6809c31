"""Fused QP kernel parity (interpret mode — runs on the CPU test mesh).

Both kernel layouts (AoS and scenario-in-lanes SoA) must reproduce the XLA
reference path (condensed build + ADMM) on identical inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx.control.condensed import condensed_qp, prediction_matrices, weight_bar
from koopmanx.control.qp import ADMMConfig, solve_qp
from koopmanx.ops.qp_pallas import FusedQPConfig, fused_qp_solve
from koopmanx.ops.qp_pallas_soa import fused_qp_solve_soa
from koopmanx.types import LinearModel


@pytest.fixture(scope="module")
def qp_batch():
    key = jax.random.PRNGKey(0)
    B, nz, m, py, N = 8, 8, 1, 2, 10
    a = 0.1 * jax.random.normal(key, (B, nz, nz)) + 0.8 * jnp.eye(nz)
    b = jax.random.normal(jax.random.PRNGKey(1), (B, nz, m)) * 0.3
    c = jax.random.normal(jax.random.PRNGKey(2), (B, py, nz)) * 0.5
    z0 = jax.random.normal(jax.random.PRNGKey(3), (B, nz))
    yr = jnp.tile(jnp.array([1.0, 0.0]), (B, N)).reshape(B, -1)
    warm = jnp.zeros((B, N * m))
    # XLA reference
    us = []
    for i in range(B):
        model = LinearModel(A=a[i], B=b[i], C=c[i])
        pred = prediction_matrices(model, N, None)
        qp = condensed_qp(
            pred,
            z0[i],
            yr[i],
            weight_bar(100 * jnp.eye(py), N),
            1e-4 * jnp.eye(N * m),
            -2.0,
            2.0,
        )
        us.append(solve_qp(qp, ADMMConfig(iters=800, rho=0.1)).x)
    return (a, b, c, z0, yr, warm), jnp.stack(us)


# compare at convergence: the kernels' box-specialized ADMM and the XLA
# general path take different (valid) iterate sequences, so mid-convergence
# snapshots can differ by ~5e-2 on individual problems
CFG = FusedQPConfig(horizon=10, iters=800, rho=0.1, tile=8, schulz_iters=24)


def test_aos_kernel_parity(qp_batch):
    inputs, u_ref = qp_batch
    u = fused_qp_solve(*inputs, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=5e-3)


def test_soa_kernel_parity(qp_batch):
    inputs, u_ref = qp_batch
    u = fused_qp_solve_soa(*inputs, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=5e-3)


def test_soa_matches_aos(qp_batch):
    inputs, _ = qp_batch
    u1 = fused_qp_solve(*inputs, CFG, interpret=True)
    u2 = fused_qp_solve_soa(*inputs, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-4)

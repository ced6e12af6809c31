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


# ---- VMEM-resident box-ADMM kernel (ops/qp_pallas_box.py) ----


@pytest.fixture(scope="module")
def box_batch():
    key = jax.random.PRNGKey(7)
    B, nx = 7, 20
    m = jax.random.normal(key, (B, nx, nx), jnp.float32) * 0.3
    p = jnp.einsum("bij,bkj->bik", m, m) + 0.5 * jnp.eye(nx, dtype=jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(8), (B, nx), jnp.float32)
    lo = jnp.full((B, nx), -1.5, jnp.float32)
    hi = jnp.full((B, nx), 1.5, jnp.float32)
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(9), (B, nx), jnp.float32)
    return p, q, lo, hi, x0


def test_box_kernel_matches_solve_box_qp(box_batch):
    from koopmanx.control.qp import solve_box_qp, solve_box_qp_batch_pallas

    p, q, lo, hi, x0 = box_batch
    cfg = ADMMConfig(iters=60, rho=0.1)
    ref = jax.vmap(
        lambda pp, qq, l, h, x: solve_box_qp(pp, qq, l, h, cfg, x0=x)
    )(p, q, lo, hi, x0)
    out = solve_box_qp_batch_pallas(p, q, lo, hi, cfg, x0, interpret=True)
    for name in ("x", "y", "primal_res", "dual_res"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)),
            np.asarray(getattr(out, name)),
            atol=2e-6,
        )


def test_box_kernel_fori_matches_unrolled(box_batch):
    from koopmanx.control.qp import solve_box_qp_batch_pallas

    p, q, lo, hi, x0 = box_batch
    cfg = ADMMConfig(iters=60, rho=0.1)
    a = solve_box_qp_batch_pallas(p, q, lo, hi, cfg, x0, unroll=True,
                                  interpret=True)
    b = solve_box_qp_batch_pallas(p, q, lo, hi, cfg, x0, unroll=False,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-7)


def test_box_kernel_pads_ragged_batch(box_batch):
    # B=7 is not a multiple of the 128-lane tile: the wrapper pads with
    # benign QPs and slices the batch back out
    from koopmanx.control.qp import solve_box_qp_batch_pallas

    p, q, lo, hi, x0 = box_batch
    cfg = ADMMConfig(iters=30, rho=0.1)
    out = solve_box_qp_batch_pallas(p, q, lo, hi, cfg, x0, interpret=True)
    assert out.x.shape == (7, 20)
    assert np.isfinite(np.asarray(out.x)).all()


def test_make_box_qp_solver_vmap_rule(box_batch):
    """The custom_vmap solver equals solve_box_qp both unbatched and
    under vmap (the engine's scenario axis), including unbatched lo/hi
    broadcast by the rule."""
    from koopmanx.control.qp import make_box_qp_solver, solve_box_qp

    p, q, lo, hi, x0 = box_batch
    cfg = ADMMConfig(iters=40, rho=0.1)
    solver = make_box_qp_solver(cfg)  # CPU -> XLA fallback inside rule
    y0 = jnp.zeros_like(x0)

    # unbatched call
    s1 = solver(p[0], q[0], lo[0], hi[0], x0[0], y0[0])
    r1 = solve_box_qp(p[0], q[0], lo[0], hi[0], cfg, x0=x0[0])
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(r1.x), atol=1e-7)

    # vmapped, lo/hi unbatched
    s2 = jax.vmap(
        lambda pp, qq, x, y: solver(pp, qq, lo[0], hi[0], x, y)
    )(p, q, x0, y0)
    r2 = jax.vmap(
        lambda pp, qq, x: solve_box_qp(pp, qq, lo[0], hi[0], cfg, x0=x)
    )(p, q, x0)
    np.testing.assert_allclose(np.asarray(s2.x), np.asarray(r2.x), atol=1e-7)

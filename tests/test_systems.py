import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx.eval import oracle
from koopmanx.systems import (
    DUFFING,
    TANK,
    VANDERPOL,
    collect,
    make_step,
    make_switch_schedule,
    rollout,
)


def test_duffing_rk4_matches_oracle():
    step = make_step(DUFFING, h=0.05)
    ref = oracle.rk4(oracle.duffing_f(), 0.05)
    x = np.array([0.3, -1.2])
    u = np.array([0.7])
    got = np.asarray(step(jnp.asarray(x), jnp.asarray(u), DUFFING.theta0))
    np.testing.assert_allclose(got, ref(x, u), rtol=1e-12)


def test_vdp_rk4_matches_oracle():
    step = make_step(VANDERPOL, h=0.05)
    ref = oracle.rk4(oracle.vdp_f(), 0.05)
    x = np.array([0.5, 0.25])
    u = np.array([-1.0])
    got = np.asarray(step(jnp.asarray(x), jnp.asarray(u), VANDERPOL.theta0))
    np.testing.assert_allclose(got, ref(x, u), rtol=1e-12)


def test_matlab_rk4_variant_differs():
    # the MATLAB k4-from-k1 quirk (Revise_2/Koopman_update.m:24) must give a
    # (slightly) different map than classic RK4
    classic = make_step(DUFFING, h=0.05, integrator="rk4")
    matlab = make_step(DUFFING, h=0.05, integrator="rk4_matlab")
    x = jnp.array([0.9, -0.4])
    u = jnp.array([0.2])
    a = classic(x, u, DUFFING.theta0)
    b = matlab(x, u, DUFFING.theta0)
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    ref = oracle.rk4(oracle.duffing_f(), 0.05, matlab_k4=True)
    np.testing.assert_allclose(np.asarray(b), ref(np.asarray(x), np.asarray(u)), rtol=1e-12)


def test_tank_step_clamps_nonnegative():
    step = make_step(TANK, h=0.05)
    x = jnp.array([0.001, 0.0])
    u = jnp.array([-5.0])
    out = np.asarray(step(x, u, TANK.theta0))
    assert (out >= 0).all()
    ref = oracle.tank_step()(np.array([0.001, 0.0]), np.array([-5.0]))
    np.testing.assert_allclose(out, ref, rtol=1e-12)


def test_switch_schedule():
    sched = make_switch_schedule(DUFFING.theta0, DUFFING.theta1, 100)
    th_pre = sched(jnp.asarray(100))
    th_post = sched(jnp.asarray(101))
    assert float(th_pre.d) == -0.5
    assert float(th_post.d) == -5.0


def test_rollout_chains_plant_steps():
    step = make_step(DUFFING, h=0.05)
    x0 = jnp.array([0.1, 0.2])
    u_seq = jnp.array([[0.5], [-0.5], [0.0]])
    xs, ys = rollout(step, x0, u_seq, DUFFING.theta0)
    assert xs.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(xs[1]), np.asarray(ys[0]), rtol=1e-12)
    ref = oracle.rk4(oracle.duffing_f(), 0.05)
    x = np.array([0.1, 0.2])
    for i, u in enumerate([[0.5], [-0.5], [0.0]]):
        np.testing.assert_allclose(np.asarray(xs[i]), x, rtol=1e-10)
        x = ref(x, np.array(u))
    np.testing.assert_allclose(np.asarray(ys[-1]), x, rtol=1e-10)


def test_collect_shapes_and_layout():
    data = collect(DUFFING, jax.random.PRNGKey(0), n_step=7, n_traj=5, dtype=jnp.float64)
    assert data.x.shape == (35, 2)
    assert data.u.shape == (35, 1)
    # trajectory-major: Y of a snapshot equals X of the next within a traj
    np.testing.assert_allclose(
        np.asarray(data.y[:6]), np.asarray(data.x[1:7]), rtol=1e-12
    )
    # inputs stay inside the excitation range (data_generate.py:33)
    assert float(jnp.abs(data.u).max()) <= 2.0


def test_linearize_discrete_matches_finite_differences():
    """Autodiff Jacobian of the RK4 step vs central finite differences —
    the reference's sympy-Jacobian baseline capability (duffing.py:615-622)
    done with jax.jacfwd."""
    from koopmanx.systems.linearize import affine_residual, linearize_discrete

    x = jnp.array([0.4, -0.8], dtype=jnp.float64)
    u = jnp.array([0.3], dtype=jnp.float64)
    model = linearize_discrete(DUFFING, x, u, h=0.05)
    step = make_step(DUFFING, 0.05)
    eps = 1e-6
    for j in range(2):
        dx = jnp.zeros(2, dtype=jnp.float64).at[j].set(eps)
        fd = (np.asarray(step(x + dx, u, DUFFING.theta0)) -
              np.asarray(step(x - dx, u, DUFFING.theta0))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(model.A[:, j]), fd, atol=1e-8)
    du = jnp.array([eps], dtype=jnp.float64)
    fd_b = (np.asarray(step(x, u + du, DUFFING.theta0)) -
            np.asarray(step(x, u - du, DUFFING.theta0))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(model.B[:, 0]), fd_b, atol=1e-8)
    # affine model is exact at the linearization point
    d = affine_residual(DUFFING, x, u, model)
    pred = np.asarray(model.A @ x + model.B @ u + d)
    np.testing.assert_allclose(pred, np.asarray(step(x, u, DUFFING.theta0)), rtol=1e-12)


def test_batch_linearize():
    from koopmanx.systems.linearize import batch_linearize_discrete

    xs = jnp.array([[0.1, 0.2], [0.5, -0.5]], dtype=jnp.float64)
    us = jnp.array([[0.0], [1.0]], dtype=jnp.float64)
    models = batch_linearize_discrete(DUFFING, xs, us)
    assert models.A.shape == (2, 2, 2)
    assert np.isfinite(np.asarray(models.A)).all()

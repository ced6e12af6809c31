"""Closed-loop LQR mode (EngineConfig.controller='lqr') — the runnable
counterpart of the reference's dead LQR flag (``duffing.py:682``; gain at
``:583-613/:669``, apply site ``:863-864`` ``u = -K_gain @ xlift``).

Gates: (a) the per-step control law matches an independent NumPy/scipy
oracle (scipy DARE + least-squares servo target) on a frozen model,
(b) the LQR loop tracks the duffing scenario to a steady error comparable
with the MPC loop, (c) the serving Controller reproduces the fused loop in
LQR mode (one shared body), (d) with r = 0 the law collapses to the
reference's literal dead-code semantics u = -K z.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from koopmanx import configs as C
from koopmanx.run import build_pipeline, run_single


def _cfg(steps=200, **mpc_over):
    cfg = C.duffing_nn_preset()
    cfg.steps = steps
    cfg.dtype = "float64"
    cfg.switch_step = 10**9
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    cfg.mpc.controller = "lqr"
    for k, v in mpc_over.items():
        setattr(cfg.mpc, k, v)
    return cfg


def _numpy_lqr_oracle(model, g, q_block, r_block, r0, z):
    """Independent f64 oracle: scipy DARE gain + least-squares steady-state
    target + clipped law — different Riccati algorithm and library from the
    production doubling iteration."""
    a = np.asarray(model.A, np.float64)
    b = np.asarray(model.B, np.float64)
    g = np.asarray(g, np.float64)
    nlift, m = a.shape[0], b.shape[1]
    q = g.T @ np.asarray(q_block) @ g + 1e-9 * np.trace(
        np.asarray(q_block)
    ) * np.eye(nlift)
    r = np.atleast_2d(np.asarray(r_block))
    p = scipy.linalg.solve_discrete_are(a, b, q, r)
    k = np.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)
    mmat = np.block(
        [[a - np.eye(nlift), b], [g, np.zeros((g.shape[0], m))]]
    )
    rhs = np.concatenate([np.zeros(nlift), np.asarray(r0, np.float64)])
    w = np.linalg.solve(
        mmat.T @ mmat + 1e-8 * np.eye(nlift + m), mmat.T @ rhs
    )
    z_ss, u_ss = w[:nlift], w[nlift:]
    return np.clip(u_ss - k @ (np.asarray(z) - z_ss), -2.0, 2.0)


def test_lqr_matches_numpy_oracle():
    """update='off' freezes the model: every step's input must match the
    NumPy oracle evaluated at the logged state."""
    cfg = _cfg(steps=40)
    cfg.update = C.UpdateConfig(mode="off")
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    xs = np.asarray(log.x)
    us = np.asarray(log.u)
    assert np.isfinite(xs).all() and np.isfinite(us).all()
    g = np.asarray(pipe.model0.C)
    r0 = np.zeros(2)
    r0[0] = 1.0
    for i in range(0, 40, 5):
        z = np.asarray(pipe.dictionary(jnp.asarray(xs[i])))
        u_oracle = _numpy_lqr_oracle(
            pipe.model0, g, pipe.params.q_block, pipe.params.r_block, r0, z
        )
        np.testing.assert_allclose(us[i], u_oracle, rtol=0, atol=1e-7)


def test_lqr_tracks_duffing_vs_mpc():
    """The LQR loop tracks the duffing r=1 scenario (online update on) and
    lands within a modest factor of the MPC loop's settled error."""
    cfg = _cfg(steps=300)
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    x = np.asarray(log.x)
    u = np.asarray(log.u)
    assert np.isfinite(x).all()
    assert np.abs(u).max() <= 2.0 + 1e-9
    err_lqr = abs(float(x[-50:, 0].mean()) - 1.0)

    cfg_mpc = _cfg(steps=300)
    cfg_mpc.mpc.controller = "mpc"
    pipe_mpc = build_pipeline(cfg_mpc)
    _, log_mpc = run_single(pipe_mpc)
    err_mpc = abs(float(np.asarray(log_mpc.x)[-50:, 0].mean()) - 1.0)
    # LQR has no preview/constraint handling, so allow slack — but it must
    # genuinely settle at the setpoint
    assert err_lqr < 0.05, (err_lqr, err_mpc)
    assert err_lqr < max(10 * err_mpc, 0.05)


def test_lqr_serving_matches_loop():
    """Controller.step in LQR mode ≡ the fused loop (one shared body)."""
    from koopmanx.engine.controller import Controller
    from koopmanx.systems import get_system, make_step

    cfg = _cfg(steps=40)
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    system = get_system(cfg.system)
    plant = make_step(system, pipe.engine_cfg.h, pipe.engine_cfg.integrator)
    ctrl = Controller.from_pipeline(pipe)
    x = pipe.x_init
    xs, us = [], []
    for _ in range(40):
        xs.append(np.asarray(x))
        u = ctrl.step(x)
        us.append(np.asarray(u))
        x = plant(x, u, system.theta0)
    np.testing.assert_allclose(
        np.stack(xs), np.asarray(log.x), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.stack(us), np.asarray(log.u), rtol=0, atol=1e-6
    )


def test_lqr_zero_reference_is_pure_gain():
    """r = 0: the servo target collapses to (0, 0) and the law is the
    reference's dead-code u = -K z (clipped)."""
    cfg = _cfg(steps=30)
    cfg.reference_value = 0.0
    cfg.update = C.UpdateConfig(mode="off")
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    xs, us = np.asarray(log.x), np.asarray(log.u)
    a = np.asarray(pipe.model0.A, np.float64)
    b = np.asarray(pipe.model0.B, np.float64)
    g = np.asarray(pipe.model0.C, np.float64)
    nlift = a.shape[0]
    q = g.T @ np.asarray(pipe.params.q_block) @ g + 1e-9 * np.trace(
        np.asarray(pipe.params.q_block)
    ) * np.eye(nlift)
    r = np.atleast_2d(np.asarray(pipe.params.r_block))
    p = scipy.linalg.solve_discrete_are(a, b, q, r)
    k = np.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)
    for i in range(0, 30, 7):
        z = np.asarray(pipe.dictionary(jnp.asarray(xs[i])))
        np.testing.assert_allclose(
            us[i], np.clip(-k @ z, -2.0, 2.0), rtol=0, atol=1e-7
        )


def test_lqr_rejects_mpc_only_features():
    from koopmanx.engine.core import EngineConfig, make_control_solver

    cfg = _cfg()
    pipe_cfg = dataclasses.replace(
        EngineConfig(controller="lqr"), delta_u=True
    )
    with pytest.raises(ValueError):
        make_control_solver(None, pipe_cfg, lambda s: None, 1)
    with pytest.raises(ValueError):
        make_control_solver(
            None, EngineConfig(controller="nope"), lambda s: None, 1
        )

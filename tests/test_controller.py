"""Serving-API controller: step-by-step control of an external plant must
reproduce the fused closed loop's behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx import configs as C
from koopmanx.engine.controller import Controller
from koopmanx.eval.persist import load_pytree, save_pytree
from koopmanx.run import build_pipeline, run_single
from koopmanx.systems import DUFFING, make_step


def _pipe(steps=120):
    cfg = C.duffing_nn_preset()
    cfg.steps = steps
    cfg.dtype = "float64"
    cfg.switch_step = 10**9
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    return build_pipeline(cfg), cfg


def test_controller_tracks_external_plant():
    pipe, cfg = _pipe()
    ctrl = Controller.from_pipeline(pipe)
    plant = make_step(DUFFING, 0.05)
    x = jnp.array([-2.0, -2.0], dtype=jnp.float64)
    xs = []
    for _ in range(150):
        u = ctrl.step(x)
        assert float(jnp.abs(u).max()) <= 2.0 + 1e-9
        x = plant(x, u, DUFFING.theta0)
        xs.append(np.asarray(x))
    xs = np.stack(xs)
    assert np.isfinite(xs).all()
    assert abs(xs[-20:, 0].mean() - 1.0) < 0.1, xs[-5:, 0]


def test_controller_matches_fused_loop():
    """Driving the controller with the same plant externally reproduces the
    internal closed loop (same per-step pipeline, same state evolution)."""
    pipe, cfg = _pipe(steps=60)
    _, log = run_single(pipe)
    x_loop = np.asarray(log.x)

    ctrl = Controller.from_pipeline(pipe)
    plant = make_step(DUFFING, 0.05)
    x = pipe.x_init
    xs = []
    for _ in range(60):
        xs.append(np.asarray(x))
        u = ctrl.step(x)
        x = plant(x, u, DUFFING.theta0)
    xs = np.stack(xs)
    # both harnesses share one per-step body (engine/core.py) and see the
    # same data at the same step (the loop absorbs (z_k, u_k, z_{k+1})
    # inside step k; the controller receives the identical pair at call
    # k+1 before solving for u_{k+1}) — only cross-program fp noise
    # remains; see tests/test_controller_equiv.py for the full-mode matrix
    assert np.abs(xs - x_loop).max() < 1e-6, np.abs(xs - x_loop).max()


def test_controller_state_checkpoint(tmp_path):
    pipe, _ = _pipe(steps=40)
    ctrl = Controller.from_pipeline(pipe)
    plant = make_step(DUFFING, 0.05)
    x = jnp.array([-1.0, 0.5], dtype=jnp.float64)
    for _ in range(10):
        u = ctrl.step(x)
        x = plant(x, u, DUFFING.theta0)
    path = str(tmp_path / "ctrl.npz")
    save_pytree(path, ctrl.state, meta=10)
    # a fresh controller restored from the checkpoint continues identically
    ctrl2 = Controller.from_pipeline(pipe)
    ctrl2.state, k = load_pytree(path, ctrl2.state)
    ctrl2._k = k
    u1 = ctrl.step(x)
    u2 = ctrl2.step(x)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-12)


def test_controller_reset_keeps_adaptation():
    """reset() starts a new episode but KEEPS the online-adapted model;
    reset(full=True) restores the initial offline model."""
    pipe, _ = _pipe(steps=40)
    ctrl = Controller.from_pipeline(pipe)
    plant = make_step(DUFFING, 0.05)
    x = jnp.array([-1.5, 1.0], dtype=jnp.float64)
    for _ in range(15):
        u = ctrl.step(x)
        x = plant(x, u, DUFFING.theta0)
    a_adapted = np.asarray(ctrl.state.model.A).copy()
    assert np.abs(a_adapted - np.asarray(pipe.model0.A)).max() > 1e-9

    ctrl.reset()
    assert ctrl._k == 0
    assert not bool(ctrl.state.have_prev)
    np.testing.assert_array_equal(np.asarray(ctrl.state.model.A), a_adapted)
    assert float(jnp.abs(ctrl.state.warm_x).max()) == 0.0

    ctrl.reset(full=True)
    np.testing.assert_array_equal(
        np.asarray(ctrl.state.model.A), np.asarray(pipe.model0.A)
    )

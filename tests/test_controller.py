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


def test_controller_reset_keeps_cert_and_change_baseline():
    """reset() keeps the last sane certificate and the change-detection
    residual baseline — both are products of adaptation, like the model
    (advisor finding r3). reset(full=True) restores the conservative
    seeds."""
    cfg = C.duffing_nn_preset()
    cfg.steps = 40
    cfg.dtype = "float64"
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    cfg.mpc.terminal_synthesis = True
    cfg.update.reset_mult = 50.0  # enables the res_ema track, never fires
    pipe = build_pipeline(cfg)
    ctrl = Controller.from_pipeline(pipe)
    plant = make_step(DUFFING, 0.05)
    x = jnp.array([-1.5, 1.0], dtype=jnp.float64)
    for _ in range(12):
        u = ctrl.step(x)
        x = plant(x, u, DUFFING.theta0)
    p_seed = np.asarray(ctrl._init.cert[0])
    p_adapted = np.asarray(ctrl.state.cert[0]).copy()
    ema_adapted = float(ctrl.state.res_ema)
    assert np.abs(p_adapted - p_seed).max() > 1e-9  # synthesis replaced the seed
    assert ema_adapted > 0.0

    ctrl.reset()
    np.testing.assert_array_equal(np.asarray(ctrl.state.cert[0]), p_adapted)
    assert float(ctrl.state.res_ema) == ema_adapted
    ctrl.reset(full=True)
    np.testing.assert_array_equal(np.asarray(ctrl.state.cert[0]), p_seed)
    assert float(ctrl.state.res_ema) == 0.0


def test_batched_controller_reset_masked():
    """BatchedController.reset resets a SUBSET of the fleet: selected
    plants clear transient state and restart their episode clock while
    keeping their adapted model; unselected plants are untouched."""
    from koopmanx.engine.controller import BatchedController
    from koopmanx.run import _dtype, _ref_fn

    pipe, _ = _pipe(steps=40)
    ref_fn = _ref_fn(
        pipe.config, pipe.dictionary, pipe.params.q_block.shape[0],
        _dtype(pipe.config),
    )
    batch = 3
    bc = BatchedController(
        pipe.dictionary, pipe.engine_cfg, pipe.params, ref_fn,
        pipe.model0, pipe.rls0, batch=batch,
    )
    plant = make_step(DUFFING, 0.05)
    x_b = jnp.stack([
        jnp.array([-1.5, 1.0]), jnp.array([0.5, -0.5]), jnp.array([1.0, 1.0])
    ]).astype(jnp.float64)
    for _ in range(6):
        u_b = bc.step(x_b)
        x_b = jax.vmap(lambda x, u: plant(x, u, DUFFING.theta0))(x_b, u_b)
    model_pre = np.asarray(bc.state.model.A).copy()
    warm_pre = np.asarray(bc.state.warm_x).copy()
    assert np.abs(warm_pre[1]).max() > 0

    bc.reset(mask=jnp.array([True, False, False]))
    np.testing.assert_array_equal(np.asarray(bc._k), [0, 6, 6])
    hp = np.asarray(bc.state.have_prev)
    assert not hp[0] and hp[1] and hp[2]
    # plant 0: transient cleared, adapted model KEPT
    assert np.abs(np.asarray(bc.state.warm_x[0])).max() == 0.0
    np.testing.assert_array_equal(np.asarray(bc.state.model.A[0]), model_pre[0])
    # plants 1-2: completely untouched
    np.testing.assert_array_equal(np.asarray(bc.state.warm_x[1:]), warm_pre[1:])
    np.testing.assert_array_equal(np.asarray(bc.state.model.A[1:]), model_pre[1:])

    # full=True restores the offline model for the selected plant only
    bc.reset(full=True, mask=jnp.array([False, True, False]))
    np.testing.assert_array_equal(
        np.asarray(bc.state.model.A[1]), np.asarray(pipe.model0.A)
    )
    np.testing.assert_array_equal(np.asarray(bc.state.model.A[2]), model_pre[2])
    np.testing.assert_array_equal(np.asarray(bc._k), [0, 0, 6])

    # the fleet keeps running after a masked reset
    u_b = bc.step(x_b)
    assert np.isfinite(np.asarray(u_b)).all()
    with pytest.raises(ValueError):
        bc.reset(mask=jnp.array([True, False]))


def test_batched_controller_masked_reset_matches_fresh_single():
    """After reset(mask=[plant 0]), plant 0 must evolve EXACTLY like a
    single Controller whose state was reset the same way — the per-plant
    episode clock (vmapped step index) is what makes this hold."""
    from koopmanx.engine.controller import BatchedController
    from koopmanx.run import _dtype, _ref_fn

    pipe, _ = _pipe(steps=40)
    ref_fn = _ref_fn(
        pipe.config, pipe.dictionary, pipe.params.q_block.shape[0],
        _dtype(pipe.config),
    )
    bc = BatchedController(
        pipe.dictionary, pipe.engine_cfg, pipe.params, ref_fn,
        pipe.model0, pipe.rls0, batch=2,
    )
    single = Controller.from_pipeline(pipe)
    plant = make_step(DUFFING, 0.05)
    x = jnp.array([-1.5, 1.0], dtype=jnp.float64)
    x_b = jnp.stack([x, jnp.array([0.5, -0.5], dtype=jnp.float64)])
    for _ in range(5):
        u_b = bc.step(x_b)
        u_s = single.step(x_b[0])
        np.testing.assert_allclose(
            np.asarray(u_b[0]), np.asarray(u_s), rtol=0, atol=1e-12
        )
        x_b = jax.vmap(lambda xi, ui: plant(xi, ui, DUFFING.theta0))(x_b, u_b)
    bc.reset(mask=jnp.array([True, False]))
    single.reset()
    for _ in range(5):
        u_b = bc.step(x_b)
        u_s = single.step(x_b[0])
        np.testing.assert_allclose(
            np.asarray(u_b[0]), np.asarray(u_s), rtol=0, atol=1e-12
        )
        x_b = jax.vmap(lambda xi, ui: plant(xi, ui, DUFFING.theta0))(x_b, u_b)

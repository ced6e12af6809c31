"""Serving Controller ≡ fused loop, bit-for-bit.

Both harnesses now share ONE per-step implementation
(:mod:`koopmanx.engine.core`): the loop updates the estimator with
``(z_k, u_k, z_{k+1})`` inside step k; the serving controller receives the
same pair one call later as ``(z_prev, u_prev, z)`` — so the model that
solves for ``u_k`` has absorbed exactly the same data, and driving the
controller against an externally-stepped copy of the same plant must
reproduce the loop's ``(x, u)`` trajectories to floating-point noise, for
EVERY update mode and engine feature.

Reference capability: the per-step serve loop,
``/root/reference/Tank_System.m:170-291``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx import configs as C
from koopmanx.engine.controller import BatchedController, Controller
from koopmanx.run import build_pipeline, run_single
from koopmanx.systems import get_system, make_step
from koopmanx.systems.base import make_switch_schedule

STEPS = 50


def _small_duffing(**over):
    cfg = C.duffing_nn_preset()
    cfg.steps = STEPS
    cfg.dtype = "float64"
    cfg.switch_step = over.pop("switch_step", 10**9)
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def _drive_controller(pipe, steps=STEPS):
    """Step the Controller against an externally-simulated copy of the
    pipeline's plant (same integrator, same switch schedule)."""
    ecfg = pipe.engine_cfg
    system = get_system(pipe.config.system)
    plant = make_step(system, ecfg.h, ecfg.integrator)
    dtype = pipe.x_init.dtype
    as_dt = lambda t: jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, dtype), t
    )
    sched = make_switch_schedule(
        as_dt(system.theta0), as_dt(system.theta1), ecfg.switch_step
    )
    ctrl = Controller.from_pipeline(pipe)
    x = pipe.x_init
    xs, us = [], []
    for k in range(steps):
        xs.append(np.asarray(x))
        u = ctrl.step(x)
        us.append(np.asarray(u))
        x = plant(x, u, sched(jnp.asarray(k)))
    return np.stack(xs), np.stack(us)


# The two harnesses run IDENTICAL math but in different XLA programs (the
# loop fuses the plant step into the scan body; the external plant is its
# own dispatch), so fusion/reassociation rounding differs at ~1e-16 per
# step and the closed loop amplifies it — observed max 1.5e-8 over 50
# steps (f64). 1e-6 is still 4 orders below any dynamics scale here and
# ~50000x tighter than the pre-unification gate (0.05).
def _assert_equiv(cfg, steps=STEPS, tol=1e-6):
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    xs, us = _drive_controller(pipe, steps)
    np.testing.assert_allclose(xs, np.asarray(log.x), rtol=0, atol=tol)
    np.testing.assert_allclose(us, np.asarray(log.u), rtol=0, atol=tol)


@pytest.mark.parametrize(
    "mode,extra,tol",
    [
        ("rls", {}, 1e-6),
        ("rls_sqrt", {"ridge": 1e-6, "dither": 0.02}, 1e-6),
        # rls_chol refits from the Gram (an SPD inverse) EVERY step — the
        # most noise-amplifying mode (observed 1.9e-6 over 50 steps)
        ("rls_chol", {"reset_mult": 4.0}, 1e-4),
        ("windowed", {"window": 32}, 1e-6),
        # refit cadence + step-scheduled filter: the estimator's
        # step-driven schedules must line up across harnesses (the serving
        # controller absorbs each pair one call later, so it passes the
        # pair's ORIGIN step k-1 to the estimator)
        (
            "windowed",
            {
                "window": 32,
                "window_refit_every": 3,
                "window_filter_late": 12,
                "window_filter_warmup": 10,
            },
            1e-6,
        ),
        ("storage", {}, 1e-6),
        ("off", {}, 1e-6),
        # Woodbury lane: carried Gram inverses + per-step extraction; the
        # serving controller must thread the extra WindowState statistics
        # identically (incl. the anchor cond on the episode clock)
        (
            "windowed",
            {"window": 32, "window_carry": "woodbury",
             "window_anchor": 16, "ridge": 1e-2},
            1e-6,
        ),
    ],
)
def test_controller_equiv_update_modes(mode, extra, tol):
    """Controller.step ≡ loop.one_step across every update mode (plus the
    dither probe and the change-detection reset where they apply)."""
    cfg = _small_duffing()
    cfg.update = C.UpdateConfig(mode=mode, **extra)
    _assert_equiv(cfg, tol=tol)


def test_controller_equiv_plant_switch():
    """The mid-run plant-parameter switch is reproduced externally."""
    cfg = _small_duffing(switch_step=20)
    _assert_equiv(cfg)


def test_controller_equiv_tank_delta_u():
    """Δu formulation: accumulator, input-magnitude rows, applied-bound
    projection, c_pairing='same' (Tank_System.m:107-290 semantics)."""
    cfg = C.tank_preset()
    cfg.steps = STEPS
    cfg.dtype = "float64"
    cfg.switch_step = 10**9
    cfg.data = C.DataConfig(
        n_step=40, n_traj=40, u_range=(-5.0, 5.0), clamp_x0=True
    )
    _assert_equiv(cfg)


def test_controller_equiv_terminal_synthesis():
    """Per-step terminal synthesis + certificate guard (Revise_2 pipeline:
    warm-started RLS, MATLAB RK4, DARE terminal)."""
    cfg = C.revise2_duffing_preset()
    cfg.steps = STEPS
    cfg.dtype = "float64"
    cfg.switch_step = 10**9
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    _assert_equiv(cfg)


def test_controller_equiv_state_bounds():
    """Revise_2 state-box rows take the general-inequality QP path."""
    cfg = _small_duffing()
    cfg.mpc.state_bounds = (-3.0, 3.0)
    _assert_equiv(cfg)


def test_batched_controller_matches_single():
    """BatchedController(B plants) ≡ B independent Controllers (same step
    function under vmap), with distinct initial states."""
    cfg = _small_duffing()
    pipe = build_pipeline(cfg)
    from koopmanx.run import _dtype, _ref_fn

    ref_fn = _ref_fn(
        pipe.config, pipe.dictionary, pipe.params.q_block.shape[0],
        _dtype(pipe.config),
    )
    batch = 3
    bc = BatchedController(
        pipe.dictionary, pipe.engine_cfg, pipe.params, ref_fn,
        pipe.model0, pipe.rls0, batch=batch,
    )
    singles = [Controller.from_pipeline(pipe) for _ in range(batch)]
    ecfg = pipe.engine_cfg
    system = get_system(pipe.config.system)
    plant = make_step(system, ecfg.h, ecfg.integrator)
    th0 = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, pipe.x_init.dtype), system.theta0
    )
    x_b = jnp.stack(
        [pipe.x_init, pipe.x_init + 0.1, pipe.x_init - 0.2]
    )
    xs = [x_b[i] for i in range(batch)]
    for _ in range(10):
        u_b = bc.step(x_b)
        u_s = [singles[i].step(xs[i]) for i in range(batch)]
        np.testing.assert_allclose(
            np.asarray(u_b), np.stack([np.asarray(u) for u in u_s]),
            rtol=0, atol=1e-9,
        )
        xs = [plant(xs[i], u_s[i], th0) for i in range(batch)]
        x_b = jnp.stack(xs)


def test_batched_controller_heterogeneous_params():
    """batch_params=True: per-plant MPCParams (different R weights) under
    one vmapped step — plants must receive genuinely different inputs."""
    cfg = _small_duffing()
    pipe = build_pipeline(cfg)
    from koopmanx.run import _dtype, _ref_fn

    ref_fn = _ref_fn(
        pipe.config, pipe.dictionary, pipe.params.q_block.shape[0],
        _dtype(pipe.config),
    )
    batch = 3
    # scale the input weight enough that the heavier plants leave the
    # u_max=2 saturation from x0=[-2,-2] (base r_weight is 1e-4)
    scales = jnp.array([1.0, 1e7, 1e9], dtype=pipe.params.r_block.dtype)
    params_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), pipe.params
    )
    params_b = params_b._replace(
        r_block=params_b.r_block * scales[:, None, None]
    )
    bc = BatchedController(
        pipe.dictionary, pipe.engine_cfg, params_b, ref_fn,
        pipe.model0, pipe.rls0, batch=batch, batch_params=True,
    )
    x_b = jnp.broadcast_to(pipe.x_init, (batch,) + pipe.x_init.shape)
    u1 = bc.step(x_b)
    u2 = bc.step(x_b)  # second call exercises the update path too
    u = np.asarray(u1)
    assert np.isfinite(np.asarray(u2)).all()
    # heavier input penalty -> strictly smaller first move
    assert abs(u[0, 0]) > abs(u[1, 0]) > abs(u[2, 0]), u[:, 0]


def test_controller_equiv_kkt_refine():
    """The carried-NS KKT inverse mode (qp_kkt_refine) is threaded through
    BOTH harnesses identically: the serving controller must reproduce the
    fused loop with the mode on (same anchor schedule via the step index)."""
    cfg = _small_duffing()
    cfg.mpc.qp_kkt_refine = 3
    cfg.mpc.qp_kkt_reanchor = 16
    _assert_equiv(cfg)

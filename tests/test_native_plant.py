"""Native C++ plant simulator (csrc/plant_sim.cpp) vs the JAX integrators.

The C++ side is an independent re-statement of every registry plant and
both RK4 variants (systems/base.py::rk4_step / rk4_step_k1k4) — agreement
to f64 roundoff pins BOTH implementations: the oracle role of the native
plant, and the precondition for the hardware-in-the-loop serving harness
(tools/bench_hil.py) where the plant steps outside the JAX graph.
"""
from __future__ import annotations

import numpy as np
import pytest

from koopmanx.systems.base import make_step
from koopmanx.systems.library import REGISTRY

try:
    from koopmanx.systems import native

    native._load()
    HAVE_NATIVE = True
except Exception:  # NativeUnavailable / no toolchain
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")

H = 0.05


@pytest.mark.parametrize("name", sorted(REGISTRY))
@pytest.mark.parametrize("integrator", ["rk4", "rk4_matlab"])
def test_native_step_matches_jax(name, integrator):
    sys = REGISTRY[name]
    if sys.discrete and integrator == "rk4_matlab":
        pytest.skip("integrator ignored for discrete plants")
    step = make_step(sys, H, integrator)
    rng = np.random.default_rng(0)
    for theta in (sys.theta0, sys.theta1):
        for _ in range(5):
            x = rng.uniform(0.1 if sys.clamp else -2.0, 2.0, size=sys.n)
            u = rng.uniform(-3.0, 3.0, size=sys.m)
            ref = np.asarray(step(x, u, theta), dtype=np.float64)
            got = native.native_step(sys, x, u, theta, H, integrator)
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


@pytest.mark.parametrize("name", ["duffing", "tank_mimo"])
def test_native_fleet_step_matches_singles(name):
    """The fleet entry point (one call advances B plants — the
    BatchedController HIL side) equals B single steps, including
    per-plant heterogeneous parameters."""
    sys = REGISTRY[name]
    rng = np.random.default_rng(2)
    b = 7
    x = rng.uniform(0.1 if sys.clamp else -2.0, 2.0, size=(b, sys.n))
    u = rng.uniform(-3.0, 3.0, size=(b, sys.m))
    # heterogeneous: each plant's params scaled by a different factor
    scales = rng.uniform(0.8, 1.2, size=b)
    theta_b = type(sys.theta0)(
        *[np.asarray(v) * scales for v in sys.theta0]
    )
    got = native.native_step_batch(
        sys, x, u, theta_b, H, per_plant_theta=True
    )
    for i in range(b):
        theta_i = type(sys.theta0)(*[float(v[i]) for v in theta_b])
        ref = native.native_step(sys, x[i], u[i], theta_i, H)
        np.testing.assert_allclose(got[i], ref, rtol=0, atol=0)
    # shared-theta path
    got_shared = native.native_step_batch(sys, x, u, sys.theta0, H)
    for i in range(b):
        ref = native.native_step(sys, x[i], u[i], sys.theta0, H)
        np.testing.assert_allclose(got_shared[i], ref, rtol=0, atol=0)


def test_hil_loop_matches_in_graph_loop():
    """End-to-end runtime pin: the hardware-in-the-loop serving loop
    (Controller.step on the device + the NATIVE C++ plant stepping outside
    the JAX graph, tools/bench_hil.py's structure) reproduces the in-graph
    ``run_single`` scan — f64, through the tank's step-100 plant switch.
    Catches step-index misalignment (the `i > switch` pattern), dtype
    drift, and any Controller-vs-loop divergence at once."""
    import jax

    from koopmanx import configs as C
    from koopmanx.engine.controller import Controller
    from koopmanx.run import build_pipeline, run_single

    cfg = C.PRESETS["tank"]()
    cfg.steps = 160
    cfg.dtype = "float64"
    cfg.data = C.DataConfig(
        n_step=40, n_traj=40, u_range=(-5.0, 5.0), clamp_x0=True
    )
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    x_ref = np.asarray(log.x, dtype=np.float64)

    system = REGISTRY[cfg.system]
    ctrl = Controller.from_pipeline(pipe)
    x = np.asarray(pipe.x_init, dtype=np.float64)
    xs = []
    for k in range(cfg.steps):
        u = np.asarray(jax.block_until_ready(ctrl.step(x)), dtype=np.float64)
        theta = system.theta1 if k > cfg.switch_step else system.theta0
        x = native.native_step(
            system, x, u, theta, cfg.data.h, cfg.integrator
        )
        xs.append(x)
    # log.x records the PRE-step state (loop.py StepLog), so the HIL
    # state after step k is the log's state at k+1.
    # Tolerance: 1e-5, not machine-eps — the serving Controller and the
    # fused scan are DIFFERENT compiled programs, and XLA's fusion /
    # reassociation choices differ at the ulp level between them; the
    # windowed tank loop amplifies that through the switch (measured
    # 8.9e-7 max under applied_bounds='box' vs 2.2e-9 under 'rows',
    # identical semantics both — the pin's purpose is catching index
    # misalignment / dtype drift, which produce O(1) deviations).
    np.testing.assert_allclose(
        np.stack(xs)[:-1], x_ref[1:], rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("name", ["duffing", "tank3", "pendulum"])
def test_native_rollout_matches_jax(name):
    sys = REGISTRY[name]
    step = make_step(sys, H, "rk4")
    rng = np.random.default_rng(1)
    x0 = rng.uniform(0.1 if sys.clamp else -1.0, 1.0, size=sys.n)
    u_seq = rng.uniform(-2.0, 2.0, size=(40, sys.m))
    xs = []
    x = x0
    for t in range(40):
        x = np.asarray(step(x, u_seq[t], sys.theta0), dtype=np.float64)
        xs.append(x)
    got = native.native_rollout(sys, x0, u_seq, sys.theta0, H)
    np.testing.assert_allclose(got, np.stack(xs), rtol=0, atol=1e-11)

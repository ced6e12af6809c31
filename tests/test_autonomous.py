"""Autonomous/offline generators (systems/autonomous.py) — the training
file's solve_ivp + LTI-snapshot utilities (DeepLearning_KoopmanControl_
Approach3.py:17-205)."""
import jax
import jax.numpy as jnp
import numpy as np

from koopmanx.edmd.batch import edmd_fit
from koopmanx.lifts.base import identity_dictionary
from koopmanx.systems.autonomous import (
    duffing_solve,
    ez_example_solve,
    lti_snapshots,
    pairs_from_rollouts,
)
from koopmanx.systems.data import Snapshots


def test_lti_snapshots_edmd_recovers_operator():
    """Pure EDMD on the LTI pairs with the identity dictionary recovers
    J = [[0.9, -0.1], [0, 0.8]] to machine precision (the reference's
    get_K sanity check, :180-205)."""
    rng = np.random.default_rng(0)
    x, y = lti_snapshots(500, rng=rng)
    d = identity_dictionary(2)
    data = Snapshots(
        x=jnp.asarray(x), y=jnp.asarray(y),
        u=jnp.zeros((500, 1), dtype=jnp.float64),
    )
    model = edmd_fit(d, data, method="pinv")
    np.testing.assert_allclose(
        np.asarray(model.A), [[0.9, -0.1], [0.0, 0.8]], atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(model.C), np.eye(2), atol=1e-10)


def test_autonomous_duffing_lsoda_matches_rk4():
    """The adaptive LSODA rollout agrees with the engine's fixed-step RK4
    at matching sample times (cross-validates both integrators)."""
    from koopmanx.systems import get_system, make_step

    from koopmanx.systems.autonomous import (
        autonomous_rollout_ivp,
        duffing_autonomous_field,
    )

    rng = np.random.default_rng(1)
    x0 = rng.uniform(-2.0, 2.0, size=(3, 2))
    # tight solver tolerances so LSODA's own error (default rtol 1e-3)
    # does not mask the comparison
    traj = autonomous_rollout_ivp(
        duffing_autonomous_field, x0, (0.0, 2.75), 11,
        rtol=1e-10, atol=1e-12,
    )
    assert traj.shape == (3, 11, 2)
    assert np.isfinite(traj).all()
    system = get_system("duffing")
    h = 2.75 / 10 / 50  # 50 RK4 substeps per LSODA sample
    step = jax.jit(make_step(system, h))
    u0 = jnp.zeros((1,), dtype=jnp.float64)
    for b in range(3):
        x = jnp.asarray(traj[b, 0], dtype=jnp.float64)
        for k in range(1, 11):
            for _ in range(50):
                x = step(x, u0, system.theta0)
            np.testing.assert_allclose(
                np.asarray(x), traj[b, k], atol=1e-6,
                err_msg=f"traj {b} sample {k}",
            )


def test_ez_example_rollout_shapes():
    rng = np.random.default_rng(2)
    traj = ez_example_solve(n_traj=8, n_eval=10, rng=rng)
    assert traj.shape == (8, 10, 2)
    x, y = pairs_from_rollouts(traj)
    assert x.shape == (8 * 9, 2) and y.shape == (8 * 9, 2)
    np.testing.assert_allclose(x[1], traj[0, 1])
    np.testing.assert_allclose(y[0], traj[0, 1])

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx import configs as C
from koopmanx.edmd import edmd_fit
from koopmanx.engine.scenario import sample_scenarios
from koopmanx.lifts import identity_dictionary
from koopmanx.parallel import (
    distributed_edmd_fit,
    make_mesh,
    psum_mean,
    shard_batch,
    sharded_closed_loop,
)
from koopmanx.run import build_pipeline
from koopmanx.systems import get_system
from koopmanx.systems.data import Snapshots


def test_mesh_has_8_devices(mesh8):
    assert mesh8.devices.size == 8


def test_distributed_edmd_matches_single_device(mesh8):
    key = jax.random.PRNGKey(0)
    a = jnp.array([[0.9, 0.1], [0.0, 0.8]])
    b = jnp.array([[0.1], [0.2]])
    kx, ku = jax.random.split(key)
    x = jax.random.normal(kx, (160, 2), dtype=jnp.float64)
    u = jax.random.normal(ku, (160, 1), dtype=jnp.float64)
    y = x @ a.T + u @ b.T
    data = Snapshots(x=x, y=y, u=u)
    d = identity_dictionary(2)
    local = edmd_fit(d, data, method="solve")
    dist = distributed_edmd_fit(d, shard_batch(data, mesh8), mesh8)
    np.testing.assert_allclose(np.asarray(dist.A), np.asarray(local.A), atol=1e-10)
    np.testing.assert_allclose(np.asarray(dist.B), np.asarray(local.B), atol=1e-10)
    np.testing.assert_allclose(np.asarray(dist.C), np.asarray(local.C), atol=1e-10)


def test_psum_mean(mesh8):
    v = jnp.arange(16.0)
    got = psum_mean(shard_batch(v, mesh8), mesh8)
    np.testing.assert_allclose(float(got), 7.5, rtol=1e-12)


def test_sharded_closed_loop_matches_vmap(mesh8):
    """shard_map over 8 CPU devices == plain vmap (determinism/parity
    across replicas — the SURVEY §5 'race detection' analog)."""
    cfg = C.duffing_nn_preset()
    cfg.steps = 25
    cfg.dtype = "float64"
    cfg.data = C.DataConfig(n_step=30, n_traj=30)
    cfg.lift = C.LiftConfig(
        kind="mlp", nlift=8,
        weights_path="/root/reference/Revise_2/duffing_weights.mat",
    )
    pipe = build_pipeline(cfg)
    batch = sample_scenarios(
        get_system("duffing"), jax.random.PRNGKey(1), batch=16,
        param_scale=0.1, dtype=jnp.float64,
    )
    rep = lambda v: jnp.broadcast_to(v, (16,) + v.shape)
    params_b = jax.tree_util.tree_map(rep, pipe.params)
    model_b = jax.tree_util.tree_map(rep, pipe.model0)
    rls_b = jax.tree_util.tree_map(rep, pipe.rls0)

    # plain vmap (single device)
    from koopmanx.engine.loop import run_batch

    _, logs_vmap = run_batch(
        pipe.closed_loop, params_b, batch.x0, model_b, rls_b,
        batch.theta0, batch.theta1,
    )
    # shard_map over the 8-device mesh
    _, logs_shard = sharded_closed_loop(
        pipe.closed_loop,
        mesh8,
        shard_batch(params_b, mesh8),
        shard_batch(batch.x0, mesh8),
        shard_batch(model_b, mesh8),
        shard_batch(rls_b, mesh8),
        shard_batch(batch.theta0, mesh8),
        shard_batch(batch.theta1, mesh8),
    )
    # sharded vs single-device differ only by float reassociation in the
    # partitioned matmuls; the closed loop amplifies that over time, so
    # compare with a loose-but-meaningful absolute tolerance
    np.testing.assert_allclose(
        np.asarray(logs_shard.x), np.asarray(logs_vmap.x), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logs_shard.u), np.asarray(logs_vmap.u), atol=1e-4
    )


def test_sharded_closed_loop_woodbury_estimator(mesh8):
    """The Woodbury windowed lane's extended WindowState (carried Grams,
    inverses, cross-Grams) shards over the scenario mesh like any other
    estimator carry: shard_map == vmap on a tank_mimo-style multi-input
    loop with window_carry='woodbury'."""
    cfg = C.tank_mimo_preset()
    cfg.steps = 20
    cfg.dtype = "float64"
    cfg.data = C.DataConfig(
        n_step=30, n_traj=30, u_range=(-4.0, 4.0), clamp_x0=True
    )
    cfg.update.window_carry = "woodbury"
    cfg.update.ridge = 0.1
    pipe = build_pipeline(cfg)
    batch = sample_scenarios(
        get_system("tank_mimo"), jax.random.PRNGKey(2), batch=16,
        param_scale=0.05, x0_range=(0.1, 0.9), dtype=jnp.float64,
    )
    rep = lambda v: jnp.broadcast_to(v, (16,) + v.shape)
    params_b = jax.tree_util.tree_map(rep, pipe.params)
    model_b = jax.tree_util.tree_map(rep, pipe.model0)
    rls_b = jax.tree_util.tree_map(rep, pipe.rls0)

    from koopmanx.engine.loop import run_batch

    _, logs_vmap = run_batch(
        pipe.closed_loop, params_b, batch.x0, model_b, rls_b,
        batch.theta0, batch.theta1,
    )
    _, logs_shard = sharded_closed_loop(
        pipe.closed_loop,
        mesh8,
        shard_batch(params_b, mesh8),
        shard_batch(batch.x0, mesh8),
        shard_batch(model_b, mesh8),
        shard_batch(rls_b, mesh8),
        shard_batch(batch.theta0, mesh8),
        shard_batch(batch.theta1, mesh8),
    )
    np.testing.assert_allclose(
        np.asarray(logs_shard.x), np.asarray(logs_vmap.x), atol=1e-6
    )
    assert np.isfinite(np.asarray(logs_shard.x)).all()

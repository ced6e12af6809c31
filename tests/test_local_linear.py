"""Local-linearization MPC baseline (engine/local_linear.py) — the
reference's Jacobian comparison (duffing.py:691-706), closed."""
import jax
import jax.numpy as jnp
import numpy as np

from koopmanx import configs as C
from koopmanx.engine.local_linear import (
    affine_augmented_model,
    make_local_linear_loop,
)
from koopmanx.engine.core import MPCParams
from koopmanx.systems import get_system
from koopmanx.types import LinearModel


def test_affine_augmented_model_is_exact():
    """[x+; 1] = A' [x; 1] + B' u reproduces x+ = A x + B u + d exactly."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(3, 3)))
    b = jnp.asarray(rng.normal(size=(3, 2)))
    d = jnp.asarray(rng.normal(size=(3,)))
    x = jnp.asarray(rng.normal(size=(3,)))
    u = jnp.asarray(rng.normal(size=(2,)))
    aug = affine_augmented_model(
        LinearModel(A=a, B=b, C=jnp.eye(3)), d
    )
    z = jnp.concatenate([x, jnp.ones((1,))])
    z_next = aug.A @ z + aug.B @ u
    np.testing.assert_allclose(
        np.asarray(z_next[:3]), np.asarray(a @ x + b @ u + d), rtol=1e-12
    )
    assert float(z_next[3]) == 1.0
    np.testing.assert_allclose(np.asarray(aug.C @ z), np.asarray(x), rtol=1e-12)


def test_local_linear_loop_tracks_duffing():
    """The baseline closes the loop on the Duffing tracking scenario:
    finite, within bounds, settles near r=1 (the A/B the reference stages
    at duffing.py:691-706 — runnable via examples/local_linear_comparison.py)."""
    cfg = C.duffing_nn_preset()
    cfg.steps = 200
    cfg.dtype = "float64"
    cfg.switch_step = 10**9
    # build engine cfg + params without the Koopman pipeline (no lift needed)
    from koopmanx.lifts.base import constant_augmented
    from koopmanx.run import _dtype, _mpc_params, _ref_fn, engine_config

    system = get_system(cfg.system)
    dictionary = constant_augmented(system.n)
    params = _mpc_params(cfg, dictionary, system)
    engine_cfg = engine_config(cfg)
    ref_fn = _ref_fn(cfg, dictionary, params.q_block.shape[0], _dtype(cfg))
    loop = jax.jit(make_local_linear_loop(system, engine_cfg, ref_fn))
    x0 = jnp.array([-2.0, -2.0], dtype=jnp.float64)
    carry, log = loop(params, x0)
    x = np.asarray(log.x)
    u = np.asarray(log.u)
    assert np.isfinite(x).all() and np.isfinite(u).all()
    assert np.abs(u).max() <= 2.0 + 1e-9
    assert abs(x[-20:, 0].mean() - 1.0) < 0.1, x[-5:]

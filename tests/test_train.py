import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx.edmd import edmd_fit
from koopmanx.lifts.mlp import encoder_dictionary
from koopmanx.systems import DUFFING, collect
from koopmanx.train.kmae import KMAEConfig, KMAEState, init_state, make_windows
from koopmanx.train.trainer import (
    export_weights,
    fit,
    load_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def duffing_data():
    return collect(
        DUFFING, jax.random.PRNGKey(0), n_step=30, n_traj=30, dtype=jnp.float64
    )


def test_make_windows_respects_trajectories(duffing_data):
    x_win, u_win = make_windows(
        duffing_data.x, duffing_data.y, duffing_data.u, 30, 4
    )
    assert x_win.shape == (30 * 26, 5, 2)
    assert u_win.shape == (30 * 26, 4, 1)
    # window states are consecutive plant states
    np.testing.assert_allclose(
        np.asarray(x_win[0, 1]), np.asarray(duffing_data.x[1]), rtol=1e-12
    )


def test_kmae_training_reduces_loss(duffing_data):
    cfg = KMAEConfig(pred_horizon=4, epochs=4, rec_only_after_epoch=None, lr=1e-3)
    state, history = fit(
        duffing_data,
        n_step=30,
        cfg=cfg,
        nlift=6,
        hidden=32,
        dtype=jnp.float64,
        batch_windows=128,
        verbose=False,
    )
    assert history[-1]["loss"] < history[0]["loss"] * 0.9
    # trained encoder is usable as a dictionary + EDMD model
    d = encoder_dictionary(
        [(w, b) for w, b in state.params.encoder], n=2
    )
    model = edmd_fit(d, duffing_data)
    assert np.isfinite(np.asarray(model.A)).all()


def test_checkpoint_roundtrip(tmp_path, duffing_data):
    cfg = KMAEConfig(pred_horizon=3, epochs=1)
    state = init_state(jax.random.PRNGKey(1), cfg, n=2, nlift=4, hidden=8, dtype=jnp.float64)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, 7)
    loaded, step = load_checkpoint(path, state)
    assert step == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_export_weights_roundtrip(tmp_path):
    from koopmanx.lifts.io import load_mat_mlp

    cfg = KMAEConfig()
    state = init_state(jax.random.PRNGKey(2), cfg, n=2, nlift=4, hidden=8, dtype=jnp.float64)
    prefix = str(tmp_path / "model")
    export_weights(state, prefix)
    enc = load_mat_mlp(prefix + "_encoder.mat", dtype=jnp.float64)
    for (w1, b1), (w2, b2) in zip(state.params.encoder, enc):
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-7)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-7)

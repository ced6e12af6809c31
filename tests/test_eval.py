import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx import configs as C
from koopmanx.eval.metrics import (
    openloop_rmse,
    rmse,
    steady_state_error,
    tracking_mse,
)
from koopmanx.eval.persist import archive_run, load_pytree, save_pytree
from koopmanx.run import build_pipeline, run_single


@pytest.fixture(scope="module")
def short_log():
    cfg = C.duffing_nn_preset()
    cfg.steps = 30
    cfg.dtype = "float64"
    cfg.data = C.DataConfig(n_step=25, n_traj=25)
    pipe = build_pipeline(cfg)
    carry, log = run_single(pipe)
    return pipe, carry, log


def test_metrics():
    y = jnp.array([1.1, 0.9, 1.0, 1.0])
    r = jnp.ones(4)
    assert abs(float(tracking_mse(y, r)) - 0.005) < 1e-9
    assert abs(float(steady_state_error(y, r, tail=2))) < 1e-9
    assert float(rmse(y, r)) > 0


def test_archive_npz_and_mat(tmp_path, short_log):
    _, _, log = short_log
    path = tmp_path / "bundle"
    archive_run(str(path), log, h=0.05, mat=True)
    data = np.load(str(path) + ".npz")
    assert data["x"].shape == (30, 2)
    assert data["tspan"].shape == (30,)
    import scipy.io as sio

    mat = sio.loadmat(str(path) + ".mat")
    # reference-compatible keys and column-major state layout
    assert mat["logX"].shape == (2, 30)
    assert "A_error" in mat and "epsilon_Set" in mat


def test_pytree_checkpoint_roundtrip(tmp_path, short_log):
    _, carry, _ = short_log
    path = str(tmp_path / "carry.npz")
    save_pytree(path, carry, meta=42)
    loaded, meta = load_pytree(path, carry)
    assert meta == 42
    for a, b in zip(
        jax.tree_util.tree_leaves(carry), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_figure_bundle(tmp_path, short_log):
    pytest.importorskip("matplotlib")
    from koopmanx.eval.plots import save_figure_bundle

    pipe, carry, log = short_log
    prefix = str(tmp_path / "fig")
    save_figure_bundle(
        prefix, log, h=0.05, u_bounds=(-2, 2),
        spectral=(carry.model, pipe.dictionary),
    )
    for suffix in (
        "tracking", "drift", "input", "phase", "spectrum", "eigenfunctions"
    ):
        assert os.path.getsize(f"{prefix}_{suffix}.png") > 1000

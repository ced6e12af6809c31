import jax
import jax.numpy as jnp
import numpy as np

from koopmanx import configs as C
from koopmanx.eval.modes import (
    eigenfunctions,
    mode_amplitudes,
    reconstruct_prediction,
    spectral_decomposition,
    spectrum_summary,
)
from koopmanx.run import build_pipeline
from koopmanx.types import LinearModel


def _model():
    cfg = C.duffing_nn_preset()
    cfg.dtype = "float64"
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    pipe = build_pipeline(cfg)
    return pipe.model0, pipe.dictionary


def test_modal_reconstruction_matches_matrix_power():
    model, d = _model()
    spec = spectral_decomposition(model)
    z0 = np.asarray(d(jnp.array([0.5, -0.5], dtype=jnp.float64)))
    y_modal = reconstruct_prediction(spec, z0, steps=20)
    # direct C A^k z0
    a, c = np.asarray(model.A), np.asarray(model.C)
    z = z0.copy()
    y_direct = []
    for _ in range(20):
        y_direct.append(c @ z)
        z = a @ z
    np.testing.assert_allclose(y_modal, np.stack(y_direct), atol=1e-8)


def test_eigenfunctions_are_koopman_invariant():
    """phi_i(A z) = lambda_i phi_i(z) — the defining property."""
    model, d = _model()
    spec = spectral_decomposition(model)
    rng = np.random.RandomState(0)
    z = rng.randn(5, model.A.shape[0])
    phi = eigenfunctions(spec, z)
    phi_next = eigenfunctions(spec, z @ np.asarray(model.A).T)
    np.testing.assert_allclose(
        phi_next, phi * spec.eigenvalues[None, :], atol=1e-8
    )


def test_spectrum_summary():
    model, _ = _model()
    s = spectrum_summary(model)
    assert 0.5 < s["spectral_radius"] < 1.5
    assert s["controllability_rank"] >= 1
    assert s["nlift"] == 8
    amps = mode_amplitudes(
        spectral_decomposition(model), np.ones(8)
    )
    assert amps.shape == (8,)
    assert np.isfinite(amps).all()


def test_eigenfunction_grid_koopman_invariance():
    """phi_i(A z) = lambda_i phi_i(z) for every grid point — the defining
    Koopman-eigenfunction property of the (linear-in-z) identified model,
    checked on the same grid the gallery renders."""
    from koopmanx.eval.plots import eigenfunction_grid

    model, d = _model()
    spec = spectral_decomposition(model)
    pts, phi = eigenfunction_grid(
        spec, d, extent=(-2.0, 2.0, -2.0, 2.0), resolution=12
    )
    z = np.asarray(
        jax.vmap(d)(jnp.asarray(pts.reshape(-1, 2)))
    )  # (S, N)
    a = np.asarray(model.A, dtype=np.float64)
    phi_flat = phi.reshape(-1, phi.shape[-1])
    phi_adv = eigenfunctions(spec, z @ a.T)
    np.testing.assert_allclose(
        phi_adv, phi_flat * spec.eigenvalues[None, :], atol=1e-8
    )


def test_eigenfunction_gallery_and_spectrum_figures(tmp_path):
    import pytest

    pytest.importorskip("matplotlib")
    from koopmanx.eval.plots import eigenfunction_gallery, spectrum_plot

    model, d = _model()
    fig = eigenfunction_gallery(model, d, resolution=24, top=6)
    p1 = str(tmp_path / "eigfun.png")
    fig.savefig(p1, dpi=80)
    ax = spectrum_plot(spectral_decomposition(model))
    p2 = str(tmp_path / "spec.png")
    ax.figure.savefig(p2, dpi=80)
    import os

    assert os.path.getsize(p1) > 5000 and os.path.getsize(p2) > 5000


def test_eigenfunction_gallery_1d(tmp_path):
    """The gallery's 1-D branch (line plots) on the toy1d model."""
    import pytest

    pytest.importorskip("matplotlib")
    import os

    from koopmanx.eval.plots import eigenfunction_gallery

    cfg = C.PRESETS["toy1d"]()
    cfg.dtype = "float64"
    cfg.data = C.DataConfig(n_step=1, n_traj=300, u_range=(-1.0, 1.0),
                            x0_range=(-1.0, 1.0))
    from koopmanx.run import build_pipeline

    pipe = build_pipeline(cfg)
    fig = eigenfunction_gallery(
        pipe.model0, pipe.dictionary, extent=(-1.0, 1.0),
        resolution=40, top=4,
    )
    p = str(tmp_path / "eig1d.png")
    fig.savefig(p, dpi=80)
    assert os.path.getsize(p) > 5000

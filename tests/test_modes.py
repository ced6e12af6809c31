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

"""Koopman spectral analysis: eigenvalues, eigenfunctions, modes.

Reference capability (``DeepLearning_KoopmanControl_Approach3.py:254-308``:
``eigendecomposition`` + ``plotDuffingScatter`` griddata mode plots; A
spectrum print at ``duffing.py:627``): decompose the identified operator

  A = W diag(lambda) W^{-1}

Koopman eigenfunctions evaluated at states: phi_i(x) = (W^{-1} psi(x))_i;
Koopman modes in output space: v_i = C W[:, i]. The model prediction then
decomposes as  y_k = sum_i lambda_i^k phi_i(x_0) v_i  — the diagnostic view
of what the lifted linear model learned (continuous-time frequencies/decay
rates via log(lambda)/h).

Eigendecomposition of a nonsymmetric A runs on CPU (jnp.linalg.eig is not
implemented for TPU); this is offline analysis, not the control hot path.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..types import LinearModel


class KoopmanSpectrum(NamedTuple):
    eigenvalues: np.ndarray  # (N,) complex discrete-time eigenvalues
    ct_eigenvalues: np.ndarray  # (N,) log(lambda)/h continuous-time
    eigenvectors: np.ndarray  # (N, N) right eigenvectors W
    left_inverse: np.ndarray  # (N, N) W^{-1}
    modes: np.ndarray  # (p, N) output-space Koopman modes C W
    frequencies_hz: np.ndarray  # (N,) |Im(ct)| / 2pi
    decay_rates: np.ndarray  # (N,) Re(ct)


def spectral_decomposition(model: LinearModel, h: float = 0.05) -> KoopmanSpectrum:
    a = np.asarray(model.A, dtype=np.float64)
    c = np.asarray(model.C, dtype=np.float64)
    lam, w = np.linalg.eig(a)
    w_inv = np.linalg.inv(w)
    ct = np.log(lam.astype(np.complex128)) / h
    return KoopmanSpectrum(
        eigenvalues=lam,
        ct_eigenvalues=ct,
        eigenvectors=w,
        left_inverse=w_inv,
        modes=c.astype(np.complex128) @ w,
        frequencies_hz=np.abs(ct.imag) / (2.0 * np.pi),
        decay_rates=ct.real,
    )


def eigenfunctions(spec: KoopmanSpectrum, z: np.ndarray) -> np.ndarray:
    """Evaluate all Koopman eigenfunctions at lifted states.

    z: (S, N) lifted states -> (S, N) complex phi_i(x_s)."""
    return np.asarray(z, dtype=np.complex128) @ spec.left_inverse.T


def mode_amplitudes(spec: KoopmanSpectrum, z0: np.ndarray) -> np.ndarray:
    """Initial-condition mode amplitudes |phi_i(x0)| * ||v_i|| — ranks which
    modes dominate the prediction from z0."""
    phi0 = spec.left_inverse @ np.asarray(z0, dtype=np.complex128)
    vnorm = np.linalg.norm(spec.modes, axis=0)
    return np.abs(phi0) * vnorm


def reconstruct_prediction(
    spec: KoopmanSpectrum, z0: np.ndarray, steps: int
) -> np.ndarray:
    """Autonomous modal reconstruction y_k = sum_i lambda_i^k phi_i v_i —
    must equal C A^k z0 (modal-consistency check)."""
    phi0 = spec.left_inverse @ np.asarray(z0, dtype=np.complex128)
    powers = spec.eigenvalues[None, :] ** np.arange(steps)[:, None]  # (T, N)
    return np.real((powers * phi0[None, :]) @ spec.modes.T)  # (T, p)


def spectrum_summary(model: LinearModel, h: float = 0.05) -> dict:
    """The sanity numbers the reference prints (duffing.py:627 spectrum,
    :659-665 controllability rank) as a dict."""
    spec = spectral_decomposition(model, h)
    a = np.asarray(model.A, dtype=np.float64)
    b = np.asarray(model.B, dtype=np.float64)
    n = a.shape[0]
    ctrb = np.concatenate(
        [np.linalg.matrix_power(a, k) @ b for k in range(n)], axis=1
    )
    return {
        "spectral_radius": float(np.abs(spec.eigenvalues).max()),
        "eigenvalues_abs": np.abs(spec.eigenvalues).tolist(),
        "dominant_frequency_hz": float(
            spec.frequencies_hz[np.argmax(np.abs(spec.eigenvalues))]
        ),
        "controllability_rank": int(np.linalg.matrix_rank(ctrb)),
        "nlift": n,
    }

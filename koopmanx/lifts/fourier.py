"""Random Fourier feature (RFF) dictionary — ψ(x) = sqrt(2/D) cos(W x + b).

A standard shift-invariant-kernel Koopman dictionary family (Rahimi &
Recht random features for the Gaussian kernel) the reference does not
carry: W rows are sampled N(0, diag(1/(bandwidth*scale)^2)), b ~ U[0, 2π).
Unlike the RBF lifts (pairwise distances to K centers — VPU work), the
RFF map is ONE (n -> D) matmul plus an elementwise cos, so it is
MXU-shaped at production dictionary sizes and composes with the same
state-augmentation / normalization wrappers as every other lift.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from .base import Dictionary

__all__ = ["rff_init", "fourier_dictionary"]


def _rff_apply(params, x: Array) -> Array:
    w, b = params
    d = w.shape[0]
    scale = jnp.sqrt(jnp.asarray(2.0 / d, dtype=x.dtype))
    return scale * jnp.cos(x @ w.T + b)


def rff_init(
    key: Array,
    n: int,
    nlift: int,
    bandwidth: float = 1.0,
    feature_scale=None,
    dtype=jnp.float32,
):
    """Sample RFF parameters: ``w (nlift, n)``, ``b (nlift,)``.

    ``feature_scale`` (n,) rescales frequencies per state dimension —
    pass the training data's per-dim std so the kernel bandwidth is
    expressed in data units (the RBF kmeans-centers analog).
    """
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (nlift, n), dtype=dtype) / jnp.asarray(
        bandwidth, dtype
    )
    if feature_scale is not None:
        w = w / jnp.asarray(feature_scale, dtype)[None, :]
    b = jax.random.uniform(
        kb, (nlift,), dtype=dtype, minval=0.0, maxval=2.0 * jnp.pi
    )
    return w, b


def fourier_dictionary(w: Array, b: Array) -> Dictionary:
    w = jnp.asarray(w)
    b = jnp.asarray(b)
    return Dictionary(_rff_apply, (w, b), nlift=w.shape[0], n=w.shape[1])

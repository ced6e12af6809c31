"""RBF dictionaries.

Two reference families:
  - MATLAB ``rbf.m:10-45``: thinplate / gauss / invquad / invmultquad /
    polyharmonic evaluated against K centers, ``y = r^2 log(r)`` with
    ``NaN -> 0`` at r = 0.
  - Python ``duffing_RBF.py:20-23``: thinplate with additive smoothing,
    ``phi = d^2 * log(d + 1e-4)`` against KMeans centers.

TPU-first: distance computation is one batched matmul-style reduction over
(..., K, n); everything is branch-free (the NaN guard becomes a
``jnp.where`` on r^2 > 0).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from .base import Dictionary


def _r_squared(x: Array, centers: Array) -> Array:
    """x: (..., n); centers: (K, n) -> (..., K) squared distances."""
    diff = x[..., None, :] - centers
    return jnp.sum(diff * diff, axis=-1)


def rbf_apply_factory(kind: str, eps: float = 1.0, k: int = 1):
    kind = kind.lower()

    def apply_fn(centers: Array, x: Array) -> Array:
        r2 = _r_squared(x, centers)
        if kind == "thinplate":
            # rbf.m:27 — r^2 * log(sqrt(r^2)) = 0.5 r^2 log r^2, NaN->0
            safe = jnp.where(r2 > 0, r2, 1.0)
            return jnp.where(r2 > 0, 0.5 * safe * jnp.log(safe), 0.0)
        if kind == "thinplate_eps":
            # duffing_RBF.py:22 — d^2 * log(d + 1e-4) (smoothed at 0)
            d = jnp.sqrt(jnp.maximum(r2, 0.0))
            return r2 * jnp.log(d + 1e-4)
        if kind == "gauss":
            return jnp.exp(-(eps**2) * r2)  # rbf.m:31
        if kind == "invquad":
            return 1.0 / (1.0 + eps**2 * r2)  # rbf.m:33
        if kind == "invmultquad":
            return 1.0 / jnp.sqrt(1.0 + eps**2 * r2)  # rbf.m:36
        if kind == "polyharmonic":
            # rbf.m:38 — r^k * log r, NaN->0
            safe = jnp.where(r2 > 0, r2, 1.0)
            return jnp.where(
                r2 > 0, safe ** (k / 2.0) * 0.5 * jnp.log(safe), 0.0
            )
        raise ValueError(f"RBF type not recognized: {kind!r}")

    return apply_fn


def rbf_dictionary(
    centers: Array, kind: str = "thinplate", eps: float = 1.0, k: int = 1
) -> Dictionary:
    centers = jnp.asarray(centers)
    K, n = centers.shape
    return Dictionary(rbf_apply_factory(kind, eps, k), centers, nlift=K, n=n)


def kmeans(
    key: Array, points: Array, k: int, iters: int = 50
) -> Tuple[Array, Array]:
    """Small jittable Lloyd's k-means (replaces the reference's
    ``sklearn.cluster.KMeans`` at ``duffing_RBF.py:44-46`` / MATLAB
    ``kmeans``). points: (S, n) -> (centers (k, n), assignments (S,))."""
    s = points.shape[0]
    init_idx = jax.random.choice(key, s, (k,), replace=False)
    centers0 = points[init_idx]

    def step(centers, _):
        d2 = jnp.sum(
            (points[:, None, :] - centers[None, :, :]) ** 2, axis=-1
        )  # (S, k)
        assign = jnp.argmin(d2, axis=-1)
        one_hot = jax.nn.one_hot(assign, k, dtype=points.dtype)  # (S, k)
        counts = one_hot.sum(axis=0)  # (k,)
        sums = one_hot.T @ points  # (k, n)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers0, None, length=iters)
    d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    return centers, jnp.argmin(d2, axis=-1)

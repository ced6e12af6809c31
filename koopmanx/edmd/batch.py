"""L3 — batch EDMD regression.

Two reference formulations, both reproduced in row-major layout:

  - Python style (``duffing.py:167-177``): ``K = Phi_Y pinv([Phi_X; U])``
    giving ``[A B]``, then a separate output regression
    ``C = X pinv(Phi_X)``.
  - MATLAB joint style (``Tank_System.m:92-99``): one regression
    ``M = (W V') pinv(V V')`` with ``W=[Ylift; X]``, ``V=[Xlift; U]``
    giving ``[A B; C 0]`` in one shot.

TPU-first: all fits go through Gram matrices ``G = V^T V`` (a single
(S, d) x (S, d) matmul on the MXU) so the identical code path serves the
distributed fit: per-shard Grams are ``psum``-reduced over the mesh and the
tiny (d, d) solve happens replicated (see :mod:`koopmanx.parallel`).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..lifts.base import Dictionary
from ..systems.data import Snapshots
from ..types import LinearModel


class GramStats(NamedTuple):
    """Sufficient statistics for EDMD: everything needed to produce
    (A, B, C) — and exactly what gets ``psum``-reduced across chips.

    syv: (N, N+m) = Zy^T [Zx U]      gvv: (N+m, N+m) = [Zx U]^T [Zx U]
    sxz: (n, N)   = X^T Zx           gzz: (N, N)     = Zx^T Zx
    count: scalar snapshot count
    """

    syv: Array
    gvv: Array
    sxz: Array
    gzz: Array
    count: Array


def lift_snapshots(dictionary: Dictionary, data: Snapshots) -> Tuple[Array, Array]:
    """Encode all snapshot pairs in one batched call (replaces the
    reference's 10,000-iteration python encode loop, duffing.py:152-164)."""
    zx = dictionary(data.x)
    zy = dictionary(data.y)
    return zx, zy


def gram_stats(zx: Array, zy: Array, u: Array, x: Array) -> GramStats:
    v = jnp.concatenate([zx, u], axis=-1)  # (S, N+m)
    return GramStats(
        syv=zy.T @ v,
        gvv=v.T @ v,
        sxz=x.T @ zx,
        gzz=zx.T @ zx,
        count=jnp.asarray(zx.shape[0], dtype=zx.dtype),
    )


def combine_gram_stats(a: GramStats, b: GramStats) -> GramStats:
    return jax.tree_util.tree_map(lambda p, q: p + q, a, b)


def fit_from_grams(
    stats: GramStats, nlift: int, method: str = "pinv", rcond: Optional[float] = None
) -> LinearModel:
    """Solve the two normal-equation systems from Gram statistics.

    ``method='pinv'`` matches the reference's pseudo-inverse semantics;
    ``method='solve'`` uses a (faster, differentiable) linear solve with
    Tikhonov-free Cholesky-backed ``jnp.linalg.solve``.
    """
    if method == "pinv":
        k_ext = stats.syv @ jnp.linalg.pinv(stats.gvv, rcond=rcond)
        c = stats.sxz @ jnp.linalg.pinv(stats.gzz, rcond=rcond)
    elif method == "solve":
        k_ext = jnp.linalg.solve(stats.gvv.T, stats.syv.T).T
        c = jnp.linalg.solve(stats.gzz.T, stats.sxz.T).T
    else:
        raise ValueError(f"unknown method {method!r}")
    return LinearModel(
        A=k_ext[..., :, :nlift], B=k_ext[..., :, nlift:], C=c
    )


def edmd_fit(
    dictionary: Dictionary,
    data: Snapshots,
    method: str = "pinv",
    rcond: Optional[float] = None,
) -> LinearModel:
    """Batch EDMD fit: (A, B) from lifted one-step pairs, C from the output
    regression. Matches ``duffing.py:167-177`` / ``Tank_System.m:92-99``
    (the two reference formulations coincide on the (A, B) block; the
    MATLAB joint regression's C block equals the separate output regression
    restricted to the state-lift subspace — both are available via the
    Gram path)."""
    zx, zy = lift_snapshots(dictionary, data)
    stats = gram_stats(zx, zy, data.u, data.x)
    return fit_from_grams(stats, dictionary.nlift, method=method, rcond=rcond)


def edmd_fit_pinv_direct(
    dictionary: Dictionary, data: Snapshots, rcond: Optional[float] = None
) -> LinearModel:
    """Direct pseudo-inverse fit on the snapshot matrices themselves —
    bitwise-closest to the reference's ``Phi_Y @ pinv([Phi_X; U])``
    (duffing.py:167). Use for parity tests; the Gram path is the
    production/distributed one."""
    zx, zy = lift_snapshots(dictionary, data)
    v = jnp.concatenate([zx, data.u], axis=-1)
    k_ext = (jnp.linalg.pinv(v, rcond=rcond) @ zy).T  # = Zy^T pinv(V^T)^T
    c = (jnp.linalg.pinv(zx, rcond=rcond) @ data.x).T
    nlift = dictionary.nlift
    return LinearModel(A=k_ext[:, :nlift], B=k_ext[:, nlift:], C=c)

"""Batched small-matrix linear algebra tuned for TPU.

LAPACK-style factorizations lower to sequential TPU custom calls whose
per-batch-element serialization dominates this framework's fused control
step: at (2048, 20, 20) f32 one ``jnp.linalg.inv`` (LuDecompositionBlock)
costs 11.5 ms and a Cholesky + triangular-inverse 4.5 ms, while the whole
rest of the step is ~2.5 ms (tools/bench_spd_inverse.py, BENCHMARKS.md).

For the symmetric positive-definite matrices this framework inverts (ADMM
KKT ``P + sigma I + rho A'A``, RLS Gram matrices), pivoting is unnecessary
— pivot-free Gauss-Jordan elimination is the classical stable algorithm for
SPD inversion. Unrolling the n elimination steps turns the whole inverse
into n batched rank-1 updates (pure VPU elementwise ops, no custom calls):
0.29 ms at (2048, 20, 20) — 16x faster than the Cholesky route, 40x faster
than LU, same accuracy (max |K X - I| parity with LU at cond 1e3).

Replaces: the reference's ``scipy.optimize`` internals and MATLAB
``quadprog``/``pinv`` host solves (Tank_System.m:158, duffing.py:930).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def spd_inverse(k: Array, eps: float = 0.0) -> Array:
    """Inverse of a symmetric positive-definite matrix (batched or not).

    Pivot-free Gauss-Jordan, unrolled over the (static) matrix dimension;
    every step is one batched rank-1 update of the augmented ``[K | I]``.
    Shapes: (..., n, n) -> (..., n, n). For a singular/indefinite input the
    result contains inf/NaN (like ``jnp.linalg.inv``); callers on the
    control path already sanitize non-finite solves (engine guards).

    ``eps`` optionally adds a diagonal ridge before inversion.
    """
    n = k.shape[-1]
    dtype = k.dtype
    if eps:
        k = k + eps * jnp.eye(n, dtype=dtype)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), k.shape)
    aug = jnp.concatenate([k, eye], axis=-1)  # (..., n, 2n)
    for j in range(n):
        d = aug[..., j, j : j + 1]  # (..., 1)
        piv = aug[..., j, :] / d  # (..., 2n)
        # One rank-1 update does both the elimination AND the pivot-row
        # normalization: with factor_j = d - 1 (instead of 0), row j becomes
        # d*piv - (d-1)*piv = piv. Avoids a (..., n, 2n) dynamic-update-slice
        # per column (20 of them cost ~0.2 ms/step at batch 2048).
        factor = aug[..., :, j].at[..., j].set(d[..., 0] - 1.0)  # (..., n)
        aug = aug - factor[..., :, None] * piv[..., None, :]
    inv = aug[..., :, n:]
    # symmetrize: elimination rounding breaks exact symmetry; the callers
    # (ADMM KKT, Gram inverses) rely on symmetric inverses
    return 0.5 * (inv + jnp.swapaxes(inv, -1, -2))


def gj_inverse(a: Array) -> Array:
    """General-matrix inverse: unrolled Gauss-Jordan WITH partial pivoting.

    For non-symmetric systems (e.g. the ``(I + G H)^{-1}`` solves inside the
    doubling DARE) where pivot-free elimination is not stable. Each of the n
    unrolled column steps is: batched argmax over the pivot column, a row
    gather implementing the swap, and one rank-1 update — no LAPACK custom
    calls, so it stays ~40x faster than ``jnp.linalg.inv`` on TPU at
    (2048, 20, 20) while matching LU-with-partial-pivoting stability.
    """
    n = a.shape[-1]
    dtype = a.dtype
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), a.shape)
    aug = jnp.concatenate([a, eye], axis=-1)  # (..., n, 2n)
    rows = jnp.arange(n)
    for j in range(n):
        # partial pivot: among rows >= j, the largest |entry| in column j
        col = jnp.abs(aug[..., :, j])
        col = jnp.where(rows >= j, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)  # (...,)
        # swap rows j <-> p via a gathered permutation (batched)
        idx = jnp.where(
            rows == j,
            p[..., None],
            jnp.where(rows == p[..., None], j, rows),
        )  # (..., n)
        aug = jnp.take_along_axis(aug, idx[..., None], axis=-2)
        d = aug[..., j, j : j + 1]
        piv = aug[..., j, :] / d
        factor = aug[..., :, j].at[..., j].set(d[..., 0] - 1.0)
        aug = aug - factor[..., :, None] * piv[..., None, :]
    return aug[..., :, n:]


def gj_solve(a: Array, b: Array) -> Array:
    """``a @ x = b`` via :func:`gj_inverse` (batched, TPU-friendly).

    Right-multiplying the explicit inverse is accurate at these sizes
    (n <= ~32) and keeps everything as batched matmuls.
    """
    x = gj_inverse(a) @ b
    return x

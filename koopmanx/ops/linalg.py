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


def spd_inverse(k: Array, eps: float = 0.0, block: int = 1) -> Array:
    """Inverse of a symmetric positive-definite matrix (batched or not).

    Pivot-free Gauss-Jordan, unrolled over the (static) matrix dimension;
    every step is one batched rank-1 update of the augmented ``[K | I]``.
    Shapes: (..., n, n) -> (..., n, n). For a singular/indefinite input the
    result contains inf/NaN (like ``jnp.linalg.inv``); callers on the
    control path already sanitize non-finite solves (engine guards).

    ``eps`` optionally adds a diagonal ridge before inversion.

    ``block`` > 1 eliminates ``block`` columns per step (block Gauss-Jordan
    with an explicitly-inverted (r, r) pivot block — pivot blocks of an SPD
    matrix's successive Schur complements are SPD, so pivot-free block
    elimination is stable). The elimination's cost on TPU is the
    ceil(n/r) passes streaming the (..., n, 2n) augmented matrix through
    HBM (BENCHMARKS.md round-2 roofline: the GJ stream is at the ~819 GB/s
    bound), so block=r cuts that dominant stream ~r-fold — the lever for
    the (Nc*nu, Nc*nu) KKT of multi-input plants (nu=2 doubles n, 8x-ing
    the scalar elimination). Every update stays a sum of r rank-1 VPU
    updates (no tiny-contraction matmuls — the measured Mosaic wall,
    BENCHMARKS.md "stacked-Schulz negative"). block=1 is the round-1
    champion kernel, bit-identical to before.
    """
    n = k.shape[-1]
    dtype = k.dtype
    if eps:
        k = k + eps * jnp.eye(n, dtype=dtype)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), k.shape)
    aug = jnp.concatenate([k, eye], axis=-1)  # (..., n, 2n)
    if block <= 1:
        for j in range(n):
            d = aug[..., j, j : j + 1]  # (..., 1)
            piv = aug[..., j, :] / d  # (..., 2n)
            # One rank-1 update does both the elimination AND the pivot-row
            # normalization: with factor_j = d - 1 (instead of 0), row j
            # becomes d*piv - (d-1)*piv = piv. Avoids a (..., n, 2n)
            # dynamic-update-slice per column (20 of them cost ~0.2 ms/step
            # at batch 2048).
            factor = aug[..., :, j].at[..., j].set(d[..., 0] - 1.0)
            aug = aug - factor[..., :, None] * piv[..., None, :]
    else:
        for j in range(0, n, block):
            r = min(block, n - j)
            # normalize the r pivot rows by Gauss-Jordan WITHIN the block
            # (r tiny passes over (r, 2n) rows — scalar-division accuracy;
            # an explicitly inverted pivot block measured 200x worse f32
            # residuals at cond 1e3: 5.8e-2 vs the scalar path's 2.7e-4)
            piv = [aug[..., j + t, :] for t in range(r)]
            for t in range(r):
                piv[t] = piv[t] / piv[t][..., j + t : j + t + 1]
                for s in range(r):
                    if s != t:
                        f = piv[s][..., j + t : j + t + 1]
                        piv[s] = piv[s] - f * piv[t]
            # ONE rank-r pass over the augmented matrix eliminates the r
            # columns from every row (block rows produce cancellation
            # garbage and are overwritten with their normalized forms — a
            # ceil(n/r)-count of row-block set()s, amortized r-fold vs the
            # scalar path's per-column trick)
            upd = None
            for t in range(r):
                factor_t = aug[..., :, j + t]  # (..., n)
                term = factor_t[..., :, None] * piv[t][..., None, :]
                upd = term if upd is None else upd + term
            aug = (aug - upd).at[..., j : j + r, :].set(
                jnp.stack(piv, axis=-2)
            )
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


def ns_tracking_inverse(
    k: Array, x_prev: Array, iters: int, safe_thresh: float = 0.95,
    cold_iters: int = 12,
) -> Array:
    """Newton-Schulz TRACKING inverse: refine last step's inverse of a
    slowly-drifting SPD matrix instead of re-eliminating from scratch.

    The closed-loop engine re-inverts the ADMM KKT matrix every control
    step, but the model (hence K) moves only O(drift) per step — so the
    previous inverse X has residual E = ||I - K X||_F << 1 and Newton-
    Schulz (X <- X (2I - K X), quadratic: E -> E^2) reaches f32 exactness
    in 2-3 iterations of BATCHED MATMULS. vs the pivot-free Gauss-Jordan
    (:func:`spd_inverse`): n sequential full-matrix eliminations streaming
    the augmented matrix from HBM each time (the measured dominant stream
    of the step, BENCHMARKS.md round-2 roofline) become 2*iters MXU
    matmuls touching ~1/8 the bytes.

    Safeguard (branch-free, per matrix — batched callers vmap this): keep
    the carried inverse only when its residual DEMONSTRABLY contracts
    under one NS squaring. NS squares the residual exactly
    (I - K X1 = (I - K X0)^2), so the test compares ||R^2||_F against
    ||R||_F directly: a small residual (||R||_F < safe_thresh < 1 implies
    rho(R) < 1) is kept outright; a large one is kept only if squaring
    shrinks it (healthy mid-convergence residuals have ||R||_F ~ sqrt(n)
    but contract — a fixed Frobenius threshold would mis-reject them),
    while an adversarial stale carry with rho(R) > 1 GROWS under squaring
    and restarts from the cold seed X0 = I/||K||_F, provably convergent
    for SPD K (residual eigenvalues 1 - lambda_i/||K||_F in [0, 1)).
    (A power-iteration rho estimate was tried and rejected: the norm-ratio
    estimate overshoots rho for the non-normal R = I - K X and spuriously
    cold-restarted mid-warm-up carries.) Combined with the engine's
    periodic exact re-anchoring (EngineConfig.qp_kkt_reanchor) any bad
    stretch is bounded to one period. Shapes: (n, n), (n, n) -> (n, n).

    ``cold_iters``: extra NS pre-iterations applied to the cold seed ONLY.
    The scaled-identity seed's residual eigenvalues 1 - lambda_i/||K||_F
    start near 1 for ill-conditioned K, so the regular 2-3 tracking
    iterations leave a cold restart far from the inverse until the next
    exact re-anchor (advisor finding, round 3). Pre-polishing the seed
    (~log2(cond K) + 4 iterations reach f32 exactness; 12 covers the
    engine's KKT matrices, whose condition is bounded by lambda_max/rho)
    makes a restart land near-exact immediately. Branch-free, so the
    polish FLOPs are paid every call — acceptable because the mode itself
    is opt-in (EngineConfig.qp_kkt_refine, measured-negative at nx~20).
    """
    n = k.shape[-1]
    dtype = k.dtype
    eye = jnp.eye(n, dtype=dtype)
    k_fro = jnp.maximum(
        jnp.sqrt(jnp.sum(k * k)), jnp.asarray(1e-30, dtype)
    )
    x0_safe = eye / k_fro
    r_prev = eye - k @ x_prev
    e0 = jnp.sqrt(jnp.sum(r_prev * r_prev))
    r_sq = r_prev @ r_prev  # the residual after one NS step, exactly
    e1 = jnp.sqrt(jnp.sum(r_sq * r_sq))
    use_prev = jnp.isfinite(e1) & (
        (e0 < safe_thresh) | (e1 < 0.7 * e0)
    )
    x_cold = x0_safe
    for _ in range(cold_iters):
        x_cold = x_cold @ (2.0 * eye - k @ x_cold)
    x = jnp.where(use_prev, x_prev, x_cold)
    for _ in range(iters):
        x = x @ (2.0 * eye - k @ x)
    # NS preserves symmetry only up to rounding; the ADMM relies on a
    # symmetric KKT inverse (same contract as spd_inverse)
    return 0.5 * (x + jnp.swapaxes(x, -1, -2))

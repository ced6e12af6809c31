"""L3 — online recursive-least-squares (rank-one Sherman–Morrison) updates.

Reference semantics reproduced:
  - ``[A B]`` update: ``K_A += z+ [z;u]^T`` and
    ``invG <- invG - (invG v v^T invG) / (1 + v^T invG v)``
    (``duffing.py:927-938``, ``Tank_System.m:233-248``), with the
    ``Revise_2`` forgetting-factor generalization
    ``invG <- (1/λ)(invG - (invG v v^T invG)/(λ + v^T invG v))``
    (``Revise_2/Koopman_update.m:270-273``).
  - ``C`` update: same scheme on ``(barX, barQ)`` with observation pair
    ``(x_target, z)`` (``duffing.py:942-953``). NOTE the Python scripts
    pair the *next* plant state with the lift of the *current* state
    (``bar_X += x_loc @ xlift^T``, duffing.py:943) while the MATLAB loops
    pair a state with its own lift (``Tank_System.m:259``). The engine
    chooses which pair to feed; this module is pairing-agnostic.

Initialization variants (SURVEY §2.1): scaled identity with
c ∈ {1e2, 1e4, 1e5} or warm start from the batch Gram
(``Revise_2/Koopman_update.m:264-265``).

Numerical-stability note (f32 / long horizons): the raw SM recursion drifts
off symmetry; ``symmetrize=True`` re-symmetrizes the inverse Grams each step
— cheap (two tiny adds) and keeps 10^4-step f32 runs sane (SURVEY §7.4).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.linalg import spd_inverse


def full_precision(fn):
    """Pin FULL f32 matmul precision inside estimator math.

    TPU f32 matmuls default to single-pass bf16; the online estimator's
    Gram accumulations/refits are exactly the ill-conditioned place where
    those ~8 mantissa bits matter — at TPU-default precision the f32 Tank
    windowed loop tracks for ~1k steps and then drains to x2=0 by step
    3000 (2026-08-18, tools/validate_scale.py), while the controller side
    (encode/QP/ADMM) is insensitive at reference scale. These ops are a
    microscopic share of the step's FLOPs, so correctness costs nothing.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped

from ..types import LinearModel, RLSState
from .batch import GramStats


def rls_init(
    nlift: int,
    m: int,
    n: int,
    c_ab: float = 1e4,
    c_c: float = 1e2,
    dtype=jnp.float32,
) -> RLSState:
    """Scaled-identity initialization: ``invG = c_ab I``, ``barQ = c_c I``
    (duffing.py:929-946 uses pinv(1e-4 I) = 1e4 I and 100 I;
    vanderpol.py:874,888 uses 1e5; Tank_System.m:237,255 uses 1e4)."""
    return RLSState(
        K_A=jnp.zeros((nlift, nlift + m), dtype=dtype),
        invG=c_ab * jnp.eye(nlift + m, dtype=dtype),
        barX=jnp.zeros((n, nlift), dtype=dtype),
        barQ=c_c * jnp.eye(nlift, dtype=dtype),
    )


def rls_init_from_grams(stats: GramStats, rcond: Optional[float] = None) -> RLSState:
    """Warm start from batch statistics: ``K_A = Zy^T V``,
    ``invG = pinv(V^T V)`` (Revise_2/Koopman_update.m:264-265), and the
    analogous C-side warm start."""
    return RLSState(
        K_A=stats.syv,
        invG=jnp.linalg.pinv(stats.gvv, rcond=rcond),
        barX=stats.sxz,
        barQ=jnp.linalg.pinv(stats.gzz, rcond=rcond),
    )


def _sm_downdate(inv_g: Array, v: Array, lam: float) -> Array:
    """One Sherman–Morrison step on an inverse Gram:
    ``invG' = (1/λ)(invG − (invG v)(invG v)^T / (λ + v^T invG v))``.

    Written with a single matrix-vector product (``gv``) so the batched
    (vmapped) version is two small GEMVs + one outer product per scenario —
    exactly the shape the VPU/MXU likes.
    """
    gv = inv_g @ v  # (d,)
    denom = lam + v @ gv
    return (inv_g - jnp.outer(gv, gv) / denom) / lam


@full_precision
def rls_update_ab(
    state: RLSState,
    z: Array,
    u: Array,
    z_next: Array,
    lam: float = 1.0,
    symmetrize: bool = False,
) -> RLSState:
    """Rank-one update of the ``[A B]`` regression with observation
    ``(v=[z;u], ζ=z_next)`` (duffing.py:932-937)."""
    v = jnp.concatenate([z, u], axis=-1)
    inv_g = _sm_downdate(state.invG, v, lam)
    if symmetrize:
        inv_g = 0.5 * (inv_g + inv_g.T)
    k_a = state.K_A + jnp.outer(z_next, v)
    return state._replace(K_A=k_a, invG=inv_g)


@full_precision
def rls_update_c(
    state: RLSState,
    z: Array,
    x_target: Array,
    lam: float = 1.0,
    symmetrize: bool = False,
) -> RLSState:
    """Rank-one update of the output regression ``C z ≈ x`` with pair
    ``(z, x_target)`` (duffing.py:942-953)."""
    bar_q = _sm_downdate(state.barQ, z, lam)
    if symmetrize:
        bar_q = 0.5 * (bar_q + bar_q.T)
    bar_x = state.barX + jnp.outer(x_target, z)
    return state._replace(barX=bar_x, barQ=bar_q)


class StorageState(NamedTuple):
    """Carry for the 'storage method' online refit (duffing_RBF.py:404-438):
    accumulate raw Grams and re-pinv every step. Equivalent to keeping the
    full growing snapshot buffers (the Grams are sufficient statistics), but
    static-shape and O(d^2) memory instead of O(S·d)."""

    syv: Array  # (N, N+m)
    gvv: Array  # (N+m, N+m)
    sxz: Array  # (n, N)
    gzz: Array  # (N, N)


def storage_init(stats: GramStats) -> StorageState:
    return StorageState(stats.syv, stats.gvv, stats.sxz, stats.gzz)


@full_precision
def storage_update(
    state: StorageState, z: Array, u: Array, z_next: Array, x_target: Array
) -> StorageState:
    v = jnp.concatenate([z, u], axis=-1)
    return StorageState(
        syv=state.syv + jnp.outer(z_next, v),
        gvv=state.gvv + jnp.outer(v, v),
        sxz=state.sxz + jnp.outer(x_target, z),
        gzz=state.gzz + jnp.outer(z, z),
    )


@full_precision
def storage_model(state: StorageState, nlift: int) -> LinearModel:
    k_ext = state.syv @ jnp.linalg.pinv(state.gvv)
    c = state.sxz @ jnp.linalg.pinv(state.gzz)
    return LinearModel(A=k_ext[..., :, :nlift], B=k_ext[..., :, nlift:], C=c)


# ---------------------------------------------------------------------------
# Square-root (Cholesky-factor) RLS — the f32-robust production path.
#
# The reference's Sherman–Morrison recursion on inv(G) (duffing.py:932)
# squares the condition number and, seeded with inv(G) = 1e4 I, loses ~4 of
# f32's 7 digits immediately; over 10^3+ steps the Tank loop diverges
# (observed; SURVEY §7.4 anticipated this). The square-root form carries an
# upper-triangular Cholesky factor R of the GRAM (G = R^T R, condition
# number sqrt of G's) updated by Givens rotations, and extracts the model
# with two triangular solves. Same O(d^2)/step, vmappable, f32-stable.
# ---------------------------------------------------------------------------


class SqrtRLSState(NamedTuple):
    """Carry for square-root RLS: K_A / barX accumulate as before
    (duffing.py:937, :943); r_g / r_q are Cholesky factors of the [z;u]
    and z Grams; ``count`` cycles the ridge trickle (see
    :func:`sqrt_rls_update_ab`)."""

    K_A: Array  # (N, N+m)
    r_g: Array  # (N+m, N+m) upper triangular, G = r_g^T r_g
    barX: Array  # (p, N)
    r_q: Array  # (N, N) upper triangular
    count: Array  # scalar int32 step counter


def chol_rank1_update(r: Array, v: Array) -> Array:
    """Return the Cholesky factor of ``R^T R + v v^T`` via d Givens
    rotations (fixed-trip-count ``fori_loop`` — branch-free under jit)."""
    d = r.shape[-1]

    def body(k, carry):
        r, v = carry
        rkk = r[k, k]
        vk = v[k]
        rho = jnp.sqrt(rkk * rkk + vk * vk)
        # guard the zero column (rho=0 -> keep row unchanged)
        safe = rho > 0
        c = jnp.where(safe, rkk / jnp.where(safe, rho, 1.0), 1.0)
        s = jnp.where(safe, vk / jnp.where(safe, rho, 1.0), 0.0)
        row = r[k, :]
        new_row = c * row + s * v
        new_v = c * v - s * row
        r = r.at[k, :].set(new_row)
        return r, new_v

    r, _ = jax.lax.fori_loop(0, d, body, (r, v))
    return r


def sqrt_rls_init(
    nlift: int, m: int, n: int, c_ab: float = 1e4, c_c: float = 1e2, dtype=jnp.float32
) -> SqrtRLSState:
    """Same statistical prior as :func:`rls_init`: inv(G) = c I  <=>
    R = sqrt(1/c) I."""
    return SqrtRLSState(
        K_A=jnp.zeros((nlift, nlift + m), dtype=dtype),
        r_g=jnp.sqrt(1.0 / c_ab) * jnp.eye(nlift + m, dtype=dtype),
        barX=jnp.zeros((n, nlift), dtype=dtype),
        r_q=jnp.sqrt(1.0 / c_c) * jnp.eye(nlift, dtype=dtype),
        count=jnp.zeros((), dtype=jnp.int32),
    )


def sqrt_rls_init_from_grams(stats: GramStats) -> SqrtRLSState:
    """Warm start from batch Grams (cholesky of the PSD Gram matrices)."""
    return SqrtRLSState(
        K_A=stats.syv,
        r_g=jnp.linalg.cholesky(stats.gvv).T,
        barX=stats.sxz,
        r_q=jnp.linalg.cholesky(stats.gzz).T,
        count=jnp.zeros((), dtype=jnp.int32),
    )


@full_precision
def sqrt_rls_update_ab(
    state: SqrtRLSState,
    z: Array,
    u: Array,
    z_next: Array,
    lam: float = 1.0,
    ridge: float = 0.0,
) -> SqrtRLSState:
    """Rank-one sqrt update of the [A B] Gram; with ``ridge`` > 0 a second
    rank-one update injects ``ridge^2`` onto one (cycling) diagonal entry
    per step. Closed-loop data is persistently non-exciting, so the Gram's
    spread grows without bound; the trickle keeps the smallest eigenvalue
    bounded away from f32 noise (a slowly-growing Tikhonov prior — the
    sqrt-form analog of the reference's large identity init)."""
    v = jnp.concatenate([z, u], axis=-1)
    d = v.shape[-1]
    r_g = state.r_g if lam == 1.0 else jnp.sqrt(lam) * state.r_g
    r_g = chol_rank1_update(r_g, v)
    if ridge > 0.0:
        e = jnp.zeros((d,), r_g.dtype).at[state.count % d].set(ridge)
        r_g = chol_rank1_update(r_g, e)
    return state._replace(
        K_A=state.K_A + jnp.outer(z_next, v),
        r_g=r_g,
        count=state.count + 1,
    )


@full_precision
def sqrt_rls_update_c(
    state: SqrtRLSState,
    z: Array,
    x_target: Array,
    lam: float = 1.0,
    ridge: float = 0.0,
) -> SqrtRLSState:
    d = z.shape[-1]
    r_q = state.r_q if lam == 1.0 else jnp.sqrt(lam) * state.r_q
    r_q = chol_rank1_update(r_q, z)
    if ridge > 0.0:
        e = jnp.zeros((d,), r_q.dtype).at[state.count % d].set(ridge)
        r_q = chol_rank1_update(r_q, e)
    return state._replace(barX=state.barX + jnp.outer(x_target, z), r_q=r_q)


def _solve_gram(r: Array, rhs: Array) -> Array:
    """Solve (R^T R) X = rhs via two triangular solves."""
    from jax.scipy.linalg import solve_triangular

    y = solve_triangular(r.T, rhs, lower=True)
    return solve_triangular(r, y, lower=False)


@full_precision
def sqrt_rls_model(state: SqrtRLSState, nlift: int) -> "LinearModel":
    """K_ext = K_A G^{-1} and C = barX Q^{-1} from the factors."""
    k_ext = _solve_gram(state.r_g, state.K_A.T).T
    c = _solve_gram(state.r_q, state.barX.T).T
    return LinearModel(A=k_ext[..., :, :nlift], B=k_ext[..., :, nlift:], C=c)


# ---------------------------------------------------------------------------
# Gram-carry RLS — the TPU-fast f32-robust estimator (default).
#
# Carrying Cholesky factors (sqrt form above) is numerically ideal but its
# per-step Givens recurrence is a sequential fori_loop of dynamic row
# updates — measured ~11 ms/step at batch 2048 on v5e, dominating the whole
# control step. Carrying the GRAM instead needs one rank-one add per step
# (a single fused outer-product), and the model extraction re-factorizes
# the (d, d) Gram fresh each step with jnp.linalg.cholesky — a batched
# 0.1 ms op on TPU. Conditioning: cholesky of G loses cond(G)^1 (not the
# squared loss of the explicit-inverse SM form), and a Tikhonov term is
# applied at solve time, so with normalized lifted features this is as
# robust as the sqrt form in f32 at a fraction of the cost.
# ---------------------------------------------------------------------------


class GramRLSState(NamedTuple):
    """K_A/barX accumulate as in the reference (duffing.py:937,943);
    g/q are the raw Grams of [z;u] and z."""

    K_A: Array  # (N, N+m)
    g: Array  # (N+m, N+m)
    barX: Array  # (p, N)
    q: Array  # (N, N)


def gram_rls_init(
    nlift: int, m: int, n: int, c_ab: float = 1e4, c_c: float = 1e2, dtype=jnp.float32
) -> GramRLSState:
    """Same prior as rls_init: inv(G0) = c I  <=>  G0 = I/c."""
    return GramRLSState(
        K_A=jnp.zeros((nlift, nlift + m), dtype=dtype),
        g=jnp.eye(nlift + m, dtype=dtype) / c_ab,
        barX=jnp.zeros((n, nlift), dtype=dtype),
        q=jnp.eye(nlift, dtype=dtype) / c_c,
    )


def gram_rls_init_from_grams(stats: GramStats) -> GramRLSState:
    return GramRLSState(K_A=stats.syv, g=stats.gvv, barX=stats.sxz, q=stats.gzz)


@full_precision
def gram_rls_update(
    state: GramRLSState,
    z: Array,
    u: Array,
    z_next: Array,
    x_target: Array,
    lam: float = 1.0,
) -> GramRLSState:
    """Both rank-one updates in one call (one fused kernel under jit)."""
    v = jnp.concatenate([z, u], axis=-1)
    g = state.g if lam == 1.0 else lam * state.g
    q = state.q if lam == 1.0 else lam * state.q
    return GramRLSState(
        K_A=state.K_A + jnp.outer(z_next, v),
        g=g + jnp.outer(v, v),
        barX=state.barX + jnp.outer(x_target, z),
        q=q + jnp.outer(z, z),
    )


def schulz_inverse(a: Array, iters: int = 24, unroll: int = 8) -> Array:
    """Newton–Schulz iterative inverse: X <- X (2I - A X), seeded with
    X0 = A^T / (||A||_1 ||A||_inf) (globally convergent). Pure matmuls —
    the fastest way to invert small batched SPD matrices on TPU (batched
    triangular solves lower to sequential per-column loops and measured
    ~10 ms/step at batch 2048). Quadratic convergence: ~log2(cond) + 3
    iterations.

    ``unroll``: scan unroll for the iteration body — at engine-batch
    shapes the per-iteration while-loop carry copy of the (B, d, d)
    iterate dominates the two tiny matmuls (measured 12 ms/step per
    24-iteration chain on the tank loop at batch 4096, 2026-08-20).

    Scale-equivariance note (exploited by the windowed refit): the seed
    normalizes by each matrix's OWN norms and X_k(c A) = X_k(A)/c exactly,
    so block-stacking several matrices into one batched call produces the
    SAME per-matrix trajectories as separate calls."""
    d = a.shape[-1]
    norm1 = jnp.max(jnp.sum(jnp.abs(a), axis=-2), axis=-1)
    norminf = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)
    x = jnp.swapaxes(a, -1, -2) / (norm1 * norminf)[..., None, None]
    eye2 = 2.0 * jnp.eye(d, dtype=a.dtype)

    def body(x, _):
        return x @ (eye2 - a @ x), None

    x, _ = jax.lax.scan(body, x, None, length=iters,
                        unroll=min(unroll, iters))
    return x


@full_precision
def gram_rls_model(
    state: GramRLSState, nlift: int, ridge: float = 1e-6, schulz_iters: int = 0
) -> LinearModel:
    """K_ext = K_A (G + ridge I)^{-1}, C = barX (Q + ridge I)^{-1} via the
    exact pivot-free SPD inverse (ops/linalg.spd_inverse): d rank-1 VPU
    updates beat the previous 24-iteration (~50 GEMM) Newton–Schulz
    extraction in both cost and accuracy. ``schulz_iters`` is kept for API
    compatibility; >0 selects the legacy iterative extraction."""
    if schulz_iters:
        g_inv = schulz_inverse(
            state.g + ridge * jnp.eye(state.g.shape[-1], dtype=state.g.dtype),
            schulz_iters,
        )
        q_inv = schulz_inverse(
            state.q + ridge * jnp.eye(state.q.shape[-1], dtype=state.q.dtype),
            schulz_iters,
        )
    else:
        g_inv = spd_inverse(state.g, eps=ridge)
        q_inv = spd_inverse(state.q, eps=ridge)
    k_ext = state.K_A @ g_inv
    c = state.barX @ q_inv
    return LinearModel(A=k_ext[..., :, :nlift], B=k_ext[..., :, nlift:], C=c)

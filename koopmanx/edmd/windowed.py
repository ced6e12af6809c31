"""Sliding-window online estimator (ring buffer + per-step refit).

The reference's online estimators weight ALL history equally (RLS/storage,
duffing.py:927, duffing_RBF.py:404) — after a plant change the stale
pre-switch data biases the model forever, and the f32 conditioning of the
ever-growing Gram degrades. A bounded sliding window is the standard
time-varying-systems alternative: keep the last W observations in a
static-shape ring buffer and refit

    [A B] = argmin ||V K' - Zy||^2 + ridge,   C = argmin ||Zx C' - X||^2

each step from the window's (freshly formed, bounded-condition) Grams via
a matmul-only Newton–Schulz solve. Pre/post-switch behavior: the window
flushes old-regime data in W steps — hard recency without the Gram
collapse of exponential forgetting.

Engine mode: ``update="windowed"``. The buffer is optionally pre-filled
with training snapshots so step 0 already has a full-rank problem.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..types import LinearModel
from ..ops.linalg import spd_inverse
from .rls import full_precision, schulz_inverse


class WindowState(NamedTuple):
    """Ring buffers of the last W observations (static shapes).

    The four trailing fields are the OPTIONAL carried sufficient
    statistics of the Woodbury lane (``window_carry='woodbury'``): the
    ridge-regularized window Grams ``g = V'V + ridge I`` /
    ``gz = Zx'Zx + ridge I``, their inverses, and the cross-Grams
    ``mg = V'Zy`` / ``mc = Zx'X``. They are the empty pytree ``()`` in the
    default refit-from-buffers mode (zero carry cost — the ``kkt_inv``
    slimming pattern)."""

    zx: Array  # (W, N) lifted states
    u: Array  # (W, m)
    zy: Array  # (W, N) lifted next states
    x: Array  # (W, n) output targets
    idx: Array  # scalar int32 write cursor
    g: Any = ()  # (d, d) V'V + ridge I, d = N + m
    g_inv: Any = ()  # (d, d)
    gz: Any = ()  # (N, N) Zx'Zx + ridge I
    gz_inv: Any = ()  # (N, N)
    mg: Any = ()  # (d, N) V'Zy
    mc: Any = ()  # (N, n) Zx'X


def window_init(
    window: int, nlift: int, m: int, n: int, dtype=jnp.float32,
    carry: bool = False, ridge: float = 1e-4, store_dtype=None,
) -> WindowState:
    """``store_dtype`` (e.g. ``jnp.bfloat16``) compresses the RING BUFFERS
    only — the ring is the windowed estimator's HBM capacity ceiling
    (8192 x 263 KB ≈ 2.2 GB at nlift=128, BENCHMARKS.md rbf128 findings)
    while the refit COMPUTE stays at the pinned full precision: buffers
    are upcast inside the refit/reanchor, and the Woodbury lane quantizes
    each incoming row BEFORE both the buffer write and the Gram update,
    so the row evicted W steps later is bit-identical to the one added
    (no storage-precision drift between the carried Grams and the ring)."""
    sd = dtype if store_dtype is None else store_dtype
    st = WindowState(
        zx=jnp.zeros((window, nlift), sd),
        u=jnp.zeros((window, m), sd),
        zy=jnp.zeros((window, nlift), sd),
        x=jnp.zeros((window, n), sd),
        idx=jnp.zeros((), jnp.int32),
    )
    if carry:
        d = nlift + m
        st = st._replace(
            g=ridge * jnp.eye(d, dtype=dtype),
            g_inv=(1.0 / ridge) * jnp.eye(d, dtype=dtype),
            gz=ridge * jnp.eye(nlift, dtype=dtype),
            gz_inv=(1.0 / ridge) * jnp.eye(nlift, dtype=dtype),
            mg=jnp.zeros((d, nlift), dtype),
            mc=jnp.zeros((nlift, n), dtype),
        )
    return st


@full_precision
def window_prefill(
    state: WindowState, zx: Array, u: Array, zy: Array, x: Array
) -> WindowState:
    """Fill the buffer with (up to W) training snapshots so the first refit
    is well posed. In the Woodbury lane the carried statistics are rebuilt
    exactly from the filled buffer (host-side in build_pipeline — the
    exact ``spd_inverse`` here is a one-shot setup cost)."""
    w = state.zx.shape[0]
    take = min(w, zx.shape[0])
    sl = slice(zx.shape[0] - take, zx.shape[0])
    sd = state.zx.dtype
    new = WindowState(
        zx=state.zx.at[:take].set(zx[sl].astype(sd)),
        u=state.u.at[:take].set(u[sl].astype(sd)),
        zy=state.zy.at[:take].set(zy[sl].astype(sd)),
        x=state.x.at[:take].set(x[sl].astype(sd)),
        idx=jnp.asarray(take % w, jnp.int32),
        g=state.g, g_inv=state.g_inv, gz=state.gz, gz_inv=state.gz_inv,
        mg=state.mg, mc=state.mc,
    )
    if not isinstance(state.g, tuple):
        cd = state.g.dtype
        ridge_eye_d = state.g - _outer_gram(
            jnp.concatenate([state.zx, state.u], axis=-1).astype(cd)
        )  # ridge I (buffers were zeros at init)
        ridge_eye_n = state.gz - _outer_gram(state.zx.astype(cd))
        v = jnp.concatenate([new.zx, new.u], axis=-1).astype(cd)
        g = _outer_gram(v) + ridge_eye_d
        gz = _outer_gram(new.zx.astype(cd)) + ridge_eye_n
        new = new._replace(
            g=g,
            g_inv=spd_inverse(g),
            gz=gz,
            gz_inv=spd_inverse(gz),
            mg=v.T @ new.zy.astype(cd),
            mc=new.zx.astype(cd).T @ new.x.astype(cd),
        )
    return new


def _outer_gram(v: Array) -> Array:
    return v.T @ v


@full_precision
def window_update(
    state: WindowState, z: Array, u: Array, z_next: Array, x_target: Array
) -> WindowState:
    i = state.idx
    w = state.zx.shape[0]
    sd = state.zx.dtype
    return state._replace(
        zx=state.zx.at[i].set(z.astype(sd)),
        u=state.u.at[i].set(u.astype(sd)),
        zy=state.zy.at[i].set(z_next.astype(sd)),
        x=state.x.at[i].set(x_target.astype(sd)),
        idx=(i + 1) % w,
    )


def _sm_step(x: Array, c: Array, sign: float) -> Array:
    """Sherman-Morrison: (G + sign c c')^{-1} from X = G^{-1}.

    The removal direction (sign=-1) has denominator 1 - c'Xc which the
    ridge keeps strictly positive for any row actually inside the window
    (c'G^{-1}c = 1 - ridge-margin < 1); the clamp guards rows that drifted
    out of sync, whose error the NS polish then contracts."""
    xc = x @ c
    denom = 1.0 + sign * (c @ xc)
    denom = jnp.where(sign < 0, jnp.maximum(denom, 1e-6), denom)
    return x - (sign / denom) * jnp.outer(xc, xc)


@full_precision
def window_update_carry(
    state: WindowState,
    z: Array,
    u: Array,
    z_next: Array,
    x_target: Array,
    polish: int = 1,
) -> WindowState:
    """The Woodbury lane: one window step updates the carried sufficient
    statistics EXACTLY — the ring replaces one row, so every Gram moves by
    rank 2 (add new, remove old) and every cross-Gram by rank 1 each way.

    Replaces the per-refit Schulz chains (the measured dominant cost of
    the windowed step: 44.2 of 56.5 ms at nlift=128, BENCHMARKS.md
    "rbf128 per-step attribution") with O(d^2) Sherman-Morrison updates +
    ``polish`` Newton-Schulz iterations per inverse. The polish squares
    the inverse's residual every step (E -> E^2 against the EXACT carried
    Gram), so floating-point drift from the rank-1 chain is self-
    correcting rather than accumulating; the model it feeds is fresh
    EVERY step — no refit-cadence staleness, which is what broke the
    multi-input cadence (stale (nlift, 2) B misallocating the two pumps,
    BENCHMARKS.md round-4 cadence table).

    Semantics note: the carried inverse tracks the EXACT ridge inverse,
    i.e. ``schulz_iters=0`` extraction semantics — the truncated-chain
    spectral filtering of the default lane is NOT reproduced. At small
    lift that filtering is load-bearing (three documented negatives);
    this lane is for workloads validated without it (large lift, MIMO).
    """
    i = state.idx
    w = state.zx.shape[0]
    sd = state.zx.dtype
    cd = state.g.dtype
    # quantize the incoming rows to the STORAGE dtype FIRST, then use the
    # quantized values for both the buffer write and the Gram updates —
    # the row evicted W steps later is then bit-identical to the one
    # added, so compressed storage (bf16 ring) cannot drift the carried
    # Grams away from the buffer contents
    z_q = z.astype(sd)
    u_q = u.astype(sd)
    zn_q = z_next.astype(sd)
    xt_q = x_target.astype(sd)
    z = z_q.astype(cd)
    u = u_q.astype(cd)
    z_next = zn_q.astype(cd)
    x_target = xt_q.astype(cd)
    # the rows being evicted (read BEFORE overwrite)
    z_old = state.zx[i].astype(cd)
    u_old = state.u[i].astype(cd)
    zy_old = state.zy[i].astype(cd)
    x_old = state.x[i].astype(cd)
    v_new = jnp.concatenate([z, u])
    v_old = jnp.concatenate([z_old, u_old])

    # exact Gram/cross-Gram motion
    g = state.g + jnp.outer(v_new, v_new) - jnp.outer(v_old, v_old)
    gz = state.gz + jnp.outer(z, z) - jnp.outer(z_old, z_old)
    mg = state.mg + jnp.outer(v_new, z_next) - jnp.outer(v_old, zy_old)
    mc = state.mc + jnp.outer(z, x_target) - jnp.outer(z_old, x_old)

    # inverses: add-then-remove Sherman-Morrison, then NS polish against
    # the exact carried Gram (symmetrize: SM/NS preserve symmetry only to
    # rounding, and downstream solves rely on symmetric inverses).
    # DIVERGENCE SAFEGUARD (observed failure, 2026-08-21: the f32 rbf128
    # 3000-step on-chip run blew the carry to inf — an SM removal with a
    # near-cancelled denominator tips ||I - G X|| past 1, after which the
    # NS polish diverges QUADRATICALLY and the engine's rls-finiteness
    # guard freezes the whole estimator forever): the polish already
    # forms h = G @ X, so the pre-update residual ||I - h||_F^2 is free —
    # when it is non-finite or above the 4d divergence threshold (a
    # healthy mid-convergence residual is <= d, and a diverging iterate
    # blows past 4d within ~2 squarings), the inverse RESTARTS from the
    # globally-convergent Schulz seed G'/(||G||_1 ||G||_inf); the
    # per-step polish then reconverges it in ~15-20 steps while
    # model_guard holds the last sane model. Requires polish >= 1.
    g_inv = _sm_step(_sm_step(state.g_inv, v_new, 1.0), v_old, -1.0)
    gz_inv = _sm_step(_sm_step(state.gz_inv, z, 1.0), z_old, -1.0)

    def _polished(mat, inv):
        d_ = mat.shape[-1]
        eye2 = 2.0 * jnp.eye(d_, dtype=mat.dtype)
        h = None
        for _ in range(polish):
            h = mat @ inv
            inv = inv @ (eye2 - h)
        if h is not None:
            r2 = jnp.sum((h - jnp.eye(d_, dtype=mat.dtype)) ** 2)
            bad = ~jnp.isfinite(r2) | (r2 > 4.0 * d_)
            norm1 = jnp.max(jnp.sum(jnp.abs(mat), axis=-2))
            norminf = jnp.max(jnp.sum(jnp.abs(mat), axis=-1))
            seed = mat.T / jnp.maximum(
                norm1 * norminf, jnp.asarray(1e-30, mat.dtype)
            )
            inv = jnp.where(bad, seed, inv)
        return 0.5 * (inv + inv.T)

    g_inv = _polished(g, g_inv)
    gz_inv = _polished(gz, gz_inv)

    return WindowState(
        zx=state.zx.at[i].set(z_q),
        u=state.u.at[i].set(u_q),
        zy=state.zy.at[i].set(zn_q),
        x=state.x.at[i].set(xt_q),
        idx=(i + 1) % w,
        g=g, g_inv=g_inv, gz=gz, gz_inv=gz_inv, mg=mg, mc=mc,
    )


@full_precision
def window_model_carry(state: WindowState, nlift: int) -> LinearModel:
    """Extraction from the carried statistics: two small matmuls (the
    normal equations are already solved by the carried inverses)."""
    k_ext = (state.g_inv @ state.mg).T
    c = (state.gz_inv @ state.mc).T
    return LinearModel(
        A=k_ext[..., :, :nlift], B=k_ext[..., :, nlift:], C=c
    )


@full_precision
def window_reanchor(state: WindowState, ridge: float) -> WindowState:
    """Rebuild the carried statistics exactly from the ring buffers —
    the periodic drift-reset of the Woodbury lane (lax.cond'd on the
    unbatched step index by the engine, so only anchor steps pay it).
    Inverses via the exact GJ elimination (one-shot, not per-step)."""
    cd = state.g.dtype  # carried-statistics (compute) dtype
    v = jnp.concatenate(
        [state.zx.astype(cd), state.u.astype(cd)], axis=-1
    )
    d = v.shape[-1]
    zx = state.zx.astype(cd)
    g = v.T @ v + ridge * jnp.eye(d, dtype=cd)
    gz = zx.T @ zx + ridge * jnp.eye(zx.shape[-1], dtype=cd)
    return state._replace(
        g=g,
        g_inv=spd_inverse(g),
        gz=gz,
        gz_inv=spd_inverse(gz),
        mg=v.T @ state.zy.astype(cd),
        mc=zx.T @ state.x.astype(cd),
    )


@full_precision
def window_model(
    state: WindowState, nlift: int, ridge: float = 1e-4, schulz_iters: int = 24
) -> LinearModel:
    """Refit (A, B, C) from the window via ridge normal equations and
    matmul-only inverses (batched-TPU-friendly; bounded condition because
    the window is bounded and features are normalized)."""
    # compute at full working precision even when the ring is stored
    # compressed (bf16/f16): the storage quantization is a data
    # perturbation, the refit arithmetic is not allowed to degrade
    cd = jnp.float64 if state.zx.dtype == jnp.float64 else jnp.float32
    v = jnp.concatenate(
        [state.zx.astype(cd), state.u.astype(cd)], axis=-1
    )  # (W, N+m)
    d = v.shape[-1]
    g = v.T @ v + ridge * jnp.eye(d, dtype=cd)
    gz = state.zx.astype(cd).T @ state.zx.astype(cd) + ridge * jnp.eye(
        nlift, dtype=cd
    )
    # DEFAULT IS DELIBERATELY THE TRUNCATED SCHULZ ITERATION, NOT THE EXACT
    # spd_inverse: at 24 iterations Schulz under-resolves the smallest Gram
    # eigendirections, i.e. it is a spectral filter on top of the ridge.
    # That filtering is load-bearing for f32 robustness — with the exact
    # inverse the post-switch Tank window fits noise in the weak directions
    # and the loop settles at x2~0.45 instead of 1.0 (observed 2026-08-18,
    # tests/test_sqrt_rls.py::test_windowed_estimator_readapts...). Pass
    # schulz_iters=0 for the exact (cheaper) extraction where the window is
    # persistently excited.
    if schulz_iters:
        # Two SEPARATE chains deliberately: stacking both Grams into one
        # (B, 2, d, d) Schulz chain is mathematically identical (Schulz is
        # scale-equivariant with per-matrix seed norms) but measured 9-25%
        # SLOWER end-to-end on the tank loop (183.6k -> 165.8k solves/s
        # stacked+unroll8, 138.5k stacked+unroll1, 2026-08-20): Mosaic
        # lowers the extra non-contracting batch dim worse than two plain
        # batched matmuls. Same tiny-shape wall as the Pallas kernels.
        g_inv = schulz_inverse(g, schulz_iters)
        gz_inv = schulz_inverse(gz, schulz_iters)
    else:
        g_inv = spd_inverse(g)
        gz_inv = spd_inverse(gz)
    k_ext = (g_inv @ (v.T @ state.zy.astype(cd))).T
    c = (gz_inv @ (state.zx.astype(cd).T @ state.x.astype(cd))).T
    return LinearModel(
        A=k_ext[..., :, :nlift], B=k_ext[..., :, nlift:], C=c
    )

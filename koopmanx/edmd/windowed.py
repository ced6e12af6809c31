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

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..types import LinearModel
from ..ops.linalg import spd_inverse
from .rls import full_precision, schulz_inverse


class WindowState(NamedTuple):
    """Ring buffers of the last W observations (static shapes)."""

    zx: Array  # (W, N) lifted states
    u: Array  # (W, m)
    zy: Array  # (W, N) lifted next states
    x: Array  # (W, n) output targets
    idx: Array  # scalar int32 write cursor


def window_init(
    window: int, nlift: int, m: int, n: int, dtype=jnp.float32
) -> WindowState:
    return WindowState(
        zx=jnp.zeros((window, nlift), dtype),
        u=jnp.zeros((window, m), dtype),
        zy=jnp.zeros((window, nlift), dtype),
        x=jnp.zeros((window, n), dtype),
        idx=jnp.zeros((), jnp.int32),
    )


@full_precision
def window_prefill(
    state: WindowState, zx: Array, u: Array, zy: Array, x: Array
) -> WindowState:
    """Fill the buffer with (up to W) training snapshots so the first refit
    is well posed."""
    w = state.zx.shape[0]
    take = min(w, zx.shape[0])
    sl = slice(zx.shape[0] - take, zx.shape[0])
    return WindowState(
        zx=state.zx.at[:take].set(zx[sl]),
        u=state.u.at[:take].set(u[sl]),
        zy=state.zy.at[:take].set(zy[sl]),
        x=state.x.at[:take].set(x[sl]),
        idx=jnp.asarray(take % w, jnp.int32),
    )


@full_precision
def window_update(
    state: WindowState, z: Array, u: Array, z_next: Array, x_target: Array
) -> WindowState:
    i = state.idx
    w = state.zx.shape[0]
    return WindowState(
        zx=state.zx.at[i].set(z),
        u=state.u.at[i].set(u),
        zy=state.zy.at[i].set(z_next),
        x=state.x.at[i].set(x_target),
        idx=(i + 1) % w,
    )


@full_precision
def window_model(
    state: WindowState, nlift: int, ridge: float = 1e-4, schulz_iters: int = 24
) -> LinearModel:
    """Refit (A, B, C) from the window via ridge normal equations and
    matmul-only inverses (batched-TPU-friendly; bounded condition because
    the window is bounded and features are normalized)."""
    v = jnp.concatenate([state.zx, state.u], axis=-1)  # (W, N+m)
    d = v.shape[-1]
    g = v.T @ v + ridge * jnp.eye(d, dtype=v.dtype)
    gz = state.zx.T @ state.zx + ridge * jnp.eye(nlift, dtype=v.dtype)
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
    k_ext = (g_inv @ (v.T @ state.zy)).T
    c = (gz_inv @ (state.zx.T @ state.x)).T
    return LinearModel(
        A=k_ext[..., :, :nlift], B=k_ext[..., :, nlift:], C=c
    )

"""Pallas TPU megakernel, scenario-in-lanes (SoA) layout.

The AoS kernel in :mod:`koopmanx.ops.qp_pallas` expresses per-scenario
small-matrix algebra as batched tiny matmuls — a shape Mosaic's tiled
layouts fundamentally dislike (minor-dim transposes/reshapes, M=1 matmuls
and >2D gathers all fail to lower; see BENCHMARKS.md log). This kernel
flips the layout: every per-scenario matrix entry becomes a *lane vector*
over the scenario tile —

    A: (nz, nz, T)   z: (nz, 1, T)   F2: (N*py, N*m, T)   ...

and ALL algebra is elementwise multiply-accumulate over (rows, cols, T)
blocks (:func:`_mm` — an unrolled contraction of static slices): purely
lane-vectorized VPU code. Transposed quantities (A^T, B^T, (CyC)^T) are
supplied by the host (XLA transposes are cheap there), and F2^T is built
by its own dual Markov recursion, so the kernel contains zero transposes,
reshapes or gathers. The whole QP pipeline — Markov recursion, F1 z0, F2,
H = F2' Q F2, Newton-Schulz KKT inverse, fixed-iteration ADMM — runs per
128-scenario tile with every intermediate resident in VMEM.

FLOP count is tiny (~0.3 MFLOP/scenario-step); the win over the XLA path
is eliminating ~100 HBM round-trips per control step of the per-step
(online-updated) QP pipeline.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qp_pallas import FusedQPConfig


def _mm(x, y):
    """SoA matmul: x (i, k, T) @ y (k, j, T) -> (i, j, T) as an unrolled
    sum over k of static-slice broadcasts (no tpu.matmul, no gathers)."""
    k_dim = x.shape[1]
    acc = None
    for k in range(k_dim):
        xk = jax.lax.slice_in_dim(x, k, k + 1, axis=1)  # (i, 1, T)
        yk = jax.lax.slice_in_dim(y, k, k + 1, axis=0)  # (1, j, T)
        term = xk * yk
        acc = term if acc is None else acc + term
    return acc


def _pattern_col(vals, length, dtype, shape):
    """Periodic constant pattern vals[i % len(vals)] materialized on
    ``shape`` whose first axis has ``length`` (built from iota + where —
    pallas kernels may not capture array constants)."""
    period = len(vals)
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0) % period
    out = jnp.zeros(shape, dtype)
    for k, v in enumerate(vals):
        out = jnp.where(idx == k, jnp.full(shape, v, dtype), out)
    return out


def _kernel(
    a_ref,  # (nz, nz, T)
    at_ref,  # (nz, nz, T)  A^T
    b_ref,  # (nz, m, T)
    bt_ref,  # (m, nz, T)   B^T
    cyc_ref,  # (py, nz, T)
    cyct_ref,  # (nz, py, T) (Cy C)^T
    z_ref,  # (nz, 1, T)
    yr_ref,  # (N*py, 1, T)
    warm_ref,  # (N*m, 1, T)
    u_out_ref,  # (N*m, T)
    cfg: FusedQPConfig,
):
    n_h = cfg.horizon
    a = a_ref[:]
    at = at_ref[:]
    b = b_ref[:]
    bt = bt_ref[:]
    cyc = cyc_ref[:]
    cyct = cyct_ref[:]
    z0 = z_ref[:]
    yr = yr_ref[:]
    warm = warm_ref[:]

    nz = a.shape[0]
    m = b.shape[1]
    py = cyc.shape[0]
    t = a.shape[-1]
    dtype = a.dtype
    clamp = cfg.f_clamp

    # ---- dual Markov recursions + F1 z0 (state recursion) ----
    g = cyc  # (py, nz, T) = Cy C A^j
    gt = cyct  # (nz, py, T) = (Cy C A^j)^T = (A^T)^j (Cy C)^T
    s_vec = z0  # (nz, 1, T) = A^j z0
    markov = []  # (py, m, T)  blocks:  (Cy C A^j) B
    markov_t = []  # (m, py, T) blocks: B^T (A^T)^j (Cy C)^T
    f1z_rows = []  # (py, 1, T)
    for _ in range(n_h):
        markov.append(jnp.clip(_mm(g, b), -clamp, clamp))
        markov_t.append(jnp.clip(_mm(bt, gt), -clamp, clamp))
        g = _mm(g, a)
        gt = _mm(at, gt)
        s_vec = _mm(a, s_vec)
        f1z_rows.append(jnp.clip(_mm(cyc, s_vec), -clamp, clamp))
    f1z = jnp.concatenate(f1z_rows, axis=0)  # (N*py, 1, T)

    # ---- F2 (N*py, N*m, T) and F2^T (N*m, N*py, T), Toeplitz assembly ----
    zero_blk = jnp.zeros((py, m, t), dtype)
    zero_blk_t = jnp.zeros((m, py, t), dtype)
    f2_rows = []
    f2t_rows = []
    for i in range(n_h):
        f2_rows.append(
            jnp.concatenate(
                [markov[i - j] if i >= j else zero_blk for j in range(n_h)],
                axis=1,
            )
        )
        f2t_rows.append(
            jnp.concatenate(
                [markov_t[j - i] if j >= i else zero_blk_t for j in range(n_h)],
                axis=1,
            )
        )
    f2 = jnp.concatenate(f2_rows, axis=0)
    f2t = jnp.concatenate(f2t_rows, axis=0)  # (N*m, N*py, T)

    # ---- H = 2(F2' Qbar F2 + Rbar): scale F2^T's contraction axis by q ----
    nxm = n_h * m
    nrow = n_h * py
    qrow = _pattern_col(cfg.qdiag, nrow, dtype, (nrow, 1))  # (nrow, 1)
    f2q = f2 * qrow[:, :, None]  # Qbar F2  (scales rows of F2)
    h = _mm(f2t, f2q)  # (N*m, N*m, T)
    rid = jax.lax.broadcasted_iota(jnp.int32, (nxm, nxm), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (nxm, nxm), 1)
    rdiag2d = _pattern_col(cfg.rdiag, nxm, dtype, (nxm, nxm))
    h = h + jnp.where(rid == cid, rdiag2d, jnp.zeros((nxm, nxm), dtype))[
        :, :, None
    ]
    p_mat = 2.0 * h

    # ---- q = 2 F2' Qbar (F1 z0 - yr) ----
    err = f1z - yr  # (nrow, 1, T)
    q_vec = 2.0 * _mm(f2t, err * qrow[:, :, None])  # (N*m, 1, T)

    # ---- Newton-Schulz inverse of the (symmetric) KKT matrix ----
    eye2d = (rid == cid).astype(dtype)[:, :, None]  # (nxm, nxm, 1)
    trace_p = jnp.sum(p_mat * eye2d, axis=(0, 1), keepdims=True)  # (1,1,T)
    rho = cfg.rho * jnp.maximum(trace_p / nxm, 1e-6)
    kkt = p_mat + (cfg.sigma + rho) * eye2d
    norm1 = jnp.max(
        jnp.sum(jnp.abs(kkt), axis=0, keepdims=True), axis=1, keepdims=True
    )
    norminf = jnp.max(
        jnp.sum(jnp.abs(kkt), axis=1, keepdims=True), axis=0, keepdims=True
    )
    x_inv = kkt / (norm1 * norminf)  # symmetric seed
    eye2 = 2.0 * eye2d

    def schulz_body(i, x_inv):
        return _mm(x_inv, eye2 - _mm(kkt, x_inv))

    x_inv = jax.lax.fori_loop(0, cfg.schulz_iters, schulz_body, x_inv)

    # ---- ADMM on box constraints ----
    lo = _pattern_col(cfg.u_lo, nxm, dtype, (nxm, 1))[:, :, None]
    hi = _pattern_col(cfg.u_hi, nxm, dtype, (nxm, 1))[:, :, None]
    x = warm  # (nxm, 1, T)
    y = jnp.zeros_like(x)
    zv = jnp.clip(x, lo, hi)

    def admm_body(i, carry):
        x, zv, y = carry
        rhs = cfg.sigma * x - q_vec + rho * zv - y
        xt = _mm(x_inv, rhs)
        x_mid = cfg.alpha * xt + (1.0 - cfg.alpha) * zv
        z_new = jnp.clip(x_mid + y / rho, lo, hi)
        y_new = y + rho * (x_mid - z_new)
        return xt, z_new, y_new

    x, zv, y = jax.lax.fori_loop(0, cfg.iters, admm_body, (x, zv, y))
    u_out_ref[:] = zv[:, 0, :]  # (N*m, T)


def fused_qp_solve_soa(
    a: Array,  # (B, nz, nz)
    b: Array,  # (B, nz, m)
    cyc: Array,  # (B, py, nz)
    z0: Array,  # (B, nz)
    yr: Array,  # (B, N*py)
    warm: Array,  # (B, N*m)
    cfg: FusedQPConfig = FusedQPConfig(),
    interpret: bool = False,
) -> Array:
    """SoA fused QP solve. Host transposes to scenario-in-lanes layout
    (cheap XLA transposes), runs the kernel, transposes back. Returns
    (B, N*m) input sequences."""
    bsz = a.shape[0]
    tile = min(cfg.tile, bsz)
    assert bsz % tile == 0, (bsz, tile)
    n_h = cfg.horizon
    nz, m, py = a.shape[-1], b.shape[-1], cyc.shape[-2]

    a_s = jnp.transpose(a, (1, 2, 0))
    at_s = jnp.transpose(a, (2, 1, 0))
    b_s = jnp.transpose(b, (1, 2, 0))
    bt_s = jnp.transpose(b, (2, 1, 0))
    cyc_s = jnp.transpose(cyc, (1, 2, 0))
    cyct_s = jnp.transpose(cyc, (2, 1, 0))
    z_s = z0.T[:, None, :]  # (nz, 1, B)
    yr_s = yr.T[:, None, :]
    warm_s = warm.T[:, None, :]

    def lanes(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            tuple(dims) + (tile,),
            lambda i: (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(_kernel, cfg=cfg)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_h * m, bsz), a.dtype),
        grid=(bsz // tile,),
        in_specs=[
            lanes(nz, nz),
            lanes(nz, nz),
            lanes(nz, m),
            lanes(m, nz),
            lanes(py, nz),
            lanes(nz, py),
            lanes(nz, 1),
            lanes(n_h * py, 1),
            lanes(n_h * m, 1),
        ],
        out_specs=lanes(n_h * m),
        interpret=interpret,
    )(a_s, at_s, b_s, bt_s, cyc_s, cyct_s, z_s, yr_s, warm_s)
    return out.T  # (B, N*m)

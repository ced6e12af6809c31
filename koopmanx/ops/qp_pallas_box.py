"""VMEM-resident batched box-QP ADMM kernel (Pallas/Mosaic).

The production engine solves, per scenario per control step,

  minimize 1/2 u'Pu + q'u   s.t.  lo <= u <= hi

with a fixed-iteration OSQP-style ADMM (``control/qp.py::solve_box_qp``,
replacing MATLAB quadprog at ``/root/reference/Tank_System.m:158`` and
scipy L-BFGS-B at ``/root/reference/duffing.py:776-778``). Under XLA each
ADMM iteration is a separate fusion pair that RE-READS the per-scenario
KKT inverse from HBM: at batch 2048, horizon 20, that is
2048*20*20*4 B = 3.3 MB * 60 iterations = ~200 MB/step of redundant HBM
traffic, measured as ~450 us/step of multiply_reduce/multiply_subtract
fusions (logs/profile_r2b.log, 2026-08-19).

This kernel keeps the whole ADMM state in VMEM: the KKT inverses are
DMA'd from HBM ONCE per step and all ``iters`` iterations run on-chip.

Layout (SoA, scenario-in-lanes — the layout the earlier whole-pipeline
SoA kernel established as Mosaic-friendly, see BENCHMARKS.md
"Fused-kernel study"):

  minv : (nx, nx, B)   per-scenario KKT inverse; ``minv[i]`` is a clean
                       2D (nx, B) slice on the untiled leading dim
  vecs : (nx, B)       q / lo / hi / x / z / y
  rho  : (1, B)        per-scenario ADMM step size

The per-iteration linear solve ``xt = Minv @ rhs`` becomes nx sublane
reductions ``sum(minv[i] * rhs, axis=0)`` — pure VPU work on lanes-wide
vectors with zero HBM traffic. Unlike the retired whole-pipeline SoA
megakernel (which serialized a ~2,500-op dependent chain), this kernel
fuses ONLY the ADMM loop; the MXU-friendly stages (encode, condensed
build) stay in XLA.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _admm_kernel(
    minv_ref,  # (nx, nx, Bt) — minv_ref[j][i, b] = KKTinv[b, i, j]
    q_ref,     # (nx, Bt)
    lo_ref,
    hi_ref,
    x0_ref,
    y0_ref,
    rho_ref,   # (1, Bt)
    xt_out,    # (nx, Bt) raw final iterate (for the primal residual)
    z_out,     # (nx, Bt) projected solution
    y_out,     # (nx, Bt) dual (for warm starts)
    *,
    nx: int,
    iters: int,
    sigma: float,
    alpha: float,
    unroll: bool,
):
    q = q_ref[:]
    lo = lo_ref[:]
    hi = hi_ref[:]
    rho = rho_ref[:]
    inv_rho = 1.0 / rho
    x = x0_ref[:]
    y = y0_ref[:]
    z = jnp.clip(x, lo, hi)
    minv = minv_ref[:]

    def matvec(rhs):
        # xt[i, :] = sum_j KKTinv[i, j, :] * rhs[j, :]. The input is laid
        # out column-major (minv[j] is KKTinv's j-th COLUMN over all
        # scenarios), so the contraction is nx row-broadcast multiplies
        #     sum_j minv[j] * rhs[j:j+1, :]
        # — (nx, Bt) * (1, Bt) sublane broadcasts with a log-depth add
        # tree, avoiding cross-sublane reductions entirely (measured 40%
        # slower as sum(minv[i]*rhs, axis=0) per-row reduces).
        terms = [minv[j] * rhs[j : j + 1, :] for j in range(nx)]
        while len(terms) > 1:
            nxt = [
                terms[k] + terms[k + 1]
                for k in range(0, len(terms) - 1, 2)
            ]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    def body(carry):
        x, z, y = carry
        rhs = sigma * x - q + rho * z - y
        xt = matvec(rhs)
        x_mid = alpha * xt + (1.0 - alpha) * z
        z_new = jnp.clip(x_mid + y * inv_rho, lo, hi)
        y_new = y + rho * (x_mid - z_new)
        return (xt, z_new, y_new)

    if unroll:
        carry = (x, z, y)
        for _ in range(iters):
            carry = body(carry)
        x, z, y = carry
    else:
        x, z, y = jax.lax.fori_loop(
            0, iters, lambda _, c: body(c), (x, z, y)
        )
    xt_out[:] = x
    z_out[:] = z
    y_out[:] = y


class BoxADMMOut(NamedTuple):
    xt: Array  # (B, nx) final unprojected iterate
    z: Array   # (B, nx) projected (feasible) solution
    y: Array   # (B, nx) dual


@functools.partial(
    jax.jit,
    static_argnames=("iters", "sigma", "alpha", "tile", "unroll", "interpret"),
)
def box_admm_pallas(
    minv: Array,  # (B, nx, nx) per-scenario KKT inverse
    q: Array,     # (B, nx)
    lo: Array,    # (B, nx)
    hi: Array,    # (B, nx)
    x0: Array,    # (B, nx)
    y0: Array,    # (B, nx)
    rho: Array,   # (B,)
    iters: int = 60,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    tile: int = 1024,
    unroll: bool = True,
    interpret: bool = False,
) -> BoxADMMOut:
    """Run ``iters`` box-ADMM iterations for a batch of QPs on-chip.

    Semantically identical to ``vmap(control.qp.solve_box_qp)`` given the
    same precomputed ``minv``/``rho`` (same op order per iteration, modulo
    f32 reassociation in the matvec reduction).
    """
    b, nx = q.shape
    dtype = q.dtype

    bt = min(tile, _round_up(b, 128))
    bp = _round_up(b, bt)
    pad = bp - b
    if pad:
        # padded scenarios solve a benign QP (Minv = I, q = 0, box [-1, 1])
        eye = jnp.broadcast_to(jnp.eye(nx, dtype=dtype), (pad, nx, nx))
        minv = jnp.concatenate([minv, eye], axis=0)
        q = jnp.concatenate([q, jnp.zeros((pad, nx), dtype)], axis=0)
        lo = jnp.concatenate([lo, jnp.full((pad, nx), -1.0, dtype)], axis=0)
        hi = jnp.concatenate([hi, jnp.full((pad, nx), 1.0, dtype)], axis=0)
        x0 = jnp.concatenate([x0, jnp.zeros((pad, nx), dtype)], axis=0)
        y0 = jnp.concatenate([y0, jnp.zeros((pad, nx), dtype)], axis=0)
        rho = jnp.concatenate([rho, jnp.ones((pad,), dtype)], axis=0)

    # AoS -> SoA (scenario-in-lanes), column-major so the kernel's
    # broadcast-row contraction reads KKTinv columns as leading-dim slices
    minv_t = jnp.transpose(minv, (2, 1, 0))
    qt, lot, hit = q.T, lo.T, hi.T
    x0t, y0t = x0.T, y0.T
    rho_t = rho[None, :]

    grid = (bp // bt,)
    mat_spec = pl.BlockSpec(
        (nx, nx, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((nx, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, bt), lambda i: (0, i), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _admm_kernel, nx=nx, iters=iters, sigma=sigma, alpha=alpha,
        unroll=unroll,
    )
    out_shape = jax.ShapeDtypeStruct((nx, bp), dtype)
    xt, z, y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat_spec] + [vec_spec] * 5 + [row_spec],
        out_specs=(vec_spec, vec_spec, vec_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(minv_t, qt, lot, hit, x0t, y0t, rho_t)

    return BoxADMMOut(xt=xt.T[:b], z=z.T[:b], y=y.T[:b])

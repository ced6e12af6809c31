"""L4 — batched first-order QP solver (OSQP-style ADMM).

Replaces MATLAB ``quadprog`` (active-set, ``Tank_System.m:158``) and
scipy L-BFGS-B (``duffing.py:776-778``) with a TPU-idiomatic solver:

  minimize 1/2 x'Px + q'x   s.t.  l <= Ax <= u

ADMM iteration (Stellato et al., OSQP):
  (P + sigma I + rho A'A) xt = sigma x - q + A'(rho z - y)
  x+ = alpha xt + (1-alpha) x
  z+ = clip(alpha A xt + (1-alpha) z + y/rho, l, u)
  y+ = y + rho (alpha A xt + (1-alpha) z - z+)

Design for the MXU: the KKT matrix is factorized (or inverted) ONCE per
control step — an O(nx^3) op on a <=20x20 matrix — and the fixed-count
iteration body is nothing but small GEMVs, so a ``vmap`` over 10^4 scenarios
turns each iteration into a handful of (batch, nx) x (nx, nx) batched
matmuls. Fixed iteration counts keep the program branch-free under ``jit``
(no data-dependent control flow; SURVEY §7.4 "quadprog semantics" risk is
handled by running enough iterations and validating against a CPU oracle in
tests).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.linalg import spd_inverse
from ..types import QPData, QPSolution


class ADMMConfig(NamedTuple):
    iters: int = 100
    rho: float = 1.0
    sigma: float = 1e-6
    alpha: float = 1.6
    scale_rho: bool = True  # normalize rho by trace(P)/nx (cheap Ruiz stand-in)
    # lax.scan unroll for the iteration body: the body is ~8 tiny fused ops
    # on (nx,) vectors, so per-iteration while-loop carry copies dominate;
    # unrolling amortizes them (semantics-neutral, compile-time cost only)
    unroll: int = 10
    # Block size for the KKT elimination (ops/linalg.spd_inverse block
    # Gauss-Jordan): r > 1 cuts the elimination's dominant HBM stream
    # ~r-fold (ceil(n/r) passes over the augmented matrix instead of n).
    # The lever for multi-input plants whose (Nc*nu, Nc*nu) KKT dwarfs the
    # nu=1 case; 1 = the round-1 scalar kernel (bit-identical semantics).
    kkt_block: int = 1
    # Store the per-step KKT inverse in bfloat16 (accumulation stays f32).
    # The iteration re-reads that matrix from HBM every one of its `iters`
    # iterations — the measured HBM-roofline term of the whole step
    # (BENCHMARKS.md round-2 roofline study) — so halving its width halves
    # the dominant stream. Accuracy: a bf16 KKT inverse perturbs the QP
    # Hessian by ~0.4%, i.e. the ADMM converges to the exact solution of a
    # ~0.4%-perturbed QP; controller-side only (the estimator is pinned at
    # full precision elsewhere). OFF by default; enable for throughput.
    kkt_bf16: bool = False


def _effective_rho(p: Array, cfg: ADMMConfig) -> Array:
    if not cfg.scale_rho:
        return jnp.asarray(cfg.rho, p.dtype)
    nx = p.shape[-1]
    scale = jnp.trace(p) / nx
    return cfg.rho * jnp.maximum(scale, jnp.asarray(1e-6, p.dtype))


def solve_qp(
    qp: QPData,
    cfg: ADMMConfig = ADMMConfig(),
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
) -> QPSolution:
    """Solve one QP with a fixed number of ADMM iterations.

    Warm starting (``x0``/``y0``) carries the previous control step's
    solution — the closed-loop engine shifts it by one step, which typically
    halves the iterations needed for a given tracking tolerance.
    """
    nx = qp.P.shape[-1]
    nc = qp.A.shape[-2]
    dtype = qp.P.dtype
    x = jnp.zeros((nx,), dtype) if x0 is None else x0
    y = jnp.zeros((nc,), dtype) if y0 is None else y0
    z = jnp.clip(qp.A @ x, qp.l, qp.u)

    rho = _effective_rho(qp.P, cfg)
    sigma, alpha = cfg.sigma, cfg.alpha
    kkt = qp.P + sigma * jnp.eye(nx, dtype=dtype) + rho * qp.A.T @ qp.A
    kkt_inv = spd_inverse(kkt, block=cfg.kkt_block)
    if cfg.kkt_bf16:
        kkt_inv = kkt_inv.astype(jnp.bfloat16)

    def body(carry, _):
        x, z, y = carry
        rhs = sigma * x - qp.q + qp.A.T @ (rho * z - y)
        # the astype sits INSIDE the iteration body so XLA fuses the
        # bf16->f32 convert into the matvec's operand read (the matrix is
        # streamed from HBM at half width, accumulation stays f32)
        xt = kkt_inv.astype(dtype) @ rhs
        axt = qp.A @ xt
        x_new = alpha * xt + (1.0 - alpha) * x
        z_mid = alpha * axt + (1.0 - alpha) * z
        z_new = jnp.clip(z_mid + y / rho, qp.l, qp.u)
        y_new = y + rho * (z_mid - z_new)
        return (x_new, z_new, y_new), None

    (x, z, y), _ = jax.lax.scan(
        body, (x, z, y), None, length=cfg.iters,
        unroll=min(cfg.unroll, cfg.iters),
    )

    ax = qp.A @ x
    primal = jnp.max(jnp.abs(ax - jnp.clip(ax, qp.l, qp.u)))
    dual = jnp.max(jnp.abs(qp.P @ x + qp.q + qp.A.T @ y))
    return QPSolution(
        x=x,
        z=z,
        y=y,
        primal_res=primal,
        dual_res=dual,
        iterations=jnp.asarray(cfg.iters),
    )


def solve_qp_batch(qp: QPData, cfg: ADMMConfig = ADMMConfig(), x0=None, y0=None):
    """vmapped batch solve: every leaf of ``qp`` has a leading batch dim."""
    fn = partial(solve_qp, cfg=cfg)
    in_axes = (0, 0 if x0 is not None else None, 0 if y0 is not None else None)
    return jax.vmap(lambda q, a, b: fn(q, x0=a, y0=b), in_axes=in_axes)(qp, x0, y0)


def box_kkt(p: Array, cfg: ADMMConfig) -> Array:
    """The box-path ADMM KKT matrix P + (sigma + rho(P)) I — exposed so the
    engine's carried-inverse mode (EngineConfig.qp_kkt_refine) builds the
    SAME matrix the solver would."""
    nx = p.shape[-1]
    rho = _effective_rho(p, cfg)
    return p + (cfg.sigma + rho) * jnp.eye(nx, dtype=p.dtype)


def solve_box_qp(
    p: Array,
    q: Array,
    lo: Array,
    hi: Array,
    cfg: ADMMConfig = ADMMConfig(),
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    kkt_inv: Optional[Array] = None,
) -> QPSolution:
    """Box-constrained fast path (A = I): the KKT solve shrinks to
    (P + (sigma+rho) I)^{-1} and no constraint matmuls are needed.

    This is the hot path for the Duffing/VDP loops whose only constraints
    are input bounds (duffing.py:636 bounds ±2, vanderpol.py:542 ±6).

    ``kkt_inv``: caller-supplied inverse of :func:`box_kkt` (the engine's
    Newton-Schulz tracking inverse); None = exact Gauss-Jordan here.
    """
    nx = p.shape[-1]
    dtype = p.dtype
    x = jnp.zeros((nx,), dtype) if x0 is None else x0
    y = jnp.zeros((nx,), dtype) if y0 is None else y0
    z = jnp.clip(x, lo, hi)

    rho = _effective_rho(p, cfg)
    sigma, alpha = cfg.sigma, cfg.alpha
    if kkt_inv is None:
        kkt_inv = spd_inverse(
            p + (sigma + rho) * jnp.eye(nx, dtype=dtype),
            block=cfg.kkt_block,
        )
    if cfg.kkt_bf16:
        kkt_inv = kkt_inv.astype(jnp.bfloat16)

    def body(carry, _):
        x, z, y = carry
        rhs = sigma * x - q + rho * z - y
        xt = kkt_inv.astype(dtype) @ rhs  # bf16 stream, f32 accumulate
        x_mid = alpha * xt + (1.0 - alpha) * z
        z_new = jnp.clip(x_mid + y / rho, lo, hi)
        y_new = y + rho * (x_mid - z_new)
        return (xt, z_new, y_new), None

    (x, z, y), _ = jax.lax.scan(
        body, (x, z, y), None, length=cfg.iters,
        unroll=min(cfg.unroll, cfg.iters),
    )
    primal = jnp.max(jnp.abs(x - jnp.clip(x, lo, hi)))
    dual = jnp.max(jnp.abs(p @ z + q + y))
    return QPSolution(
        x=z,  # the projected iterate is the feasible solution
        z=z,
        y=y,
        primal_res=primal,
        dual_res=dual,
        iterations=jnp.asarray(cfg.iters),
    )


def solve_box_qp_batch_pallas(
    p: Array,
    q: Array,
    lo: Array,
    hi: Array,
    cfg: ADMMConfig = ADMMConfig(),
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    tile: int = 1024,
    unroll: bool = True,
    interpret: bool = False,
) -> QPSolution:
    """Batched box QP via the VMEM-resident Pallas ADMM kernel.

    Same iteration as ``vmap(solve_box_qp)`` (identical KKT setup and
    epilogue; the kernel keeps the per-scenario KKT inverses in VMEM for
    all ``cfg.iters`` iterations instead of re-streaming them from HBM —
    see ``ops/qp_pallas_box.py``). All leaves carry a leading batch dim.
    """
    from ..ops.qp_pallas_box import box_admm_pallas

    b, nx = q.shape
    dtype = q.dtype
    rho = jax.vmap(lambda pp: _effective_rho(pp, cfg))(p)
    eye = jnp.eye(nx, dtype=dtype)
    kkt_inv = spd_inverse(p + (cfg.sigma + rho)[:, None, None] * eye)
    x0 = jnp.zeros((b, nx), dtype) if x0 is None else x0
    y0 = jnp.zeros((b, nx), dtype) if y0 is None else y0
    out = box_admm_pallas(
        kkt_inv, q, lo, hi, x0, y0, rho,
        iters=cfg.iters, sigma=cfg.sigma, alpha=cfg.alpha,
        tile=tile, unroll=unroll, interpret=interpret,
    )
    primal = jnp.max(jnp.abs(out.xt - jnp.clip(out.xt, lo, hi)), axis=-1)
    dual = jnp.max(
        jnp.abs(jnp.einsum("bij,bj->bi", p, out.z) + q + out.y), axis=-1
    )
    return QPSolution(
        x=out.z,
        z=out.z,
        y=out.y,
        primal_res=primal,
        dual_res=dual,
        iterations=jnp.full((b,), cfg.iters),
    )


def make_box_qp_solver(cfg: ADMMConfig, backend: str = "xla"):
    """Box-QP solver ``solve(p, q, lo, hi, x0, y0)`` with a custom
    batching rule.

    Called unbatched it is exactly ``solve_box_qp``. Under ``vmap`` (the
    engine's ``run_batch``/``sharded_closed_loop`` scenario axis) the rule
    sees the WHOLE batch at once, so ``backend='pallas'`` can route it to
    the VMEM-resident kernel — something a plain per-scenario function can
    never express (vmapping a per-scenario ``pallas_call`` would emit one
    sequential grid cell per scenario). Falls back to ``vmap(solve_box_qp)``
    off-TPU or at f64, keeping the CPU test mesh and f64 parity paths on
    the reference XLA implementation.

    ``backend='xla'`` (the default) returns a PLAIN closure over
    ``solve_box_qp`` with no custom_vmap wrapper: ``jax.custom_batching``
    has no reverse-mode rule, and the default engine must stay
    differentiable end-to-end (gradient-through-the-closed-loop tuning,
    ``examples/tune_weights.py``).
    """
    if backend != "pallas":
        def solve_plain(p, q, lo, hi, x0, y0, kkt_inv=None):
            return solve_box_qp(p, q, lo, hi, cfg, x0=x0, y0=y0,
                                kkt_inv=kkt_inv)

        return solve_plain

    @jax.custom_batching.custom_vmap
    def solve(p, q, lo, hi, x0, y0):
        return solve_box_qp(p, q, lo, hi, cfg, x0=x0, y0=y0)

    @solve.def_vmap
    def _rule(axis_size, in_batched, p, q, lo, hi, x0, y0):
        def bcast(v, batched):
            return v if batched else jnp.broadcast_to(
                v, (axis_size,) + v.shape
            )

        p, q, lo, hi, x0, y0 = (
            bcast(v, bt)
            for v, bt in zip((p, q, lo, hi, x0, y0), in_batched)
        )
        use_kernel = (
            backend == "pallas"
            and p.dtype == jnp.float32
            and jax.default_backend() == "tpu"
        )
        if use_kernel:
            sol = solve_box_qp_batch_pallas(p, q, lo, hi, cfg, x0, y0)
        else:
            sol = jax.vmap(
                lambda *a: solve_box_qp(a[0], a[1], a[2], a[3], cfg,
                                        x0=a[4], y0=a[5])
            )(p, q, lo, hi, x0, y0)
        batched = QPSolution(
            x=True, z=True, y=True,
            primal_res=True, dual_res=True, iterations=True,
        )
        return sol, batched

    return solve

#!/usr/bin/env python
"""Microbench: batched SPD inverse strategies at (B, n, n) on TPU.

The ADMM KKT inverse is the fused control step's dominant cost. LAPACK-style
custom calls (LU 10.3 ms, Cholesky 4.3 ms per step at B=2048, n=20)
serialize on TPU; candidates here lower to plain batched VPU/MXU ops.

NOTE: the axon remote tunnel adds ~25 ms dispatch overhead per jitted call,
so each candidate runs ITERS times inside one lax.scan (input perturbed by
the carry to defeat loop-invariant code motion) and we report per-iteration
time net of an empty-loop baseline.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = 100


def make_spd(key, b, n, cond=1e3, dtype=jnp.float32):
    a = jax.random.normal(key, (b, n, n), dtype)
    q, _ = jnp.linalg.qr(a)
    lam = jnp.logspace(0, jnp.log10(cond), n, dtype=dtype)
    k = jnp.einsum("bij,j,bkj->bik", q, lam, q)
    # EXACT symmetrization: at TPU-default (bf16-pass) einsum precision the
    # product is asymmetric by ~1e-3 relative — candidates that symmetrize
    # their output (spd_inverse does, its callers rely on it) then show an
    # O(asymmetry * cond) phantom residual (measured 0.163 at n=40 on a
    # device-built k vs 1.4e-5 on an exactly-symmetric host-built one)
    return 0.5 * (k + jnp.swapaxes(k, -1, -2))


def inv_lu(k):
    return jnp.linalg.inv(k)


def inv_chol_lapack(k):
    n = k.shape[-1]
    l = jnp.linalg.cholesky(k)
    li = jax.scipy.linalg.solve_triangular(
        l, jnp.broadcast_to(jnp.eye(n, dtype=k.dtype), k.shape), lower=True
    )
    return jnp.einsum("bji,bjk->bik", li, li)


def inv_gj_unrolled(k):
    """Pivot-free Gauss-Jordan on an SPD matrix: n unrolled elimination
    steps, each one batched rank-1 update of the augmented [K | I]."""
    b, n, _ = k.shape
    aug = jnp.concatenate(
        [k, jnp.broadcast_to(jnp.eye(n, dtype=k.dtype), k.shape)], axis=-1
    )  # (b, n, 2n)
    for j in range(n):
        piv = aug[:, j, :] / aug[:, j, j : j + 1]  # (b, 2n)
        factor = aug[:, :, j].at[:, j].set(0.0)  # (b, n)
        aug = aug - factor[:, :, None] * piv[:, None, :]
        aug = aug.at[:, j, :].set(piv)
    return aug[:, :, n:]


def inv_gj5(k):
    return inv_gj_unrolled(k)


def inv_schur(k):
    """Recursive 2x2-block Schur inversion; all work is batched MXU matmuls.
    Base case: unrolled Gauss-Jordan at n<=5."""
    n = k.shape[-1]
    if n <= 5:
        return inv_gj_unrolled(k)
    h = n // 2
    k11 = k[:, :h, :h]
    k12 = k[:, :h, h:]
    k21 = k[:, h:, :h]
    k22 = k[:, h:, h:]
    i11 = inv_schur(k11)
    w = i11 @ k12
    s = k22 - k21 @ w
    is_ = inv_schur(s)
    top_right = -w @ is_
    bottom_left = jnp.swapaxes(top_right, -1, -2)
    top_left = i11 - top_right @ jnp.swapaxes(w, -1, -2)
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bottom_left, is_], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def ns_refine4(k, x0):
    x = x0
    eye = jnp.broadcast_to(jnp.eye(k.shape[-1], dtype=k.dtype), k.shape)
    for _ in range(4):
        x = x @ (2.0 * eye - k @ x)
    return x


def residual(k, out, sample=256):
    """max |K X - I| in f64 on the HOST. The device einsum used before ran
    at TPU-default (single-pass bf16) matmul precision, whose ~0.2 error
    floor at n=129 saturated the column for every method (BENCHMARKS.md
    n=129 caveat) — method error was unmeasurable. A subsample bounds the
    host cost at large B."""
    import numpy as np

    b = k.shape[0]
    take = min(b, sample)
    kh = np.asarray(k[:take], dtype=np.float64)
    xh = np.asarray(out[:take], dtype=np.float64)
    eye = np.eye(k.shape[-1], dtype=np.float64)
    return float(np.max(np.abs(np.einsum("bij,bjk->bik", kh, xh) - eye)))


def loop_time(fn, k, x0=None, reps=3):
    """Per-iteration time of fn inside a scan, net of dispatch.

    The operands are jit ARGUMENTS (not closure captures — captured
    device arrays embed in the module as literal constants, which at
    large (B, n, n) blows the remote-compile request size limit)."""

    def body_of(kin, x0in):
        def body(c, _):
            # defeat LICM with an ADDITIVE diagonal perturbation — the
            # earlier scalar multiply kin * (1 + eps*c) is algebraically
            # invertible (inv(sK) = inv(K)/s) — at a REPRESENTABLE scale: a
            # 1e-6 diagonal shift is sub-ULP for f32 entries O(300), so
            # the loop body is bit-invariant and XLA legally hoists the
            # whole op (the 0.001 ms lu_inv rows); 3e-2 is ~1e-4 relative
            # on the diagonal (representable) and 0.01% of lambda_max
            # (timing-neutral) (probe_lu_elision.py: iters
            # scaling only appears with a material perturbation + 1e-20
            # coupling; with those, LU measures 12.9 ms/iter at
            # (2048,20,20), matching the round-1 number)
            n_ = kin.shape[-1]
            kk = kin + (3e-2 * (1.0 + c)) * jnp.eye(n_, dtype=kin.dtype)
            out = fn(kk) if x0in is None else fn(kk, x0in)
            # consume EVERY element of the result into the timing
            # dependency chain; the 1e-20 coupling keeps the checksum
            # nonzero in f32 (1e-30 rounded to no-op and re-enabled the
            # elision)
            # accumulate MOD 1: c must change by a REPRESENTABLE
            # amount each iteration (with a 1e-20 coupling the
            # carry's increment vanishes in f32 and the perturbation
            # value repeats bit-exactly -> the body is loop-
            # invariant again and simple matmul chains get hoisted)
            return jnp.mod(c + jnp.sum(out) * 1e-3, 1.0), None

        return body

    if x0 is None:
        run = jax.jit(
            lambda kin: jax.lax.scan(
                body_of(kin, None), jnp.float32(0.0), None, length=ITERS
            )[0]
        )
        args = (k,)
    else:
        run = jax.jit(
            lambda kin, x0in: jax.lax.scan(
                body_of(kin, x0in), jnp.float32(0.0), None, length=ITERS
            )[0]
        )
        args = (k, x0)
    out = jax.block_until_ready(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    b = int(os.environ.get("B", "2048"))
    n = int(os.environ.get("N", "20"))
    cond = float(os.environ.get("COND", "1e3"))
    k = make_spd(jax.random.PRNGKey(0), b, n, cond)
    k = jax.block_until_ready(k)
    print(f"B={b} n={n} cond={cond} dtype={k.dtype} platform={jax.devices()[0]}")

    # empty-loop baseline (the k perturbation op itself)
    base = loop_time(lambda kk: kk, k)
    print(f"{'baseline (copy)':24s} {base*1e3:9.3f} ms/iter")

    from koopmanx.ops.linalg import spd_inverse

    candidates = [
        ("lu_inv", inv_lu, None),
        ("chol_lapack", inv_chol_lapack, None),
        ("gj_unrolled", inv_gj_unrolled, None),
        ("gj_block2", lambda kk: spd_inverse(kk, block=2), None),
        ("gj_block4", lambda kk: spd_inverse(kk, block=4), None),
        ("gj_block8", lambda kk: spd_inverse(kk, block=8), None),
        ("schur_block", inv_schur, None),
    ]
    for name, fn, _ in candidates:
        t = loop_time(fn, k)
        out = jax.jit(fn)(k)
        err = residual(k, out)
        print(f"{name:24s} {t*1e3:9.3f} ms/iter (net {max(t-base,0)*1e3:7.3f})  max|KX-I|={err:.2e}")

    # warm seed from the GJ inverse (the chol_lapack route produces a bad
    # inverse on this backend — measured residual 0.45 at n=20 f32 — and
    # poisons the NS refinement's seed)
    x0 = jax.block_until_ready(jax.jit(inv_gj_unrolled)(k))
    t = loop_time(ns_refine4, k, x0)
    out = jax.jit(ns_refine4)(k, x0)
    err = residual(k, out)
    print(f"{'ns_refine4 (warm)':24s} {t*1e3:9.3f} ms/iter (net {max(t-base,0)*1e3:7.3f})  max|KX-I|={err:.2e}")

    # the production estimator pins FULL f32 matmul precision
    # (edmd.rls.full_precision) — the default-precision NS row above runs
    # bf16-pass matmuls (residual ~0.4-1.0 at cond 1e3: each iteration
    # injects ~1e-3 relative error), so the production-relevant NS number
    # is this pinned row
    def ns_refine4_pinned(kk, x0in):
        with jax.default_matmul_precision("highest"):
            return ns_refine4(kk, x0in)

    t = loop_time(ns_refine4_pinned, k, x0)
    out = jax.jit(ns_refine4_pinned)(k, x0)
    err = residual(k, out)
    print(f"{'ns_refine4 (warm,f32)':24s} {t*1e3:9.3f} ms/iter (net {max(t-base,0)*1e3:7.3f})  max|KX-I|={err:.2e}")


if __name__ == "__main__":
    main()

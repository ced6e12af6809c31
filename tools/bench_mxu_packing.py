#!/usr/bin/env python
"""MXU block-diagonal packing — the last unmeasured kernel route.

BENCHMARKS.md round 1 flagged "16 scenarios' 8x8 blocks per 128x128 MXU
tile" as the promising direction after the AoS/SoA/VMEM-Pallas negatives;
rounds 2-4 measured every OTHER route (carried-NS, stacked Schulz, bf16
streams) and left this one open. The idea: batched tiny matmuls pad each
(n, n) operand to one 128x128 MXU tile (~n^2/128^2 utilization), so
packing k = floor(128/n) scenarios onto the tile diagonal raises MXU
utilization k-fold per tile and cuts the tile count k-fold.

The catch this benchmark quantifies: a packed operand materializes the
OFF-DIAGONAL zeros — (B/k, 128, 128) carries 128^2/(k n^2) more bytes
than (B, n, n) — so packing trades HBM bytes for MXU occupancy. It can
only win where the baseline is genuinely MXU-throughput-bound, not
bandwidth-bound. Block-diagonal structure is closed under matmul, so a
CHAIN (the Schulz/NS iterations — the real production shape) packs once
and unpacks once; the single-op rows include the packing scatter.

Shapes mirror production streams: n=13 (tank windowed Grams), n=20
(ADMM KKT), n=40 (tank_mimo KKT). Run: B=8192 N=20 python tools/bench_mxu_packing.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50
TILE = 128


def pack_blockdiag(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, n, n) -> (B/k, k*n, k*n) with the k blocks on the diagonal.
    One scatter; zero-padded to the MXU tile only by XLA's own layout."""
    b, n, _ = a.shape
    g = b // k
    a = a[: g * k].reshape(g, k, n, n)
    out = jnp.zeros((g, k * n, k * n), a.dtype)
    for j in range(k):
        out = out.at[:, j * n : (j + 1) * n, j * n : (j + 1) * n].set(
            a[:, j]
        )
    return out


def unpack_blockdiag(p: jnp.ndarray, k: int, n: int) -> jnp.ndarray:
    g = p.shape[0]
    blocks = [
        p[:, j * n : (j + 1) * n, j * n : (j + 1) * n] for j in range(k)
    ]
    return jnp.stack(blocks, axis=1).reshape(g * k, n, n)


def loop_time(fn, *args, reps=3):
    """Per-iteration time inside a scan; full-output checksum consumed
    into the carry (the round-5 harness rules: no DCE, no LICM)."""

    def run_fn(*ops):
        def body(c, _):
            # material perturbation + 1e-20 coupling: the 1e-9/1e-30
            # constants let the backend elide the whole body (see
            # tools/probe_lu_elision.py and the round-5 harness study)
            perturbed = ops[0] + (3e-2 * (1.0 + c)) * jnp.eye(
                ops[0].shape[-1], dtype=ops[0].dtype
            )
            out = fn(perturbed, *ops[1:])
            # accumulate MOD 1 so the perturbation materially
            # changes every iteration (see bench_spd_inverse.py)
            return jnp.mod(c + jnp.sum(out) * 1e-3, 1.0), None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)[0]

    run = jax.jit(run_fn)
    jax.block_until_ready(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    b = int(os.environ.get("B", "8192"))
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    print(f"B={b} platform={jax.devices()[0]}  (ms/iter, best of 3)")

    for n in (13, 20, 40):
        k = TILE // n
        ka, kb = jax.random.split(jax.random.fold_in(key, n))
        a = jax.random.normal(ka, (b, n, n), dtype)
        c = jax.random.normal(kb, (b, n, n), dtype)
        a = jax.block_until_ready(a)
        c = jax.block_until_ready(c)

        # ---- single matmul: batched vs packed (incl. pack scatter) ----
        t_batched = loop_time(lambda aa, cc: aa @ cc, a, c)
        t_packed_inc = loop_time(
            lambda aa, cc: pack_blockdiag(aa, k) @ pack_blockdiag(cc, k),
            a, c,
        )
        # packed with operands PRE-PACKED (the chain-amortized regime)
        ap = jax.block_until_ready(jax.jit(
            lambda x: pack_blockdiag(x, k))(a))
        cp = jax.block_until_ready(jax.jit(
            lambda x: pack_blockdiag(x, k))(c))
        t_packed_pre = loop_time(lambda aa, cc: aa @ cc, ap, cp)

        # ---- 24-iteration Schulz-like chain (the production shape):
        # pack once, run the chain on tiles, unpack once ----
        def chain_batched(kk):
            eye2 = 2.0 * jnp.eye(n, dtype=dtype)
            x = jnp.swapaxes(kk, -1, -2) / jnp.maximum(
                jnp.sum(kk * kk, axis=(-2, -1), keepdims=True), 1e-20
            )
            for _ in range(24):
                x = x @ (eye2 - kk @ x)
            return x

        def chain_packed(kk):
            kp = pack_blockdiag(kk, k)
            eye2 = 2.0 * jnp.eye(k * n, dtype=dtype)
            x = jnp.swapaxes(kp, -1, -2) / jnp.maximum(
                jnp.sum(kp * kp, axis=(-2, -1), keepdims=True), 1e-20
            )
            for _ in range(24):
                x = x @ (eye2 - kp @ x)
            return unpack_blockdiag(x, k, n)

        t_chain_b = loop_time(chain_batched, a)
        t_chain_p = loop_time(chain_packed, a)

        print(
            f"n={n:3d} k={k}: matmul batched {t_batched*1e3:8.3f} | "
            f"packed(incl pack) {t_packed_inc*1e3:8.3f} | "
            f"packed(pre) {t_packed_pre*1e3:8.3f} || "
            f"chain24 batched {t_chain_b*1e3:8.3f} | "
            f"packed {t_chain_p*1e3:8.3f}"
        )


if __name__ == "__main__":
    main()

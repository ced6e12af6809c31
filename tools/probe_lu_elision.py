#!/usr/bin/env python
"""Root-cause probe: does the LU custom call execute inside a scan on
axon? If wall time scales with ITERS the op executes; a flat ~0 wall at
any ITERS means backend-level elision (BENCHMARKS.md round-5 harness
study — the fixed harness still reads 0.001 ms/iter for lu_inv)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

b, n = 2048, 20
rng = np.random.default_rng(0)
a = rng.normal(size=(b, n, n))
k = jnp.asarray((a @ a.transpose(0, 2, 1) + n * np.eye(n)).astype(np.float32))
k = jax.block_until_ready(k)

def walls(iters, scale):
    def run(kin):
        def body(c, _):
            # LARGE per-iteration perturbation: materially different
            # matrices each iteration, loop-carried via the checksum
            kk = kin + (scale * (1.0 + c)) * jnp.eye(n, dtype=kin.dtype)
            return c + jnp.sum(jnp.linalg.inv(kk)) * 1e-20, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]
    f = jax.jit(run)
    out = jax.block_until_ready(f(k))
    t0 = time.perf_counter(); jax.block_until_ready(f(k))
    return time.perf_counter() - t0, float(out)

for iters in (5, 50, 200):
    w, chk = walls(iters, 0.5)
    print(f"iters={iters}: wall={w*1e3:8.2f} ms  ({w/iters*1e3:6.3f} ms/iter)  checksum={chk:.6e}")
# correctness: does the in-scan inverse even produce the right numbers?
def one(kin):
    def body(c, _):
        kk = kin + 0.5 * jnp.eye(n, dtype=kin.dtype)
        return c, jnp.linalg.inv(kk)
    _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=2)
    return outs[0]
inv_scan = np.asarray(jax.jit(one)(k), np.float64)
ref = np.linalg.inv(np.asarray(k, np.float64) + 0.5 * np.eye(n))
print("in-scan inv residual vs f64:", np.abs(inv_scan - ref).max())

"""Gradient-tune MPC weights THROUGH the closed loop.

A capability the reference's imperative scripts cannot express: because the
whole closed loop — encode, condensed-QP build, fixed-iteration ADMM, plant
step, online RLS — is one pure `lax.scan` over pytrees, `jax.grad`
differentiates the realized tracking cost with respect to the controller
weights, and a few Adam steps auto-tune Q/R against the TRUE nonlinear
plant (not the lifted surrogate). The fixed-iteration ADMM makes the solve
differentiable without implicit-function machinery; `EngineConfig.remat`
rematerializes steps so reference-length horizons fit in HBM.

  python examples/tune_weights.py            # CPU-friendly, ~1 min

Typical output: r_weight falls from its deliberately-detuned 1.0 toward
the reference's small-R regime and the settled tracking cost roughly
halves (2.5e-3 -> 1.1e-3 over 15 Adam steps; the landscape is noisy
because the online RLS interacts with the input trajectory).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from koopmanx import configs as C
from koopmanx.run import build_pipeline


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--cpu", action="store_true")  # accepted for symmetry
    args = ap.parse_args()  # (this example always runs on CPU)

    cfg = C.duffing_nn_preset()
    cfg.steps = args.steps
    cfg.dtype = "float32"
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    cfg.mpc.r_weight = 1.0  # deliberately detuned (reference: 1e-4)
    pipe = build_pipeline(cfg)
    params = pipe.params

    def loss(log_r):
        # tune log r so positivity is structural
        p = params._replace(
            r_block=jnp.exp(log_r) * jnp.eye(1, dtype=jnp.float32)
        )
        _, log = pipe.closed_loop(p, pipe.x_init, pipe.model0, pipe.rls0)
        err = log.x[:, 0] - log.r[:, 0]
        # settled-regime cost: the first half of the horizon is the
        # unavoidable transit from x0=[-2,-2], identical for any sane R
        return jnp.mean(err[cfg.steps // 2:] ** 2)

    log_r = jnp.asarray(0.0, jnp.float32)
    opt = optax.adam(0.5)
    state = opt.init(log_r)
    vg = jax.jit(jax.value_and_grad(loss))
    print(f"init: r={float(jnp.exp(log_r)):.2e} cost={float(loss(log_r)):.5f}")
    for i in range(args.iters):
        v, g = vg(log_r)
        updates, state = opt.update(g, state)
        log_r = optax.apply_updates(log_r, updates)
        if i % 3 == 2:
            print(f"step {i+1:2d}: r={float(jnp.exp(log_r)):.2e} "
                  f"cost={float(v):.5f} grad={float(g):+.4f}")
    print(f"tuned: r={float(jnp.exp(log_r)):.2e} cost={float(loss(log_r)):.5f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Sweep (batch, unroll) for the headline bench on the real TPU chip.

Each config is one compile of the fused closed-loop program; run detached
(compiles go through the remote tunnel, 1-10 min each). Prints one JSON
line per config.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run_config(batch: int, unroll: int, steps: int = 50, horizon: int = 20):
    from koopmanx import configs as C
    from koopmanx.engine.loop import run_batch
    from koopmanx.engine.scenario import sample_scenarios
    from koopmanx.run import build_pipeline
    from koopmanx.systems import get_system

    cfg = C.duffing_nn_preset()
    cfg.steps = steps
    cfg.dtype = "float32"
    cfg.unroll = unroll
    cfg.mpc.horizon = horizon
    cfg.mpc.markov = os.environ.get("BENCH_MARKOV", "dag")
    cfg.switch_step = steps // 2
    cfg.data = C.DataConfig(n_step=50, n_traj=50)
    cfg.lift = C.LiftConfig(kind="mlp", nlift=8)
    pipe = build_pipeline(cfg)

    batch_sc = sample_scenarios(
        get_system("duffing"), jax.random.PRNGKey(0), batch=batch,
        param_scale=0.15, dtype=jnp.float32,
    )
    rep = lambda v: jnp.broadcast_to(v, (batch,) + v.shape)
    params_b = jax.tree_util.tree_map(rep, pipe.params)
    model_b = jax.tree_util.tree_map(rep, pipe.model0)
    rls_b = jax.tree_util.tree_map(rep, pipe.rls0)

    runner = jax.jit(
        lambda x0, t0, t1: run_batch(
            pipe.closed_loop, params_b, x0, model_b, rls_b, t0, t1
        )[1].x
    )
    out = runner(batch_sc.x0, batch_sc.theta0, batch_sc.theta1)
    out.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = runner(batch_sc.x0, batch_sc.theta0, batch_sc.theta1)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return {
        "batch": batch,
        "unroll": unroll,
        "solves_per_s": round(batch * steps / best, 1),
        "per_step_ms": round(best / steps * 1e3, 3),
    }


def main():
    combos = [(2048, 4), (2048, 8), (4096, 4), (4096, 8), (8192, 4)]
    env = os.environ.get("SWEEP")
    if env:
        combos = [tuple(map(int, c.split("x"))) for c in env.split(",")]
    for batch, unroll in combos:
        try:
            r = run_config(batch, unroll)
        except Exception as e:  # keep sweeping past OOM etc.
            r = {"batch": batch, "unroll": unroll, "error": repr(e)[:200]}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()

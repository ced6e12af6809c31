#!/usr/bin/env python
"""Bench the per-step terminal-synthesis (Revise_2 production) workload:
Duffing closed loop with DARE-based terminal certificate re-synthesized
every control step, batched scenarios, one chip.

USE_LAPACK=1 monkeypatches the GJ kernels back to jnp.linalg (LU) for an
apples-to-apples before/after of the custom-call removal.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("USE_LAPACK", "0") == "1":
    from koopmanx.ops import linalg as _lin

    _lin.spd_inverse = lambda k, eps=0.0: jnp.linalg.inv(
        k + eps * jnp.eye(k.shape[-1], dtype=k.dtype) if eps else k
    )
    _lin.gj_inverse = jnp.linalg.inv
    _lin.gj_solve = jnp.linalg.solve
    # rebind call sites that imported the names directly
    import koopmanx.control.dare as _dare
    import koopmanx.control.qp as _qp

    _dare.spd_inverse = _lin.spd_inverse
    _dare.gj_solve = _lin.gj_solve
    _qp.spd_inverse = _lin.spd_inverse


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))

    from koopmanx import configs as C
    from koopmanx.engine.loop import run_batch
    from koopmanx.engine.scenario import sample_scenarios
    from koopmanx.run import build_pipeline
    from koopmanx.systems import get_system

    cfg = C.duffing_nn_preset()
    cfg.steps = steps
    cfg.dtype = "float32"
    cfg.switch_step = steps // 2
    cfg.data = C.DataConfig(n_step=50, n_traj=50)
    cfg.lift = C.LiftConfig(kind="mlp", nlift=8)
    cfg.mpc.terminal_synthesis = True
    cfg.mpc.terminal_mode = "dare"
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
    assert bool(jnp.all(jnp.isfinite(out))), "non-finite trajectory"

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        runner(batch_sc.x0, batch_sc.theta0, batch_sc.theta1).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "workload": "duffing + per-step DARE terminal synthesis",
        "lapack": os.environ.get("USE_LAPACK", "0") == "1",
        "batch": batch,
        "solves_per_s": round(batch * steps / best, 1),
        "per_step_ms": round(best / steps * 1e3, 3),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump the TPU-compiled HLO of the bench runner and locate hot ops."""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    batch = int(os.environ.get("BENCH_BATCH", "2048"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    horizon = int(os.environ.get("BENCH_HORIZON", "20"))

    from koopmanx import configs as C
    from koopmanx.engine.loop import run_batch
    from koopmanx.engine.scenario import sample_scenarios
    from koopmanx.run import build_pipeline
    from koopmanx.systems import get_system

    cfg = C.duffing_nn_preset()
    cfg.steps = steps
    cfg.dtype = "float32"
    cfg.mpc.horizon = horizon
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
    compiled = runner.lower(
        batch_sc.x0, batch_sc.theta0, batch_sc.theta1
    ).compile()
    txt = compiled.as_text()
    with open("/tmp/bench_hlo.txt", "w") as f:
        f.write(txt)
    print("wrote /tmp/bench_hlo.txt", len(txt))
    for m in re.finditer(r"custom-call\.(12[4-9]|13[0-9])\b[^\n]*", txt):
        print(m.group(0)[:400])


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scaling-efficiency evidence on the virtual CPU mesh.

No multi-chip TPU hardware is reachable from this box, so the SPMD
program's scaling is demonstrated on an N-virtual-device CPU mesh (the
standard fake-backend technique, SURVEY §4): run the SAME sharded closed
loop at fixed per-device batch on a 1-device and an N-device mesh and
report weak-scaling efficiency = T1 / TN. The per-step math is identical
per shard and the loop exchanges ZERO bytes between scenarios (the only
collectives in the framework are the one-shot EDMD Gram psum and optional
metric reductions), so efficiency is bounded by runtime overhead, not
communication — the same structure that makes >=80% at 2 TPU hosts the
expected regime.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/bench_scaling_cpu.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def run_mesh(pipe, n_dev, per_device_batch, steps):
    from koopmanx.engine.scenario import sample_scenarios
    from koopmanx.parallel.sharded import sharded_closed_loop
    from koopmanx.systems import get_system

    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devices), ("data",))
    batch = per_device_batch * n_dev
    sc = sample_scenarios(
        get_system("duffing"), jax.random.PRNGKey(0), batch=batch,
        param_scale=0.15, dtype=jnp.float32,
    )
    rep = lambda v: jnp.broadcast_to(v, (batch,) + v.shape)
    params_b = jax.tree_util.tree_map(rep, pipe.params)
    model_b = jax.tree_util.tree_map(rep, pipe.model0)
    rls_b = jax.tree_util.tree_map(rep, pipe.rls0)

    fn = jax.jit(
        lambda p, x, m, r, t0, t1: sharded_closed_loop(
            pipe.closed_loop, mesh, p, x, m, r, t0, t1
        )[1].x
    )
    out = fn(params_b, sc.x0, model_b, rls_b, sc.theta0, sc.theta1)
    out.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(params_b, sc.x0, model_b, rls_b, sc.theta0, sc.theta1).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best, batch * steps / best


def main():
    n_dev = len(jax.devices())
    per_dev = int(os.environ.get("PER_DEVICE_BATCH", "32"))
    steps = int(os.environ.get("STEPS", "30"))

    from koopmanx import configs as C
    from koopmanx.run import build_pipeline

    cfg = C.duffing_nn_preset()
    cfg.steps = steps
    cfg.dtype = "float32"
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    cfg.lift = C.LiftConfig(kind="mlp", nlift=8)
    pipe = build_pipeline(cfg)

    t1, s1 = run_mesh(pipe, 1, per_dev, steps)
    tn, sn = run_mesh(pipe, n_dev, per_dev, steps)
    eff = t1 / tn  # weak scaling: same per-device work, ideal ratio = 1.0
    print(json.dumps({
        "devices": n_dev,
        "per_device_batch": per_dev,
        "steps": steps,
        "t_1dev_s": round(t1, 4),
        "t_ndev_s": round(tn, 4),
        "weak_scaling_efficiency": round(eff, 3),
        "solves_per_s_1dev": round(s1, 1),
        "solves_per_s_ndev": round(sn, 1),
        "throughput_scaleup": round(sn / s1, 2),
    }))


if __name__ == "__main__":
    main()

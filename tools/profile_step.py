#!/usr/bin/env python
"""Per-op TPU profile of the headline bench step.

Runs the bench workload under jax.profiler.trace, then parses the emitted
chrome-trace json.gz to aggregate device time by op, printing the top-K.
This replaces guesswork about the "op-count tail" (BENCHMARKS.md) with
measured per-op cost.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

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

    preset = os.environ.get("BENCH_PRESET", "duffing")
    cfg = C.PRESETS[preset]()
    cfg.steps = steps
    cfg.dtype = "float32"
    cfg.mpc.horizon = horizon
    cfg.switch_step = steps // 2
    if preset == "duffing":
        cfg.data = C.DataConfig(n_step=50, n_traj=50)
        cfg.lift = C.LiftConfig(kind="mlp", nlift=8)
    else:
        import dataclasses

        cfg.data = dataclasses.replace(cfg.data, n_step=50, n_traj=50)
    pipe = build_pipeline(cfg)

    x0r = (0.0, 2.0) if cfg.system.startswith("tank") else (-2.0, 2.0)
    batch_sc = sample_scenarios(
        get_system(cfg.system), jax.random.PRNGKey(0), batch=batch,
        param_scale=0.15, dtype=jnp.float32, x0_range=x0r,
    )
    rep = lambda v: jnp.broadcast_to(v, (batch,) + v.shape)
    params_b = jax.tree_util.tree_map(rep, pipe.params)
    model_b = jax.tree_util.tree_map(rep, pipe.model0)
    rls_b = jax.tree_util.tree_map(rep, pipe.rls0)

    # carry pytrees as jit ARGUMENTS (closure-captured device arrays embed
    # as HLO constants and blow the remote-compile limit at large nlift)
    runner = jax.jit(
        lambda p, x0, m, r, t0, t1: run_batch(
            pipe.closed_loop, p, x0, m, r, t0, t1
        )[1].x
    )
    rargs = (params_b, batch_sc.x0, model_b, rls_b, batch_sc.theta0,
             batch_sc.theta1)
    out = runner(*rargs)
    out.block_until_ready()

    trace_dir = "/tmp/kx_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = runner(*rargs)
        out.block_until_ready()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("NO TRACE FILES; contents:")
        os.system(f"find {trace_dir} | head -50")
        return
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for fn in files:
        with gzip.open(fn, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            cat = ev.get("args", {}) or {}
            # keep device-side XLA ops only (heuristic: has 'long_name' or
            # comes from a TPU pid); fall back to aggregating everything
            agg[name] += dur
            cnt[name] += 1
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"{'op':70s} {'ms':>10s} {'count':>8s}")
    for name, ms in items[:80]:
        print(f"{name[:70]:70s} {ms:10.3f} {cnt[name]:8d}")


if __name__ == "__main__":
    main()

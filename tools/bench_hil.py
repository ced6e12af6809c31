#!/usr/bin/env python
"""Hardware-in-the-loop serving bench: native C++ plant, device controller.

The deployment regime the in-graph benches can't represent: the plant steps
OUTSIDE the JAX program (csrc/plant_sim.cpp via ctypes — standing in for
external hardware), only the serving ``Controller`` runs on the device, and
every control period pays the full measurement -> Controller.step ->
actuation round trip. Reports per-period latency percentiles against the
plant's real-time budget and the closed-loop tracking metrics, so the
latency number is tied to a loop that demonstrably controls the plant.

Run: python tools/bench_hil.py [--preset pendulum] [--steps 600] [--cpu]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def fleet_main(args, cfg, pipe, system, y_idx):
    """HIL a fleet: one `BatchedController.step` per period against the
    native BATCHED plant step (`koopman_plant_step_batch`) — B independent
    plants with perturbed initial levels, one device dispatch per period."""
    import jax.numpy as jnp

    from koopmanx.engine.controller import BatchedController
    from koopmanx.run import _dtype, _ref_fn
    from koopmanx.systems.native import native_step_batch

    b = args.fleet
    ref_fn = _ref_fn(
        cfg, pipe.dictionary, pipe.params.q_block.shape[0], _dtype(cfg)
    )
    bc = BatchedController(
        pipe.dictionary, pipe.engine_cfg, pipe.params, ref_fn,
        pipe.model0, pipe.rls0, batch=b,
    )
    rng = np.random.default_rng(0)
    x0 = np.asarray(pipe.x_init, dtype=np.float64)
    x = x0[None, :] * rng.uniform(0.5, 1.5, size=(b, 1))
    if system.clamp is not None:
        x = np.maximum(x, 0.0)

    for _ in range(2):  # warm through a step+reset cycle (trace provenance)
        bc.step(jnp.asarray(x))
        bc.reset()

    lat = np.zeros(args.steps)
    xs = np.zeros((args.steps, b, system.n))
    t_wall = time.perf_counter()
    for k in range(args.steps):
        t0 = time.perf_counter()
        u = bc.step(jnp.asarray(x))
        u = np.asarray(jax.block_until_ready(u), dtype=np.float64)
        lat[k] = time.perf_counter() - t0
        theta = system.theta1 if k > cfg.switch_step else system.theta0
        x = native_step_batch(
            system, x, u, theta, cfg.data.h, cfg.integrator
        )
        xs[k] = x
    wall = time.perf_counter() - t_wall

    tail = xs[-max(args.steps // 10, 20):, :, y_idx]
    target = float(cfg.reference_value)
    print(json.dumps({
        "metric": f"HIL fleet loop ({args.preset}, {b} plants, native C++ batch step)",
        "steps": args.steps,
        "latency_ms": {
            "p50": round(float(np.percentile(lat, 50)) * 1e3, 3),
            "p90": round(float(np.percentile(lat, 90)) * 1e3, 3),
            "p99": round(float(np.percentile(lat, 99)) * 1e3, 3),
        },
        "per_plant_us_p50": round(
            float(np.percentile(lat, 50)) / b * 1e6, 2
        ),
        "realtime_budget_ms": cfg.data.h * 1e3,
        "loop_rate_hz": round(args.steps / wall, 1),
        "tracking": {
            "finite": bool(np.isfinite(xs).all()),
            # absolute tail-mean tracking error, the same quantity
            # validate_scale.py calls steady_state_error (NOT a sum of
            # squared errors — the old *_sse names mislabeled it)
            "worst_plant_steady_state_error": round(
                float(np.abs(tail.mean(axis=0) - target).max()), 5
            ),
            "median_plant_steady_state_error": round(
                float(np.median(np.abs(tail.mean(axis=0) - target))), 5
            ),
            "target": target,
        },
        "device": str(jax.devices()[0]),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="pendulum")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--fleet", type=int, default=0,
                    help="HIL a fleet of B plants via BatchedController + "
                         "the native batched plant step")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koopmanx import configs as C
    from koopmanx.engine.controller import Controller
    from koopmanx.run import build_pipeline
    from koopmanx.systems import get_system
    from koopmanx.systems.native import native_step

    cfg = C.PRESETS[args.preset]()
    cfg.steps = args.steps
    if args.dtype:
        cfg.dtype = args.dtype
        if args.dtype == "float64":
            jax.config.update("jax_enable_x64", True)
    pipe = build_pipeline(cfg)
    system = get_system(cfg.system)
    y_idx = cfg.mpc.cy_index if cfg.mpc.cy_index is not None else 0
    if args.fleet:
        return fleet_main(args, cfg, pipe, system, y_idx)
    ctrl = Controller.from_pipeline(pipe)

    x = np.asarray(pipe.x_init, dtype=np.float64)
    # warm through a full step+reset cycle so the measured loop's first
    # call has identical trace/state provenance to the rest (a single
    # warm-up step leaves the first post-reset call paying a retrace)
    for _ in range(2):
        ctrl.step(x)
        ctrl.reset()

    lat = np.zeros(args.steps)
    xs = np.zeros((args.steps, system.n))
    t_wall = time.perf_counter()
    for k in range(args.steps):
        t0 = time.perf_counter()
        u = ctrl.step(x)
        u = np.asarray(jax.block_until_ready(u), dtype=np.float64)
        lat[k] = time.perf_counter() - t0
        # the reference's `if i > 100` switch pattern (base.py schedule)
        theta = system.theta1 if k > cfg.switch_step else system.theta0
        x = native_step(system, x, u, theta, cfg.data.h, cfg.integrator)
        xs[k] = x
    wall = time.perf_counter() - t_wall

    tail = xs[-max(args.steps // 10, 20):, y_idx]
    target = float(cfg.reference_value)
    print(json.dumps({
        "metric": f"HIL serving loop ({args.preset}, native C++ plant)",
        "steps": args.steps,
        "latency_ms": {
            "p50": round(float(np.percentile(lat, 50)) * 1e3, 3),
            "p90": round(float(np.percentile(lat, 90)) * 1e3, 3),
            "p99": round(float(np.percentile(lat, 99)) * 1e3, 3),
            "max": round(float(lat.max()) * 1e3, 3),
        },
        "realtime_budget_ms": cfg.data.h * 1e3,
        "loop_rate_hz": round(args.steps / wall, 1),
        "tracking": {
            "finite": bool(np.isfinite(xs).all()),
            "tail_mean": round(float(tail.mean()), 5),
            "target": target,
            "steady_state_error": round(float(abs(tail.mean() - target)), 5),
        },
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

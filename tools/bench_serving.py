"""Serving-path latency/throughput: Controller.step and BatchedController.

The engine bench (bench.py) measures the fused simulation loop — 200
steps per dispatch. Serving is the opposite regime: ONE control step per
measurement, state carried across calls. This measures:

- single-plant `Controller.step(x)` round-trip latency,
- `BatchedController.step(X)` round-trip for plant fleets,
- the empty-dispatch baseline (a jitted identity on the same state), so
  the device compute can be separated from the host->device dispatch —
  on this box every jitted call pays the ~25 ms axon remote-dispatch
  tunnel (BENCHMARKS.md), which a locally-attached TPU does not.

Run: python tools/bench_serving.py [--cpu] [--batches 1,256,4096]
Prints one JSON line per configuration.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _timeit(fn, reps=20):
    fn()  # warm
    best = float("inf")
    t_all = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        t_all += dt
    return best, t_all / reps


def _hlo_op_count(jitted, *args) -> int:
    """Instruction count of the compiled program — the 'program size' axis
    of the latency curve (proxy: '= op(' lines in the optimized HLO)."""
    txt = jitted.lower(*args).compile().as_text()
    return sum(1 for line in txt.splitlines() if " = " in line)


def curve_main(args):
    """Dispatch-latency vs program-size curve (VERDICT r3 item 4): build
    the serving Controller under progressively smaller step programs and
    measure single-plant round-trip vs compiled op count — separates the
    environment's per-dispatch floor from program-size cost. Variants:

      full        the production duffing serving step (update on, 60 ADMM)
      no_update   estimator stripped (update='off')
      admm20/5    fewer ADMM iterations
      lean        no_update + admm20 (a serving-lean trace)
      tiny        a jitted identity on the same state (environment floor)
    """
    import numpy as np

    from koopmanx import configs as C
    from koopmanx.engine.controller import Controller
    from koopmanx.run import _dtype, _ref_fn, build_pipeline

    def build(update, qp_iters, horizon=20):
        cfg = C.duffing_nn_preset()
        cfg.steps = 10
        cfg.mpc.horizon = horizon
        cfg.mpc.qp_iters = qp_iters
        cfg.update.mode = update
        cfg.data = C.DataConfig(n_step=25, n_traj=25)
        cfg.lift = C.LiftConfig(kind="mlp", nlift=8)
        pipe = build_pipeline(cfg)
        ref_fn = _ref_fn(
            cfg, pipe.dictionary, pipe.params.q_block.shape[0], _dtype(cfg)
        )
        return pipe, Controller(
            pipe.dictionary, pipe.engine_cfg, pipe.params, ref_fn,
            pipe.model0, pipe.rls0,
        )

    variants = [
        ("full", ("rls_sqrt", 60, 20)),
        ("no_update", ("off", 60, 20)),
        ("admm20", ("rls_sqrt", 20, 20)),
        ("admm5", ("rls_sqrt", 5, 20)),
        ("horizon10", ("rls_sqrt", 60, 10)),
        ("lean", ("off", 20, 10)),
    ]
    rows = []
    for name, (upd, iters, hor) in variants:
        pipe, ctrl = build(upd, iters, hor)
        x0 = jnp.asarray(pipe.x_init)
        ctrl.step(x0)  # compile
        ops = _hlo_op_count(
            ctrl._step, ctrl.params, ctrl.state, x0,
            jnp.asarray(ctrl._k),
        )

        def one():
            u = ctrl.step(x0)
            u.block_until_ready()

        best, mean = _timeit(one, args.reps)
        rows.append({
            "variant": name, "hlo_ops": ops,
            "best_ms": round(best * 1e3, 3), "mean_ms": round(mean * 1e3, 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    dummy = jnp.zeros((8, 8), jnp.float32)
    ident = jax.jit(lambda a: a + 1.0)
    ident(dummy).block_until_ready()
    t_best, t_mean = _timeit(lambda: ident(dummy).block_until_ready(), args.reps)
    rows.append({
        "variant": "tiny_identity", "hlo_ops": _hlo_op_count(ident, dummy),
        "best_ms": round(t_best * 1e3, 3), "mean_ms": round(t_mean * 1e3, 3),
    })
    print(json.dumps({"curve": rows, "device": str(jax.devices()[0])}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batches", default="1,256,4096")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--curve", action="store_true",
                    help="measure the dispatch-latency-vs-program-size "
                         "curve instead of the fleet table")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.curve:
        curve_main(args)
        return

    import numpy as np

    from koopmanx import configs as C
    from koopmanx.engine.controller import BatchedController, Controller
    from koopmanx.run import _dtype, _ref_fn, build_pipeline

    cfg = C.duffing_nn_preset()
    cfg.steps = 10
    cfg.mpc.horizon = 20
    cfg.data = C.DataConfig(n_step=25, n_traj=25)
    cfg.lift = C.LiftConfig(kind="mlp", nlift=8)
    pipe = build_pipeline(cfg)
    ref_fn = _ref_fn(
        cfg, pipe.dictionary, pipe.params.q_block.shape[0], _dtype(cfg)
    )

    # empty-dispatch baseline: jitted identity on a same-sized pytree
    dummy = jnp.zeros((8, 8), _dtype(cfg))
    ident = jax.jit(lambda a: a + 1.0)
    base_best, base_mean = _timeit(
        lambda: ident(dummy).block_until_ready(), args.reps
    )

    x0 = jnp.asarray(pipe.x_init)

    ctrl = Controller(
        pipe.dictionary, pipe.engine_cfg, pipe.params, ref_fn,
        pipe.model0, pipe.rls0,
    )
    ctrl.step(x0)  # compile

    def single():
        u = ctrl.step(x0)
        u.block_until_ready()

    s_best, s_mean = _timeit(single, args.reps)
    print(json.dumps({
        "metric": "serving Controller.step latency (single plant)",
        "best_ms": round(s_best * 1e3, 3),
        "mean_ms": round(s_mean * 1e3, 3),
        "dispatch_baseline_ms": round(base_best * 1e3, 3),
        "est_device_ms": round((s_best - base_best) * 1e3, 3),
        "device": str(jax.devices()[0]),
    }))

    for b in [int(v) for v in args.batches.split(",") if int(v) > 1]:
        bc = BatchedController(
            pipe.dictionary, pipe.engine_cfg, pipe.params, ref_fn,
            pipe.model0, pipe.rls0, batch=b,
        )
        xb = jnp.broadcast_to(x0, (b,) + x0.shape)
        bc.step(xb)  # compile

        def fleet():
            u = bc.step(xb)
            u.block_until_ready()

        f_best, f_mean = _timeit(fleet, args.reps)
        print(json.dumps({
            "metric": f"serving BatchedController.step latency (fleet={b})",
            "best_ms": round(f_best * 1e3, 3),
            "mean_ms": round(f_mean * 1e3, 3),
            "per_plant_us": round(f_best / b * 1e6, 2),
            "solves_per_s": round(b / f_best, 1),
            "device": str(jax.devices()[0]),
        }))


if __name__ == "__main__":
    main()

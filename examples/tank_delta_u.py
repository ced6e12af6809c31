"""The Tank serve loop (Tank_System.m): Δu (incremental) condensed-QP MPC
with the sliding-window online estimator, tracking tank-2 level r=1 through
the coefficient switch at step 100 (0.5/0.4/0.2/0.3 → 0.53/0.3/0.1/0.35,
Tank_System.m:193-203). The reference rebuilds F1/F2/H every step after the
RLS update (:272-290); here the rebuild is fused into the scan body.

Run:  python examples/tank_delta_u.py [--steps 1200] [--cpu]
Outputs: tank_delta_u.png + printed tracking metrics.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--out", default="tank_delta_u.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from koopmanx import configs as C
    from koopmanx.eval.metrics import steady_state_error, tracking_mse
    from koopmanx.run import build_pipeline, run_single

    cfg = C.tank_preset()
    cfg.steps = args.steps
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)

    x2 = np.asarray(log.x)[:, 1]
    u = np.asarray(log.u)[:, 0]
    r = np.asarray(log.r)[:, 0]
    print(f"tracking MSE (x2 vs r=1):  {float(tracking_mse(x2, r)):.5f}")
    print(f"steady-state error:        {float(steady_state_error(x2, r)):.5f}")
    print(f"applied input range:       [{u.min():.3f}, {u.max():.3f}] (bounds ±8)")

    from koopmanx.eval.plots import input_trace, tracking

    ax = tracking(log.x, log.r, h=cfg.data.h, channel=1)
    fig = ax.figure
    ax2 = fig.add_subplot(2, 1, 2)
    input_trace(np.asarray(log.u), h=cfg.data.h, bounds=(-8, 8), ax=ax2)
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

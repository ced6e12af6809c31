"""The reference's central experiment: the same Duffing tracking scenario
run twice — static Koopman model vs online-updated model — with a live
plant-parameter switch mid-run, overlaid (duffing.py runs both loops and
plots the comparison at :1031-1051; the switch makes the static model's
tracking degrade while the online update adapts).

Run:  python examples/duffing_comparison.py  [--steps 600] [--switch 150]
Outputs: duffing_comparison.png + printed MSEs.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--switch", type=int, default=150)
    ap.add_argument("--out", default="duffing_comparison.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from koopmanx import configs as C
    from koopmanx.eval.metrics import tracking_mse
    from koopmanx.run import build_pipeline, run_single

    logs = {}
    for mode in ("off", "rls_sqrt"):
        cfg = C.duffing_nn_preset()
        cfg.steps = args.steps
        cfg.switch_step = args.switch  # make the switch LIVE for the A/B
        cfg.update.mode = mode
        pipe = build_pipeline(cfg)
        _, log = run_single(pipe)
        logs[mode] = log
        x1 = np.asarray(log.x)[:, 0]
        r1 = np.asarray(log.r)[:, 0]
        mse = float(tracking_mse(x1, r1))
        post = slice(args.switch + 50, None)  # after re-convergence window
        mse_post = float(tracking_mse(x1[post], r1[post]))
        print(
            f"update={mode}: tracking MSE = {mse:.5f}  "
            f"post-switch MSE = {mse_post:.5f}"
        )

    from koopmanx.eval.plots import tracking

    ax = tracking(
        logs["rls_sqrt"].x,
        logs["rls_sqrt"].r,
        h=0.05,
        x_compare=logs["off"].x,
        labels=("online update", "static model"),
    )
    ax.axvline(args.switch * 0.05, color="k", linestyle=":", label="plant switch")
    ax.legend()
    ax.set_title("Duffing tracking: online-updated vs static Koopman model")
    ax.figure.savefig(args.out, dpi=130)
    print(f"figure: {args.out}")


if __name__ == "__main__":
    main()

"""The reference's local-linearization MPC baseline, closed and A/B'd.

``duffing.py:691-706`` (sympy Jacobian) and ``Revise_2/Koopman_update.m:
169-177`` (MATLAB ``jacobian``) stage a locally-linear MPC comparison
against the Koopman controller but never close the loop. This example
runs both on the SAME Duffing tracking scenario through the SAME condensed
QP (the local model rides the affine lift ψ(x) = [x; 1], see
``koopmanx/engine/local_linear.py``) and overlays them.

Run:  python examples/local_linear_comparison.py  [--steps 400] [--cpu]
Outputs: local_linear_comparison.png + printed MSEs.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--switch", type=int, default=10**9)
    ap.add_argument("--out", default="local_linear_comparison.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from koopmanx import configs as C
    from koopmanx.engine.local_linear import make_local_linear_loop
    from koopmanx.eval.metrics import tracking_mse
    from koopmanx.run import _dtype, _ref_fn, build_pipeline, run_single
    from koopmanx.systems import get_system

    # --- Koopman loop (reference pipeline) ---
    cfg = C.duffing_nn_preset()
    cfg.steps = args.steps
    cfg.switch_step = args.switch
    pipe = build_pipeline(cfg)
    _, log_koop = run_single(pipe)

    # --- locally-linear loop: same scenario, same QP weights/bounds ---
    system = get_system(cfg.system)
    ref_fn = _ref_fn(cfg, pipe.dictionary, pipe.params.q_block.shape[0],
                     _dtype(cfg))
    ll_loop = jax.jit(
        make_local_linear_loop(system, pipe.engine_cfg, ref_fn)
    )
    _, log_ll = ll_loop(pipe.params, pipe.x_init)

    results = {}
    for name, log in (("koopman", log_koop), ("local_linear", log_ll)):
        x1 = np.asarray(log.x)[:, 0]
        r1 = np.asarray(log.r)[:, 0]
        results[name] = float(tracking_mse(x1, r1))
        print(f"{name:>13}: tracking MSE = {results[name]:.6f}  "
              f"|u|max = {np.abs(np.asarray(log.u)).max():.3f}")

    from koopmanx.eval.plots import tracking

    ax = tracking(
        log_koop.x, log_koop.r, h=0.05, x_compare=log_ll.x,
        labels=("Koopman MPC", "local-linearization MPC"),
    )
    ax.figure.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")
    return results


if __name__ == "__main__":
    main()

"""Evaluate encoder artifacts on BOTH reference-comparable metrics.

VERDICT r3 item 1: the open-loop champion is not the closed-loop champion.
This tool scores any set of encoder .mat artifacts (plus the reference's
shipped weights) on:

  open_rmse   — the reference's 500-step open-loop prediction RMSE
                (duffing.py:264-344 protocol: EDMD fit on the 100x100
                PRNGKey(0) snapshots, replay on the PRNGKey(2) rollout,
                host-CPU fit like build_pipeline's setup)
  closed_sse  — steady-state tracking error of the production closed loop
                (the CLI summary metric: |tail-mean(y) - target|, 300
                steps f32, duffing r=1 / vanderpol output-tracking r=1)

  python tools/eval_encoder_both_metrics.py --system duffing \
      --artifacts artifacts/duffing_kmae_r3a_encoder.mat,... [--cpu]

One JSON line per artifact.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REF_WEIGHTS = {
    "duffing": "/root/reference/Revise_2/duffing_weights.mat",
    "vanderpol": "/root/reference/VDP_Revise_2/Good_VDP.mat",
}


def openloop_rmse(system, weights_path):
    """The reference's open-loop protocol (same as train_reference_scale)."""
    from koopmanx.edmd.batch import edmd_fit
    from koopmanx.eval.openloop import openloop_validate
    from koopmanx.lifts.base import fit_normalizer, normalized
    from koopmanx.lifts.io import load_mat_mlp
    from koopmanx.lifts.mlp import encoder_dictionary
    from koopmanx.systems import collect

    host = jax.local_devices(backend="cpu")[0]
    with jax.default_device(host):
        data = collect(system, jax.random.PRNGKey(0), n_step=100, n_traj=100)
        val = collect(system, jax.random.PRNGKey(2), n_step=500, n_traj=1)
        params = load_mat_mlp(weights_path, dtype=jnp.float32)
        d = encoder_dictionary(params, n=system.n)
        mu, sc = fit_normalizer(d, data.x)
        d = normalized(d, mu, sc)
        model = edmd_fit(d, data, method="pinv")
        res = openloop_validate(model, d, val.x, val.u, reencode_every=0)
        return float(res.rmse_ref)


def closed_sse(system_name, weights_path, steps=300):
    """Steady-state error of the production closed loop under this encoder
    (the CLI summary metric on the flagship scenario)."""
    from koopmanx import configs as C
    from koopmanx.run import build_pipeline, run_single

    if system_name == "duffing":
        cfg = C.duffing_nn_preset()
    else:
        # output-tracking VDP (the encoder-robust formulation, see
        # vanderpol_selftrained_preset)
        cfg = C.vdp_lifted_preset()
        cfg.mpc.track_lifted = False
        cfg.data.u_range = (-6.0, 6.0)
    cfg.steps = steps
    cfg.dtype = "float32"
    cfg.lift.weights_path = weights_path
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    x = np.asarray(log.x)
    r = np.asarray(log.r)
    tail = slice(-max(steps // 10, 20), None)
    target = r[-1, 0]
    return (
        float(abs(x[tail, 0].mean() - target)),
        float(np.abs(np.asarray(log.u)).max()),
        bool(np.isfinite(x).all()),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", default="duffing")
    ap.add_argument("--artifacts", default="")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koopmanx.systems import get_system

    system = get_system(args.system)
    paths = [p for p in args.artifacts.split(",") if p]
    if not paths:
        tagmap = {
            "duffing": ["", "_r3a", "_r3b", "_r3c", "_r3d", "_refscale"],
            "vanderpol": ["", "_vdp_r30", "_vdp_r31", "_refscale"],
        }[args.system]
        paths = [
            os.path.join(REPO, "artifacts",
                         f"{args.system}_kmae{t}_encoder.mat")
            for t in tagmap
        ]
    ref = REF_WEIGHTS[args.system]
    if os.path.exists(ref):
        paths.append(ref)

    for p in paths:
        if not os.path.exists(p):
            print(json.dumps({"artifact": p, "error": "missing"}))
            continue
        o = openloop_rmse(system, p)
        c, umax, finite = closed_sse(args.system, p, args.steps)
        print(json.dumps({
            "artifact": os.path.basename(p),
            "open_rmse": round(o, 5),
            "closed_sse": round(c, 5),
            "u_abs_max": round(umax, 3),
            "finite": finite,
        }), flush=True)


if __name__ == "__main__":
    main()

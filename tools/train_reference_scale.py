"""KMAE training at the REFERENCE's actual scale + encoder comparison.

Reproduces DeepLearning_KoopmanControl_Approach3.py:455-459 at full size:
10,000 snapshots (100 steps x 100 trajectories), 20 epochs, pred_horizon 6,
alpha = (1, 50, 50, 1e-6), eta = 0.5 blend, rec-only after epoch 5 — then
reports the inference-side losses (duffing.py:179-235 harness) and the
open-loop 500-step prediction RMSE (duffing.py:264-344 protocol) of the
freshly-trained encoder NEXT TO the reference's shipped encoder
(Revise_2/duffing_weights.mat), on the same validation rollout.

  python tools/train_reference_scale.py [--cpu] [--system duffing]

Writes artifacts/<system>_kmae_refscale_encoder.mat and prints one JSON
line per encoder for BENCHMARKS.md.
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
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--system", default="duffing")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--pred-horizon", type=int, default=6)
    ap.add_argument("--n-step", type=int, default=100)
    ap.add_argument("--n-traj", type=int, default=100)
    ap.add_argument("--batch-windows", type=int, default=94,
                    help="94 -> ~100 optimizer steps/epoch like the reference")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from koopmanx.edmd.batch import edmd_fit
    from koopmanx.eval.openloop import openloop_validate
    from koopmanx.lifts.io import load_mat_mlp
    from koopmanx.lifts.mlp import encoder_dictionary
    from koopmanx.lifts.base import fit_normalizer, normalized
    from koopmanx.systems import collect, get_system
    from koopmanx.systems.data import Snapshots
    from koopmanx.train.kmae import KMAEConfig
    from koopmanx.train.trainer import evaluate, export_weights, fit

    system = get_system(args.system)
    # training data: the reference's 100x100 protocol (data_generate.py:17-79)
    data = collect(
        system, jax.random.PRNGKey(0),
        n_step=args.n_step, n_traj=args.n_traj,
    )
    n_snap = data.x.shape[0]
    cfg = KMAEConfig(pred_horizon=args.pred_horizon, epochs=args.epochs)
    t0 = time.perf_counter()
    state, history = fit(
        data, n_step=args.n_step, cfg=cfg, nlift=8, hidden=100,
        batch_windows=args.batch_windows, seed=0,
    )
    train_wall = time.perf_counter() - t0

    # inference-side loss harness on FRESH data (duffing.py:179-235)
    fresh = collect(
        system, jax.random.PRNGKey(1), n_step=args.n_step, n_traj=20
    )
    losses = evaluate(state, fresh, n_step=args.n_step, cfg=cfg)

    prefix = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", f"{args.system}_kmae_refscale",
    )
    export_weights(state, prefix)

    # ---- open-loop 500-step RMSE: trained vs reference encoder ----
    # the EDMD fit + replay run on HOST CPU like build_pipeline's setup:
    # the TPU's reduced-precision matmul passes and inaccurate SVD/pinv
    # custom calls produce marginally-unstable A's whose 500-step free run
    # explodes (the documented 2026-08-18 failure mode, BENCHMARKS.md)
    host = jax.local_devices(backend="cpu")[0]
    with jax.default_device(host):
        val = collect(
            system, jax.random.PRNGKey(2), n_step=500, n_traj=1,
        )
        data_h = jax.device_put(data, host)

        def openloop_rmse(dictionary):
            d = dictionary
            mu, sc = fit_normalizer(d, data_h.x)
            d = normalized(d, mu, sc)
            model = edmd_fit(d, data_h, method="pinv")
            res = openloop_validate(model, d, val.x, val.u, reencode_every=0)
            return float(res.rmse_ref), float(res.rmse)

        results = {}
        trained_dict = encoder_dictionary(
            jax.device_put(state.params.encoder, host), n=system.n
        )
        results["kmae_refscale"] = openloop_rmse(trained_dict)
        ref_mat = "/root/reference/Revise_2/duffing_weights.mat" \
            if args.system == "duffing" else \
            "/root/reference/VDP_Revise_2/Good_VDP.mat"
        if os.path.exists(ref_mat):
            ref_params = load_mat_mlp(ref_mat, dtype=jnp.float32)
            results["reference_encoder"] = openloop_rmse(
                encoder_dictionary(ref_params, n=system.n)
            )

    print(json.dumps({
        "system": args.system,
        "snapshots": int(n_snap),
        "epochs": args.epochs,
        "pred_horizon": args.pred_horizon,
        "steps_per_epoch": max(
            1, args.n_traj * (args.n_step - args.pred_horizon) // args.batch_windows
        ),
        "train_wall_s": round(train_wall, 1),
        "device": str(jax.devices()[0]),
        "final_epoch": history[-1],
        "fresh_losses": losses,
        "openloop_rmse_500": {
            k: {"rmse_ref_formula": v[0], "rmse": v[1]}
            for k, v in results.items()
        },
        "artifact": prefix + "_encoder.mat",
    }))


if __name__ == "__main__":
    main()

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
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cosine-final", type=float, default=None,
                    help="if set, cosine-decay lr to lr*THIS over training")
    ap.add_argument("--rec-only-after", type=str, default="5",
                    help="'none' keeps the full loss throughout")
    ap.add_argument("--val-select", action="store_true",
                    help="pick the checkpoint with the best open-loop RMSE "
                         "on a held-out validation rollout (PRNGKey(3) — "
                         "distinct from the PRNGKey(2) test rollout)")
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--tag", default="refscale")
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

    import optax

    system = get_system(args.system)
    # training data: the reference's 100x100 protocol (data_generate.py:
    # 17-79). Excitation matches each plant's operating regime (the
    # pendulum preset drives ±6 torque — the (-2, 2) duffing default
    # under-excites it and the learned lift never sees the setpoint's
    # steady torque ~3.4-5.1).
    u_rng = {"pendulum": (-6.0, 6.0), "vanderpol": (-2.0, 2.0)}.get(
        args.system, (-2.0, 2.0)
    )
    data = collect(
        system, jax.random.PRNGKey(0),
        n_step=args.n_step, n_traj=args.n_traj, u_range=u_rng,
    )
    n_snap = data.x.shape[0]
    rec_only_after = (
        None if args.rec_only_after.lower() == "none"
        else int(args.rec_only_after)
    )
    cfg = KMAEConfig(
        pred_horizon=args.pred_horizon, epochs=args.epochs, lr=args.lr,
        rec_only_after_epoch=rec_only_after,
    )
    optimizer = None
    if args.cosine_final is not None:
        n_win = args.n_traj * (args.n_step - args.pred_horizon)
        total_steps = args.epochs * max(1, n_win // args.batch_windows)
        sched = optax.cosine_decay_schedule(
            args.lr, total_steps, alpha=args.cosine_final
        )
        optimizer = optax.adam(sched)

    # host-CPU EDMD-fit + open-loop replay (see precision note below) —
    # shared by the in-training validation callback and the final report
    host = jax.local_devices(backend="cpu")[0]

    def openloop_rmse_host(dictionary, data_h, rollout):
        with jax.default_device(host):
            mu, sc = fit_normalizer(dictionary, data_h.x)
            d = normalized(dictionary, mu, sc)
            model = edmd_fit(d, data_h, method="pinv")
            res = openloop_validate(
                model, d, rollout.x, rollout.u, reencode_every=0
            )
            return float(res.rmse_ref), float(res.rmse)

    eval_callback = None
    data_h = jax.device_put(data, host)
    if args.val_select:
        with jax.default_device(host):
            val_sel = collect(
                system, jax.random.PRNGKey(3), n_step=500, n_traj=1,
                u_range=u_rng,
            )

        def eval_callback(state, epoch):
            enc = jax.device_put(state.params.encoder, host)
            d = encoder_dictionary(enc, n=system.n)
            rmse_ref, _ = openloop_rmse_host(d, data_h, val_sel)
            return rmse_ref if np.isfinite(rmse_ref) else 1e9

    t0 = time.perf_counter()
    state, history = fit(
        data, n_step=args.n_step, cfg=cfg, nlift=8, hidden=100,
        batch_windows=args.batch_windows, seed=args.seed,
        optimizer=optimizer, eval_callback=eval_callback,
        eval_every=args.eval_every,
    )
    train_wall = time.perf_counter() - t0

    # inference-side loss harness on FRESH data (duffing.py:179-235)
    fresh = collect(
        system, jax.random.PRNGKey(1), n_step=args.n_step, n_traj=20,
        u_range=u_rng,
    )
    losses = evaluate(state, fresh, n_step=args.n_step, cfg=cfg)

    prefix = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", f"{args.system}_kmae_{args.tag}",
    )
    export_weights(state, prefix)

    # ---- open-loop 500-step RMSE: trained vs reference encoder ----
    # the EDMD fit + replay run on HOST CPU like build_pipeline's setup:
    # the TPU's reduced-precision matmul passes and inaccurate SVD/pinv
    # custom calls produce marginally-unstable A's whose 500-step free run
    # explodes (the documented 2026-08-18 failure mode, BENCHMARKS.md)
    with jax.default_device(host):
        val = collect(
            system, jax.random.PRNGKey(2), n_step=500, n_traj=1,
            u_range=u_rng,
        )

        results = {}
        trained_dict = encoder_dictionary(
            jax.device_put(state.params.encoder, host), n=system.n
        )
        results["kmae_" + args.tag] = openloop_rmse_host(
            trained_dict, data_h, val
        )
        ref_mat = "/root/reference/Revise_2/duffing_weights.mat" \
            if args.system == "duffing" else \
            "/root/reference/VDP_Revise_2/Good_VDP.mat"
        if args.system in ("duffing", "vanderpol") and os.path.exists(
            ref_mat
        ):
            ref_params = load_mat_mlp(ref_mat, dtype=jnp.float32)
            results["reference_encoder"] = openloop_rmse_host(
                encoder_dictionary(ref_params, n=system.n), data_h, val
            )
        # systems the reference never trained on (e.g. pendulum): compare
        # against the PRESET's production dictionary instead — the bar the
        # trained encoder must beat to flip the preset
        from koopmanx.configs import PRESETS
        from koopmanx.run import build_dictionary

        if args.system in PRESETS:
            pcfg = PRESETS[args.system]()
            preset_dict = build_dictionary(
                pcfg, data_h, jax.random.PRNGKey(7)
            )
            results["preset_dictionary"] = openloop_rmse_host(
                preset_dict, data_h, val
            )

    print(json.dumps({
        "system": args.system,
        "tag": args.tag,
        "snapshots": int(n_snap),
        "epochs": args.epochs,
        "seed": args.seed,
        "lr": args.lr,
        "cosine_final": args.cosine_final,
        "rec_only_after": rec_only_after,
        "val_select": bool(args.val_select),
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

"""Command-line interface.

The reference has no CLI (everything is hardcoded scripts, SURVEY §5);
this exposes the full config surface:

  python -m koopmanx.cli run --preset tank --steps 500
  python -m koopmanx.cli run --config my_config.json --save-log out.npz
  python -m koopmanx.cli bench --batch 4096 --horizon 20
  python -m koopmanx.cli presets
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _apply_overrides(cfg, overrides):
    for item in overrides:
        key, _, val = item.partition("=")
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        cur = getattr(obj, parts[-1])
        if isinstance(cur, bool):
            val = val.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(val)
        elif isinstance(cur, float):
            val = float(val)
        setattr(obj, parts[-1], val)
    return cfg


def cmd_run(args):
    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    from . import configs as C
    from .eval.metrics import steady_state_error, tracking_mse
    from .run import build_pipeline, run_single

    if args.config:
        with open(args.config) as f:
            cfg = C.RunConfig.from_json(f.read())
    else:
        cfg = C.PRESETS[args.preset]()
    if args.steps:
        cfg.steps = args.steps
    cfg = _apply_overrides(cfg, args.override or [])
    if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
        # honor -o dtype=float64 without requiring a separate --x64 flag
        jax.config.update("jax_enable_x64", True)

    pipe = build_pipeline(cfg)
    carry, log = run_single(pipe)
    x = np.asarray(log.x)
    u = np.asarray(log.u)
    r = np.asarray(log.r)

    if cfg.mpc.cy_index is not None:
        y = x[:, cfg.mpc.cy_index]
        r_head = r[:, 0]
    elif cfg.mpc.track_lifted:
        y = x[:, 0]
        r_head = np.full_like(y, cfg.reference_value)
    else:
        y = x[:, 0]
        r_head = r[:, 0]

    if args.archive:
        from .eval.persist import archive_run

        archive_run(args.archive, log, h=cfg.data.h, mat=args.mat)
    if args.figures:
        from .eval.plots import save_figure_bundle

        bounds = (cfg.mpc.u_min, cfg.mpc.u_max)
        # C-map reconstruction of the closed-loop trajectory through the
        # initial model (duffing.py:354-390 reconstruction subplots)
        z_traj = pipe.dictionary(log.x)
        x_recon = z_traj @ np.asarray(pipe.model0.C).T
        save_figure_bundle(
            args.figures, log, h=cfg.data.h, u_bounds=bounds,
            data=pipe.data, recon=(x, x_recon),
            # spectrum + eigenfunction gallery of the FINAL online-updated
            # operator (what the adaptation converged to)
            spectral=(carry.model, pipe.dictionary),
        )

    summary = {
        "system": cfg.system,
        "steps": cfg.steps,
        "tracking_mse": float(tracking_mse(y, r_head)),
        "steady_state_error": float(
            steady_state_error(y, r_head, tail=min(50, cfg.steps))
        ),
        "u_abs_max": float(np.abs(u).max()),
        "mean_drift_A": float(np.asarray(log.drift_a).mean()),
        "mean_residual": float(np.asarray(log.residual).mean()),
        "final_state": np.asarray(carry.x).tolist(),
    }
    print(json.dumps(summary, indent=2))
    if args.save_log:
        np.savez(
            args.save_log,
            x=x,
            u=u,
            r=r,
            drift_a=np.asarray(log.drift_a),
            drift_b=np.asarray(log.drift_b),
            drift_c=np.asarray(log.drift_c),
            residual=np.asarray(log.residual),
        )
        print(f"log saved to {args.save_log}", file=sys.stderr)


def cmd_bench(args):
    import os

    for k, v in (
        ("BENCH_BATCH", args.batch),
        ("BENCH_STEPS", args.steps),
        ("BENCH_HORIZON", args.horizon),
    ):
        if v:
            os.environ[k] = str(v)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.main()


def cmd_validate(args):
    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    from . import configs as C
    from .eval.openloop import openloop_validate
    from .run import build_pipeline
    from .systems import collect, get_system
    from .run import _dtype

    cfg = C.PRESETS[args.preset]()
    pipe = build_pipeline(cfg)
    system = get_system(cfg.system)
    # fresh validation rollout (the reference re-seeds and regenerates,
    # duffing.py:264)
    data = collect(
        system,
        jax.random.PRNGKey(cfg.seed + 1),
        n_step=max(args.steps, cfg.data.n_step),
        n_traj=1,
        h=cfg.data.h,
        u_range=cfg.data.u_range,
        x0_range=cfg.data.x0_range,
        integrator=cfg.integrator,
        clamp_x0=cfg.data.clamp_x0,
        dtype=_dtype(cfg),
    )
    res = openloop_validate(
        pipe.model0,
        pipe.dictionary,
        data.x[: args.steps],
        data.u[: args.steps],
        reencode_every=args.reencode_every,
    )
    print(
        json.dumps(
            {
                "system": cfg.system,
                "steps": int(args.steps),
                "rmse_reference_formula": float(res.rmse_ref),
                "rmse": float(res.rmse),
            },
            indent=2,
        )
    )


def cmd_train(args):
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from .systems import collect, get_system
    from .train.kmae import KMAEConfig
    from .train.trainer import export_weights, fit

    system = get_system(args.system)
    data = collect(
        system,
        jax.random.PRNGKey(args.seed),
        n_step=args.n_step,
        n_traj=args.n_traj,
    )
    cfg = KMAEConfig(pred_horizon=args.pred_horizon, epochs=args.epochs)
    state, history = fit(
        data,
        n_step=args.n_step,
        cfg=cfg,
        nlift=args.nlift,
        hidden=args.hidden,
        seed=args.seed,
        checkpoint_path=args.checkpoint,
        resume=bool(args.checkpoint),
    )
    if args.export:
        export_weights(state, args.export)
        print(f"weights exported to {args.export}_encoder.mat / _decoder.mat", file=sys.stderr)
    print(json.dumps({"final": history[-1] if history else None}, indent=2))


def cmd_sweep(args):
    """Pod-scale randomized scenario sweep (BASELINE.json config 5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from . import configs as C
    from .engine.scenario import sample_scenarios
    from .run import build_pipeline, run_scenarios
    from .systems import get_system

    cfg = C.PRESETS[args.preset]()
    cfg.steps = args.steps
    cfg = _apply_overrides(cfg, args.override or [])
    pipe = build_pipeline(cfg)
    batch = sample_scenarios(
        get_system(cfg.system),
        jax.random.PRNGKey(args.seed),
        batch=args.batch,
        param_scale=args.param_scale,
        dtype=jnp.float32 if cfg.dtype == "float32" else jnp.float64,
    )
    import time

    t0 = time.perf_counter()
    carries, logs = run_scenarios(pipe, batch)
    jax.block_until_ready(logs.x)
    wall = time.perf_counter() - t0

    x = np.asarray(logs.x)  # (B, T, n)
    track_err = np.abs(x[:, -min(50, cfg.steps):, 0] - cfg.reference_value).mean(axis=1)
    finite = np.isfinite(x).all(axis=(1, 2))
    print(
        json.dumps(
            {
                "system": cfg.system,
                "scenarios": args.batch,
                "steps": cfg.steps,
                "param_scale": args.param_scale,
                "wall_s": round(wall, 3),
                "solves_per_s": round(args.batch * cfg.steps / wall, 1),
                "finite_fraction": float(finite.mean()),
                "tracking_err_mean": float(track_err[finite].mean()),
                "tracking_err_p95": float(np.percentile(track_err[finite], 95)),
                "tracking_err_max": float(track_err[finite].max()),
            },
            indent=2,
        )
    )


def cmd_modes(args):
    """Koopman spectral analysis of a preset's identified operator: print
    the spectrum summary (the reference's duffing.py:627/:659-665 sanity
    numbers) and optionally save the eigenfunction gallery + spectrum
    figures (plotDuffingScatter counterpart)."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from . import configs as C
    from .eval.modes import spectrum_summary
    from .run import build_pipeline, run_single

    cfg = C.PRESETS[args.preset]()
    if args.steps:
        cfg.steps = args.steps
    cfg = _apply_overrides(cfg, args.override or [])
    if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    pipe = build_pipeline(cfg)
    model = pipe.model0
    label = "batch-EDMD model"
    if args.final:
        carry, _ = run_single(pipe)
        model = carry.model
        label = f"online model after {cfg.steps} steps"
    summary = spectrum_summary(model, h=cfg.data.h)
    summary["model"] = label
    print(json.dumps(summary, indent=2))
    if args.figures:
        from .eval.plots import eigenfunction_gallery, spectrum_plot
        from .eval.modes import spectral_decomposition

        fig = eigenfunction_gallery(
            model, pipe.dictionary, h=cfg.data.h, top=args.top
        )
        fig.savefig(f"{args.figures}_eigenfunctions.png", dpi=130)
        ax = spectrum_plot(spectral_decomposition(model, h=cfg.data.h))
        ax.figure.savefig(f"{args.figures}_spectrum.png", dpi=130)
        print(f"wrote {args.figures}_eigenfunctions.png, "
              f"{args.figures}_spectrum.png")


def cmd_presets(args):
    from . import configs as C

    for name, factory in C.PRESETS.items():
        cfg = factory()
        print(f"{name}: {cfg.system}, steps={cfg.steps}, horizon={cfg.mpc.horizon}")
        if args.verbose:
            print(cfg.to_json())


def main(argv=None):
    p = argparse.ArgumentParser(prog="koopmanx")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run a closed-loop scenario")
    pr.add_argument(
        "--preset",
        default="duffing",
        choices=list(__import__("koopmanx.configs", fromlist=["PRESETS"]).PRESETS),
    )
    pr.add_argument("--config", help="JSON RunConfig file")
    pr.add_argument("--steps", type=int)
    pr.add_argument("--override", "-o", action="append", help="dotted.key=value")
    pr.add_argument("--save-log")
    pr.add_argument("--archive", help="write a results bundle (.npz)")
    pr.add_argument("--mat", action="store_true", help="also write the reference-schema .mat bundle")
    pr.add_argument("--figures", help="prefix for the standard figure set (PNG)")
    pr.add_argument("--cpu", action="store_true")
    pr.add_argument("--x64", action="store_true")
    pr.set_defaults(fn=cmd_run)

    pv = sub.add_parser("validate", help="open-loop multi-step prediction validation")
    pv.add_argument("--preset", default="duffing", choices=list(__import__("koopmanx.configs", fromlist=["PRESETS"]).PRESETS))
    pv.add_argument("--steps", type=int, default=500)
    pv.add_argument("--reencode-every", type=int, default=0)
    pv.add_argument("--cpu", action="store_true")
    pv.add_argument("--x64", action="store_true")
    pv.set_defaults(fn=cmd_validate)

    pt = sub.add_parser("train", help="train a KMAE encoder/decoder")
    pt.add_argument("--system", default="duffing")
    pt.add_argument("--nlift", type=int, default=8)
    pt.add_argument("--hidden", type=int, default=100)
    pt.add_argument("--epochs", type=int, default=20)
    pt.add_argument("--pred-horizon", type=int, default=6)
    pt.add_argument("--n-step", type=int, default=100)
    pt.add_argument("--n-traj", type=int, default=100)
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--checkpoint", help="npz checkpoint path (resume if exists)")
    pt.add_argument("--export", help="prefix for .mat weight export")
    pt.add_argument("--cpu", action="store_true")
    pt.set_defaults(fn=cmd_train)

    pb = sub.add_parser("bench", help="run the headline benchmark")
    pb.add_argument("--batch", type=int)
    pb.add_argument("--steps", type=int)
    pb.add_argument("--horizon", type=int)
    pb.set_defaults(fn=cmd_bench)

    ps = sub.add_parser("sweep", help="randomized scenario sweep (batched plants)")
    ps.add_argument("--preset", default="duffing")
    ps.add_argument("--batch", type=int, default=1024)
    ps.add_argument("--steps", type=int, default=200)
    ps.add_argument("--param-scale", type=float, default=0.2)
    ps.add_argument("--seed", type=int, default=0)
    ps.add_argument("--override", "-o", action="append")
    ps.add_argument("--cpu", action="store_true")
    ps.set_defaults(fn=cmd_sweep)

    pm = sub.add_parser(
        "modes", help="Koopman spectrum + eigenfunction analysis of a preset"
    )
    pm.add_argument("--preset", default="duffing")
    pm.add_argument("--steps", type=int, default=None)
    pm.add_argument("--final", action="store_true",
                    help="analyze the online-updated model after a run "
                         "(default: the batch-EDMD model)")
    pm.add_argument("--figures", default=None,
                    help="prefix for eigenfunction/spectrum PNGs")
    pm.add_argument("--top", type=int, default=8)
    pm.add_argument("--cpu", action="store_true")
    pm.add_argument("-o", "--override", action="append")
    pm.set_defaults(fn=cmd_modes)

    pp = sub.add_parser("presets", help="list reference-scenario presets")
    pp.add_argument("--verbose", "-v", action="store_true")
    pp.set_defaults(fn=cmd_presets)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

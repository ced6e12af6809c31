import json
import sys

import numpy as np
import pytest

from koopmanx import cli
from koopmanx import configs as C


def test_apply_overrides_types():
    cfg = C.duffing_nn_preset()
    cli._apply_overrides(
        cfg,
        [
            "steps=42",
            "mpc.qp_iters=99",
            "mpc.q_weight=12.5",
            "lift.normalize=false",
            "update.mode=storage",
        ],
    )
    assert cfg.steps == 42
    assert cfg.mpc.qp_iters == 99
    assert cfg.mpc.q_weight == 12.5
    assert cfg.lift.normalize is False
    assert cfg.update.mode == "storage"


def test_config_json_roundtrip():
    cfg = C.tank_preset()
    s = cfg.to_json()
    cfg2 = C.RunConfig.from_json(s)
    assert cfg2.system == "tank"
    assert cfg2.mpc.delta_u is True
    assert cfg2.update.c_pairing == "same"
    assert tuple(cfg2.data.u_range) == (-5.0, 5.0)


def test_cli_run_end_to_end(capsys):
    cli.main(
        [
            "run",
            "--preset",
            "duffing",
            "--steps",
            "30",
            "--cpu",
            "-o",
            "data.n_step=20",
            "-o",
            "data.n_traj=20",
        ]
    )
    out = capsys.readouterr().out
    summary = json.loads(out)
    assert summary["system"] == "duffing"
    assert summary["steps"] == 30
    assert np.isfinite(summary["tracking_mse"])


def test_cli_presets_listing(capsys):
    cli.main(["presets"])
    out = capsys.readouterr().out
    for name in ("duffing", "tank", "vanderpol", "toy1d", "revise2_duffing"):
        assert name in out


def test_cli_validate(capsys):
    cli.main(
        ["validate", "--preset", "duffing", "--steps", "50", "--cpu"]
    )
    out = json.loads(capsys.readouterr().out)
    assert np.isfinite(out["rmse_reference_formula"])


def test_cli_modes_subcommand(tmp_path, capsys):
    from koopmanx.cli import main

    prefix = str(tmp_path / "m")
    main([
        "modes", "--preset", "duffing", "--cpu",
        "-o", "data.n_step=30", "-o", "data.n_traj=30",
        "--figures", prefix, "--top", "4",
    ])
    out = capsys.readouterr().out
    assert '"controllability_rank"' in out and '"spectral_radius"' in out
    import os

    assert os.path.getsize(prefix + "_eigenfunctions.png") > 5000
    assert os.path.getsize(prefix + "_spectrum.png") > 5000

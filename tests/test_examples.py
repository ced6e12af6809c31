"""Smoke tests: every shipped example runs end-to-end at reduced size
(import-and-call with tiny steps — example-rot guard, mirrors the
test_presets.py philosophy)."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=420):
    env = {**os.environ}
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script), "--cpu",
         *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=ROOT,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    return r.stdout


def test_duffing_comparison_example(tmp_path):
    out = _run(
        "duffing_comparison.py", "--steps", "120", "--switch", "40",
        "--out", str(tmp_path / "cmp.png"),
    )
    assert "update=off" in out and "update=rls_sqrt" in out
    assert os.path.getsize(tmp_path / "cmp.png") > 1000


def test_local_linear_comparison_example(tmp_path):
    out = _run(
        "local_linear_comparison.py", "--steps", "80",
        "--out", str(tmp_path / "ll.png"),
    )
    assert "koopman" in out and "local_linear" in out
    assert os.path.getsize(tmp_path / "ll.png") > 1000


def test_tank_delta_u_example(tmp_path):
    out = _run("tank_delta_u.py", "--steps", "300", "--out",
               str(tmp_path / "tank.png"))
    assert os.path.getsize(tmp_path / "tank.png") > 1000


def test_tune_weights_example():
    _run("tune_weights.py", "--steps", "30", "--iters", "2")

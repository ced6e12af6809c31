"""Every shipped preset builds and runs finite — config-rot guard.

The heavyweight presets (duffing, vanderpol, tank, revise2_*, the
selftrained pair) each have dedicated behavioral tests; this module covers
the remaining preset surface (the RBF pair and toy1d had none) plus a
cheap all-presets build sweep so a config/schema change cannot silently
break a preset nobody runs in CI.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx import configs as C
from koopmanx.run import build_pipeline, run_single


def _shrink(cfg, steps=25):
    cfg.steps = steps
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    return cfg


@pytest.mark.parametrize(
    "name", ["duffing_rbf", "vanderpol_rbf", "toy1d"]
)
def test_uncovered_presets_run_finite(name):
    cfg = _shrink(C.PRESETS[name]())
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    x = np.asarray(log.x)
    u = np.asarray(log.u)
    assert np.isfinite(x).all()
    assert np.isfinite(u).all()
    assert np.abs(u).max() <= float(cfg.mpc.u_max) + 1e-6


def test_all_presets_build():
    """Schema check: every registered preset constructs, serializes
    through the JSON round-trip, and exposes a valid engine config."""
    for name, factory in C.PRESETS.items():
        cfg = factory()
        back = C.RunConfig.from_json(cfg.to_json())
        assert back.system == cfg.system, name
        assert back.mpc.horizon == cfg.mpc.horizon, name

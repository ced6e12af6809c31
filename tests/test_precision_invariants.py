"""Regression nets for the 2026-08-18 TPU-f32 correctness invariants.

These can't exercise TPU bf16 behavior on the CPU test mesh, but they pin
the structural guarantees whose removal re-introduces the failures:
  1. every estimator update/extraction is wrapped by full_precision;
  2. build_pipeline fits the initial model on the host CPU and the fitted
     model is stable (the on-TPU fit produced spectral radius >> 1 for the
     VDP preset, overflowing the QP).
"""
import jax
import jax.numpy as jnp
import numpy as np

from koopmanx.edmd import rls as rlsmod
from koopmanx.edmd import windowed as winmod
import koopmanx.types as types_mod


def _is_wrapped(fn):
    return hasattr(fn, "__wrapped__")


def test_estimator_functions_pin_full_precision():
    for mod, names in (
        (rlsmod, [
            "rls_update_ab", "rls_update_c", "sqrt_rls_update_ab",
            "sqrt_rls_update_c", "sqrt_rls_model", "storage_update",
            "storage_model", "gram_rls_update", "gram_rls_model",
        ]),
        (winmod, ["window_update", "window_model", "window_prefill"]),
    ):
        for name in names:
            assert _is_wrapped(getattr(mod, name)), (
                f"{mod.__name__}.{name} lost its full_precision wrapper — "
                "TPU bf16-pass matmuls corrupt estimator Grams "
                "(BENCHMARKS.md precision study)"
            )


def test_model_from_rls_mentions_precision():
    import inspect

    src = inspect.getsource(types_mod.model_from_rls)
    assert "default_matmul_precision" in src


def test_initial_fit_runs_on_host_and_is_stable():
    from koopmanx import configs as C
    from koopmanx.run import build_pipeline

    cfg = C.vdp_lifted_preset()
    cfg.steps = 10
    cfg.dtype = "float32"
    pipe = build_pipeline(cfg)
    a = np.asarray(pipe.model0.A, dtype=np.float64)
    radius = np.max(np.abs(np.linalg.eigvals(a)))
    assert radius < 1.5, radius  # the broken on-TPU fit gave >> 1
    # setup arrays live on the framework default device afterwards
    assert list(pipe.model0.A.devices())[0] == jax.devices()[0]

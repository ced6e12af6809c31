"""ctypes bindings to the native C++ plant simulator (csrc/plant_sim.cpp).

Two uses:

- **Hardware-in-the-loop serving** (tools/bench_hil.py): the plant steps in
  native code OUTSIDE the JAX graph while the serving ``Controller`` runs on
  the device — the realistic deployment loop, where "the plant" is external
  hardware and only the controller is ours.
- **Integrator oracle** (tests/test_native_plant.py): an independent C++
  re-statement of every registry plant + both RK4 variants
  (``systems/base.py::rk4_step`` / ``rk4_step_k1k4``), pinning the JAX
  integrators against a second implementation in f64.

Callers must tolerate :class:`koopmanx.ops.native.NativeUnavailable` — the
pure-JAX plant (``systems/base.py::make_step``) is always available.
"""
from __future__ import annotations

import numpy as np

from ..ops.native import NativeUnavailable, _as_c, _load
from .base import System

__all__ = [
    "NativeUnavailable", "native_step", "native_step_batch",
    "native_rollout", "supported",
]

# name -> (id, state dim); ids must match csrc/plant_sim.cpp::kSpecs
_SYS = {
    "duffing": (0, 2),
    "vanderpol": (1, 2),
    "tank": (2, 2),
    "tank3": (3, 3),
    "pendulum": (4, 2),
    "toy1d": (5, 1),
    "approach3": (6, 2),
    "tank_mimo": (7, 2),
}
_INTEGRATOR = {"rk4": 0, "rk4_matlab": 1}


def supported(system: System) -> bool:
    return system.name in _SYS


def _prep(system: System, theta, integrator: str):
    try:
        sys_id, n = _SYS[system.name]
    except KeyError:
        raise NativeUnavailable(f"no native plant for {system.name!r}")
    th = np.ascontiguousarray(
        [float(np.asarray(v)) for v in theta], dtype=np.float64
    )
    return sys_id, n, th, _INTEGRATOR[integrator]


def native_step(
    system: System,
    x: np.ndarray,
    u: np.ndarray,
    theta,
    h: float,
    integrator: str = "rk4",
) -> np.ndarray:
    """One native plant step — same semantics as
    ``systems/base.py::make_step(system, h, integrator)`` (clamp included)."""
    lib = _load()
    sys_id, n, th, integ = _prep(system, theta, integrator)
    xb = np.ascontiguousarray(np.asarray(x, dtype=np.float64).ravel())
    ub = np.ascontiguousarray(
        np.atleast_1d(np.asarray(u, dtype=np.float64)).ravel()
    )
    out = np.zeros(n, dtype=np.float64)
    rc = lib.koopman_plant_step(
        sys_id, integ, float(h), _as_c(th), _as_c(xb), _as_c(ub), _as_c(out)
    )
    if rc != 0:
        raise NativeUnavailable(f"native plant step failed (rc={rc})")
    return out


def native_step_batch(
    system: System,
    x: np.ndarray,
    u: np.ndarray,
    theta,
    h: float,
    integrator: str = "rk4",
    per_plant_theta: bool = False,
) -> np.ndarray:
    """Advance a fleet of B independent plants one period — the native side
    of the BatchedController HIL loop. ``x (B, n)``, ``u (B, m)``; theta is
    one shared parameter tuple, or (with ``per_plant_theta``) a tuple whose
    fields are arrays of shape (B,) — heterogeneous plants per row."""
    lib = _load()
    try:
        sys_id, n = _SYS[system.name]
    except KeyError:
        raise NativeUnavailable(f"no native plant for {system.name!r}")
    xb = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    ub = np.ascontiguousarray(np.asarray(u, dtype=np.float64))
    b = xb.shape[0]
    if ub.ndim == 1:
        ub = ub[:, None]
    if per_plant_theta:
        # (B, ntheta): one row per plant, field-major within the row
        th = np.ascontiguousarray(
            np.stack(
                [np.asarray(v, dtype=np.float64).reshape(b) for v in theta],
                axis=1,
            )
        )
    else:
        th = np.ascontiguousarray(
            [float(np.asarray(v)) for v in theta], dtype=np.float64
        )
    out = np.zeros((b, n), dtype=np.float64)
    rc = lib.koopman_plant_step_batch(
        sys_id, _INTEGRATOR[integrator], float(h), b, _as_c(th),
        1 if per_plant_theta else 0, _as_c(xb), _as_c(ub), _as_c(out),
    )
    if rc != 0:
        raise NativeUnavailable(f"native fleet step failed (rc={rc})")
    return out


def native_rollout(
    system: System,
    x0: np.ndarray,
    u_seq: np.ndarray,
    theta,
    h: float,
    integrator: str = "rk4",
) -> np.ndarray:
    """Native rollout under an input sequence ``u_seq (steps,)`` or
    ``(steps, m)``; returns the state AFTER each step, shape (steps, n)."""
    lib = _load()
    sys_id, n, th, integ = _prep(system, theta, integrator)
    x0b = np.ascontiguousarray(np.asarray(x0, dtype=np.float64).ravel())
    # the C side indexes u_seq + t*m with the SYSTEM's input width — derive
    # steps from the (steps, m) view, not the flat length (a flat (steps*m,)
    # count would double `steps` for m>1 and read past the buffer)
    useq = np.ascontiguousarray(
        np.asarray(u_seq, dtype=np.float64).reshape(-1, system.m)
    )
    steps = useq.shape[0]
    out = np.zeros((steps, n), dtype=np.float64)
    rc = lib.koopman_plant_rollout(
        sys_id, integ, float(h), steps, _as_c(th), _as_c(x0b), _as_c(useq),
        _as_c(out),
    )
    if rc != 0:
        raise NativeUnavailable(f"native plant rollout failed (rc={rc})")
    return out

"""System registry: ground-truth nonlinear plants with time-varying parameters.

Reference behavior being reproduced (not ported):
  - vector fields and RK4 chains in ``/root/reference/data_generate.py:17-152``
    and inline lambdas ``duffing.py:250-261``;
  - exact discrete tank map ``Tank_System.m:9-10`` with state clamping
    ``Tank_System.m:40,45,211``;
  - mid-run parameter switches (``duffing.py:802-803``,
    ``vanderpol.py:712-720``, ``Tank_System.m:193-203``).

TPU-first design: every plant is a *pure function* ``f(t, x, u, theta)`` over
single states ``x: (n,)``, ``u: (m,)`` with an explicit parameter pytree
``theta``. Batching is done by ``vmap`` (scenarios) and time by ``lax.scan``;
the time-varying parameter switch is a ``lax.select``-based *schedule* over
the step index so the whole closed loop stays trace-once/compile-once.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

VectorField = Callable[[Array, Array, Array, Any], Array]  # (t, x, u, theta) -> dx
StepMap = Callable[[Array, Array, Any], Array]  # (x, u, theta) -> x_next


@dataclasses.dataclass(frozen=True)
class System:
    """A plant: either a continuous vector field (integrated by RK4) or an
    exact discrete map (``discrete=True``, e.g. the cascaded tanks)."""

    name: str
    n: int
    m: int
    f: Optional[VectorField] = None
    step_map: Optional[StepMap] = None
    discrete: bool = False
    theta0: Any = None  # nominal parameters
    theta1: Any = None  # post-switch parameters (reference's i>100 switch)
    clamp: Optional[Callable[[Array], Array]] = None  # e.g. tanks: x >= 0

    def default_schedule(self, switch_step: int) -> Callable[[Array], Any]:
        """Schedule mapping a step index to a parameter pytree.

        Selects ``theta1`` once ``step > switch_step`` (the reference's
        ``if i > 100`` pattern, ``duffing.py:802``, ``Tank_System.m:194``).
        """
        return make_switch_schedule(self.theta0, self.theta1, switch_step)


def make_switch_schedule(theta0: Any, theta1: Any, switch_step: int):
    """Branch-free parameter switch: ``theta(step) = step > switch_step ?
    theta1 : theta0`` via ``lax.select`` on every leaf (static shapes, no
    python control flow under jit)."""

    def schedule(step: Array) -> Any:
        pred = step > switch_step

        def sel(a, b):
            a = jnp.asarray(a)
            b = jnp.asarray(b)
            return jax.lax.select(jnp.broadcast_to(pred, a.shape), b, a)

        return jax.tree_util.tree_map(sel, theta0, theta1)

    return schedule


def make_constant_schedule(theta: Any):
    def schedule(step: Array) -> Any:
        del step
        return theta

    return schedule


def rk4_step(f: VectorField, h: float) -> StepMap:
    """Classic RK4 one-step map — the Python reference's integrator
    (``data_generate.py:24-30``): k4 evaluated at ``x + h*k3``."""

    def step(x: Array, u: Array, theta: Any) -> Array:
        t = jnp.asarray(0.0, dtype=x.dtype)
        k1 = f(t, x, u, theta)
        k2 = f(t + h / 2.0, x + 0.5 * h * k1, u, theta)
        k3 = f(t + h / 2.0, x + 0.5 * h * k2, u, theta)
        k4 = f(t + h, x + h * k3, u, theta)
        return x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    return step


def rk4_step_k1k4(f: VectorField, h: float) -> StepMap:
    """The MATLAB reference's RK4 variant, whose ``k4`` stage is (sic)
    evaluated at ``x + h*k1`` (``Revise_2/Koopman_update.m:21-25``,
    ``One_Dimensional_Toy_Example_Continuous_System.m:13-16``). Kept as a
    separate integrator so MATLAB-config parity is exact."""

    def step(x: Array, u: Array, theta: Any) -> Array:
        t = jnp.asarray(0.0, dtype=x.dtype)
        k1 = f(t, x, u, theta)
        k2 = f(t + h / 2.0, x + 0.5 * h * k1, u, theta)
        k3 = f(t + h / 2.0, x + 0.5 * h * k2, u, theta)
        k4 = f(t + h, x + h * k1, u, theta)
        return x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    return step


def make_step(system: System, h: float, integrator: str = "rk4") -> StepMap:
    """Build the one-step plant map ``x+ = F(x, u, theta)`` with clamping."""
    if system.discrete:
        base = system.step_map
    elif integrator == "rk4":
        base = rk4_step(system.f, h)
    elif integrator == "rk4_matlab":
        base = rk4_step_k1k4(system.f, h)
    else:
        raise ValueError(f"unknown integrator {integrator!r}")

    if system.clamp is None:
        return base

    def step(x: Array, u: Array, theta: Any) -> Array:
        return system.clamp(base(x, u, theta))

    return step

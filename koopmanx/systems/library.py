"""The four reference benchmark plants + the Approach3 training plant.

Each system exposes nominal parameters ``theta0`` and the reference's
post-switch parameters ``theta1`` (the deliberate mid-run plant change the
online update must track — a core feature, SURVEY §2.1 "Time-varying plant
switches").
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from .base import System


class DuffingParams(NamedTuple):
    """x1' = x2 ; x2' = d*x2 + k1*x1 + k3*x1^3 + u."""

    d: Array
    k1: Array
    k3: Array


def _duffing_f(t, x, u, th: DuffingParams):
    del t
    x1, x2 = x[0], x[1]
    return jnp.stack([x2, th.d * x2 + th.k1 * x1 + th.k3 * x1**3 + u[0]])


# nominal: duffing.py:255 / data_generate.py:23; switched: duffing.py:802-803
DUFFING = System(
    name="duffing",
    n=2,
    m=1,
    f=_duffing_f,
    theta0=DuffingParams(d=-0.5, k1=1.0, k3=-1.0),
    theta1=DuffingParams(d=-5.0, k1=2.0, k3=-0.5),
)


class VdpParams(NamedTuple):
    """x1' = a*x2 ; x2' = b*x2 + c*x1^2*x2 + d*x1 + u."""

    a: Array
    b: Array
    c: Array
    d: Array


def _vdp_f(t, x, u, th: VdpParams):
    del t
    x1, x2 = x[0], x[1]
    return jnp.stack([th.a * x2, th.b * x2 + th.c * x1**2 * x2 + th.d * x1 + u[0]])


# nominal: vanderpol.py:252; switched: vanderpol.py:714 (note the switched
# field's first row drops the factor 2: x1' = x2)
VANDERPOL = System(
    name="vanderpol",
    n=2,
    m=1,
    f=_vdp_f,
    theta0=VdpParams(a=2.0, b=2.0, c=-10.0, d=-0.8),
    theta1=VdpParams(a=1.0, b=-3.0, c=-10.0, d=-3.0),
)


class TankParams(NamedTuple):
    """Exact discrete cascaded-tank map (Tank_System.m:9-10):
    x1+ = x1 - c1*sqrt(x1) + c2*u ; x2+ = x2 + c3*sqrt(x1) - c4*sqrt(x2)."""

    c1: Array
    c2: Array
    c3: Array
    c4: Array


def _tank_step(x, u, th: TankParams):
    # sqrt of a clamped state; the clamp below keeps x >= 0 like
    # Tank_System.m:40,45,211 (x(x<0)=0)
    s1 = jnp.sqrt(jnp.maximum(x[0], 0.0))
    s2 = jnp.sqrt(jnp.maximum(x[1], 0.0))
    return jnp.stack([x[0] - th.c1 * s1 + th.c2 * u[0], x[1] + th.c3 * s1 - th.c4 * s2])


TANK = System(
    name="tank",
    n=2,
    m=1,
    step_map=_tank_step,
    discrete=True,
    theta0=TankParams(c1=0.5, c2=0.4, c3=0.2, c4=0.3),
    theta1=TankParams(c1=0.53, c2=0.3, c3=0.1, c4=0.35),  # Tank_System.m:195-196
    clamp=lambda x: jnp.maximum(x, 0.0),
)


class Tank3Params(NamedTuple):
    """Three-tank cascade — the reference's exact discrete two-tank map
    (Tank_System.m:9-10) extended by one stage; the first state dim > 2 in
    the registry, exercising n-generality (output selectors, monitors,
    plotting guards) end-to-end:

    x1+ = x1 - c1*sqrt(x1) + c2*u
    x2+ = x2 + c3*sqrt(x1) - c4*sqrt(x2)
    x3+ = x3 + c5*sqrt(x2) - c6*sqrt(x3)
    """

    c1: Array
    c2: Array
    c3: Array
    c4: Array
    c5: Array
    c6: Array


def _tank3_step(x, u, th: Tank3Params):
    s1 = jnp.sqrt(jnp.maximum(x[0], 0.0))
    s2 = jnp.sqrt(jnp.maximum(x[1], 0.0))
    s3 = jnp.sqrt(jnp.maximum(x[2], 0.0))
    return jnp.stack(
        [
            x[0] - th.c1 * s1 + th.c2 * u[0],
            x[1] + th.c3 * s1 - th.c4 * s2,
            x[2] + th.c5 * s2 - th.c6 * s3,
        ]
    )


TANK3 = System(
    name="tank3",
    n=3,
    m=1,
    step_map=_tank3_step,
    discrete=True,
    theta0=Tank3Params(c1=0.5, c2=0.4, c3=0.2, c4=0.3, c5=0.2, c6=0.25),
    # switch mirrors the reference's outlet-coefficient drift pattern
    theta1=Tank3Params(c1=0.53, c2=0.3, c3=0.1, c4=0.35, c5=0.22, c6=0.27),
    clamp=lambda x: jnp.maximum(x, 0.0),
)


class TankMimoParams(NamedTuple):
    """Two-pump cascaded tanks — the registry's first MULTI-INPUT plant
    (every reference system is single-input). The reference's exact
    discrete map (Tank_System.m:9-10) with a second pump feeding tank 2
    directly:

    x1+ = x1 - c1*sqrt(x1) + c2*u1
    x2+ = x2 + c3*sqrt(x1) - c4*sqrt(x2) + c5*u2

    Exercises nu=2 end-to-end: (nlift, 2) B identification, horizon*nu QP
    with per-channel bound tiling, (steps, 2) input logs.
    """

    c1: Array
    c2: Array
    c3: Array
    c4: Array
    c5: Array


def _tank_mimo_step(x, u, th: TankMimoParams):
    s1 = jnp.sqrt(jnp.maximum(x[0], 0.0))
    s2 = jnp.sqrt(jnp.maximum(x[1], 0.0))
    return jnp.stack(
        [
            x[0] - th.c1 * s1 + th.c2 * u[0],
            x[1] + th.c3 * s1 - th.c4 * s2 + th.c5 * u[1],
        ]
    )


TANK_MIMO = System(
    name="tank_mimo",
    n=2,
    m=2,
    step_map=_tank_mimo_step,
    discrete=True,
    theta0=TankMimoParams(c1=0.5, c2=0.4, c3=0.2, c4=0.3, c5=0.25),
    theta1=TankMimoParams(c1=0.53, c2=0.3, c3=0.1, c4=0.35, c5=0.2),
    clamp=lambda x: jnp.maximum(x, 0.0),
)


class PendulumParams(NamedTuple):
    """Damped torque-driven pendulum — the registry's first transcendental
    (non-polynomial, non-sqrt) nonlinearity:

    x1' = x2 ; x2' = -a*sin(x1) - b*x2 + k*u

    with a = g/l, b = c/(m l^2) the damping rate, and k = 1/(m l^2) the
    torque gain. The mid-run switch models the payload mass growing 50%
    (m -> 1.5 m): ``a`` is mass-independent, while ``b`` and ``k`` both
    shrink by 1/1.5 — the online update must re-identify the input gain or
    the loop settles with a steady tracking offset.
    """

    a: Array
    b: Array
    k: Array


def _pendulum_f(t, x, u, th: PendulumParams):
    del t
    x1, x2 = x[0], x[1]
    return jnp.stack([x2, -th.a * jnp.sin(x1) - th.b * x2 + th.k * u[0]])


PENDULUM = System(
    name="pendulum",
    n=2,
    m=1,
    f=_pendulum_f,
    theta0=PendulumParams(a=4.0, b=0.5, k=1.0),
    theta1=PendulumParams(a=4.0, b=1.0 / 3.0, k=2.0 / 3.0),
)


class Toy1dParams(NamedTuple):
    """x' = a2*x^2 + a3*x^3 + a1*x + u
    (One_Dimensional_Toy_Example_Continuous_System.m:4)."""

    a1: Array
    a2: Array
    a3: Array


def _toy1d_f(t, x, u, th: Toy1dParams):
    del t
    x1 = x[0]
    return jnp.stack([th.a2 * x1**2 + th.a3 * x1**3 + th.a1 * x1 + u[0]])


TOY1D = System(
    name="toy1d",
    n=1,
    m=1,
    f=_toy1d_f,
    theta0=Toy1dParams(a1=0.4, a2=0.2, a3=-0.3),
    theta1=Toy1dParams(a1=0.4, a2=0.2, a3=-0.3),  # no switch in the reference
)


class Approach3Params(NamedTuple):
    """x1' = a*x1 ; x2' = b*x2 + x1^4 - 2*x1^2 + u
    (DeepLearning_KoopmanControl_Approach3.py:91)."""

    a: Array
    b: Array


def _approach3_f(t, x, u, th: Approach3Params):
    del t
    x1, x2 = x[0], x[1]
    return jnp.stack([th.a * x1, th.b * x2 + x1**4 - 2.0 * x1**2 + u[0]])


APPROACH3 = System(
    name="approach3",
    n=2,
    m=1,
    f=_approach3_f,
    theta0=Approach3Params(a=-0.1, b=-1.0),
    theta1=Approach3Params(a=-0.1, b=-1.0),
)


REGISTRY = {
    s.name: s
    for s in (
        DUFFING, VANDERPOL, TANK, TANK3, TANK_MIMO, PENDULUM, TOY1D,
        APPROACH3,
    )
}


def get_system(name: str) -> System:
    try:
        return REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown system {name!r}; available: {sorted(REGISTRY)}")

"""Reference-signal generators (the reference's commented-out library,
``duffing.py:740-759``, ``Tank_System.m:168-177``, made explicit config).

Each factory returns ``ref_fn(step) -> (horizon, py)``: the receding
window ``r_k, ..., r_{k+N-1}`` for the MPC cost. All are pure/jittable.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from jax import Array

from ..lifts.base import Dictionary

RefFn = Callable[[Array], Array]


def _window(step: Array, horizon: int) -> Array:
    return step + jnp.arange(horizon)


def constant(value, horizon: int, py: int = 1, dtype=jnp.float32) -> RefFn:
    """r ≡ const (the active choice in every reference script: r=1 for
    Duffing/Tank, duffing.py:748; Tank_System.m:175)."""
    v = jnp.broadcast_to(jnp.asarray(value, dtype), (py,))

    def ref_fn(step):
        del step
        return jnp.broadcast_to(v, (horizon, py))

    return ref_fn


def sine(amp, omega, horizon: int, py: int = 1, offset=0.0, dtype=jnp.float32) -> RefFn:
    """r_j = amp*sin(omega*j) + offset on the first channel
    (duffing.py:744: ``sin(0.01 j)``)."""

    def ref_fn(step):
        j = _window(step, horizon).astype(dtype)
        r1 = amp * jnp.sin(omega * j) + offset
        out = jnp.zeros((horizon, py), dtype)
        return out.at[:, 0].set(r1)

    return ref_fn


def cos_sin_mix(a, wa, b, wb, horizon: int, py: int = 1, dtype=jnp.float32) -> RefFn:
    """r_j = a*cos(wa*j) + b*sin(wb*j) (duffing.py:755)."""

    def ref_fn(step):
        j = _window(step, horizon).astype(dtype)
        r1 = a * jnp.cos(wa * j) + b * jnp.sin(wb * j)
        out = jnp.zeros((horizon, py), dtype)
        return out.at[:, 0].set(r1)

    return ref_fn


def square(amp, period: int, horizon: int, py: int = 1, dtype=jnp.float32) -> RefFn:
    """r = amp * (-1)^ceil(i/period) square wave (duffing.py:745)."""

    def ref_fn(step):
        j = _window(step, horizon)
        sign = 1.0 - 2.0 * (jnp.ceil(j / period) % 2)
        out = jnp.zeros((horizon, py), dtype)
        return out.at[:, 0].set(amp * sign.astype(dtype))

    return ref_fn


def chirp(amp, horizon: int, py: int = 1, offset=0.7, dtype=jnp.float32) -> RefFn:
    """r_j = amp*sin(j/(20+0.01j)) + offset (duffing.py:742 commented)."""

    def ref_fn(step):
        j = _window(step, horizon).astype(dtype)
        r1 = amp * jnp.sin(j / (20.0 + 0.01 * j)) + offset
        out = jnp.zeros((horizon, py), dtype)
        return out.at[:, 0].set(r1)

    return ref_fn


def encoded(base: RefFn, dictionary: Dictionary, n: int) -> RefFn:
    """Lifted-space reference: encode each horizon step of a state-space
    reference through the dictionary (``vanderpol.py:668-675`` encodes
    ``r`` per horizon index; ``VDP_Revise_2/...m:111`` lifts a constant).
    ``base`` must produce (horizon, n) state references."""

    def ref_fn(step):
        r_states = base(step)  # (horizon, n)
        return dictionary(r_states)  # (horizon, nlift)

    return ref_fn


def constant_state(values, horizon: int, dtype=jnp.float32) -> RefFn:
    """Full-state constant reference, e.g. VDP's [-1, 0]
    (VDP_Revise_2/Koopman_update_Tracking_Lift.m:111)."""
    v = jnp.asarray(values, dtype)

    def ref_fn(step):
        del step
        return jnp.broadcast_to(v, (horizon, v.shape[-1]))

    return ref_fn

"""L1 — data collection: batched random-excitation rollouts → snapshot arrays.

Reference behavior: ``data_generate.py:33-79`` (Python) and
``Tank_System.m:29-51`` (MATLAB): ``N_Traj`` trajectories of ``N`` steps each
under i.i.d. uniform inputs, returning snapshot matrices ``(X, Y, U)``.

TPU-first design: one ``lax.scan`` over time, ``vmap`` over trajectories —
the whole collection is a single jitted program (no per-snapshot python
loop). Snapshots are returned **row-major** ``(S, n)`` with S = N*N_Traj in
*trajectory-major* order, which coincides with the reference's reordered
layout (``data_generate.py:63-78``) and is the layout EDMD/KMAE consume.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from .base import System, make_step


class Snapshots(NamedTuple):
    """Trajectory-major snapshot arrays: X, Y are (S, n); U is (S, m)."""

    x: Array
    y: Array
    u: Array

    @property
    def count(self) -> int:
        return self.x.shape[0]


def rollout(
    step_fn,
    x0: Array,
    u_seq: Array,
    theta: Any,
) -> Tuple[Array, Array]:
    """Roll one trajectory: returns (X, Y) with X[t]=x_t, Y[t]=x_{t+1}.

    ``step_fn(x, u, theta) -> x+``; ``u_seq`` is (T, m).
    """

    def body(x, u):
        x_next = step_fn(x, u, theta)
        return x_next, (x, x_next)

    _, (xs, ys) = jax.lax.scan(body, x0, u_seq)
    return xs, ys


def collect(
    system: System,
    key: Array,
    n_step: int = 100,
    n_traj: int = 100,
    h: float = 0.05,
    u_range: Tuple[float, float] = (-2.0, 2.0),
    x0_range: Tuple[float, float] = (-2.0, 2.0),
    theta: Any = None,
    integrator: str = "rk4",
    clamp_x0: bool = False,
    dtype=jnp.float32,
) -> Snapshots:
    """Batched random-excitation data collection (one jitted program).

    Matches the reference protocol: ``u ~ U[u_range]`` i.i.d. per step
    (``data_generate.py:33``; Tank uses U[-5,5], ``Tank_System.m:37``),
    ``x0 ~ U[x0_range]`` (``data_generate.py:41``; Tank additionally clamps
    x0 at 0, ``Tank_System.m:40`` → ``clamp_x0=True``).
    """
    if theta is None:
        theta = system.theta0
    theta = jax.tree_util.tree_map(lambda v: jnp.asarray(v, dtype), theta)
    step_fn = make_step(system, h, integrator)

    ku, kx = jax.random.split(key)
    u_lo, u_hi = u_range
    x_lo, x_hi = x0_range
    u_seq = jax.random.uniform(
        ku, (n_traj, n_step, system.m), minval=u_lo, maxval=u_hi, dtype=dtype
    )
    x0 = jax.random.uniform(
        kx, (n_traj, system.n), minval=x_lo, maxval=x_hi, dtype=dtype
    )
    if clamp_x0:
        x0 = jnp.maximum(x0, 0.0)

    xs, ys = jax.vmap(lambda x, u: rollout(step_fn, x, u, theta))(x0, u_seq)
    # (n_traj, n_step, n) -> trajectory-major flat (S, n)
    return Snapshots(
        x=xs.reshape(-1, system.n),
        y=ys.reshape(-1, system.n),
        u=u_seq.reshape(-1, system.m),
    )


def from_reference_layout(X, Y, U) -> Snapshots:
    """Adapt reference-style column-major snapshot matrices (n, S) into
    row-major :class:`Snapshots` — used by the parity harness to feed
    oracle-generated fixtures into the JAX engine."""
    return Snapshots(
        x=jnp.asarray(X).T, y=jnp.asarray(Y).T, u=jnp.atleast_2d(jnp.asarray(U)).T
    )

"""Scenario-batch generation for pod-scale sweeps.

BASELINE.json config 5: "10^4+ randomized time-varying Duffing/VDP
instances, batched RLS + QP across N>=2 hosts". A scenario = (initial
state, plant parameters before/after the switch, switch step is shared
static config). This module samples scenario batches as pytrees with a
leading batch dim, ready for ``vmap``/``shard_map``.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..systems.base import System


class ScenarioBatch(NamedTuple):
    x0: Array  # (B, n)
    theta0: Any  # pytree, leaves (B, ...)
    theta1: Any


def perturb_theta(key: Array, theta: Any, batch: int, rel_scale: float, dtype):
    """Multiplicative uniform perturbation of each parameter leaf:
    theta * (1 + U[-rel_scale, rel_scale]) per scenario."""
    leaves, treedef = jax.tree_util.tree_flatten(theta)
    keys = jax.random.split(key, len(leaves))
    new_leaves = []
    for k, leaf in zip(keys, leaves):
        base = jnp.asarray(leaf, dtype)
        noise = jax.random.uniform(
            k, (batch,) + base.shape, minval=-rel_scale, maxval=rel_scale, dtype=dtype
        )
        new_leaves.append(base * (1.0 + noise))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def sample_scenarios(
    system: System,
    key: Array,
    batch: int,
    x0_range: Tuple[float, float] = (-2.0, 2.0),
    param_scale: float = 0.2,
    switch_scale: Optional[float] = None,
    dtype=jnp.float32,
) -> ScenarioBatch:
    """Randomized scenario batch: x0 ~ U[x0_range]^n, per-scenario
    perturbed nominal & post-switch parameters (``switch_scale`` defaults
    to ``param_scale``)."""
    kx, k0, k1 = jax.random.split(key, 3)
    x0 = jax.random.uniform(
        kx, (batch, system.n), minval=x0_range[0], maxval=x0_range[1], dtype=dtype
    )
    theta0 = perturb_theta(k0, system.theta0, batch, param_scale, dtype)
    theta1 = perturb_theta(
        k1,
        system.theta1,
        batch,
        param_scale if switch_scale is None else switch_scale,
        dtype,
    )
    return ScenarioBatch(x0=x0, theta0=theta0, theta1=theta1)


def replicate_scenario(x0: Array, theta0: Any, theta1: Any, batch: int, dtype):
    """Tile a single scenario to a batch (for throughput benchmarking of
    one config at scale)."""

    def rep(v):
        v = jnp.asarray(v, dtype)
        return jnp.broadcast_to(v, (batch,) + v.shape)

    return ScenarioBatch(
        x0=rep(x0),
        theta0=jax.tree_util.tree_map(rep, theta0),
        theta1=jax.tree_util.tree_map(rep, theta1),
    )

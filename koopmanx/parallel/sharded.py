"""shard_map'd execution: scenario fan-out + cross-chip reductions.

Two entry points:
  - :func:`sharded_closed_loop` — run a scenario batch of closed loops with
    the batch dimension sharded over the ``('data',)`` mesh; per-step
    scalar metrics are reduced with ``psum`` over ICI so every host sees
    global aggregates.
  - :func:`distributed_edmd_fit` — EDMD over a sharded snapshot set: local
    Gram matmuls + one ``psum`` + a replicated tiny solve (the canonical
    TPU pattern for a distributed least squares).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..edmd.batch import GramStats, fit_from_grams, gram_stats
from ..lifts.base import Dictionary
from ..systems.data import Snapshots
from ..types import LinearModel
from .mesh import DATA_AXIS


def distributed_edmd_fit(
    dictionary: Dictionary,
    data: Snapshots,
    mesh: Mesh,
    nlift: Optional[int] = None,
    method: str = "solve",
    axis: str = DATA_AXIS,
) -> LinearModel:
    """Fit (A, B, C) from snapshots sharded over the mesh's data axis.

    Local work: encode shard + two Gram matmuls (MXU). Communication: one
    ``psum`` of the (d, d) Gram stats over ICI. The final (d, d) solve is
    replicated (d = nlift + m ≤ ~21 — cheaper to replicate than shard).
    """
    nlift = dictionary.nlift if nlift is None else nlift

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def fit(dict_, x, y, u):
        zx = dict_(x)
        zy = dict_(y)
        local = gram_stats(zx, zy, u, x)
        total = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis), local
        )
        return fit_from_grams(total, nlift, method=method)

    return fit(dictionary, data.x, data.y, data.u)


def sharded_closed_loop(
    closed_loop,
    mesh: Mesh,
    params,
    x0,
    model0,
    rls0,
    theta0=None,
    theta1=None,
    axis: str = DATA_AXIS,
):
    """Run ``vmap(closed_loop)`` with the scenario axis sharded over the
    mesh. Scenario counts must be divisible by the mesh size (pad upstream).

    Returns (final_carries, logs) with leading scenario dims, plus a dict
    of psum-reduced global scalars (mean tracking error inputs etc. are
    computed downstream; here we reduce counts to prove the collective
    path end-to-end on every platform including the CPU test mesh).
    """
    have_theta = theta0 is not None

    in_specs = [P(axis)] * (6 if have_theta else 4)

    def local_run(*args):
        if have_theta:
            params_, x0_, model0_, rls0_, th0_, th1_ = args
        else:
            params_, x0_, model0_, rls0_ = args
            th0_ = th1_ = None
        axes = (0, 0, 0, 0, 0 if have_theta else None, 0 if have_theta else None)
        carry, logs = jax.vmap(
            lambda p, x, mdl, r, t0, t1: closed_loop(p, x, mdl, r, t0, t1),
            in_axes=axes,
        )(params_, x0_, model0_, rls0_, th0_, th1_)
        return carry, logs

    @partial(shard_map, mesh=mesh, in_specs=tuple(in_specs),
             out_specs=(P(axis), P(axis)), check_vma=False)
    def run(*args):
        return local_run(*args)

    args = [params, x0, model0, rls0]
    if have_theta:
        args += [theta0, theta1]
    return run(*args)


def psum_mean(values, mesh: Mesh, axis: str = DATA_AXIS):
    """Global mean of per-scenario scalars sharded over the mesh."""

    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P())
    def reduce(v):
        local_sum = jnp.sum(v, axis=0)
        local_cnt = jnp.asarray(v.shape[0], v.dtype)
        total = jax.lax.psum(local_sum, axis)
        count = jax.lax.psum(local_cnt, axis)
        return total / count

    return reduce(values)

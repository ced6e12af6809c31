"""L6 — metrics.

The scalar quantities the reference computes at runtime (BASELINE.md):
open-loop prediction RMSE (duffing.py:341-343), closed-loop tracking MSE
(Tank_System.m:294), steady-state error (Revise_2/Koopman_update.m:477),
model-drift norms (duffing.py:985-990). All are pure reductions over logged
arrays; distributed runs ``psum`` these across the mesh.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def openloop_rmse(pred: Array, truth: Array) -> Array:
    """The reference's (idiosyncratic) RMSE: ``||(pred - truth)/T||_2``
    over the first state channel (duffing.py:341). pred/truth: (T,)."""
    t = pred.shape[0]
    return jnp.linalg.norm((pred - truth) / t)


def rmse(pred: Array, truth: Array) -> Array:
    """Conventional RMSE."""
    return jnp.sqrt(jnp.mean((pred - truth) ** 2))


def tracking_mse(y: Array, r: Array) -> Array:
    """Closed-loop tracking MSE (Tank_System.m:294): mean squared error of
    the tracked output vs the reference head. y/r: (T,) or (T, py)."""
    return jnp.mean(jnp.sum(jnp.atleast_2d((y - r).T).T ** 2, axis=-1))


def steady_state_error(y: Array, r: Array, tail: int = 10) -> Array:
    """Mean |y - r| over the last ``tail`` steps
    (Revise_2/Koopman_update.m:477 semantics)."""
    return jnp.mean(jnp.abs(y[-tail:] - r[-tail:]))


def mean_update_norms(drift_a: Array, drift_b: Array, drift_c: Array):
    return (
        jnp.mean(drift_a),
        jnp.mean(drift_b),
        jnp.mean(drift_c),
    )

"""L6 — open-loop multi-step prediction validation.

Reference behavior (``duffing.py:264-344``): free-run the lifted linear
model under the recorded input sequence, decode via ``C z`` each step,
optionally re-encode from the true state every ``reencode_every`` steps
(markers, duffing.py:303), and report RMSE vs truth.

TPU-first: the whole replay is one ``lax.scan``; re-encoding is a
``lax.select`` on the step index (branch-free).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..lifts.base import Dictionary
from ..types import LinearModel


class OpenLoopResult(NamedTuple):
    y_pred: Array  # decoded predictions (T, p)
    z_traj: Array  # lifted free-run (T, nlift)
    rmse_ref: Array  # the reference's RMSE formula on channel 0
    rmse: Array  # conventional RMSE over all channels


def openloop_validate(
    model: LinearModel,
    dictionary: Dictionary,
    x_truth: Array,  # (T, n) true states (first row = init)
    u_seq: Array,  # (T, m)
    reencode_every: int = 0,
) -> OpenLoopResult:
    z0 = dictionary(x_truth[0])
    steps = x_truth.shape[0]

    def body(z, inp):
        step, x_true, u = inp
        if reencode_every:
            z = jax.lax.select(
                step % reencode_every == 0,
                dictionary(x_true),
                z,
            )
        y = model.C @ z
        z_next = model.A @ z + model.B @ u
        return z_next, (y, z)

    _, (y_pred, z_traj) = jax.lax.scan(
        body, z0, (jnp.arange(steps), x_truth, u_seq)
    )
    t = steps
    rmse_ref = jnp.linalg.norm((y_pred[:, 0] - x_truth[:, 0]) / t)
    rmse = jnp.sqrt(jnp.mean((y_pred - x_truth[:, : y_pred.shape[1]]) ** 2))
    return OpenLoopResult(y_pred=y_pred, z_traj=z_traj, rmse_ref=rmse_ref, rmse=rmse)

"""Core pytree types shared across koopmanx.

The framework is built around three small immutable pytrees:

- :class:`LinearModel` — the lifted linear Koopman predictor
  ``z+ = A z + B u``, ``y = C z`` (reference: the ``(A, B, C)`` triplet fit at
  ``/root/reference/duffing.py:167-177`` and ``Tank_System.m:96-99``).
- :class:`RLSState` — carries for the two rank-one recursive-least-squares
  updates (reference: ``duffing.py:927-953``).
- :class:`QPData` — a condensed MPC quadratic program in OSQP standard form.

All leaves are ``jax.Array``s and every type supports arbitrary leading batch
dimensions, so the same structures flow through ``vmap``/``shard_map``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array


class LinearModel(NamedTuple):
    """Lifted linear predictor ``z+ = A z + B u``, ``y = C z``.

    Shapes (possibly with leading batch dims):
      A: (N, N)   B: (N, m)   C: (p, N)
    """

    A: Array
    B: Array
    C: Array

    @property
    def nlift(self) -> int:
        return self.A.shape[-1]

    @property
    def nu(self) -> int:
        return self.B.shape[-1]

    @property
    def ny(self) -> int:
        return self.C.shape[-2]

    def ab(self) -> Array:
        """Concatenated ``[A B]`` of shape (..., N, N+m)."""
        return jnp.concatenate([self.A, self.B], axis=-1)


class RLSState(NamedTuple):
    """Carry for the rank-one Sherman–Morrison RLS updates.

    ``K_A``/``invG`` track the ``[A B]`` regression
    (``K_A += z+ [z;u]^T``, ``invG`` = inverse Gram of ``[z;u]``;
    reference duffing.py:927-938), ``barX``/``barQ`` track the output map
    ``C`` (reference duffing.py:942-953).

    Shapes (with optional leading batch dims):
      K_A:  (N, N+m)    invG: (N+m, N+m)
      barX: (p, N)      barQ: (N, N)
    """

    K_A: Array
    invG: Array
    barX: Array
    barQ: Array


class QPData(NamedTuple):
    """A dense QP in OSQP standard form.

    minimize   1/2 x^T P x + q^T x
    subject to l <= A x <= u

    Box bounds are expressed by identity rows in ``A``. Shapes (with leading
    batch dims): P (nx, nx), q (nx,), A (nc, nx), l (nc,), u (nc,).
    """

    P: Array
    q: Array
    A: Array
    l: Array
    u: Array


class QPSolution(NamedTuple):
    """Primal/dual solution and residuals from the batched ADMM solver."""

    x: Array
    z: Array
    y: Array
    primal_res: Array
    dual_res: Array
    iterations: Array


class ClosedLoopLog(NamedTuple):
    """Per-step outputs stacked by ``lax.scan`` over the closed loop.

    Mirrors the quantities the reference logs per step
    (``duffing.py:985-990``: drift norms; ``Revise_2/Koopman_update.m:253``:
    prediction residual).
    """

    x: Array  # plant state (T, n)
    u: Array  # applied input (T, m)
    r: Array  # reference head (T, p)
    drift_a: Array  # ||A_k+1 - A_k||_F (T,)
    drift_b: Array
    drift_c: Array
    residual: Array  # ||z+ - (A z + B u)|| one-step lifted residual (T,)


def model_from_rls(state: RLSState, nlift: int) -> LinearModel:
    """Extract the current ``LinearModel`` from RLS carries.

    ``K_ext = K_A @ invG`` then slice (reference duffing.py:938, 978-981);
    ``C = barX @ barQ`` (reference duffing.py:953).
    """
    # estimator math runs at full matmul precision (see
    # koopmanx.edmd.rls.full_precision for why TPU-default bf16 passes
    # are not safe here)
    with jax.default_matmul_precision("highest"):
        k_ext = state.K_A @ state.invG
        a = k_ext[..., :, :nlift]
        b = k_ext[..., :, nlift:]
        c = state.barX @ state.barQ
    return LinearModel(A=a, B=b, C=c)

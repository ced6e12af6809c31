"""Local-linearization MPC baseline — the reference's Jacobian-model
comparison loop, runnable.

The reference stages a locally-linear MPC A/B against the Koopman loop
(``duffing.py:691-706`` sympy Jacobian; ``Revise_2/Koopman_update.m:169-177``
MATLAB ``jacobian``) but leaves it vestigial. Here it closes the loop:
each step re-linearizes the TRUE plant at the current operating point
(``jax.jacfwd`` of the one-step map — exact, jittable) and solves the SAME
condensed QP through the SAME shared control body
(:func:`koopmanx.engine.core.make_control_solver`) the Koopman engine uses.

TPU-first framing: local linearization is just another Koopman lift. On
the affine dictionary ψ(x) = [x; 1] the affine local model
``x+ ≈ A x + B u + d`` is EXACTLY linear —

    [x+; 1] = [[A, d], [0, 1]] [x; 1] + [B; 0] u

so no special-case MPC is needed; the per-step "estimator update" is an
exact Jacobian refit instead of RLS. The whole loop is one ``lax.scan``,
batched by ``vmap`` like every other engine loop.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..lifts.base import constant_augmented
from ..systems.base import System, make_step, make_switch_schedule
from ..systems.linearize import affine_residual, linearize_discrete
from ..types import LinearModel
from .core import (
    EngineConfig,
    MPCParams,
    dual_dim,
    initial_cert,
    make_control_solver,
)


class LocalLinearCarry(NamedTuple):
    x: Array
    u_applied: Array
    warm_x: Array
    warm_y: Array
    cert: tuple = ()


class LocalLinearLog(NamedTuple):
    x: Array
    u: Array
    r: Array
    qp_primal_res: Array


def affine_augmented_model(loc: LinearModel, d: Array) -> LinearModel:
    """Lift an affine local model (A, B, d) to the exact linear model on
    ψ(x) = [x; 1]: A' = [[A, d], [0, 1]], B' = [B; 0], C' = [I 0]."""
    n = loc.A.shape[0]
    m = loc.B.shape[1]
    dt = loc.A.dtype
    a_aug = jnp.zeros((n + 1, n + 1), dt)
    a_aug = a_aug.at[:n, :n].set(loc.A).at[:n, n].set(d).at[n, n].set(1.0)
    b_aug = jnp.concatenate([loc.B, jnp.zeros((1, m), dt)], axis=0)
    c_aug = jnp.concatenate([jnp.eye(n, dtype=dt), jnp.zeros((n, 1), dt)], axis=1)
    return LinearModel(A=a_aug, B=b_aug, C=c_aug)


def make_local_linear_loop(
    system: System,
    cfg: EngineConfig,
    ref_fn: Callable[[Array], Array],
):
    """Build the locally-linear closed loop for one scenario.

    Same call convention as :func:`koopmanx.engine.loop.make_closed_loop`
    minus the model/estimator arguments (the "model" is re-derived from the
    plant every step): ``loop(params, x0, theta0, theta1) ->
    (carry, LocalLinearLog)``. The linearization tracks the SCHEDULED plant
    parameters — the strongest version of the baseline (perfect model
    knowledge, imperfect only through the linearization itself).
    """
    plant_step = make_step(system, cfg.h, cfg.integrator)
    n, m = system.n, system.m
    aug = constant_augmented(n)
    control_solve = make_control_solver(aug, cfg, ref_fn, m)

    def one_step(params: MPCParams, carry: LocalLinearCarry, step: Array,
                 theta_sched):
        x, u_prev = carry.x, carry.u_applied
        theta = theta_sched(step)
        # exact per-step refit: Jacobian of the one-step map at (x, u_prev)
        loc = linearize_discrete(
            system, x, u_prev, cfg.h, theta, cfg.integrator
        )
        d = affine_residual(
            system, x, u_prev, loc, cfg.h, theta, cfg.integrator
        )
        model = affine_augmented_model(loc, d)
        z = aug(x)

        dec = control_solve(
            params, model, carry.cert, x, z, u_prev,
            carry.warm_x, carry.warm_y, step,
        )
        x_next = plant_step(x, dec.u_applied, theta)
        new_carry = LocalLinearCarry(
            x=x_next,
            u_applied=dec.u_applied,
            warm_x=dec.warm_x,
            warm_y=dec.sol.y if cfg.qp_warm_start == "full" else carry.warm_y,
            cert=dec.cert,
        )
        log = LocalLinearLog(
            x=x,
            u=dec.u_applied,
            r=dec.r_window[0],
            qp_primal_res=dec.sol.primal_res,
        )
        return new_carry, log

    def closed_loop(
        params: MPCParams,
        x0: Array,
        theta0=None,
        theta1=None,
        u0: Optional[Array] = None,
    ) -> Tuple[LocalLinearCarry, LocalLinearLog]:
        th0 = system.theta0 if theta0 is None else theta0
        th1 = system.theta1 if theta1 is None else theta1
        dtype = x0.dtype
        th0 = jax.tree_util.tree_map(lambda v: jnp.asarray(v, dtype), th0)
        th1 = jax.tree_util.tree_map(lambda v: jnp.asarray(v, dtype), th1)
        theta_sched = make_switch_schedule(th0, th1, cfg.switch_step)

        n_dec = cfg.horizon * m
        nc = dual_dim(cfg, params, m)
        carry0 = LocalLinearCarry(
            x=x0,
            u_applied=jnp.zeros((m,), dtype) if u0 is None else u0,
            warm_x=jnp.zeros((n_dec,), dtype),
            warm_y=(
                jnp.zeros((nc,), dtype)
                if cfg.qp_warm_start == "full"
                else ()
            ),
            cert=initial_cert(cfg, params, aug.nlift, m, dtype),
        )

        def body(carry, step):
            return one_step(params, carry, step, theta_sched)

        with jax.default_matmul_precision(cfg.matmul_precision):
            return jax.lax.scan(
                body, carry0, jnp.arange(cfg.steps), unroll=cfg.unroll
            )

    return closed_loop

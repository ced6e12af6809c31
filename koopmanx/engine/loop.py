"""L5 — the fused closed-loop engine.

One control step of the reference's per-step loop
(``duffing.py:738-1012``, ``Tank_System.m:170-291``):

  encode -> build condensed QP -> solve -> apply input -> plant step ->
  re-encode -> RLS update of [A B] and C -> rebuild controller -> log

is a single pure function ``(carry, step) -> (carry, log)``; the whole
closed loop is one ``lax.scan`` over time, ``vmap`` batches scenarios, and
``shard_map`` (see :mod:`koopmanx.parallel`) spreads the scenario batch
over the device mesh. Time is inherently sequential (the RLS carry —
SURVEY §5 "long-context"), so all throughput comes from the scenario axis.

The per-step bodies (control solve, estimator update, change reset) live in
:mod:`koopmanx.engine.core` and are SHARED with the serving API
(:mod:`koopmanx.engine.controller`) — one implementation, two harnesses.
This module owns what only the simulation loop has: the plant, the scan,
and the :class:`StepLog` monitor block.

Parameter switches (the reference's ``if i > 100`` plant change) are
branch-free ``lax.select`` schedules; the "inert" Python-Duffing switch
(SURVEY §2.1: duffing.py reassigns a dead variable) is reproduced by
setting ``switch_step >= steps``.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..lifts.base import Dictionary
from ..systems.base import System, make_step, make_switch_schedule
from ..types import LinearModel
from .core import (  # re-exported for compatibility (public config surface)
    EngineConfig,
    MPCParams,
    _matnorm,
    _spectral_radius_estimate,
    _tree_finite,
    change_reset,
    dual_dim,
    initial_cert,
    initial_kkt_inv,
    make_control_solver,
    make_estimator_update,
)

__all__ = [
    "EngineConfig",
    "MPCParams",
    "LoopCarry",
    "StepLog",
    "make_closed_loop",
    "run_batch",
]


class LoopCarry(NamedTuple):
    x: Array  # plant state (n,)
    u_applied: Array  # last applied input / U0 accumulator (m,)
    model: LinearModel
    rls: Any  # RLSState | StorageState | None-like zeros
    warm_x: Array  # QP primal warm start (N*m,)
    # QP dual warm start (nc,) — carried ONLY under qp_warm_start='full';
    # the default 'primal' mode never reads it, so it is slimmed to the
    # empty pytree () there, same pattern as kkt_inv (carry-copy HBM
    # bandwidth is the measured limiter past the 8192-scenario knee; a
    # zero-LENGTH array instead of () trips shard_map's out-spec — XLA
    # forces 0-size outputs to replicated)
    warm_y: Any
    res_ema: Array  # running residual average (change detection)
    # last sane terminal certificate (P, K, gamma) — per-step DARE/LMI
    # synthesis on a TRANSIENT estimated model can legitimately fail (a
    # non-stabilizable A has no certificate; observed 38/1000 NaN or
    # indefinite-P steps on the f32 revise2_vdp run, 2026-08-19): hold
    # the previous certificate, same layering as model_guard. A scalar
    # zeros dummy when cfg.terminal_synthesis is off.
    cert: Any = ()
    # carried ADMM KKT inverse (cfg.qp_kkt_refine > 0), else ()
    kkt_inv: Any = ()


class StepLog(NamedTuple):
    x: Array
    u: Array
    r: Array
    drift_a: Array
    drift_b: Array
    drift_c: Array
    residual: Array
    qp_primal_res: Array
    lyapunov: Array
    # ---- Revise_2 per-step certificate monitors (zeros unless
    # cfg.terminal_synthesis; reference series cited per field) ----
    gamma: Array  # Gamma_k (Revise_2/Koopman_update.m:369)
    eps_state: Array  # ||x+ - C(Az+Bu)|| (epsilon_Set, :253)
    eps_op: Array  # ||(zeta-(Az+Bu)) pinv(z)||_F (epsilon_Decomposition, :254)
    compensator: Array  # K (zeta - (Az+Bu)) (m,) (Compensator, :251)
    gamma_margin: Array  # Gamma - (V - x_err' CPC' x_err) (Gamma_Set, :385)
    compare_state: Array  # u'Ru - (A^N N psi(e))' P (A^N N psi(e)) (:386)
    minus_set: Array  # z'Q_lift z - |(2 zeta)' P (zeta - (Az+Bu))| (:374)
    ellipse: Array  # C P C'/Gamma (py,py): invariant-ellipsoid section
    # matrix; host-side chol reproduces the phase-plot rings (:521-535)
    cert_fresh: Array  # bool: this step's synthesis passed the guard (a
    # False marks a held-over certificate; all-True when synthesis is off)


def make_closed_loop(
    system: System,
    dictionary: Dictionary,
    cfg: EngineConfig,
    ref_fn: Callable[[Array], Array],
):
    """Build the fused closed-loop function for one scenario.

    ``ref_fn(step) -> (horizon, py)`` produces the receding reference
    window (reference generators live in :mod:`koopmanx.engine.ref`).

    Returns ``closed_loop(params, x0, model0, rls0, theta0, theta1)``
    -> :class:`StepLog` stacked over ``cfg.steps``. All arguments are
    pytrees of arrays, so scenario batching is ``jax.vmap`` over any of
    them (heterogeneous models/params/plants per scenario).
    """
    plant_step = make_step(system, cfg.h, cfg.integrator)
    n, m = system.n, system.m
    horizon = cfg.horizon
    control_solve = make_control_solver(dictionary, cfg, ref_fn, m)
    estimator_update = make_estimator_update(dictionary, cfg)

    def one_step(params: MPCParams, carry: LoopCarry, step: Array, theta_sched):
        x, u_prev = carry.x, carry.u_applied
        model = carry.model
        z = dictionary(x)

        # ---- shared control body: encode'd state -> applied input ----
        dec = control_solve(
            params, model, carry.cert, x, z, u_prev,
            carry.warm_x, carry.warm_y, step, carry.kkt_inv,
        )
        u_applied = dec.u_applied
        sol = dec.sol

        # ---- plant + re-encode ----
        theta = theta_sched(step)
        x_next = plant_step(x, u_applied, theta)
        z_next = dictionary(x_next)

        # ---- online model update (shared body; pairing resolved here:
        # 'next' regresses C on x+, 'same' on x — duffing.py:943 vs
        # Tank_System.m:259) ----
        c_target = x_next if cfg.c_pairing == "next" else x
        rls, new_model = estimator_update(
            carry.rls, model, z, u_applied, z_next, c_target, step
        )

        # ---- change detection: event-triggered statistic reset ----
        residual = jnp.linalg.norm(z_next - (model.A @ z + model.B @ u_applied))
        rls, res_ema = change_reset(cfg, rls, carry.res_ema, residual)

        if cfg.drift_norm == "fro":
            # one flattened squared-diff pass: the three Frobenius drift
            # norms come out of a single (|A|+|B|+|C|)-element kernel with
            # sibling segment sums instead of three separate reduce fusions
            # (each ~35 us/step at batch 2048 — measured 2026-08-19)
            d2 = (
                jnp.concatenate(
                    [
                        jnp.ravel(new_model.A - model.A),
                        jnp.ravel(new_model.B - model.B),
                        jnp.ravel(new_model.C - model.C),
                    ]
                )
                ** 2
            )
            na, nb = model.A.size, model.B.size
            drift_a = jnp.sqrt(jnp.sum(d2[:na]))
            drift_b = jnp.sqrt(jnp.sum(d2[na : na + nb]))
            drift_c = jnp.sqrt(jnp.sum(d2[na + nb :]))
        else:
            drift_a = _matnorm(new_model.A - model.A, cfg.drift_norm)
            drift_b = _matnorm(new_model.B - model.B, cfg.drift_norm)
            drift_c = _matnorm(new_model.C - model.C, cfg.drift_norm)
        py_out = params.q_block.shape[0]
        if dec.p_lyap is not None:
            p_lyap = dec.p_lyap
            ref_full = dec.ref_full
            cert_gamma = dec.cert_gamma
            terminal = dec.terminal
            # V = psi(x - r)' P psi(x - r) (Revise_2/Koopman_update.m:382-384)
            psi_err = dictionary(x - ref_full)
            lyap = psi_err @ p_lyap @ psi_err
            # ---- the full Revise_2 per-step monitor series; all use the
            # PRE-update model, matching the reference which logs before
            # the RLS block (Revise_2/Koopman_update.m:251-254) ----
            z_pred = model.A @ z + model.B @ u_applied
            res_vec = z_next - z_pred
            eps_state = jnp.linalg.norm(x_next - model.C @ z_pred)
            # eps * pinv(z) is the rank-one matrix res_vec z'/||z||^2 whose
            # Frobenius norm is ||res_vec||/||z|| (epsilon_Decomposition :254)
            eps_op = jnp.linalg.norm(res_vec) / jnp.maximum(
                jnp.linalg.norm(z), jnp.asarray(1e-30, z.dtype)
            )
            comp = dec.cert_k @ res_vec  # Compensator (:251)
            x_err = x - ref_full
            if cfg.track_lifted:
                # lifted tracking (C = I): the output-space correction term
                # of :385 coincides with V, so the literal formula collapses
                # to Gamma; log the ellipsoid MEMBERSHIP margin Gamma - V
                # instead (the quantity :385 is measuring a slice of)
                g_margin = cert_gamma - lyap
            else:
                e_out = x_err if params.cy is None else params.cy @ x_err
                g_margin = cert_gamma - (lyap - e_out @ terminal @ e_out)
            # Compare_State (:386): u'Ru vs the N-step amplified prediction
            # error under the terminal cost
            e_pred = x_next - model.C @ z_pred
            psi_e = dictionary(e_pred)
            a_pow = jnp.linalg.matrix_power(model.A, horizon)
            amp = (a_pow @ psi_e) * horizon
            compare_state = (
                u_applied @ params.r_block @ u_applied
                - amp @ p_lyap @ amp
            )
            # Minus_Set (:374): z'Q_lift z - |(2 zeta)' P (zeta - pred)|
            minus_set = z @ params.q_lift @ z - jnp.abs(
                2.0 * (z_next @ p_lyap @ res_vec)
            )
            ellipse = terminal / jnp.maximum(
                cert_gamma, jnp.asarray(1e-30, z.dtype)
            )
            gamma_log = cert_gamma
        else:
            lyap = jnp.zeros((), dtype=x.dtype)
            gamma_log = jnp.zeros((), dtype=x.dtype)
            eps_state = jnp.zeros((), dtype=x.dtype)
            eps_op = jnp.zeros((), dtype=x.dtype)
            comp = jnp.zeros((m,), dtype=x.dtype)
            g_margin = jnp.zeros((), dtype=x.dtype)
            compare_state = jnp.zeros((), dtype=x.dtype)
            minus_set = jnp.zeros((), dtype=x.dtype)
            ellipse = jnp.zeros((py_out, py_out), dtype=x.dtype)

        new_carry = LoopCarry(
            x=x_next,
            u_applied=u_applied,
            model=new_model,
            rls=rls,
            warm_x=dec.warm_x,
            warm_y=sol.y if cfg.qp_warm_start == "full" else carry.warm_y,
            res_ema=res_ema,
            cert=dec.cert,
            kkt_inv=dec.kkt_inv,
        )
        log = StepLog(
            x=x,
            u=u_applied,
            r=dec.r_window[0],
            drift_a=drift_a,
            drift_b=drift_b,
            drift_c=drift_c,
            residual=residual,
            qp_primal_res=sol.primal_res,
            lyapunov=lyap,
            gamma=gamma_log,
            eps_state=eps_state,
            eps_op=eps_op,
            compensator=comp,
            gamma_margin=g_margin,
            compare_state=compare_state,
            minus_set=minus_set,
            ellipse=ellipse,
            cert_fresh=dec.cert_ok,
        )
        return new_carry, log

    def closed_loop(
        params: MPCParams,
        x0: Array,
        model0: LinearModel,
        rls0,
        theta0=None,
        theta1=None,
        u0: Optional[Array] = None,
        carry0: Optional[LoopCarry] = None,
        step_offset: int = 0,
    ) -> Tuple[LoopCarry, StepLog]:
        th0 = system.theta0 if theta0 is None else theta0
        th1 = system.theta1 if theta1 is None else theta1
        dtype = x0.dtype
        th0 = jax.tree_util.tree_map(lambda v: jnp.asarray(v, dtype), th0)
        th1 = jax.tree_util.tree_map(lambda v: jnp.asarray(v, dtype), th1)
        theta_sched = make_switch_schedule(th0, th1, cfg.switch_step)

        n_dec = horizon * m
        nc = dual_dim(cfg, params, m)
        if carry0 is None:
            carry0 = LoopCarry(
                x=x0,
                u_applied=jnp.zeros((m,), dtype) if u0 is None else u0,
                model=model0,
                rls=rls0,
                warm_x=jnp.zeros((n_dec,), dtype),
                warm_y=(
                    jnp.zeros((nc,), dtype)
                    if cfg.qp_warm_start == "full"
                    else ()
                ),
                res_ema=jnp.zeros((), dtype),
                cert=initial_cert(cfg, params, dictionary.nlift, m, dtype),
                kkt_inv=initial_kkt_inv(cfg, m, dtype),
            )

        def body(carry, step):
            return one_step(params, carry, step, theta_sched)

        if cfg.remat:
            body = jax.checkpoint(body)

        with jax.default_matmul_precision(cfg.matmul_precision):
            return jax.lax.scan(
                body, carry0, step_offset + jnp.arange(cfg.steps),
                unroll=cfg.unroll,
            )

    return closed_loop


def run_batch(closed_loop, params, x0, model0, rls0, theta0=None, theta1=None):
    """vmap the scenario axis: every argument may carry a leading batch dim
    (params/models/plant parameters per scenario)."""
    axes = (0, 0, 0, 0, None if theta0 is None else 0, None if theta1 is None else 0)
    return jax.vmap(
        lambda p, x, mdl, r, t0, t1: closed_loop(p, x, mdl, r, t0, t1),
        in_axes=axes,
    )(params, x0, model0, rls0, theta0, theta1)

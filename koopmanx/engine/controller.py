"""Serving API: step-by-step MPC controller for externally-owned plants.

The fused closed loop (:mod:`koopmanx.engine.loop`) simulates the plant
internally — right for scenario sweeps and benchmarks, wrong for
deployment, where the physical system produces the measurements. The
:class:`Controller` exposes the same per-step pipeline (encode -> condensed
QP -> ADMM -> online RLS refresh) as a stateful ``step(x) -> u`` call:

    ctrl = Controller.from_pipeline(pipe)           # or explicit parts
    u = ctrl.step(x_measured)                        # one control step
    ...apply u to the real plant, measure x again...

State (model, RLS carries, QP warm start, previous input) lives in a pytree
the caller can checkpoint/restore (:func:`koopmanx.eval.persist.save_pytree`).
``step`` is one jitted program; a batched controller (many plants, one
call) is the same function under ``vmap`` via :class:`BatchedController`.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..control.condensed import (
    augment_delta_u,
    condensed_qp,
    prediction_matrices,
    weight_bar,
)
from ..control.qp import solve_qp
from ..edmd.rls import (
    gram_rls_model,
    gram_rls_update,
    rls_update_ab,
    rls_update_c,
    sqrt_rls_model,
    sqrt_rls_update_ab,
    sqrt_rls_update_c,
)
from ..lifts.base import Dictionary
from ..types import LinearModel, model_from_rls
from .loop import EngineConfig, MPCParams, _spectral_radius_estimate


class ControllerState(NamedTuple):
    model: LinearModel
    rls: Any
    u_prev: Array  # last applied input / U0 accumulator
    warm_x: Array  # QP primal warm start
    z_prev: Array  # lift of the previous measurement (for the RLS pair)
    have_prev: Array  # bool scalar: first call has no (z, u, z+) pair yet


def _make_step_fn(dictionary: Dictionary, cfg: EngineConfig, params: MPCParams,
                  ref_fn):
    horizon = cfg.horizon
    m = params.r_block.shape[-1]
    qp_cfg = cfg.qp_config

    def step_fn(state: ControllerState, x: Array, step_idx: Array):
        z = dictionary(x)

        # ---- online update with the (z_prev, u_prev, z) pair ----
        model = state.model
        rls = state.rls
        if cfg.update != "off":
            def do_update(rls):
                if cfg.update == "rls_sqrt":
                    r2 = sqrt_rls_update_ab(
                        rls, state.z_prev, state.u_prev, z,
                        lam=cfg.rls_lambda, ridge=cfg.rls_ridge,
                    )
                    r2 = sqrt_rls_update_c(
                        r2, state.z_prev, x, lam=cfg.rls_lambda,
                        ridge=cfg.rls_ridge,
                    )
                    return r2, sqrt_rls_model(r2, dictionary.nlift)
                if cfg.update == "rls_chol":
                    r2 = gram_rls_update(
                        rls, state.z_prev, state.u_prev, z, x,
                        lam=cfg.rls_lambda,
                    )
                    return r2, gram_rls_model(
                        r2, dictionary.nlift, ridge=max(cfg.rls_ridge**2, 1e-7)
                    )
                r2 = rls_update_ab(
                    rls, state.z_prev, state.u_prev, z,
                    lam=cfg.rls_lambda, symmetrize=cfg.symmetrize,
                )
                r2 = rls_update_c(
                    r2, state.z_prev, x, lam=cfg.rls_lambda,
                    symmetrize=cfg.symmetrize,
                )
                return r2, model_from_rls(r2, dictionary.nlift)

            rls_new, model_new = do_update(rls)
            # hold everything on the first call (no pair yet) and guard
            use = state.have_prev
            if cfg.model_guard > 0.0:
                finite = jnp.stack(
                    [
                        jnp.all(jnp.isfinite(l.astype(jnp.float32)))
                        for l in jax.tree_util.tree_leaves(model_new)
                    ]
                ).all()
                sane = finite & (
                    _spectral_radius_estimate(model_new.A) < cfg.model_guard
                )
            else:
                sane = jnp.asarray(True)
            sel = lambda a, b, pred: jax.tree_util.tree_map(
                lambda p, q: jax.lax.select(jnp.broadcast_to(pred, p.shape), p, q),
                a,
                b,
            )
            rls = sel(rls_new, rls, use)
            model = sel(model_new, model, use & sane)

        # ---- controller model + QP (same construction as the loop) ----
        ctrl_model = model
        if cfg.track_lifted:
            ctrl_model = ctrl_model._replace(
                C=jnp.eye(dictionary.nlift, dtype=z.dtype)
            )
        if cfg.delta_u:
            ctrl_model = augment_delta_u(ctrl_model)
            z_qp = jnp.concatenate([z, state.u_prev])
        else:
            z_qp = z

        qbar = weight_bar(params.q_block, horizon, params.terminal)
        rbar = jnp.kron(
            jnp.eye(horizon, dtype=params.r_block.dtype), params.r_block
        )
        pred = prediction_matrices(ctrl_model, horizon, params.cy, cfg.markov)
        if cfg.f_clamp > 0.0:
            pred = jax.tree_util.tree_map(
                lambda f: jnp.clip(
                    jnp.nan_to_num(f, nan=0.0, posinf=cfg.f_clamp,
                                   neginf=-cfg.f_clamp),
                    -cfg.f_clamp,
                    cfg.f_clamp,
                ),
                pred,
            )
        yr = ref_fn(step_idx).reshape(-1)

        a_ineq = l_ineq = u_ineq = None
        if cfg.delta_u and params.applied_min is not None:
            a_first = jnp.zeros((m, horizon * m), dtype=z.dtype)
            a_first = a_first.at[:, :m].set(jnp.eye(m, dtype=z.dtype))
            a_ineq = a_first
            l_ineq = params.applied_min - state.u_prev
            u_ineq = params.applied_max - state.u_prev

        qp = condensed_qp(
            pred, z_qp, yr, qbar, rbar,
            jnp.broadcast_to(params.u_min, (horizon * m,)),
            jnp.broadcast_to(params.u_max, (horizon * m,)),
            a_ineq, l_ineq, u_ineq,
        )
        sol = solve_qp(qp, qp_cfg, x0=state.warm_x)
        first = jnp.clip(
            jnp.nan_to_num(sol.x[:m], nan=0.0, posinf=0.0, neginf=0.0),
            params.u_min,
            params.u_max,
        )
        if cfg.delta_u:
            u_applied = state.u_prev + first
            if params.applied_min is not None:
                u_applied = jnp.clip(
                    u_applied, params.applied_min, params.applied_max
                )
        else:
            u_applied = first

        warm_x = jnp.nan_to_num(
            jnp.concatenate([sol.x[m:], sol.x[-m:]]),
            nan=0.0, posinf=0.0, neginf=0.0,
        )
        new_state = ControllerState(
            model=model,
            rls=rls,
            u_prev=u_applied,
            warm_x=warm_x,
            z_prev=z,
            have_prev=jnp.asarray(True),
        )
        return new_state, u_applied

    return step_fn


class Controller:
    """Stateful single-plant MPC controller (serving-side API)."""

    def __init__(self, dictionary, cfg: EngineConfig, params: MPCParams,
                 ref_fn, model0: LinearModel, rls0, m: Optional[int] = None):
        self.cfg = cfg
        self.params = params
        m = params.r_block.shape[-1] if m is None else m
        dtype = params.q_block.dtype
        self._step = jax.jit(_make_step_fn(dictionary, cfg, params, ref_fn))
        self.state = ControllerState(
            model=model0,
            rls=rls0,
            u_prev=jnp.zeros((m,), dtype),
            warm_x=jnp.zeros((cfg.horizon * m,), dtype),
            z_prev=jnp.zeros((dictionary.nlift,), dtype),
            have_prev=jnp.asarray(False),
        )
        self._k = 0

    @classmethod
    def from_pipeline(cls, pipe) -> "Controller":
        from ..run import _dtype, _ref_fn

        cfg = pipe.config
        ref_fn = _ref_fn(
            cfg, pipe.dictionary, pipe.params.q_block.shape[0], _dtype(cfg)
        )
        return cls(
            pipe.dictionary, pipe.engine_cfg, pipe.params, ref_fn,
            pipe.model0, pipe.rls0,
        )

    def step(self, x) -> Array:
        """One control step from a measurement; returns the input to apply."""
        self.state, u = self._step(
            self.state, jnp.asarray(x, self.params.q_block.dtype),
            jnp.asarray(self._k),
        )
        self._k += 1
        return u

    def reset(self) -> None:
        self.state = self.state._replace(
            have_prev=jnp.asarray(False),
            warm_x=jnp.zeros_like(self.state.warm_x),
            u_prev=jnp.zeros_like(self.state.u_prev),
        )
        self._k = 0

"""Serving API: step-by-step MPC controller for externally-owned plants.

The fused closed loop (:mod:`koopmanx.engine.loop`) simulates the plant
internally — right for scenario sweeps and benchmarks, wrong for
deployment, where the physical system produces the measurements. The
:class:`Controller` exposes the same per-step pipeline as a stateful
``step(x) -> u`` call:

    ctrl = Controller.from_pipeline(pipe)           # or explicit parts
    u = ctrl.step(x_measured)                        # one control step
    ...apply u to the real plant, measure x again...

The pipeline is not re-implemented here: the control solve (terminal
synthesis + certificate guard, condensed QP, box fast path, dither, Δu
accumulation) and the estimator update (all five update modes, model
guard, change-detection reset) are the SAME builders the loop uses
(:mod:`koopmanx.engine.core`), so serving cannot drift from the validated
engine — ``tests/test_controller_equiv.py`` pins ``Controller.step`` ≡
``loop.one_step`` bit-for-bit across update modes.

State (model, RLS carries, QP warm start, previous input, certificate)
lives in a pytree the caller can checkpoint/restore
(:func:`koopmanx.eval.persist.save_pytree`). ``step`` is one jitted
program; a batched controller (many plants, one call) is the same function
under ``vmap`` via :class:`BatchedController`.

Reference capability: the per-step serve loop,
``/root/reference/Tank_System.m:170-291``.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..lifts.base import Dictionary
from ..types import LinearModel
from .core import (
    EngineConfig,
    MPCParams,
    change_reset,
    dual_dim,
    initial_cert,
    initial_kkt_inv,
    make_control_solver,
    make_estimator_update,
)


class ControllerState(NamedTuple):
    model: LinearModel
    rls: Any
    u_prev: Array  # last applied input / U0 accumulator
    warm_x: Array  # QP primal warm start
    warm_y: Any  # QP dual warm start (only under qp_warm_start='full'; () else)
    z_prev: Array  # lift of the previous measurement (for the RLS pair)
    x_prev: Array  # previous measurement (c_pairing='same' target)
    have_prev: Array  # bool scalar: first call has no (z, u, z+) pair yet
    res_ema: Array  # change-detection running residual average
    cert: Any  # last sane terminal certificate (P, K, gamma) or ()
    kkt_inv: Any = ()  # carried ADMM KKT inverse (cfg.qp_kkt_refine) or ()


def _select(new, old, pred):
    return jax.tree_util.tree_map(
        lambda a, b: jax.lax.select(jnp.broadcast_to(pred, a.shape), a, b),
        new,
        old,
    )


def make_step_fn(dictionary: Dictionary, cfg: EngineConfig, ref_fn):
    """Pure serving step: ``(params, state, x, k) -> (state', u)``.

    Mirrors ``loop.one_step`` exactly, shifted one measurement: the loop
    updates the estimator with ``(z_k, u_k, z_{k+1})`` after stepping its
    internal plant; here the plant is external, so the same pair arrives
    at call ``k+1`` as ``(z_prev, u_prev, z)`` — the model that solves for
    ``u_k`` has absorbed exactly the same data in both harnesses.
    """
    def build(m: int):
        solve = make_control_solver(dictionary, cfg, ref_fn, m)
        estimate = make_estimator_update(dictionary, cfg)

        def step_fn(params: MPCParams, state: ControllerState, x: Array,
                    step_idx: Array):
            # same matmul-precision policy as the loop's scan (loop.py:
            # closed_loop wraps the scan; here the context is active while
            # jit traces this body — identical compiled semantics)
            with jax.default_matmul_precision(cfg.matmul_precision):
                return _body(params, state, x, step_idx)

        def _body(params: MPCParams, state: ControllerState, x: Array,
                  step_idx: Array):
            z = dictionary(x)
            model, rls, res_ema = state.model, state.rls, state.res_ema

            # ---- online update with the (z_prev, u_prev, z) pair ----
            if cfg.update != "off":
                c_target = x if cfg.c_pairing == "next" else state.x_prev
                # the pair absorbed at call k belongs to LOOP step k-1 (see
                # docstring), so the estimator's step-driven schedules
                # (windowed refit cadence / filter switch) see k-1 — keeps
                # serving ≡ loop under those modes
                rls_new, model_new = estimate(
                    rls, model, state.z_prev, state.u_prev, z, c_target,
                    step_idx - 1,
                )
                residual = jnp.linalg.norm(
                    z - (model.A @ state.z_prev + model.B @ state.u_prev)
                )
                rls_new, res_ema_new = change_reset(
                    cfg, rls_new, res_ema, residual
                )
                # hold everything on the first call (no pair yet)
                use = state.have_prev
                rls = _select(rls_new, rls, use)
                model = _select(model_new, model, use)
                res_ema = jnp.where(use, res_ema_new, res_ema)

            # ---- shared control body (identical to the loop's) ----
            dec = solve(
                params, model, state.cert, x, z, state.u_prev,
                state.warm_x, state.warm_y, step_idx, state.kkt_inv,
            )

            new_state = ControllerState(
                model=model,
                rls=rls,
                u_prev=dec.u_applied,
                warm_x=dec.warm_x,
                warm_y=(
                    dec.sol.y
                    if cfg.qp_warm_start == "full"
                    else state.warm_y
                ),
                z_prev=z,
                x_prev=x,
                have_prev=jnp.asarray(True),
                res_ema=res_ema,
                cert=dec.cert,
                kkt_inv=dec.kkt_inv,
            )
            return new_state, dec.u_applied

        return step_fn

    return build


def initial_state(dictionary: Dictionary, cfg: EngineConfig,
                  params: MPCParams, model0: LinearModel, rls0,
                  n: Optional[int] = None) -> ControllerState:
    """Fresh serving state matching ``closed_loop``'s initial carry."""
    m = params.r_block.shape[-1]
    n = model0.C.shape[0] if n is None else n
    dtype = params.q_block.dtype
    nc = dual_dim(cfg, params, m)
    return ControllerState(
        model=model0,
        rls=rls0,
        u_prev=jnp.zeros((m,), dtype),
        warm_x=jnp.zeros((cfg.horizon * m,), dtype),
        # dual warm start carried only under 'full' warm starts — () else,
        # the kkt_inv empty-pytree pattern (see LoopCarry.warm_y)
        warm_y=(
            jnp.zeros((nc,), dtype) if cfg.qp_warm_start == "full" else ()
        ),
        z_prev=jnp.zeros((dictionary.nlift,), dtype),
        x_prev=jnp.zeros((n,), dtype),
        have_prev=jnp.asarray(False),
        res_ema=jnp.zeros((), dtype),
        cert=initial_cert(cfg, params, dictionary.nlift, m, dtype),
        kkt_inv=initial_kkt_inv(cfg, m, dtype),
    )


class Controller:
    """Stateful single-plant MPC controller (serving-side API)."""

    def __init__(self, dictionary, cfg: EngineConfig, params: MPCParams,
                 ref_fn, model0: LinearModel, rls0,
                 n: Optional[int] = None):
        self.cfg = cfg
        self.params = params
        m = params.r_block.shape[-1]
        step_fn = make_step_fn(dictionary, cfg, ref_fn)(m)
        self._step = jax.jit(step_fn)
        self._init = initial_state(dictionary, cfg, params, model0, rls0, n)
        self.state = self._init
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
            self.params, self.state,
            jnp.asarray(x, self.params.q_block.dtype),
            jnp.asarray(self._k),
        )
        self._k += 1
        return u

    def reset(self, full: bool = False) -> None:
        """New episode: clear the transient state (warm starts, previous
        input, step counter) while KEEPING everything adaptation produced —
        the online model/estimator, the last sane terminal certificate and
        the change-detection residual baseline (all three are products of
        the data seen so far; resetting the certificate to the conservative
        P = Q_lift seed or zeroing res_ema would silently discard them —
        advisor finding, round 3). ``full=True`` restores the initial
        offline model/RLS/certificate as well.
        """
        if full:
            self.state = self._init
        else:
            self.state = self._init._replace(
                model=self.state.model,
                rls=self.state.rls,
                cert=self.state.cert,
                res_ema=self.state.res_ema,
            )
        self._k = 0


class BatchedController:
    """Many plants, one jitted call: ``step(X) -> U`` over a leading batch
    axis, optionally with heterogeneous per-plant :class:`MPCParams`
    (``batch_params=True``). Same pure step as :class:`Controller`, under
    ``jax.vmap`` — the serving analog of :func:`koopmanx.engine.loop.run_batch`.
    """

    def __init__(self, dictionary, cfg: EngineConfig, params: MPCParams,
                 ref_fn, model0: LinearModel, rls0, batch: int,
                 batch_params: bool = False, batch_model: bool = False,
                 n: Optional[int] = None):
        """``batch_params`` / ``batch_model``: the corresponding argument
        carries a leading per-plant batch axis (heterogeneous weights /
        per-plant warm-started model+estimator); otherwise it is shared
        and broadcast."""
        self.cfg = cfg
        self.params = params
        p_one = (
            jax.tree_util.tree_map(lambda a: a[0], params)
            if batch_params
            else params
        )
        m = p_one.r_block.shape[-1]
        step_fn = make_step_fn(dictionary, cfg, ref_fn)(m)
        # the step index is vmapped PER PLANT (in_axes 0, not None): after a
        # masked reset the reset plants restart their episode clock at 0
        # (dither probe phase, receding reference window, kkt re-anchor
        # schedule) while the others keep counting. Cost: in qp_kkt_refine
        # mode the re-anchor lax.cond batches into a select (both branches
        # execute) — acceptable for the opt-in mode; all other configs are
        # unaffected.
        self._step = jax.jit(
            jax.vmap(step_fn, in_axes=(0 if batch_params else None, 0, 0, 0))
        )
        take0 = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
        m0 = take0(model0) if batch_model else model0
        r0 = take0(rls0) if batch_model else rls0
        state1 = initial_state(dictionary, cfg, p_one, m0, r0, n)
        self._init = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (batch,) + leaf.shape), state1
        )
        if batch_model:
            self._init = self._init._replace(model=model0, rls=rls0)
        self.state = self._init
        self._k = jnp.zeros((batch,), jnp.int32)

    def step(self, x_batch) -> Array:
        # cast to the controller dtype (same as Controller.step): a
        # mismatched caller dtype would otherwise promote the carried
        # state and force a retrace every call
        p_one = self.params
        dt = jax.tree_util.tree_leaves(p_one.q_block)[0].dtype
        self.state, u = self._step(
            self.params, self.state, jnp.asarray(x_batch, dt), self._k,
        )
        self._k = self._k + 1
        return u

    def reset(self, full: bool = False, mask=None) -> None:
        """Start a new episode for the whole fleet (``mask=None``) or a
        subset of plants (``mask``: (batch,) bool, True = reset that
        plant) — the realistic fleet event: one plant finishes its batch /
        restarts while the rest keep running.

        Same semantics per selected plant as :meth:`Controller.reset`:
        transient state (warm starts, previous input, pair flag, episode
        clock) clears; the adapted model, estimator, certificate and
        change-detection baseline are KEPT unless ``full=True``, which
        restores the initial offline model/RLS for the selected plants.
        """
        if full:
            new = self._init
        else:
            new = self._init._replace(
                model=self.state.model,
                rls=self.state.rls,
                cert=self.state.cert,
                res_ema=self.state.res_ema,
            )
        if mask is None:
            self.state = new
            self._k = jnp.zeros_like(self._k)
            return
        mask = jnp.asarray(mask, bool)
        if mask.shape != self._k.shape:
            raise ValueError(
                f"mask shape {mask.shape} != fleet shape {self._k.shape}"
            )
        pick = lambda a, b: jnp.where(
            mask.reshape(mask.shape + (1,) * (a.ndim - 1)), a, b
        )
        self.state = jax.tree_util.tree_map(pick, new, self.state)
        self._k = jnp.where(mask, 0, self._k)

"""High-level runner: RunConfig -> built pipeline -> closed-loop results.

This is the programmatic API the CLI, benchmarks and ``__graft_entry__``
share. It wires together L0..L6 exactly as the reference scripts do
(SURVEY §3 call stacks): collect data -> build dictionary -> batch EDMD ->
init RLS -> fused closed loop.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from . import configs as C
from .control.qp import ADMMConfig
from .edmd.batch import edmd_fit, gram_stats, lift_snapshots
from .edmd.rls import (
    gram_rls_init,
    gram_rls_init_from_grams,
    rls_init,
    rls_init_from_grams,
    sqrt_rls_init,
    sqrt_rls_init_from_grams,
    storage_init,
)
from .engine import ref as refgen
from .engine.loop import EngineConfig, MPCParams, make_closed_loop, run_batch
from .lifts.base import (
    Dictionary,
    fit_normalizer,
    identity_dictionary,
    normalized,
    state_augmented,
    zero_offset,
)
from .lifts.io import load_mat_mlp, load_torch_autoencoder
from .lifts.mlp import encoder_dictionary, mlp_init
from .lifts.poly import hermite_dictionary, monomial_dictionary
from .lifts.rbf import kmeans, rbf_dictionary
from .systems.data import Snapshots, collect
from .systems.library import get_system
from .types import LinearModel


def _dtype(cfg: C.RunConfig):
    return {"float32": jnp.float32, "float64": jnp.float64, "bfloat16": jnp.bfloat16}[
        cfg.dtype
    ]


def build_dictionary(
    cfg: C.RunConfig, data: Snapshots, key: Array
) -> Dictionary:
    lc = cfg.lift
    system = get_system(cfg.system)
    dtype = _dtype(cfg)
    if lc.kind == "identity":
        d = identity_dictionary(system.n)
    elif lc.kind == "mlp":
        import os

        if lc.weights_path and not os.path.exists(lc.weights_path):
            # fall back: in-repo self-trained artifact for this system
            # (artifacts/<system>_kmae_encoder.mat), else random init
            alt = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "artifacts",
                f"{system.name}_kmae_encoder.mat",
            )
            lc = dataclasses.replace(
                lc, weights_path=alt if os.path.exists(alt) else None
            )
        if lc.weights_path and lc.weights_path.endswith(".mat"):
            params = load_mat_mlp(lc.weights_path, dtype=dtype)
        elif lc.weights_path and lc.weights_path.endswith(".pkl"):
            params, _ = load_torch_autoencoder(lc.weights_path, dtype=dtype)
        else:
            sizes = (system.n,) + (lc.hidden,) * 3 + (lc.nlift,)
            params = mlp_init(key, sizes, dtype=dtype)
        d = encoder_dictionary(params, n=system.n)
    elif lc.kind == "rbf":
        if lc.rbf_centers == "kmeans":
            centers, _ = kmeans(key, data.x.astype(dtype), lc.nlift)
        else:
            centers = jax.random.uniform(
                key, (lc.nlift, system.n), dtype=dtype
            )
        d = rbf_dictionary(centers, lc.rbf_type)
    elif lc.kind == "fourier":
        from .lifts.fourier import fourier_dictionary, rff_init

        feat_scale = jnp.maximum(
            data.x.astype(dtype).std(axis=0), jnp.asarray(1e-3, dtype)
        )
        w, b = rff_init(
            key, system.n, lc.nlift, bandwidth=lc.rff_bandwidth,
            feature_scale=feat_scale, dtype=dtype,
        )
        d = fourier_dictionary(w, b)
    elif lc.kind == "hermite":
        d = hermite_dictionary()
    elif lc.kind == "monomial":
        d = monomial_dictionary()
    else:
        raise ValueError(f"unknown lift kind {lc.kind!r}")

    if lc.state_augmented:
        d = state_augmented(d, zero_offset=lc.zero_offset)
    elif lc.zero_offset:
        d = zero_offset(d)
    if lc.normalize:
        mu, sc = fit_normalizer(d, data.x.astype(dtype))
        d = normalized(d, mu, sc)
    return d


class Pipeline(NamedTuple):
    config: C.RunConfig
    dictionary: Dictionary
    data: Snapshots
    model0: LinearModel
    rls0: Any
    engine_cfg: EngineConfig
    params: MPCParams
    closed_loop: Any  # callable
    x_init: Array


def _mpc_params(cfg: C.RunConfig, dictionary: Dictionary, system) -> MPCParams:
    mc = cfg.mpc
    dtype = _dtype(cfg)
    if mc.track_lifted:
        py = dictionary.nlift
        cy = None
    elif mc.cy_index is not None:
        py = 1
        cy = jnp.zeros((1, system.n), dtype).at[0, mc.cy_index].set(1.0)
    else:
        py = system.n
        cy = None
    q_block = mc.q_weight * jnp.eye(py, dtype=dtype)
    r_block = mc.r_weight * jnp.eye(system.m, dtype=dtype)
    if mc.delta_u:
        u_min = jnp.full((system.m,), mc.du_min, dtype)
        u_max = jnp.full((system.m,), mc.du_max, dtype)
        applied_min = (
            None if mc.applied_min is None else jnp.full((system.m,), mc.applied_min, dtype)
        )
        applied_max = (
            None if mc.applied_max is None else jnp.full((system.m,), mc.applied_max, dtype)
        )
    else:
        u_min = jnp.full((system.m,), mc.u_min, dtype)
        u_max = jnp.full((system.m,), mc.u_max, dtype)
        applied_min = applied_max = None
    x_minmax = (None, None)
    if mc.state_bounds is not None:
        lo, hi = mc.state_bounds
        x_minmax = (
            jnp.full((mc.horizon * py,), lo, dtype),
            jnp.full((mc.horizon * py,), hi, dtype),
        )
    q_lift = None
    if mc.terminal_synthesis:
        if mc.track_lifted:
            # lifted tracking weights the whole lifted state: Q_Lift = Q
            # (VDP_Revise_2/Koopman_update_Tracking_Lift.m:197 `Q_Lift = Q`)
            q_lift = mc.q_weight * jnp.eye(dictionary.nlift, dtype=dtype)
        else:
            # Q_Lift = diag([q q 0...]) on the lifted state (Revise_2:283 region)
            diag = jnp.zeros((dictionary.nlift,), dtype).at[: system.n].set(
                mc.q_weight
            )
            q_lift = jnp.diag(diag)
    ref_state = None
    if cfg.reference == "constant":
        # the state-space anchor for Lyapunov/LMI monitors (x - Yr with
        # Yr(1:2) the underlying state reference, Revise_2:382-385) — in
        # lifted tracking the receding window is already encoded so the
        # engine cannot recover it from ref_fn
        if cfg.reference_state is not None:
            ref_state = jnp.asarray(cfg.reference_state, dtype)
        else:
            ref_state = jnp.zeros((system.n,), dtype).at[0].set(
                cfg.reference_value
            )
    return MPCParams(
        q_block=q_block,
        r_block=r_block,
        u_min=u_min,
        u_max=u_max,
        cy=cy,
        applied_min=applied_min,
        applied_max=applied_max,
        terminal=None,
        q_lift=q_lift,
        x_min=x_minmax[0],
        x_max=x_minmax[1],
        ref_state=ref_state,
    )


def engine_config(cfg: C.RunConfig) -> EngineConfig:
    """Translate a declarative RunConfig into the static EngineConfig the
    engine builders consume (public: also used to run the local-linear
    baseline or a custom loop under a preset's exact engine settings)."""
    uc = cfg.update
    return EngineConfig(
        controller=cfg.mpc.controller,
        horizon=cfg.mpc.horizon,
        steps=cfg.steps,
        h=cfg.data.h,
        integrator=cfg.integrator,
        delta_u=cfg.mpc.delta_u,
        applied_bounds=cfg.mpc.applied_bounds,
        track_lifted=cfg.mpc.track_lifted,
        update=uc.mode,
        c_pairing=uc.c_pairing,
        rls_lambda=uc.forgetting,
        rls_ridge=uc.ridge,
        reset_mult=uc.reset_mult,
        reset_factor=uc.reset_factor,
        window_filter=uc.window_filter,
        window_filter_late=uc.window_filter_late,
        window_filter_warmup=uc.window_filter_warmup,
        window_refit_every=uc.window_refit_every,
        window_carry=uc.window_carry,
        window_polish=uc.window_polish,
        window_anchor=uc.window_anchor,
        dither=uc.dither,
        symmetrize=uc.symmetrize,
        switch_step=cfg.switch_step,
        markov=cfg.mpc.markov,
        qp_iters=cfg.mpc.qp_iters,
        qp_rho=cfg.mpc.qp_rho,
        qp_unroll=cfg.mpc.qp_unroll,
        qp_kkt_block=cfg.mpc.qp_kkt_block,
        qp_kkt_lowrank=cfg.mpc.qp_kkt_lowrank,
        qp_kkt_bf16=cfg.mpc.qp_kkt_bf16,
        qp_kkt_refine=cfg.mpc.qp_kkt_refine,
        qp_kkt_reanchor=cfg.mpc.qp_kkt_reanchor,
        qp_backend=cfg.mpc.qp_backend,
        terminal_synthesis=cfg.mpc.terminal_synthesis,
        terminal_mode=cfg.mpc.terminal_mode,
        state_bounds=cfg.mpc.state_bounds is not None,
        unroll=cfg.unroll,
        matmul_precision=cfg.matmul_precision,
    )


def _ref_fn(cfg: C.RunConfig, dictionary: Dictionary, py: int, dtype):
    mc = cfg.mpc
    n = get_system(cfg.system).n
    if cfg.reference == "constant":
        if cfg.reference_state is not None:
            r_state = jnp.asarray(cfg.reference_state, dtype)
        else:
            r_state = jnp.zeros((n,), dtype).at[0].set(cfg.reference_value)
        if mc.track_lifted:
            base = refgen.constant_state(r_state, mc.horizon, dtype=dtype)
            return refgen.encoded(base, dictionary, n)
        return refgen.constant(
            jnp.zeros((py,), dtype).at[: min(py, n)].set(r_state[: min(py, n)]),
            mc.horizon,
            py,
            dtype,
        )
    if cfg.reference == "sine":
        return refgen.sine(cfg.reference_value, 0.01, mc.horizon, py, dtype=dtype)
    if cfg.reference == "square":
        return refgen.square(cfg.reference_value, 200, mc.horizon, py, dtype=dtype)
    if cfg.reference == "chirp":
        return refgen.chirp(cfg.reference_value, mc.horizon, py, dtype=dtype)
    if cfg.reference == "cos_sin_mix":
        return refgen.cos_sin_mix(0.5, 0.007, 1.2, 0.002, mc.horizon, py, dtype=dtype)
    raise ValueError(f"unknown reference {cfg.reference!r}")


def build_pipeline(cfg: C.RunConfig, x_init=None) -> Pipeline:
    """Build the full pipeline for a run config.

    The one-time SETUP computation (data collection, dictionary build/
    normalization stats, batch EDMD fit, estimator warm start) runs on the
    HOST CPU and is moved to the accelerator afterwards. This is a
    correctness requirement, not a preference: TPU f32 matmuls use
    reduced-precision passes by default and the TPU SVD/pinv custom calls
    are inaccurate on ill-conditioned lifted Grams — fitting the VDP
    preset's initial model ON the TPU produced an unstable A whose
    horizon-20 powers overflow the condensed QP (observed 2026-08-18:
    every solve NaN, u ≡ 0). The reference fits in float64 NumPy/MATLAB
    (duffing.py:167); host CPU f32/f64 LAPACK reproduces that reliably.
    """
    try:
        host = jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # CPU backend unavailable (exotic deployments)
        host = jax.devices()[0]
    # local_devices, not devices: under multi-process jax.distributed the
    # global device list starts with rank 0's devices, which other ranks
    # cannot device_put to ("Cannot copy array to non-addressable device")
    target = jax.local_devices()[0]
    with jax.default_device(host):
        pipe = _build_pipeline_on_host(cfg, x_init)
    if target != host:
        moved = jax.device_put(
            (pipe.dictionary, pipe.data, pipe.model0, pipe.rls0,
             pipe.params, pipe.x_init),
            target,
        )
        pipe = pipe._replace(
            dictionary=moved[0], data=moved[1], model0=moved[2],
            rls0=moved[3], params=moved[4], x_init=moved[5],
        )
        # the closed loop closes over the dictionary; rebuild it with the
        # device-resident copy so jit doesn't capture host-committed arrays
        pipe = pipe._replace(
            closed_loop=make_closed_loop(
                get_system(cfg.system), moved[0], pipe.engine_cfg,
                _ref_fn(cfg, moved[0], pipe.params.q_block.shape[0],
                        _dtype(cfg)),
            )
        )
    return pipe


def _build_pipeline_on_host(cfg: C.RunConfig, x_init=None) -> Pipeline:
    system = get_system(cfg.system)
    dtype = _dtype(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    k_data, k_dict = jax.random.split(key)

    data = collect(
        system,
        k_data,
        n_step=cfg.data.n_step,
        n_traj=cfg.data.n_traj,
        h=cfg.data.h,
        u_range=cfg.data.u_range,
        x0_range=cfg.data.x0_range,
        integrator=cfg.integrator,
        clamp_x0=cfg.data.clamp_x0,
        dtype=dtype,
    )
    dictionary = build_dictionary(cfg, data, k_dict)
    model0 = edmd_fit(dictionary, data, method="pinv")

    uc = cfg.update
    if uc.mode == "windowed":
        from .edmd.windowed import window_init, window_prefill

        zx, zy = lift_snapshots(dictionary, data)
        rls0 = window_init(
            uc.window, dictionary.nlift, system.m, system.n, dtype,
            carry=uc.window_carry == "woodbury",
            ridge=max(uc.ridge, 1e-5),
            store_dtype=(
                None if uc.window_store == "float32"
                else jnp.dtype(uc.window_store)
            ),
        )
        rls0 = window_prefill(rls0, zx, data.u, zy, data.x)
    elif uc.mode == "storage" or uc.warm_start_from_batch:
        zx, zy = lift_snapshots(dictionary, data)
        stats = gram_stats(zx, zy, data.u, data.x)
        if uc.mode == "storage":
            rls0 = storage_init(stats)
        elif uc.mode == "rls_sqrt":
            rls0 = sqrt_rls_init_from_grams(stats)
        elif uc.mode == "rls_chol":
            rls0 = gram_rls_init_from_grams(stats)
        else:
            rls0 = rls_init_from_grams(stats)
    elif uc.mode == "rls_sqrt":
        rls0 = sqrt_rls_init(
            dictionary.nlift, system.m, system.n, uc.c_ab, uc.c_c, dtype
        )
    elif uc.mode == "rls_chol":
        rls0 = gram_rls_init(
            dictionary.nlift, system.m, system.n, uc.c_ab, uc.c_c, dtype
        )
    else:
        rls0 = rls_init(
            dictionary.nlift, system.m, system.n, uc.c_ab, uc.c_c, dtype
        )

    params = _mpc_params(cfg, dictionary, system)
    py = params.q_block.shape[0]
    ref_fn = _ref_fn(cfg, dictionary, py, dtype)

    engine_cfg = engine_config(cfg)
    closed_loop = make_closed_loop(system, dictionary, engine_cfg, ref_fn)
    if x_init is None and cfg.x0 is not None:
        x_init = jnp.asarray(cfg.x0, dtype)  # preset-pinned initial state
    if x_init is None:
        x_init = jnp.full((system.n,), -2.0, dtype)  # duffing.py:650 init
        if system.name in ("tank", "tank3"):
            x_init = jnp.zeros((system.n,), dtype)  # Tank_System.m:125
    else:
        x_init = jnp.asarray(x_init, dtype)
    return Pipeline(
        config=cfg,
        dictionary=dictionary,
        data=data,
        model0=model0,
        rls0=rls0,
        engine_cfg=engine_cfg,
        params=params,
        closed_loop=closed_loop,
        x_init=x_init,
    )


def run_single(pipe: Pipeline, theta0=None, theta1=None):
    """Run one scenario; returns (final_carry, StepLog)."""
    fn = jax.jit(pipe.closed_loop)
    return fn(pipe.params, pipe.x_init, pipe.model0, pipe.rls0, theta0, theta1)


def run_scenarios(pipe: Pipeline, batch):
    """Run a ScenarioBatch (vmapped); returns (final_carries, StepLogs)."""
    rep = lambda v: jnp.broadcast_to(v, (batch.x0.shape[0],) + v.shape)
    params_b = jax.tree_util.tree_map(rep, pipe.params)
    model_b = jax.tree_util.tree_map(rep, pipe.model0)
    rls_b = jax.tree_util.tree_map(rep, pipe.rls0)
    return run_batch(
        jax.jit(pipe.closed_loop),
        params_b,
        batch.x0,
        model_b,
        rls_b,
        batch.theta0,
        batch.theta1,
    )


def run_resumable(
    pipe: Pipeline,
    total_steps: int,
    chunk_steps: int,
    checkpoint_path=None,
    resume: bool = False,
):
    """Run a long closed loop in checkpointable chunks.

    The single-scan loop (:func:`run_single`) is one device program — fine
    up to ~10^4 steps, but unrecoverable if interrupted. This runner scans
    ``chunk_steps`` at a time, carrying the loop state across chunks and
    (optionally) persisting it to ``checkpoint_path`` after each — crash
    or preemption resumes from the last finished chunk (``resume=True``).
    Returns (final_carry, logs concatenated over the executed chunks).
    """
    import os

    import numpy as np

    from .engine.loop import make_closed_loop
    from .eval.persist import load_pytree, save_pytree

    cfg = dataclasses.replace(pipe.engine_cfg, steps=chunk_steps)
    ref_fn = _ref_fn(
        pipe.config, pipe.dictionary, pipe.params.q_block.shape[0], _dtype(pipe.config)
    )
    system = get_system(pipe.config.system)
    loop = jax.jit(
        make_closed_loop(system, pipe.dictionary, cfg, ref_fn),
        static_argnames=("step_offset",),
    )

    carry = None
    start = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        # build a template carry by tracing zero steps worth of state
        template, _ = loop(
            pipe.params, pipe.x_init, pipe.model0, pipe.rls0, None, None,
            None, None, 0,
        )
        carry, start = load_pytree(checkpoint_path, template)

    logs = []
    for offset in range(start, total_steps, chunk_steps):
        carry, log = loop(
            pipe.params,
            pipe.x_init,
            pipe.model0,
            pipe.rls0,
            None,
            None,
            None,
            carry,
            offset,
        )
        logs.append(jax.tree_util.tree_map(np.asarray, log))
        if checkpoint_path:
            save_pytree(checkpoint_path, carry, meta=offset + chunk_steps)
    full = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *logs
    )
    return carry, full

"""Shared per-step MPC body — the ONE implementation of the reference's
control step, used by both execution harnesses:

- :mod:`koopmanx.engine.loop` — the fused simulation loop (plant stepped
  internally, whole horizon under one ``lax.scan``), and
- :mod:`koopmanx.engine.controller` — the serving API (plant external,
  one jitted ``step(x) -> u`` per measurement).

The reference interleaves these concerns in flat scripts
(``duffing.py:738-1012``, ``Tank_System.m:170-291``); here the step is
factored into three pure builders so the two harnesses cannot drift:

- :func:`make_control_solver` — encode -> (terminal synthesis + certificate
  guard) -> condensed QP build -> ADMM solve (box fast path when the only
  constraints are the input box) -> dither -> Δu accumulation. Everything
  between "we have a model" and "here is the input to apply".
- :func:`make_estimator_update` — the online-update dispatch
  (rls | rls_sqrt | rls_chol | windowed | storage) + the model guard
  (finiteness + spectral-radius screen, hold last sane model).
- :func:`change_reset` — event-triggered statistic reset (re-adaptation
  after plant changes) on the one-step lifted residual.

Config types (:class:`EngineConfig`, :class:`MPCParams`) live here and are
re-exported by :mod:`koopmanx.engine.loop` for compatibility.
"""
from __future__ import annotations

import dataclasses
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
from ..control.qp import (
    ADMMConfig,
    _effective_rho,
    box_kkt,
    make_box_qp_solver,
    solve_qp,
)
from ..ops.linalg import ns_tracking_inverse, spd_inverse
from ..control.dare import dlqr_gain, solve_dare_doubling
from ..control.lmi import solve_terminal_lmi
from ..control.terminal import synthesize_terminal
from ..types import QPSolution
from ..edmd.windowed import (
    window_model,
    window_model_carry,
    window_reanchor,
    window_update,
    window_update_carry,
)
from ..edmd.rls import (
    gram_rls_model,
    gram_rls_update,
    rls_update_ab,
    rls_update_c,
    sqrt_rls_model,
    sqrt_rls_update_ab,
    sqrt_rls_update_c,
    storage_model,
    storage_update,
)
from ..lifts.base import Dictionary
from ..types import LinearModel, model_from_rls


class MPCParams(NamedTuple):
    """Runtime (array-valued) MPC parameters for one scenario."""

    q_block: Array  # (py, py) stage output weight
    r_block: Array  # (m, m) stage input weight
    u_min: Array  # (m,) decision-variable bounds (Δu bounds in delta mode)
    u_max: Array
    cy: Optional[Array] = None  # (py, p) output selector; None = track C z
    applied_min: Optional[Array] = None  # Δu mode: bounds on U0 itself
    applied_max: Optional[Array] = None
    terminal: Optional[Array] = None  # static terminal block override
    q_lift: Optional[Array] = None  # lifted-state weight for terminal synth
    x_min: Optional[Array] = None  # (N*py,) stacked state box (Revise_2)
    x_max: Optional[Array] = None
    # State-space reference point used as the Lyapunov / LMI / monitor
    # anchor x - r (Revise_2/Koopman_update.m:331, :382-385). Required in
    # lifted-tracking mode where the receding reference window is already
    # encoded; falls back to the first n channels of the window when None.
    ref_state: Optional[Array] = None


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static (hashable) engine configuration — the explicit config surface
    the reference hides in commented-out constants (SURVEY §5)."""

    horizon: int = 10
    steps: int = 1000
    h: float = 0.05
    integrator: str = "rk4"
    # 'mpc' (the reference's production path) | 'lqr' — the closed-loop
    # LQR mode behind the reference's dead LQR flag (duffing.py:682,
    # gain at :583-613, apply site :863-864 `u = -K_gain @ xlift`):
    # u = clip(u_ss - K (z - z_ss)), K = dlqr on the CURRENT (online-
    # updated) lifted model, (z_ss, u_ss) the least-squares steady-state
    # target for the reference (zero for regulation, recovering the
    # reference's literal dead-code semantics). No QP — the input box is
    # enforced by exact projection (the reference's dead branch had no
    # constraint handling at all).
    controller: str = "mpc"
    delta_u: bool = False  # Tank's incremental-input formulation
    # How the Δu applied-input window (Tank_System.m:147-150) enters the
    # QP: 'box' (default) folds it into the first decision block's bounds —
    # it constrains Δu_0 alone, so it IS a box — keeping the whole Δu
    # family on the box-only ADMM fast path; 'rows' appends the reference-
    # shaped explicit inequality rows (round-4 semantics; forces the
    # general-inequality ADMM with its per-iteration constraint matvecs).
    # Both describe the same feasible set and exact-QP minimizer.
    applied_bounds: str = "box"
    track_lifted: bool = False  # VDP's lifted-space tracking
    update: str = "rls"  # 'rls' | 'storage' | 'off'
    c_pairing: str = "next"  # 'next' (duffing.py:943) | 'same' (Tank_System.m:259)
    rls_lambda: float = 1.0
    rls_ridge: float = 0.0  # rls_sqrt mode: per-step diagonal trickle
    symmetrize: bool = True
    switch_step: int = 100  # plant-parameter switch (>= steps disables)
    markov: str = "dag"  # prediction-matrix build (condensed.py): dag|doubling|assoc|scan
    qp_iters: int = 60
    qp_rho: float = 0.1
    qp_sigma: float = 1e-6
    qp_alpha: float = 1.6
    # 'primal' re-uses the shifted previous solution; 'full' also carries
    # duals (only safe when the QP matrices barely change step-to-step,
    # e.g. update='off'); 'off' solves cold. Carrying duals across the
    # online-updated model's changing (H, A, l, u) destabilizes a
    # fixed-iteration ADMM (observed on the Tank Δu loop).
    qp_warm_start: str = "primal"
    # Box-QP backend under scenario batching: 'xla' (batched fusions) or
    # 'pallas' (EXPERIMENTAL — VMEM-resident ADMM kernel,
    # ops/qp_pallas_box.py). Measured result (BENCHMARKS.md "Fused-kernel
    # study"): at these tiny shapes XLA wins; keep 'xla' in production.
    qp_backend: str = "xla"
    # Stream the ADMM KKT inverse from HBM in bfloat16 (f32 accumulation):
    # halves the step's measured HBM-roofline term at a ~0.4% QP-Hessian
    # perturbation — controller-side only, see ADMMConfig.kkt_bf16.
    qp_kkt_bf16: bool = False
    # lax.scan unroll for the ADMM iteration body (ADMMConfig.unroll)
    qp_unroll: int = 10
    # Block size for the KKT elimination (ADMMConfig.kkt_block): r > 1
    # streams the augmented matrix ceil(n/r) times instead of n — the
    # measured lever for the multi-input (Nc*nu, Nc*nu) KKT (2.1-2.2x at
    # n=20/40, equal-or-better residuals; round-5 study). 1 = scalar.
    qp_kkt_block: int = 4
    # Output-space (Woodbury) KKT inversion on the box fast path: the
    # condensed Hessian is KKT = D + 2 F2' Qbar F2 with BLOCK-DIAGONAL
    # D = 2 Rbar + (sigma+rho) I (Rbar = I_N (x) R) and F2 of shape
    # (N*py, N*m) — when the loop tracks fewer outputs than inputs
    # (py < m, e.g. tank_mimo's single-level tracking with two pumps),
    # the matrix-inversion lemma reduces the (N*m, N*m) elimination to an
    # (N*py, N*py) one + a few batched matmuls, making the KKT-inverse
    # cost independent of nu. Exact (same matrix, same ADMM), auto-gated:
    # engages only when py < m, the constraint set is the pure box, no
    # terminal override is injected (Qbar must stay block-diagonal PD),
    # and the carried-inverse mode is off.
    qp_kkt_lowrank: bool = True
    # Carried Newton-Schulz KKT inverse (box path only): >0 replaces the
    # per-step exact Gauss-Jordan inversion of the ADMM KKT matrix — the
    # step's dominant HBM stream (BENCHMARKS.md round-2 roofline) — with
    # qp_kkt_refine NS refinement iterations of LAST step's inverse
    # (ops/linalg.ns_tracking_inverse: quadratic convergence, the model
    # drifts O(1e-3)/step so 2-3 iterations reach f32 exactness). Every
    # qp_kkt_reanchor steps an exact inversion re-anchors the tracker
    # (unbatched lax.cond on the step index — only the anchor steps pay
    # it), bounding any post-shock staleness to one period. 0 = exact
    # inversion every step (the parity default).
    qp_kkt_refine: int = 0
    qp_kkt_reanchor: int = 16
    # Change detection / re-adaptation: when the one-step lifted residual
    # spikes above reset_mult x its running average (EMA), the plant has
    # changed — scale the RLS sufficient statistics by reset_factor
    # (K_A <- a K_A, G <- a G leaves the current model UNCHANGED but makes
    # new observations dominate, i.e. event-triggered forgetting). Unlike a
    # blanket forgetting factor this cannot collapse the Gram during quiet
    # periods (observed failure: lam=0.99 drains the Tank loop). 0 disables.
    reset_mult: float = 0.0
    reset_factor: float = 1e-3
    residual_ema: float = 0.98
    # 'windowed' update: Schulz iterations of the per-step refit (the
    # spectral-filter strength / hot-chain length, edmd/windowed.py)
    window_filter: int = 24
    # Step-scheduled filter strength (resolves the round-3 warm-up-vs-tail
    # knob conflict, BENCHMARKS.md "Tank-path attribution"): when
    # window_filter_late > 0, steps >= window_filter_warmup refit with the
    # SHORTER window_filter_late Schulz chain — measured better post-switch
    # tracking AND roughly half the chain cost — while the warm-up keeps
    # the longer window_filter chain whose weaker spectral filtering adapts
    # faster from the sparse early window. Branch on the unbatched scan
    # index: a REAL branch under the scenario vmap (one chain executes per
    # step). 0 disables (static filter, round-3 semantics).
    window_filter_late: int = 0
    window_filter_warmup: int = 300
    # 'windowed' Woodbury lane (edmd/windowed.py::window_update_carry):
    # 'woodbury' carries the window's Gram inverses + cross-Grams and
    # updates them EXACTLY by rank-2 Sherman-Morrison each step — the
    # Schulz chains (the windowed step's measured dominant cost) vanish
    # and the model is fresh every step. Exact-inverse extraction
    # semantics: the truncated chain's spectral filter is NOT applied, so
    # this lane is opt-in per validated workload (small-lift presets keep
    # the filter — three documented negatives). window_filter/
    # window_refit_every/window_filter_late are ignored in this lane.
    window_carry: str = "none"
    # NS polish iterations per step on each carried inverse (residual
    # squaring against the exact carried Gram — self-correcting drift)
    window_polish: int = 1
    # exact statistics rebuild from the ring buffers every so many steps
    # (lax.cond on the unbatched step index; 0 = never)
    window_anchor: int = 0
    # Refit cadence: re-extract (A, B, C) from the window every k-th step
    # only (the ring buffer still absorbs every observation, so no data is
    # lost — the model is just held between refits). The tank step's
    # dominant cost is the two Schulz chains of the PER-STEP refit
    # (~24 ms/step at batch 8192); k>1 divides that cost by k at the price
    # of a k-step model staleness bound — the same trade the kkt re-anchor
    # makes. 1 = refit every step (parity semantics).
    window_refit_every: int = 1
    # Persistent excitation: a small deterministic multi-sine probe added
    # to the applied input (within bounds). Closed-loop data alone is not
    # persistently exciting — after a plant change (or from an absorbing
    # state like the drained tank) the scratch estimator can identify a
    # degenerate model and never recover; a probing signal restores
    # identifiability. 0 disables (parity modes).
    dither: float = 0.0
    # Failure detection (SURVEY §5), two layers:
    # (1) f_clamp saturates prediction-matrix entries so an unstable model
    #     estimate raised to the horizon-th power cannot overflow f32 and
    #     NaN the QP (sane models produce entries O(10); the clamp only
    #     engages in pathological transients, which then yield bounded-
    #     garbage inputs that the box projection contains while the
    #     estimator recovers).
    # (2) model_guard screens the controller-side model: non-finite or
    #     estimated spectral radius of A (power iteration — basis-
    #     independent, unlike matrix norms on unnormalized lifts) above
    #     the bound -> hold the last sane model while the estimator keeps
    #     accumulating. Healthy Koopman predictors of these stable plants
    #     have radius <= ~1.1; pathological transients exceed 2 quickly.
    #     0 disables.
    f_clamp: float = 1e5
    model_guard: float = 3.0
    terminal_synthesis: bool = False  # per-step terminal synthesis (Revise_2)
    terminal_mode: str = "dare"  # 'dare' (production) | 'lmi' (Revise_2 parity)
    state_bounds: bool = False  # enable Revise_2 state-box rows
    drift_norm: str = "fro"  # 'fro' | 'spectral'
    # lax.scan unroll factor for the time loop: >1 amortizes while-loop
    # carry copies over multiple steps at the cost of compile time.
    unroll: int = 1
    # Rematerialize each step under autodiff (jax.checkpoint): grad through
    # an S-step closed loop then stores only the S carries instead of every
    # intermediate of every step — the standard FLOPs-for-HBM trade that
    # makes reference-length (1000+ step) differentiation fit on a chip.
    # No effect on forward-only runs.
    remat: bool = False
    # Matmul precision for the CONTROLLER side of the step (encode, QP
    # build, ADMM). TPU f32 matmuls default to single-pass bf16
    # approximations; that default silently corrupted the online
    # estimator's Gram refit (observed 2026-08-18: the f32 Tank windowed
    # loop drains to x2=0 by step 3000 on TPU while identical code tracks
    # r=1 on CPU) — so every estimator update/extraction function in
    # koopmanx.edmd pins FULL precision internally (see
    # edmd.rls.full_precision) regardless of this knob. The controller
    # side tolerates fast precision at reference scale (duffing 10k /
    # vdp 1k / tank 3k validated); raise to 'high'/'highest' to harden it
    # for ill-conditioned custom workloads.
    matmul_precision: str = "default"

    @property
    def qp_config(self) -> ADMMConfig:
        return ADMMConfig(
            iters=self.qp_iters,
            rho=self.qp_rho,
            sigma=self.qp_sigma,
            alpha=self.qp_alpha,
            kkt_bf16=self.qp_kkt_bf16,
            unroll=self.qp_unroll,
            kkt_block=self.qp_kkt_block,
        )


def _tree_finite(tree) -> Array:
    """All-leaves-finite as ONE scalar: isfinite(sum of |leaf| sums).

    NaN/Inf anywhere propagates through the sum (|.| prevents +inf/-inf
    cancelling into a spuriously-finite value... it cannot anyway — they sum
    to NaN — but abs also prevents large finite values cancelling below the
    overflow threshold). Equivalent failure detection to per-leaf
    ``all(isfinite(...))`` at a fraction of the cost: the per-leaf stacked
    reductions were 4 separate fusions ~0.28 ms/step at batch 2048; the
    add-tree of sums fuses into the surrounding computation.
    """
    flat = jnp.concatenate(
        [
            jnp.ravel(leaf).astype(jnp.float32)
            for leaf in jax.tree_util.tree_leaves(tree)
        ]
    )
    return jnp.isfinite(jnp.sum(jnp.abs(flat)))


def _matnorm(d: Array, kind: str) -> Array:
    if kind == "spectral":
        return jnp.linalg.norm(d, ord=2)
    return jnp.linalg.norm(d)


def _spectral_radius_estimate(a: Array, iters: int = 12) -> Array:
    """|lambda_max(A)| estimate by power iteration: v <- A v / ||A v||;
    the norm ratio ||A v|| converges to the dominant |eigenvalue|. Cheap
    (iters small matvecs), branch-free, vmappable. NaN inputs propagate to
    NaN (caught by the finiteness check alongside)."""
    n = a.shape[-1]
    v = jnp.full((n,), 1.0 / jnp.sqrt(jnp.asarray(n, a.dtype)), dtype=a.dtype)

    def body(carry, _):
        v, _ = carry
        av = a @ v
        nrm = jnp.linalg.norm(av)
        v_new = av / jnp.maximum(nrm, jnp.asarray(1e-30, a.dtype))
        return (v_new, nrm), None

    # fully unrolled: 12 dependent matvecs on an (8,8) are ~100 ns of VPU
    # work — while-loop per-iteration carry copies would cost 10x that
    (v, nrm), _ = jax.lax.scan(
        body, (v, jnp.asarray(0.0, a.dtype)), None, length=iters, unroll=iters
    )
    return nrm


class ControlDecision(NamedTuple):
    """Everything :func:`make_control_solver` produces for one step.

    ``u_applied`` is the input to apply; the rest feeds the carry
    (``warm_x``, ``sol.y``, ``cert``) and the Revise_2 monitor block
    (``p_lyap`` .. ``c_for_term`` are None when synthesis is off — they are
    trace-time constants per config, so the Optional is static)."""

    u_applied: Array
    warm_x: Array  # shifted, sanitized primal warm start for the next step
    sol: Any  # QPSolution (x, y, primal_res)
    cert: Any  # guarded (P, K, gamma) tuple, or () when synthesis off
    cert_ok: Array  # bool: this step's synthesis passed the guard
    r_window: Array  # (horizon, py) reference window used
    kkt_inv: Any = ()  # carried KKT inverse (qp_kkt_refine mode) or ()
    p_lyap: Optional[Array] = None
    cert_k: Optional[Array] = None
    cert_gamma: Optional[Array] = None
    ref_full: Optional[Array] = None
    terminal: Optional[Array] = None
    c_for_term: Optional[Array] = None


def initial_cert(cfg: EngineConfig, params: MPCParams, nlift: int, m: int,
                 dtype) -> Any:
    """Pre-synthesis certificate seed: P = Q_lift (the DARE iterate's own
    starting point), K = 0, gamma = 1; the first guard-passing synthesis
    replaces it. ``()`` when synthesis is off."""
    if not cfg.terminal_synthesis:
        return ()
    p_seed = (
        params.q_lift
        if params.q_lift is not None
        else jnp.eye(nlift, dtype=dtype)
    )
    return (
        jnp.asarray(p_seed, dtype),
        jnp.zeros((m, nlift), dtype),
        jnp.ones((), dtype),
    )


def make_control_solver(dictionary: Dictionary, cfg: EngineConfig, ref_fn,
                        m: int):
    """Build the shared control-solve body (model -> applied input).

    Covers the reference's per-step controller block: condensed QP build
    (``duffing.py:756-800``, ``Tank_System.m:118-158``), the Revise_2
    per-step terminal synthesis + certificate guard
    (``Revise_2/Koopman_update.m:331-369``), the Δu accumulator
    (``Tank_System.m:192``), and state-box rows
    (``Revise_2/Koopman_update.m:205-211``).
    """
    horizon = cfg.horizon
    qp_cfg = cfg.qp_config
    box_solver = make_box_qp_solver(qp_cfg, backend=cfg.qp_backend)
    if cfg.qp_kkt_refine > 0 and cfg.qp_backend == "pallas":
        raise ValueError(
            "qp_kkt_refine (carried KKT inverse) requires qp_backend='xla' "
            "(the Pallas kernel computes its own inverses)"
        )
    if cfg.controller == "lqr":
        return _make_lqr_solver(dictionary, cfg, ref_fn, m)
    if cfg.controller != "mpc":
        raise ValueError(f"unknown controller {cfg.controller!r}")

    def control_solve(params: MPCParams, model: LinearModel, cert: Any,
                      x: Array, z: Array, u_prev: Array, warm_x: Array,
                      warm_y: Array, step: Array,
                      kkt_prev: Any = ()) -> ControlDecision:
        n = model.C.shape[0]  # plant state dim (C maps z -> x)

        # ---- controller model (Δu augmentation happens on the *current*
        # online-updated model, Tank_System.m:265-268) ----
        ctrl_model = model
        if cfg.track_lifted:
            # lifted-space tracking (vanderpol.py:456-459): the tracked
            # output is z itself, so the predictor's C is the identity
            # (VDP_Revise_2/...m:99: C = eye(Nlift))
            ctrl_model = ctrl_model._replace(
                C=jnp.eye(dictionary.nlift, dtype=z.dtype)
            )
        if cfg.delta_u:
            ctrl_model = augment_delta_u(ctrl_model)
            z_qp = jnp.concatenate([z, u_prev])
        else:
            z_qp = z

        # ---- terminal weight ----
        if cfg.terminal_synthesis:
            if params.ref_state is not None:
                ref_full = params.ref_state
            else:
                r0 = ref_fn(step)[0]
                ref_full = jnp.zeros((n,), dtype=z.dtype).at[
                    : r0.shape[-1]
                ].set(r0[:n])
            if cfg.terminal_mode == "lmi":
                # Revise_2 parity: per-step LMI anchored at the current
                # lifted tracking error (Revise_2/Koopman_update.m:331)
                psi = dictionary(x - ref_full)
                lmi_res = solve_terminal_lmi(
                    model,
                    params.q_lift,
                    params.r_block,
                    psi,
                    u_max=params.u_max[0],  # traced scalar is fine here
                )
                cert_p = lmi_res.p
                cert_k = lmi_res.k  # u = K z convention (ref :361)
                cert_gamma = lmi_res.gamma
            else:
                tc = synthesize_terminal(model, params.q_lift, params.r_block)
                cert_p = tc.p
                cert_k = -tc.k  # dlqr returns u = -K z; flip to ref convention
                cert_gamma = tc.gamma
            # ---- certificate guard: a transiently non-stabilizable
            # estimated model has NO certificate (f32 DARE doubling / LMI
            # barrier then returns NaN or an indefinite P). Hold the last
            # sane (P, K, gamma) instead of poisoning the terminal weight
            # and the Revise_2 monitor series. ----
            psi_anchor = dictionary(x - ref_full)
            v_anchor = psi_anchor @ cert_p @ psi_anchor
            cert_ok = (
                _tree_finite((cert_p, cert_k, cert_gamma))
                & (v_anchor >= 0)
                & (cert_gamma > 0)
            )
            prev_p, prev_k, prev_gamma = cert
            cert_p = jnp.where(cert_ok, cert_p, prev_p)
            cert_k = jnp.where(cert_ok, cert_k, prev_k)
            cert_gamma = jnp.where(cert_ok, cert_gamma, prev_gamma)
            new_cert = (cert_p, cert_k, cert_gamma)
            if cfg.track_lifted:
                # lifted tracking injects the FULL P — the tracked output
                # is z itself so the output map is the identity
                # (VDP_Revise_2/Koopman_update_Tracking_Lift.m:283)
                c_for_term = jnp.eye(dictionary.nlift, dtype=z.dtype)
                terminal = cert_p
            else:
                c_for_term = model.C if params.cy is None else params.cy @ model.C
                terminal = c_for_term @ cert_p @ c_for_term.T
            p_lyap = cert_p
        else:
            terminal = params.terminal
            p_lyap = None
            cert_k = None
            cert_gamma = None
            ref_full = None
            c_for_term = None
            new_cert = cert
            cert_ok = jnp.asarray(True)

        qbar = weight_bar(params.q_block, horizon, terminal)
        rbar = jnp.kron(
            jnp.eye(horizon, dtype=params.r_block.dtype), params.r_block
        )

        pred = prediction_matrices(ctrl_model, horizon, params.cy, cfg.markov)
        if cfg.f_clamp > 0.0:
            pred = jax.tree_util.tree_map(
                lambda f: jnp.clip(
                    jnp.nan_to_num(
                        f, nan=0.0, posinf=cfg.f_clamp, neginf=-cfg.f_clamp
                    ),
                    -cfg.f_clamp,
                    cfg.f_clamp,
                ),
                pred,
            )
        r_window = ref_fn(step)  # (horizon, py)
        yr = r_window.reshape(-1)

        # ---- extra inequality rows ----
        a_ineq = None
        l_ineq = None
        u_ineq = None
        tighten_first = False
        if cfg.delta_u and params.applied_min is not None:
            # input-magnitude constraint on U0 + Δu_0 (Tank_System.m:147-150).
            # The constraint selects ONLY the first decision block, so it is
            # a box intersection, not a general inequality: fold it into the
            # Δu_0 bounds (cfg.applied_bounds='box', the default) and the
            # whole Δu family rides the box-only ADMM fast path — no
            # per-iteration A matvecs, no (nc, N*m) constraint stream, and
            # the carried-KKT-inverse mode becomes available. Same feasible
            # set and minimizer as the reference's explicit rows
            # (Tank_System.m:147-150); fixed-iteration ADMM iterates differ
            # (different constraint splitting), gated by the exact-QP
            # parity tests either way. 'rows' keeps the round-4 explicit
            # general-inequality formulation.
            if cfg.applied_bounds == "box":
                tighten_first = True
            else:
                a_first = jnp.zeros((m, horizon * m), dtype=z.dtype)
                a_first = a_first.at[:, :m].set(jnp.eye(m, dtype=z.dtype))
                a_ineq = a_first
                l_ineq = params.applied_min - u_prev
                u_ineq = params.applied_max - u_prev
        if cfg.state_bounds and params.x_min is not None:
            # Revise_2/Koopman_update.m:205-211 state box via F1/F2
            f1z = pred.f1 @ z_qp
            a_state = pred.f2
            l_state = params.x_min - f1z
            u_state = params.x_max - f1z
            if a_ineq is None:
                a_ineq, l_ineq, u_ineq = a_state, l_state, u_state
            else:
                a_ineq = jnp.concatenate([a_ineq, a_state], axis=0)
                l_ineq = jnp.concatenate([l_ineq, l_state])
                u_ineq = jnp.concatenate([u_ineq, u_state])

        if cfg.qp_kkt_refine > 0 and a_ineq is not None:
            # the carried KKT inverse only serves the box fast path below;
            # on the general-inequality ADMM (Δu input-magnitude rows /
            # Revise_2 state box) it would sit unused in the scan carry,
            # burning carry-copy HBM bandwidth with zero benefit — refuse
            # loudly (trace-time: a_ineq's None-ness is static per config)
            raise ValueError(
                "qp_kkt_refine > 0 requires the box-only QP fast path; this "
                "config adds general inequality rows (delta_u applied "
                "bounds or state_bounds) which use solve_qp's own KKT — "
                "set qp_kkt_refine=0 for this configuration"
            )
        # per-channel bounds are (m,): TILE over the horizon (broadcast_to
        # only handles size-1, which silently worked for every m=1 plant)
        lo = jnp.tile(jnp.broadcast_to(params.u_min, (m,)), horizon)
        hi = jnp.tile(jnp.broadcast_to(params.u_max, (m,)), horizon)
        if tighten_first:
            # intersect the Δu_0 box with the applied-input window. The
            # accumulator projection keeps u_prev inside [applied_min,
            # applied_max], so with a 0-straddling Δu box the intersection
            # is non-empty; the minimum guards pathological params anyway.
            lo0 = jnp.maximum(
                jnp.broadcast_to(params.u_min, (m,)),
                params.applied_min - u_prev,
            )
            hi0 = jnp.minimum(
                jnp.broadcast_to(params.u_max, (m,)),
                params.applied_max - u_prev,
            )
            lo0 = jnp.minimum(lo0, hi0)
            lo = lo.at[:m].set(lo0)
            hi = hi.at[:m].set(hi0)
        qp = condensed_qp(
            pred, z_qp, yr, qbar, rbar, lo, hi, a_ineq, l_ineq, u_ineq
        )
        if a_ineq is None:
            # Box-only fast path (A = I): the Duffing/VDP loops' only
            # constraints are the input box (duffing.py:636 ±2,
            # vanderpol.py:542 ±6) — skip the A-matmuls entirely and shrink
            # the KKT solve to (P + (sigma+rho) I)^{-1}. Statically known:
            # a_ineq is a trace-time Python value.
            # box_solver == solve_box_qp unbatched; under the scenario
            # vmap its custom batching rule can route the whole batch to
            # the VMEM-resident Pallas kernel (cfg.qp_backend='pallas')
            zeros_x = jnp.zeros_like(qp.q)
            n_out = pred.f2.shape[0]  # N*py (static)
            lowrank_kkt = (
                cfg.qp_kkt_lowrank
                and cfg.qp_kkt_refine == 0
                and cfg.qp_backend == "xla"
                and terminal is None
                and n_out < horizon * m  # py < m
            )
            x0 = (
                warm_x
                if cfg.qp_warm_start in ("full", "primal")
                else zeros_x
            )
            y0 = warm_y if cfg.qp_warm_start == "full" else zeros_x
            if cfg.qp_kkt_refine > 0 and not isinstance(kkt_prev, tuple):
                # carried-inverse mode: Newton-Schulz refinement of last
                # step's KKT inverse; exact Gauss-Jordan re-anchor every
                # qp_kkt_reanchor steps. `step` is unbatched (scan index
                # shared by all vmapped scenarios), so the cond is a REAL
                # branch even under the scenario vmap — anchor steps pay
                # the elimination, every other step pays 2*refine batched
                # matmuls instead. A caller that threads NO carry
                # (kkt_prev=(), e.g. the local-linear baseline loop) falls
                # through to exact inversion every step below.
                kkt = box_kkt(qp.P, qp_cfg)
                kkt_inv = jax.lax.cond(
                    step % cfg.qp_kkt_reanchor == 0,
                    lambda ops: spd_inverse(ops[0], block=cfg.qp_kkt_block),
                    lambda ops: ns_tracking_inverse(
                        ops[0], ops[1], cfg.qp_kkt_refine
                    ),
                    (kkt, kkt_prev),
                )
                sol = box_solver(qp.P, qp.q, lo, hi, x0, y0, kkt_inv)
                new_kkt = kkt_inv
            elif lowrank_kkt:
                # output-space Woodbury inversion (see qp_kkt_lowrank):
                #   KKT = D + F2' Qt F2,   D = 2 Rbar + (sigma+rho) I,
                #   Qt = 2 Qbar,  both block-diagonal
                #   KKT^{-1} = D^{-1} - D^{-1} F2' S^{-1} F2 D^{-1},
                #   S = Qt^{-1} + F2 D^{-1} F2'   ((N*py, N*py) SPD)
                # rho matches solve_box_qp's own scaling (same P).
                # FULL matmul precision is pinned locally: this block
                # CONSTRUCTS an inverse (precision-critical, like the
                # estimator side — TPU-default bf16-pass matmuls here
                # biased the tank_mimo 3000-step tail by 6e-2 on-chip
                # while CPU f32 sat at 9e-5; measured 2026-08-21). The
                # matmuls are a one-per-step microscopic FLOP share.
                with jax.default_matmul_precision("highest"):
                    rho = _effective_rho(qp.P, qp_cfg)
                    d_block = 2.0 * params.r_block + (
                        qp_cfg.sigma + rho
                    ) * jnp.eye(m, dtype=z.dtype)
                    d_block_inv = spd_inverse(d_block)
                    f2r = pred.f2.reshape(n_out, horizon, m)
                    f2d = (f2r @ d_block_inv).reshape(n_out, horizon * m)
                    qt_block_inv = spd_inverse(2.0 * params.q_block)
                    s = jnp.kron(
                        jnp.eye(horizon, dtype=z.dtype), qt_block_inv
                    ) + f2d @ pred.f2.T
                    s_inv = spd_inverse(s, block=cfg.qp_kkt_block)
                    kkt_inv = jnp.kron(
                        jnp.eye(horizon, dtype=z.dtype), d_block_inv
                    ) - f2d.T @ (s_inv @ f2d)
                    kkt_inv = 0.5 * (kkt_inv + kkt_inv.T)
                sol = box_solver(qp.P, qp.q, lo, hi, x0, y0, kkt_inv)
                new_kkt = kkt_prev
            else:
                sol = box_solver(qp.P, qp.q, lo, hi, x0, y0)
                new_kkt = kkt_prev
        elif cfg.qp_warm_start == "full":
            sol = solve_qp(qp, qp_cfg, x0=warm_x, y0=warm_y)
            new_kkt = kkt_prev
        elif cfg.qp_warm_start == "primal":
            sol = solve_qp(qp, qp_cfg, x0=warm_x)
            new_kkt = kkt_prev
        else:
            sol = solve_qp(qp, qp_cfg)
            new_kkt = kkt_prev
        # project the applied move onto its box (the ADMM x-iterate is only
        # asymptotically feasible; actuator saturation is exact projection);
        # a non-finite solve (guarded model pathologies) falls back to 0
        first_move = jnp.clip(
            jnp.nan_to_num(sol.x[:m], nan=0.0, posinf=0.0, neginf=0.0),
            params.u_min,
            params.u_max,
        )

        if cfg.dither > 0.0:
            t_f = step.astype(z.dtype)
            probe = cfg.dither * (
                jnp.sin(0.37 * t_f) + 0.5 * jnp.sin(1.13 * t_f + 1.0)
            )
            first_move = jnp.clip(
                first_move + probe, params.u_min, params.u_max
            )
        if cfg.delta_u:
            u_applied = u_prev + first_move  # U0 += ΔU (Tank_System.m:192)
            if params.applied_min is not None:
                # exact actuator saturation: the QP's input-magnitude rows
                # (Tank_System.m:147-150) are only asymptotically feasible
                # under fixed-iteration ADMM; project the accumulator (this
                # also keeps |Δu_applied| <= the Δu box).
                u_applied = jnp.clip(
                    u_applied, params.applied_min, params.applied_max
                )
        else:
            u_applied = first_move

        # warm start: shift the solution one step (last move repeated);
        # sanitize so a pathological solve cannot poison later steps
        warm_next = jnp.nan_to_num(
            jnp.concatenate([sol.x[m:], sol.x[-m:]]),
            nan=0.0, posinf=0.0, neginf=0.0,
        )
        return ControlDecision(
            u_applied=u_applied,
            warm_x=warm_next,
            sol=sol,
            cert=new_cert,
            cert_ok=cert_ok,
            r_window=r_window,
            kkt_inv=new_kkt,
            p_lyap=p_lyap,
            cert_k=cert_k,
            cert_gamma=cert_gamma,
            ref_full=ref_full,
            terminal=terminal,
            c_for_term=c_for_term,
        )

    return control_solve


def _make_lqr_solver(dictionary: Dictionary, cfg: EngineConfig, ref_fn,
                     m: int):
    """The closed-loop LQR mode (``cfg.controller='lqr'``) — the runnable
    counterpart of the reference's dead LQR flag (``duffing.py:682``; gain
    ``K_gain = dlqr(A, B, Q, R)`` at ``:669``, apply site ``:863-864``
    ``u = -K_gain @ xlift``).

    Per step, on the CURRENT online-updated model (the reference's dead
    branch used the offline model's static gain; with ``update='off'`` this
    reduces to exactly that):

      K  = dlqr(A, B, Q_dare, R)        (doubling DARE, no LAPACK)
      (z_ss, u_ss) = argmin ||(A - I) z + B u||^2 + ||G z - r||^2
                                         (least-squares servo target)
      u  = clip(u_ss - K (z - z_ss), u_min, u_max)

    ``G`` is the tracked output map (``Cy C``, or I in lifted tracking,
    where ``z_ss`` is the encoded reference directly). With r = 0 the
    target collapses to (0, 0) and u = -K z — the reference's literal
    dead-code semantics. ``Q_dare`` is ``params.q_lift`` when provided,
    else the output weight pulled back through G (plus a detectability
    ridge). Same ControlDecision contract as the MPC solve, so the loop,
    the serving Controller and run_batch work unchanged.
    """
    if cfg.delta_u or cfg.state_bounds or cfg.terminal_synthesis:
        raise ValueError(
            "controller='lqr' supports the plain tracking formulation only "
            "(no delta_u, state_bounds, or terminal_synthesis — those are "
            "MPC-path features; the reference's LQR flag had none of them)"
        )
    horizon = cfg.horizon

    def control_solve(params: MPCParams, model: LinearModel, cert: Any,
                      x: Array, z: Array, u_prev: Array, warm_x: Array,
                      warm_y: Array, step: Array,
                      kkt_prev: Any = ()) -> ControlDecision:
        nlift = dictionary.nlift
        dtype = z.dtype
        a, b = model.A, model.B
        if cfg.track_lifted:
            g = jnp.eye(nlift, dtype=dtype)
        else:
            g = model.C if params.cy is None else params.cy @ model.C
        if params.q_lift is not None:
            q_dare = params.q_lift
        else:
            q_dare = g.T @ params.q_block @ g
        # tiny ridge: the pulled-back Q is rank-py — the doubling DARE
        # needs detectability of (A, Q^1/2)
        q_dare = q_dare + (1e-9 * jnp.trace(params.q_block)) * jnp.eye(
            nlift, dtype=dtype
        )
        p = solve_dare_doubling(a, b, q_dare, params.r_block)
        k = dlqr_gain(a, b, q_dare, params.r_block, p)  # u = -K z

        r_window = ref_fn(step)  # (horizon, py)
        r0 = r_window[0]
        eye_n = jnp.eye(nlift, dtype=dtype)
        if cfg.track_lifted:
            # the window is already encoded: z_ss = liftFun(r); u_ss from
            # the equilibrium condition B u = (I - A) z_ss in least squares
            z_ss = r0
            bb = b.T @ b + jnp.asarray(1e-8, dtype) * jnp.eye(m, dtype=dtype)
            u_ss = spd_inverse(bb) @ (b.T @ ((eye_n - a) @ z_ss))
        else:
            mmat = jnp.concatenate(
                [
                    jnp.concatenate([a - eye_n, b], axis=1),
                    jnp.concatenate(
                        [g, jnp.zeros((g.shape[0], m), dtype)], axis=1
                    ),
                ],
                axis=0,
            )
            rhs = jnp.concatenate([jnp.zeros((nlift,), dtype), r0])
            mtm = mmat.T @ mmat + jnp.asarray(1e-8, dtype) * jnp.eye(
                nlift + m, dtype=dtype
            )
            w = spd_inverse(mtm) @ (mmat.T @ rhs)
            z_ss, u_ss = w[:nlift], w[nlift:]

        # a transiently non-stabilizable estimate yields NaN (P, K) — same
        # bounded-garbage fallback as the MPC path's first_move sanitation
        u_raw = u_ss - k @ (z - z_ss)
        u_applied = jnp.clip(
            jnp.nan_to_num(u_raw, nan=0.0, posinf=0.0, neginf=0.0),
            params.u_min,
            params.u_max,
        )
        if cfg.dither > 0.0:
            t_f = step.astype(dtype)
            probe = cfg.dither * (
                jnp.sin(0.37 * t_f) + 0.5 * jnp.sin(1.13 * t_f + 1.0)
            )
            u_applied = jnp.clip(u_applied + probe, params.u_min, params.u_max)

        sol = QPSolution(
            x=jnp.zeros((horizon * m,), dtype),
            z=jnp.zeros((horizon * m,), dtype),
            # warm_y is () unless qp_warm_start='full' (LoopCarry slimming)
            y=(
                jnp.zeros((0,), dtype)
                if isinstance(warm_y, tuple)
                else jnp.zeros_like(warm_y)
            ),
            primal_res=jnp.zeros((), dtype),
            dual_res=jnp.zeros((), dtype),
            iterations=jnp.zeros((), jnp.int32),
        )
        return ControlDecision(
            u_applied=u_applied,
            warm_x=jnp.zeros_like(warm_x),
            sol=sol,
            cert=cert,
            cert_ok=jnp.asarray(True),
            r_window=r_window,
            kkt_inv=kkt_prev,
        )

    return control_solve


def dual_dim(cfg: EngineConfig, params: MPCParams, m: int) -> int:
    """Number of QP constraint rows (dual warm-start size) — the ONE place
    that mirrors control_solve's row construction (box + Δu input-magnitude
    rows + Revise_2 state box); used by every harness's carry init."""
    nc = cfg.horizon * m
    if (cfg.delta_u and params.applied_min is not None
            and cfg.applied_bounds != "box"):
        nc += m
    if cfg.state_bounds and params.x_min is not None:
        nc += params.x_min.shape[0]
    return nc


def initial_kkt_inv(cfg: EngineConfig, m: int, dtype) -> Any:
    """Seed for the carried KKT inverse: zeros — step 0 always hits the
    exact re-anchor (0 % reanchor == 0), so the seed is never consumed.
    ``()`` when the mode is off."""
    if cfg.qp_kkt_refine <= 0:
        return ()
    n_dec = cfg.horizon * m
    return jnp.zeros((n_dec, n_dec), dtype)


def make_estimator_update(dictionary: Dictionary, cfg: EngineConfig):
    """Build the shared online-update body (one (z, u, z+, c_target) pair
    -> refreshed estimator + guarded model).

    The update-mode dispatch mirrors the reference's RLS blocks
    (``duffing.py:926-949``, ``Tank_System.m:251-268``); the model guard is
    a koopmanx robustness layer (see EngineConfig.model_guard).

    ``c_target`` is the output-regression target already resolved by the
    caller (``x_next`` for c_pairing='next', ``x`` for 'same') — the two
    harnesses see the pair at different times, so the pairing is theirs.
    ``step`` is the caller's step index (the loop's scan index / the
    serving controller's episode clock) — it drives the windowed refit
    cadence and the step-scheduled filter; other modes ignore it.
    Returns ``(rls, new_model)``. With ``cfg.update == 'off'`` both pass
    through unchanged.
    """

    def estimator_update(rls, model: LinearModel, z: Array, u: Array,
                         z_next: Array, c_target: Array, step: Array):
        if cfg.update == "rls":
            rls_new = rls_update_ab(
                rls, z, u, z_next,
                lam=cfg.rls_lambda, symmetrize=cfg.symmetrize,
            )
            rls_new = rls_update_c(
                rls_new, z, c_target,
                lam=cfg.rls_lambda, symmetrize=cfg.symmetrize,
            )
            new_model = model_from_rls(rls_new, dictionary.nlift)
        elif cfg.update == "rls_chol":
            rls_new = gram_rls_update(
                rls, z, u, z_next, c_target, lam=cfg.rls_lambda
            )
            new_model = gram_rls_model(
                rls_new, dictionary.nlift, ridge=max(cfg.rls_ridge**2, 1e-7)
            )
        elif cfg.update == "rls_sqrt":
            rls_new = sqrt_rls_update_ab(
                rls, z, u, z_next, lam=cfg.rls_lambda, ridge=cfg.rls_ridge,
            )
            rls_new = sqrt_rls_update_c(
                rls_new, z, c_target, lam=cfg.rls_lambda, ridge=cfg.rls_ridge
            )
            new_model = sqrt_rls_model(rls_new, dictionary.nlift)
        elif cfg.update == "windowed" and cfg.window_carry == "woodbury":
            rls_new = window_update_carry(
                rls, z, u, z_next, c_target, polish=cfg.window_polish
            )
            if cfg.window_anchor > 0:
                # exact rebuild from the buffers on anchor steps only —
                # `step` is unbatched (the scan index), so the cond is a
                # REAL branch under the scenario vmap
                rls_new = jax.lax.cond(
                    (step + 1) % cfg.window_anchor == 0,
                    lambda s: window_reanchor(
                        s, max(cfg.rls_ridge, 1e-5)
                    ),
                    lambda s: s,
                    rls_new,
                )
            new_model = window_model_carry(rls_new, dictionary.nlift)
        elif cfg.update == "windowed":
            rls_new = window_update(rls, z, u, z_next, c_target)
            ridge = max(cfg.rls_ridge, 1e-5)

            def refit():
                if cfg.window_filter_late > 0:
                    # step-scheduled filter: long warm-up chain, short
                    # (stronger-filtering, cheaper) late chain — cond on
                    # the unbatched scan index is a real branch under vmap
                    return jax.lax.cond(
                        step < cfg.window_filter_warmup,
                        lambda: window_model(
                            rls_new, dictionary.nlift, ridge=ridge,
                            schulz_iters=cfg.window_filter,
                        ),
                        lambda: window_model(
                            rls_new, dictionary.nlift, ridge=ridge,
                            schulz_iters=cfg.window_filter_late,
                        ),
                    )
                return window_model(
                    rls_new, dictionary.nlift, ridge=ridge,
                    schulz_iters=cfg.window_filter,
                )

            if cfg.window_refit_every > 1:
                # refit cadence: the ring buffer absorbed the observation
                # above regardless; the Schulz-chain extraction — the tank
                # step's dominant cost — only runs on cadence steps, the
                # carried model is held between (k-step staleness bound,
                # same structure as the kkt re-anchor). The warm-up phase
                # (step < window_filter_warmup) always refits: holding a
                # 4-step-stale model while the window is still sparse blew
                # the pre-switch transient to 1.65 (gate: <1.5; every-step
                # warm-up stays at the validated ~1.26).
                new_model = jax.lax.cond(
                    (step < cfg.window_filter_warmup)
                    | (step % cfg.window_refit_every == 0),
                    refit,
                    lambda: model,
                )
            else:
                new_model = refit()
        elif cfg.update == "storage":
            rls_new = storage_update(rls, z, u, z_next, c_target)
            new_model = storage_model(rls_new, dictionary.nlift)
        else:
            return rls, model

        # ---- model guard (failure detection) ----
        if cfg.model_guard > 0.0:
            finite = _tree_finite(new_model)
            radius = _spectral_radius_estimate(new_model.A)
            sane = finite & (radius < cfg.model_guard)
            new_model = jax.tree_util.tree_map(
                lambda a, b: jax.lax.select(
                    jnp.broadcast_to(sane, a.shape), a, b
                ),
                new_model,
                model,
            )
            # estimator state must never absorb non-finite carries
            rls_finite = _tree_finite(rls_new)
            rls_new = jax.tree_util.tree_map(
                lambda a, b: jax.lax.select(
                    jnp.broadcast_to(rls_finite, a.shape), a, b
                ),
                rls_new,
                rls,
            )

        return rls_new, new_model

    return estimator_update


def change_reset(cfg: EngineConfig, rls, res_ema: Array, residual: Array):
    """Event-triggered statistic reset (see EngineConfig.reset_mult).

    ``residual`` is the one-step lifted residual under the PRE-update model
    (matching the loop's logging point). Returns ``(rls, res_ema)``;
    identity when disabled or under update modes without scalable Grams.
    """
    if not (cfg.reset_mult > 0.0 and cfg.update in ("rls_sqrt", "rls_chol")):
        return rls, res_ema
    warmed = res_ema > 0
    trigger = warmed & (residual > cfg.reset_mult * res_ema)
    alpha = jnp.where(trigger, cfg.reset_factor, 1.0).astype(residual.dtype)
    if cfg.update == "rls_sqrt":
        rls = rls._replace(
            K_A=rls.K_A * alpha,
            r_g=rls.r_g * jnp.sqrt(alpha),
            barX=rls.barX * alpha,
            r_q=rls.r_q * jnp.sqrt(alpha),
        )
    else:  # rls_chol (Gram carry)
        rls = rls._replace(
            K_A=rls.K_A * alpha,
            g=rls.g * alpha,
            barX=rls.barX * alpha,
            q=rls.q * alpha,
        )
    res_ema = jnp.where(
        trigger,
        res_ema,  # don't poison the baseline with the spike
        cfg.residual_ema * res_ema + (1.0 - cfg.residual_ema) * residual,
    )
    res_ema = jnp.where(warmed, res_ema, residual)
    return rls, res_ema

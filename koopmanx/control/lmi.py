"""LMI terminal-cost synthesis — the Revise_2 SDP, solved TPU-natively.

The reference re-certifies stability every control step by solving, with
YALMIP (``Revise_2/Koopman_update.m:314-357``):

  find   gamma, X1 (m x m), Q1 (N x N), Y1 (m x N)
  s.t.   LMI0 = [X1 Y1; Y1' Q1]                      >= 0
         LMI1 = [1 psi'; psi Q1]                     >= 0.01 I
         LMI2 = [Q1          (A Q1 + B Y1)'  (sqrtQ Q1)'  (sqrtR Y1)';
                 A Q1+B Y1    Q1              0            0;
                 sqrtQ Q1     0               gamma I      0;
                 sqrtR Y1     0               0            gamma I ]  >= 0
         Q1 >= 0,  X1(j,j) <= u_max^2
  min    gamma

then recovers ``K = Y1/Q1``, ``P = gamma inv(Q1)``
(``Revise_2/Koopman_update.m:361-381``). LMI2 is the Schur-complement form
of the quasi-infinite-horizon decrease condition; LMI1 anchors
``psi = liftFun(x - r)`` inside the invariant ellipsoid; LMI0/X1 encode the
input bound on the terminal controller.

No off-the-shelf SDP solver runs on TPU. This module solves the problem as
a smooth penalized program — differentiable eigenvalue penalties

  pen(M) = sum relu(margin - eig_i(M))^2     (via jnp.linalg.eigh)

minimized over (gamma, X1, Q1, Y1) with Adam at a fixed iteration count
(branch-free, jittable, vmappable over scenario batches), warm-started from
the DARE solution (which satisfies the decrease LMI with equality, so the
penalty starts near-feasible). The production default remains the direct
DARE synthesis (:mod:`koopmanx.control.terminal`); this path exists for
Revise_2 parity and for genuinely constrained terminal sets.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..types import LinearModel
from ..ops.linalg import gj_solve, spd_inverse
from .dare import dlqr_gain, solve_dare_doubling, solve_dlyap_doubling


class LMIResult(NamedTuple):
    p: Array  # terminal cost P = gamma inv(Q1)
    k: Array  # terminal gain K = Y1 inv(Q1)
    gamma: Array
    q1: Array
    feasibility: Array  # max PSD violation across the LMIs (<=0 feasible)


class _Vars(NamedTuple):
    gamma_raw: Array  # gamma = softplus(gamma_raw)
    x1: Array
    q1_raw: Array  # Q1 = sym(q1_raw)
    y1: Array


def _sym(m: Array) -> Array:
    return 0.5 * (m + jnp.swapaxes(m, -1, -2))


def _eig_penalty(m: Array, margin: float = 0.0) -> Array:
    """sum relu(margin - lambda_i)^2 — zero iff M >= margin*I."""
    w = jnp.linalg.eigvalsh(_sym(m))
    return jnp.sum(jax.nn.relu(margin - w) ** 2)


def _min_eig(m: Array) -> Array:
    return jnp.min(jnp.linalg.eigvalsh(_sym(m)))


def _build_lmis(
    v: _Vars,
    a: Array,
    b: Array,
    sqrt_q: Array,
    sqrt_r: Array,
    psi: Array,
    u_max: float,
):
    nlift = a.shape[-1]
    m = b.shape[-1]
    gamma = jax.nn.softplus(v.gamma_raw)
    q1 = _sym(v.q1_raw)
    x1 = _sym(v.x1)
    y1 = v.y1
    dtype = a.dtype

    lmi0 = jnp.block([[x1, y1], [y1.T, q1]])
    lmi1 = jnp.block(
        [[jnp.ones((1, 1), dtype), psi[None, :]], [psi[:, None], q1]]
    )
    aq_by = a @ q1 + b @ y1
    z_nn = jnp.zeros((nlift, nlift), dtype)
    z_nm = jnp.zeros((nlift, m), dtype)
    lmi2 = jnp.block(
        [
            [q1, aq_by.T, (sqrt_q @ q1).T, (sqrt_r @ y1).T],
            [aq_by, q1, z_nn, z_nm],
            [sqrt_q @ q1, z_nn, gamma * jnp.eye(nlift, dtype=dtype), z_nm],
            [(sqrt_r @ y1), z_nm.T, z_nm.T, gamma * jnp.eye(m, dtype=dtype)],
        ]
    )
    input_slack = u_max**2 - jnp.diag(x1)  # >= 0 required
    return gamma, q1, x1, y1, lmi0, lmi1, lmi2, input_slack


def _lmi_feasibility(
    a: Array,
    b: Array,
    sqrt_q: Array,
    sqrt_r: Array,
    psi: Array,
    u_max,
    gamma: Array,
    p: Array,
    k: Array,
) -> Array:
    """Max violation of the REFERENCE's LMI set at a candidate (gamma,P,K),
    mapped back to the YALMIP variables via ``Q1 = gamma P^{-1}``,
    ``Y1 = K Q1``, Schur-minimal ``X1 = gamma K P^{-1} K'``
    (jax twin of :func:`koopmanx.eval.sdp_oracle.check_reference_lmis`).
    <= 0 means certified feasible."""
    nlift = a.shape[-1]
    m = b.shape[-1]
    dtype = a.dtype
    p_inv = spd_inverse(p, eps=1e-9)
    q1 = _sym(gamma * p_inv)
    y1 = k @ q1
    x1 = _sym(gamma * (k @ (p_inv @ k.T)))
    lmi0 = jnp.block([[x1, y1], [y1.T, q1]])
    lmi1 = jnp.block(
        [[jnp.ones((1, 1), dtype), psi[None, :]], [psi[:, None], q1]]
    )
    aq_by = a @ q1 + b @ y1
    z_nn = jnp.zeros((nlift, nlift), dtype)
    z_nm = jnp.zeros((nlift, m), dtype)
    lmi2 = jnp.block(
        [
            [q1, aq_by.T, (sqrt_q @ q1).T, (sqrt_r @ y1).T],
            [aq_by, q1, z_nn, z_nm],
            [sqrt_q @ q1, z_nn, gamma * jnp.eye(nlift, dtype=dtype), z_nm],
            [sqrt_r @ y1, z_nm.T, z_nm.T, gamma * jnp.eye(m, dtype=dtype)],
        ]
    )
    return jnp.maximum(
        jnp.maximum(-_min_eig(lmi0), -_min_eig(lmi1)),
        jnp.maximum(
            -_min_eig(lmi2), jnp.max(jax.nn.relu(jnp.diag(x1) - u_max**2))
        ),
    )


def solve_terminal_lmi(
    model: LinearModel,
    q_lift: Array,
    r: Array,
    psi: Array,
    u_max: float = 2.0,
    iters: int = 300,
    lr: float = 5e-2,
    penalty: float = 1e3,
    margin: float = 1e-2,
    lyapunov_correct: bool = True,
    method: str = "auto",
    detune_grid: int = 12,
    detune_bisect: int = 12,
    polish_iters: int = 0,
) -> LMIResult:
    """Solve the Revise_2 terminal LMI for the current model.

    ``psi`` is the lifted tracking error ``liftFun(x - r)``
    (Revise_2/Koopman_update.m:331).

    ``method='auto'`` (default, production): exploit the analytic structure
    of the SDP (Kothare, Balakrishnan & Morari 1996 — proof in
    ``koopmanx/eval/sdp_oracle.py``):

      * whenever the input-bound row is SLACK at the DARE point, the exact
        optimum is ``(P, K, gamma*) = (P_dare, K_dare, psi' P_dare psi)`` —
        return it directly (the reference *minimizes* gamma,
        Revise_2/Koopman_update.m:355; the previous penalized solve was up
        to 3x conservative here);
      * when the bound BINDS, sweep the R-detuned DARE family
        ``(P_s, K_s) = dare(A, B, Q, s R)``, ``s >= 1``: every member
        satisfies the decrease LMI for the ORIGINAL (Q, R) — the
        closed-loop Lyapunov identity gives
        ``Acl' P_s Acl - P_s + Q + K_s' R K_s = -(s-1) K_s' R K_s <= 0`` —
        and larger ``s`` shrinks the gain until the input bound certifies.
        A geometric grid (``2^1 .. 2^detune_grid``) picks the first
        feasible ``s``, then ``detune_bisect`` geometric-bisection steps
        polish it down (gamma_s is increasing in s). Branch-free,
        vmappable, ~20 doubling-DARE solves — far cheaper than the
        penalized eigen-barrier.

    ``polish_iters`` (method='auto' only): > 0 runs a gamma-descent polish
    on the BINDING branch — a jittable log-det barrier interior-point
    solve of the full SDP (``polish_iters`` outer barrier stages, damped
    Newton inside), seeded strictly feasible from the family optimum and
    accepted only when the endpoint certifies under the reference LMI set
    AND improves gamma. Closes the measured 1.127x structural gap of the
    detuned-DARE family to the numeric SDP optimum (PARITY.md). f64 /
    eigh / slogdet territory: intended for offline synthesis and the CI
    optimality gate, defaults OFF on the per-step engine path.

    ``method='penalized'``: the original fixed-iteration Adam on
    ``gamma + penalty * (PSD eigenvalue violations)``, warm-started from
    the DARE pair — kept for Revise_2-parity experiments and as an
    independent cross-check. With ``lyapunov_correct`` (default) its
    returned ``P`` is re-derived from the solved gain via the exact
    discrete Lyapunov equation and any input-bound violation is folded
    into the feasibility residual.
    """
    if method == "auto":
        return _solve_detuned_dare(
            model, q_lift, r, psi, u_max, detune_grid, detune_bisect,
            polish_iters,
        )
    a, b = model.A, model.B
    nlift = a.shape[-1]
    m = b.shape[-1]
    dtype = a.dtype
    r_mat = jnp.atleast_2d(jnp.asarray(r, dtype))
    sqrt_q = jnp.sqrt(jnp.maximum(q_lift, 0.0)) if q_lift.ndim == 2 else jnp.diag(
        jnp.sqrt(jnp.maximum(q_lift, 0.0))
    )
    # matrix sqrt of a diagonal-ish Q_lift: the reference uses sqrtm of a
    # diagonal matrix (Revise_2:340), i.e. elementwise sqrt on the diagonal
    sqrt_q = jnp.where(
        jnp.eye(nlift, dtype=bool), jnp.sqrt(jnp.maximum(q_lift, 0.0)), 0.0
    ) if q_lift.ndim == 2 else sqrt_q
    sqrt_r = jnp.sqrt(r_mat)

    # ---- DARE warm start: P satisfies the decrease LMI with equality ----
    p0 = solve_dare_doubling(a, b, q_lift, r_mat)
    k0 = -dlqr_gain(a, b, q_lift, r_mat, p0)  # u = K z convention (ref :361)
    gamma0 = jnp.maximum(psi @ p0 @ psi, 1.0) * 2.0
    q1_0 = gamma0 * spd_inverse(p0, eps=1e-6)
    y1_0 = k0 @ q1_0
    x1_0 = jnp.diag(jnp.minimum(jnp.diag(y1_0 @ (spd_inverse(q1_0) @ y1_0.T)) * 1.5 + 1e-3, u_max**2 * 0.9))
    # stable softplus^-1: y + log(1 - exp(-y)) (≈ y for large y)
    g0 = jnp.maximum(gamma0, 1e-3)
    g_raw0 = g0 + jnp.log1p(-jnp.exp(-g0))
    v0 = _Vars(gamma_raw=g_raw0, x1=x1_0, q1_raw=q1_0, y1=y1_0)

    def objective(v: _Vars) -> Array:
        gamma, q1, x1, y1, lmi0, lmi1, lmi2, slack = _build_lmis(
            v, a, b, sqrt_q, sqrt_r, psi, u_max
        )
        pen = (
            _eig_penalty(lmi0)
            + _eig_penalty(lmi1, margin)
            + _eig_penalty(lmi2)
            + _eig_penalty(q1, 1e-6)
            + jnp.sum(jax.nn.relu(-slack) ** 2)
        )
        return gamma + penalty * pen

    opt = optax.adam(lr)

    def step(carry, _):
        v, opt_state = carry
        g = jax.grad(objective)(v)
        updates, opt_state = opt.update(g, opt_state)
        v = optax.apply_updates(v, updates)
        return (v, opt_state), None

    (v, _), _ = jax.lax.scan(step, (v0, opt.init(v0)), None, length=iters)

    gamma, q1, x1, y1, lmi0, lmi1, lmi2, slack = _build_lmis(
        v, a, b, sqrt_q, sqrt_r, psi, u_max
    )
    feas = jnp.maximum(
        jnp.maximum(-_min_eig(lmi0), -_min_eig(lmi2)),
        jnp.maximum(margin - _min_eig(lmi1), jnp.max(jax.nn.relu(-slack))),
    )
    q1_inv = spd_inverse(q1, eps=1e-9)
    k_out = y1 @ q1_inv
    p_out = gamma * q1_inv
    if lyapunov_correct:
        acl = a + b @ k_out
        q_cl = q_lift + k_out.T @ r_mat @ k_out
        p_out = solve_dlyap_doubling(acl, q_cl)
        gamma = jnp.maximum(gamma, psi @ p_out @ psi * 1.001)
        # Re-assert the input-bound certificate against the RETURNED pair:
        # the Schur-minimal X1 for (Q1_eff = gamma P^{-1}, Y1 = K Q1_eff)
        # is K Q1_eff K' = gamma K P^{-1} K', and LMI0 + the X1(j,j)
        # bound (Revise_2/Koopman_update.m:350-353) require its diagonal
        # <= u_max^2. The correction replaces P (and lifts gamma), so the
        # pre-correction X1 no longer certifies — fold any violation into
        # the reported feasibility residual.
        x1_min_diag = gamma * jnp.diag(
            k_out @ (spd_inverse(p_out, eps=1e-9) @ k_out.T)
        )
        feas = jnp.maximum(
            feas, jnp.max(jax.nn.relu(x1_min_diag - u_max**2))
        )
    return LMIResult(
        p=p_out,
        k=k_out,
        gamma=gamma,
        q1=q1,
        feasibility=feas,
    )


def _gamma_polish(
    a: Array,
    b: Array,
    sqrt_q: Array,
    sqrt_r: Array,
    psi: Array,
    u_max,
    q1_0: Array,
    y1_0: Array,
    gamma_0: Array,
    iters: int,
    mu: float = 5.0,
    newton_per_stage: int = 12,
):
    """Gamma descent on the binding case: a jittable log-det barrier
    interior-point solve of the FULL Revise_2 SDP, seeded strictly inside
    the feasible set from the detuned-DARE family optimum (VERDICT r4
    item 4 — a penalized Adam descent was tried first and stalled at the
    seed: gamma moved <2% in 4000 iterations; the barrier Newton method
    is the right tool, same algorithm family as the independently
    self-checked NumPy oracle ``eval/sdp_oracle.py::terminal_sdp_solve``).

    Branch-free port of the classic barrier method: a fixed geometric
    t-schedule (``iters`` outer stages, factor ``mu``), a fixed count of
    damped Newton steps per stage, and a 14-candidate backtracking line
    search selected with ``jnp.where`` on (strict feasibility AND Armijo
    decrease). Variables are the YALMIP set (gamma, X1, Q1, Y1) packed
    into one vector; the Hessian is exact via ``jax.hessian`` (the
    barrier is smooth on the interior). f64-oriented (slogdet/eigh);
    intended for offline synthesis and the CI optimality gate, not the
    per-step TPU path. Returns ``(p, k, gamma, ok)``; ``ok`` False keeps
    the family result."""
    nlift = a.shape[-1]
    m = b.shape[-1]
    dtype = a.dtype
    iu_x = jnp.triu_indices(m)
    iu_q = jnp.triu_indices(nlift)
    nx_v, nq_v = iu_x[0].size, iu_q[0].size

    def unpack(v):
        gamma = v[0]
        x1 = jnp.zeros((m, m), dtype).at[iu_x].set(v[1 : 1 + nx_v])
        x1 = x1 + jnp.triu(x1, 1).T
        q1 = jnp.zeros((nlift, nlift), dtype).at[iu_q].set(
            v[1 + nx_v : 1 + nx_v + nq_v]
        )
        q1 = q1 + jnp.triu(q1, 1).T
        y1 = v[1 + nx_v + nq_v :].reshape(m, nlift)
        return gamma, x1, q1, y1

    def lmis(v):
        gamma, x1, q1, y1 = unpack(v)
        lmi0 = jnp.block([[x1, y1], [y1.T, q1]])
        lmi1 = jnp.block(
            [[jnp.ones((1, 1), dtype), psi[None, :]], [psi[:, None], q1]]
        )
        aq_by = a @ q1 + b @ y1
        z_nn = jnp.zeros((nlift, nlift), dtype)
        z_nm = jnp.zeros((nlift, m), dtype)
        lmi2 = jnp.block(
            [
                [q1, aq_by.T, (sqrt_q @ q1).T, (sqrt_r @ y1).T],
                [aq_by, q1, z_nn, z_nm],
                [sqrt_q @ q1, z_nn,
                 gamma * jnp.eye(nlift, dtype=dtype), z_nm],
                [sqrt_r @ y1, z_nm.T, z_nm.T,
                 gamma * jnp.eye(m, dtype=dtype)],
            ]
        )
        slack = u_max**2 - jnp.diag(x1)
        return gamma, lmi0, lmi1, lmi2, q1, slack

    def barrier(v, t):
        gamma, lmi0, lmi1, lmi2, q1, slack = lmis(v)
        # margin-shifted LMI1 (the reference requires LMI1 >= 0.01 I)
        lmi1 = lmi1 - 0.01 * jnp.eye(lmi1.shape[-1], dtype=dtype)
        ld = (
            jnp.linalg.slogdet(lmi0)[1]
            + jnp.linalg.slogdet(lmi1)[1]
            + jnp.linalg.slogdet(lmi2)[1]
            + jnp.linalg.slogdet(q1)[1]
            + jnp.sum(jnp.log(jnp.maximum(slack, 1e-300)))
        )
        return t * gamma - ld

    def min_eig_all(v):
        _, lmi0, lmi1, lmi2, q1, slack = lmis(v)
        lmi1 = lmi1 - 0.01 * jnp.eye(lmi1.shape[-1], dtype=dtype)
        me = jnp.minimum(
            jnp.minimum(_min_eig(lmi0), _min_eig(lmi1)),
            jnp.minimum(_min_eig(lmi2), _min_eig(q1)),
        )
        return jnp.minimum(me, jnp.min(slack))

    # ---- strictly feasible seed: the polished family point sits ON the
    # input-bound boundary (binding case), so inflating gamma there
    # overshoots X1 past u_max^2. Build candidate seeds from EVERY
    # detuned-grid member (q1_0/y1_0/gamma_0 carry the (grid,) stacks) —
    # more detuned = smaller gain = strict input margin — inflate gamma
    # 1.5x, set the mid-box X1, and take the FIRST strictly interior one
    # (smallest s, closest to the optimum), the oracle's seeding rule. ----
    def build_seed(q1_i, y1_i, g_i):
        gamma_s = g_i * 1.5 + 1e-3
        q1_s = _sym(q1_i * 1.5)  # Q1 = gamma P^{-1} scales with gamma
        y1_s = y1_i * 1.5
        x1_lo = _sym(y1_s @ (spd_inverse(q1_s, eps=1e-12) @ y1_s.T))
        x1_s = 0.5 * (x1_lo + u_max**2 * jnp.eye(m, dtype=dtype))
        return jnp.concatenate(
            [gamma_s[None], x1_s[iu_x], q1_s[iu_q], y1_s.ravel()]
        )

    seeds = jax.vmap(build_seed)(q1_0, y1_0, gamma_0)
    strict = jax.vmap(min_eig_all)(seeds) > 1e-10
    seed_idx = jnp.argmax(strict)
    v0 = seeds[seed_idx]
    seed_ok = jnp.any(strict)

    nvar = v0.shape[0]
    nu = (m + nlift) + (nlift + 1) + (3 * nlift + m) + nlift + m
    alphas = 2.0 ** -jnp.arange(14, dtype=dtype)

    grad_f = jax.grad(barrier)
    hess_f = jax.hessian(barrier)

    def newton(v, t):
        g = grad_f(v, t)
        h = hess_f(v, t)
        scale = jnp.maximum(jnp.max(jnp.abs(h)), 1.0)
        dx = -gj_solve(
            h + (1e-12 * scale) * jnp.eye(nvar, dtype=dtype), g[:, None]
        )[:, 0]
        lam2 = -g @ dx
        f0 = barrier(v, t)
        cands = v[None, :] + alphas[:, None] * dx[None, :]
        feas = jax.vmap(min_eig_all)(cands) > 0
        fvals = jax.vmap(lambda c: barrier(c, t))(cands)
        armijo = fvals < f0 - 1e-4 * alphas * lam2
        ok = feas & armijo & jnp.isfinite(fvals)
        idx = jnp.argmax(ok)  # largest acceptable alpha
        v_new = jnp.where(jnp.any(ok), cands[idx], v)
        return v_new

    def stage(carry, _):
        v, t = carry
        def nstep(vv, _):
            return newton(vv, t), None
        v, _ = jax.lax.scan(nstep, v, None, length=newton_per_stage)
        return (v, t * mu), None

    t0 = jnp.maximum(nu / jnp.maximum(v0[0], 1.0), 1.0)
    (v, t_end), _ = jax.lax.scan(stage, (v0, t0), None, length=iters)

    gamma, x1, q1, y1 = unpack(v)
    # certify the endpoint exactly under the reference LMI set
    feasible = (min_eig_all(v) >= 0) & jnp.isfinite(gamma) & seed_ok
    q1_inv = spd_inverse(q1, eps=1e-12)
    k_out = y1 @ q1_inv
    p_out = _sym(gamma * q1_inv)
    return p_out, k_out, gamma, feasible


def _solve_detuned_dare(
    model: LinearModel,
    q_lift: Array,
    r: Array,
    psi: Array,
    u_max,
    grid: int,
    bisect: int,
    polish_iters: int = 0,
) -> LMIResult:
    """`method='auto'` body — see :func:`solve_terminal_lmi` docstring."""
    a, b = model.A, model.B
    nlift = a.shape[-1]
    dtype = a.dtype
    r_mat = jnp.atleast_2d(jnp.asarray(r, dtype))
    q_mat = q_lift if q_lift.ndim == 2 else jnp.diag(q_lift)
    # sqrtm of the (diagonal) Revise_2 Q_lift = elementwise sqrt on the diag
    sqrt_q = jnp.where(
        jnp.eye(nlift, dtype=bool), jnp.sqrt(jnp.maximum(q_mat, 0.0)), 0.0
    )
    sqrt_r = jnp.sqrt(r_mat)
    # tiny relative lift turns the LMI1/LMI2 equalities at the DARE point
    # into strict feasibility (roundoff headroom for the certificate check)
    lift = jnp.asarray(1.0 + 1e-6, dtype)

    def candidate(s):
        """(P_s, K_s, gamma_s, input-bound ok) for the R-detuned DARE."""
        p_s = solve_dare_doubling(a, b, q_mat, s * r_mat)
        k_s = -dlqr_gain(a, b, q_mat, s * r_mat, p_s)  # u = K z convention
        g_s = (psi @ p_s @ psi) * lift
        x1_diag = g_s * jnp.diag(k_s @ (spd_inverse(p_s, eps=1e-9) @ k_s.T))
        finite = jnp.all(jnp.isfinite(p_s)) & jnp.all(jnp.isfinite(k_s))
        ok = jnp.all(x1_diag <= u_max**2) & finite & (g_s >= 0)
        return p_s, k_s, g_s, ok

    # exact-optimum fast path: DARE point with the input bound slack
    p0, k0, g0, ok0 = candidate(jnp.asarray(1.0, dtype))

    # geometric grid s = 2^1 .. 2^grid for the binding case
    s_grid = jnp.asarray(2.0, dtype) ** jnp.arange(1, grid + 1, dtype=dtype)

    def grid_body(_, s):
        p_s, k_s, g_s, ok = candidate(s)
        return None, (p_s, k_s, g_s, ok)

    _, (ps, ks, gs, oks) = jax.lax.scan(grid_body, None, s_grid)
    any_ok = jnp.any(oks)
    # first feasible s (argmax returns the first True); fall back to the
    # largest s when none certifies (genuinely input-infeasible anchor)
    idx = jnp.where(any_ok, jnp.argmax(oks), grid - 1)
    s_hi = s_grid[idx]
    p_hi, k_hi, g_hi = ps[idx], ks[idx], gs[idx]

    # geometric bisection on [s_hi/2, s_hi]: gamma_s increases with s, so
    # shaving s toward the smallest feasible value minimizes gamma
    def bisect_body(carry, _):
        lo, hi, p_b, k_b, g_b = carry
        mid = jnp.sqrt(lo * hi)
        p_m, k_m, g_m, ok = candidate(mid)
        hi_n = jnp.where(ok, mid, hi)
        lo_n = jnp.where(ok, lo, mid)
        p_n = jnp.where(ok, p_m, p_b)
        k_n = jnp.where(ok, k_m, k_b)
        g_n = jnp.where(ok, g_m, g_b)
        return (lo_n, hi_n, p_n, k_n, g_n), None

    (_, _, p_b, k_b, g_b), _ = jax.lax.scan(
        bisect_body, (s_hi * 0.5, s_hi, p_hi, k_hi, g_hi), None,
        length=bisect,
    )
    # select: exact optimum when slack at DARE; else the polished detuned
    # pair when any certifies; else the max-detune candidate (violation
    # surfaces in the feasibility residual below)
    use_det = jnp.logical_and(~ok0, any_ok)
    p_out = jnp.where(ok0, p0, jnp.where(use_det, p_b, p_hi))
    k_out = jnp.where(ok0, k0, jnp.where(use_det, k_b, k_hi))
    gamma = jnp.where(ok0, g0, jnp.where(use_det, g_b, g_hi))

    if polish_iters > 0:
        # gamma-descent polish off the family manifold (binding case).
        # Seeds: a RIDGED-Q detuned grid — the unridged family members sit
        # exactly ON the LMI2 boundary (the Lyapunov slack (s-1) K'RK is
        # rank-1, singular in every other direction), so no barrier can
        # start from them; ridging Q by eps*I before the DARE makes the
        # slack eps*I + (s-1) K'RK strictly PD (the numeric oracle's
        # seeding rule, eval/sdp_oracle.py::terminal_sdp_solve). eps at
        # 1e-6*tr — the oracle's 1e-9 leaves an LMI2 margin ~2e-9 whose
        # 1/lambda^2 barrier curvature stalls the fixed-iteration Newton
        # (measured: gamma stuck at the seed; at 1e-6 it descends to
        # 1.018x the SDP optimum on the gated instance).
        eps_q = 1e-6 * jnp.maximum(jnp.trace(q_mat), 1.0)
        q_ridged = q_mat + eps_q * jnp.eye(nlift, dtype=dtype)

        def ridged_candidate(_, s):
            p_s = solve_dare_doubling(a, b, q_ridged, s * r_mat)
            k_s = -dlqr_gain(a, b, q_ridged, s * r_mat, p_s)
            g_s = psi @ p_s @ psi
            q1_s = _sym(g_s * spd_inverse(p_s, eps=1e-12))
            return None, (q1_s, k_s @ q1_s, g_s)

        _, (q1_grid, y1_grid, g_grid) = jax.lax.scan(
            ridged_candidate, None, s_grid
        )
        p_p, k_p, g_p, ok_p = _gamma_polish(
            a, b, sqrt_q, sqrt_r, psi, u_max,
            q1_grid, y1_grid, g_grid, polish_iters,
        )
        # accept only a certified IMPROVEMENT, and never on the slack
        # fast path (already exactly optimal there)
        take = (~ok0) & ok_p & (g_p < gamma)
        p_out = jnp.where(take, p_p, p_out)
        k_out = jnp.where(take, k_p, k_out)
        gamma = jnp.where(take, g_p, gamma)

    feas = _lmi_feasibility(
        a, b, sqrt_q, sqrt_r, psi, u_max, gamma, p_out, k_out
    )
    q1 = _sym(gamma * spd_inverse(p_out, eps=1e-9))
    return LMIResult(p=p_out, k=k_out, gamma=gamma, q1=q1, feasibility=feas)

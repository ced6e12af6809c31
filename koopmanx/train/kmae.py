"""L7 — KMAE (Koopman-consistent autoencoder) training.

Reference training loop (``DeepLearning_KoopmanControl_Approach3.py:378-566``):
per batch, re-encode the full dataset, EDMD-fit (A, B) *inside the graph*
(gradients flow through the least squares, SURVEY §3.3), blend
``A = eta*A_hat + (1-eta)*A_prev`` (eta = 0.5, :498-501), then minimize

  Loss = a1*L_rec + a2*L_lin + a3*L_pred + a4*sum|w|

with multi-step rollouts ``z_p = A^p z + sum_s A^{s-1} B u`` over
``pred_horizon`` steps (:503-538); after epoch 5 only L_rec is kept
(:549-552). Optimizer: Adam lr=1e-3 (:58).

TPU-first re-design:
  - the full-dataset re-encode per step is ONE batched matmul chain;
  - (A, B) come from a differentiable ``lstsq`` (QR-based — stable
    gradients, SURVEY §7.4) on the lifted Grams;
  - the multi-step loss is a ``lax.scan`` over the prediction horizon on a
    (batch, window, n) tensor of trajectory windows — no python loops;
  - data parallelism: grads are ``psum``-averaged across the mesh when run
    under ``shard_map`` (see dryrun_multichip).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..lifts.mlp import MLPParams, mlp_apply
from ..ops.linalg import spd_inverse
from ..types import LinearModel


@dataclasses.dataclass(frozen=True)
class KMAEConfig:
    pred_horizon: int = 6
    alpha_rec: float = 1.0
    alpha_lin: float = 50.0
    alpha_pred: float = 50.0
    alpha_l1: float = 1e-6
    eta: float = 0.5  # EDMD blend with previous (A, B)
    lr: float = 1e-3
    epochs: int = 20
    rec_only_after_epoch: Optional[int] = 5  # DeepLearning...py:549-552
    ridge: float = 1e-8  # tiny Tikhonov for the differentiable lstsq
    # Multi-step input accumulation. 'rollout' is the true linear rollout
    # z_p = A^p z_0 + sum_s A^{p-s} B u_{s-1} (what the reference's
    # INFERENCE-side loss report computes, duffing.py:201). 'legacy_train'
    # reproduces the reference TRAINING loop's different exponent
    # sum_s A^{s-1} B u_{s-1} (DeepLearning...py:525) — a reference quirk
    # (the two only agree for p=1), kept for behavioral parity experiments.
    lin_exponent: str = "rollout"


class KMAEParams(NamedTuple):
    encoder: MLPParams
    decoder: MLPParams


class KMAEState(NamedTuple):
    params: KMAEParams
    opt_state: Any
    a_prev: Array
    b_prev: Array


def differentiable_edmd(
    zx: Array, zy: Array, u: Array, ridge: float, axis_name: Optional[str] = None
) -> Tuple[Array, Array]:
    """(A, B) from ``min ||V K^T - Zy||`` with V = [Zx U] via the ridge-
    regularized normal equations (differentiable; gradients flow into Zx/Zy
    like the reference's pinv at DeepLearning...py:493-497).

    Under data-parallel shard_map (``axis_name`` set) the Gram matrices are
    psum-reduced across the mesh so every shard fits against the GLOBAL
    dataset — a per-shard fit would be underdetermined (local snapshot
    count < nlift + m) and is the wrong semantics anyway.
    """
    v = jnp.concatenate([zx, u], axis=-1)  # (S, N+m)
    d = v.shape[-1]
    g = v.T @ v
    vty = v.T @ zy
    if axis_name is not None:
        g = jax.lax.psum(g, axis_name)
        vty = jax.lax.psum(vty, axis_name)
    g = g + ridge * jnp.eye(d, dtype=v.dtype)
    # ridged Gram is SPD; spd_inverse avoids the TPU LU custom call and
    # is differentiable (pure elementary ops) for the KMAE backward pass
    k = (spd_inverse(g) @ vty).T  # (N, N+m)
    nlift = zx.shape[-1]
    return k[:, :nlift], k[:, nlift:]


def multi_step_loss(
    params: KMAEParams,
    a: Array,
    b: Array,
    x_win: Array,  # (B, H+1, n) trajectory windows
    u_win: Array,  # (B, H, m)
    cfg: KMAEConfig,
) -> Tuple[Array, Array, Array]:
    """L_rec, L_lin, L_pred over prediction windows, batched.

    L_lin_p = ||A^p z_0 + sum A^{p-s} B u_{s-1} - z_p||^2 (lifted rollout vs
    encoded truth), L_pred_p = ||Dec(rollout) - x_p||^2. Implemented as one
    scan carrying the rolled lifted state.
    """
    z_all = mlp_apply(params.encoder, x_win)  # (B, H+1, N)
    x_rec = mlp_apply(params.decoder, z_all[:, 0])  # reconstruct z_0
    l_rec = jnp.sum((x_rec - x_win[:, 0]) ** 2, axis=-1)  # (B,)

    u_t = jnp.swapaxes(u_win, 0, 1)  # (H, B, m)
    z_t = jnp.swapaxes(z_all[:, 1:], 0, 1)  # (H, B, N)
    x_t = jnp.swapaxes(x_win[:, 1:], 0, 1)  # (H, B, n)

    if cfg.lin_exponent == "legacy_train":
        # reference training quirk (DeepLearning...py:520-538):
        #   z_pred_p = A^p z_0 + sum_{s=1..p} A^{s-1} B u_{s-1}
        # (input powers INCREASE with s instead of decaying with horizon
        # distance). Carry (A^p z_0, A^{s-1} as a matrix, running input sum).
        n_lift = a.shape[-1]
        eye = jnp.eye(n_lift, dtype=a.dtype)

        def body(carry, inp):
            z0p, apow, acc = carry
            u_s, z_true_s, x_true_s = inp
            acc = acc + u_s @ (apow @ b).T
            z0p = z0p @ a.T
            z_pred = z0p + acc
            lin = jnp.sum((z_pred - z_true_s) ** 2, axis=-1)
            x_dec = mlp_apply(params.decoder, z_pred)
            pred = jnp.sum((x_dec - x_true_s) ** 2, axis=-1)
            return (z0p, a @ apow, acc), (lin, pred)

        z0 = z_all[:, 0]
        acc0 = jnp.zeros_like(z0)
        _, (lin, pred) = jax.lax.scan(body, (z0, eye, acc0), (u_t, z_t, x_t))
    else:

        def body(z, inp):
            u_s, z_true_s, x_true_s = inp
            z_next = z @ a.T + u_s @ b.T
            lin = jnp.sum((z_next - z_true_s) ** 2, axis=-1)
            x_dec = mlp_apply(params.decoder, z_next)
            pred = jnp.sum((x_dec - x_true_s) ** 2, axis=-1)
            return z_next, (lin, pred)

        _, (lin, pred) = jax.lax.scan(body, z_all[:, 0], (u_t, z_t, x_t))
    l_lin = jnp.mean(jnp.sum(lin, axis=0) / cfg.pred_horizon)
    l_pred = jnp.mean(jnp.sum(pred, axis=0) / cfg.pred_horizon)
    return jnp.mean(l_rec), l_lin, l_pred


def l1_penalty(params: KMAEParams) -> Array:
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(jnp.abs(p)) for p in leaves)


def kmae_loss(
    params: KMAEParams,
    a_prev: Array,
    b_prev: Array,
    x_snap: Array,  # (S, n) full snapshot set for the EDMD refit
    y_snap: Array,
    u_snap: Array,
    x_win: Array,
    u_win: Array,
    cfg: KMAEConfig,
    rec_only: bool = False,
    axis_name: Optional[str] = None,
):
    zx = mlp_apply(params.encoder, x_snap)
    zy = mlp_apply(params.encoder, y_snap)
    a_hat, b_hat = differentiable_edmd(zx, zy, u_snap, cfg.ridge, axis_name)
    a = cfg.eta * a_hat + (1.0 - cfg.eta) * a_prev  # DeepLearning...py:498-501
    b = cfg.eta * b_hat + (1.0 - cfg.eta) * b_prev
    l_rec, l_lin, l_pred = multi_step_loss(params, a, b, x_win, u_win, cfg)
    l1 = l1_penalty(params)
    if rec_only:
        loss = cfg.alpha_rec * l_rec
    else:
        loss = (
            cfg.alpha_rec * l_rec
            + cfg.alpha_lin * l_lin
            + cfg.alpha_pred * l_pred
            + cfg.alpha_l1 * l1
        )
    aux = {
        "l_rec": l_rec,
        "l_lin": l_lin,
        "l_pred": l_pred,
        "a": a,
        "b": b,
    }
    return loss, aux


def make_windows(x: Array, y: Array, u: Array, n_step: int, horizon: int):
    """Cut trajectory-major snapshots into (windows, H+1, n)/(windows, H, m)
    prediction windows that never cross trajectory boundaries."""
    n_traj = x.shape[0] // n_step
    n = x.shape[-1]
    m = u.shape[-1]
    xs = x.reshape(n_traj, n_step, n)
    ys = y.reshape(n_traj, n_step, n)
    us = u.reshape(n_traj, n_step, m)
    # states along each traj: [x_0..x_{T-1}, x_T] via last y
    full = jnp.concatenate([xs, ys[:, -1:, :]], axis=1)  # (n_traj, T+1, n)
    starts = jnp.arange(n_step - horizon)

    def windows_one(traj_x, traj_u):
        wx = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(traj_x, s, horizon + 1)
        )(starts)
        wu = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(traj_u, s, horizon)
        )(starts)
        return wx, wu

    wx, wu = jax.vmap(windows_one)(full, us)
    return wx.reshape(-1, horizon + 1, n), wu.reshape(-1, horizon, m)


def make_train_step(cfg: KMAEConfig, optimizer=None, axis_name: Optional[str] = None):
    """Build one jittable KMAE SGD step.

    If ``axis_name`` is given the gradient is psum-averaged across that
    mesh axis (data-parallel training over shard_map).
    """
    opt = optax.adam(cfg.lr) if optimizer is None else optimizer

    def train_step(
        state: KMAEState,
        x_snap,
        y_snap,
        u_snap,
        x_win,
        u_win,
        rec_only: bool = False,
    ):
        (loss, aux), grads = jax.value_and_grad(kmae_loss, has_aux=True)(
            state.params,
            state.a_prev,
            state.b_prev,
            x_snap,
            y_snap,
            u_snap,
            x_win,
            u_win,
            cfg,
            rec_only,
            axis_name,
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = KMAEState(
            params=params,
            opt_state=opt_state,
            a_prev=aux["a"],
            b_prev=aux["b"],
        )
        return new_state, loss, aux

    return train_step, opt


def init_state(
    key: Array,
    cfg: KMAEConfig,
    n: int,
    nlift: int,
    hidden: int = 100,
    dtype=jnp.float32,
    optimizer=None,
) -> KMAEState:
    from ..lifts.mlp import mlp_init

    ke, kd, ka, kb = jax.random.split(key, 4)
    enc = mlp_init(ke, (n, hidden, hidden, hidden, nlift), dtype=dtype)
    dec = mlp_init(kd, (nlift, hidden, hidden, hidden, n), dtype=dtype)
    params = KMAEParams(encoder=enc, decoder=dec)
    opt = optax.adam(cfg.lr) if optimizer is None else optimizer
    # The reference seeds the blend with uniform random (A, B)
    # (duffing.py:107-108) — spectral radius ~Nlift/2, which overflows the
    # multi-step rollout in f32. Scale to spectral radius <~0.5; the first
    # eta-blend with the EDMD refit washes the init out either way.
    a0 = jax.random.uniform(ka, (nlift, nlift), dtype=dtype) / nlift
    b0 = jax.random.uniform(kb, (nlift, 1), dtype=dtype) / nlift
    return KMAEState(
        params=params, opt_state=opt.init(params), a_prev=a0, b_prev=b0
    )

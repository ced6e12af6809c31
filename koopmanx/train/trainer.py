"""KMAE training driver + checkpoint/resume.

Reference loop shape (DeepLearning_KoopmanControl_Approach3.py:462-563):
20 epochs x 100 minibatches; each minibatch re-fits (A, B) by EDMD over the
FULL dataset and backprops the blended multi-step loss over a window slice;
after epoch 5 only the reconstruction term is kept; final artifacts are a
full-model pickle + .mat weight export (:565-566).

TPU-first: one jitted train step (minibatch windows are a gather), scanned
epochs on-device if desired; checkpoints via numpy .npz (pytree flatten) +
the reference-schema ``.mat`` export so trained encoders round-trip into
the MATLAB-side tooling (L8 interchange).
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..lifts.io import save_mat_mlp
from ..systems.data import Snapshots
from .kmae import (
    KMAEConfig,
    KMAEState,
    init_state,
    make_train_step,
    make_windows,
)


def save_checkpoint(path: str, state: KMAEState, step: int) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path,
        step=step,
        n_leaves=len(leaves),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_checkpoint(path: str, template: KMAEState) -> Tuple[KMAEState, int]:
    data = np.load(path)
    _, treedef = jax.tree_util.tree_flatten(template)
    n = int(data["n_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves), int(data["step"])


def fit(
    data: Snapshots,
    n_step: int,
    cfg: KMAEConfig = KMAEConfig(),
    nlift: int = 8,
    hidden: int = 100,
    seed: int = 0,
    batch_windows: int = 256,
    dtype=jnp.float32,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    log_every: int = 1,
    verbose: bool = True,
    optimizer=None,
    eval_callback: Optional[Callable[[KMAEState, int], float]] = None,
    eval_every: int = 5,
):
    """Train θ_E/θ_D on trajectory-major snapshots.

    Returns (state, history) where history is a list of per-epoch dicts.

    ``optimizer`` — any optax GradientTransformation (e.g. adam on a cosine
    schedule); defaults to the reference's constant-lr Adam
    (DeepLearning_KoopmanControl_Approach3.py:58).

    ``eval_callback(state, epoch) -> score`` — run every ``eval_every``
    epochs (and after the last); the state with the LOWEST score is the one
    returned (best-checkpoint selection on a validation metric — e.g. the
    downstream open-loop RMSE — instead of last-epoch weights). The scores
    land in history as ``val_score``.
    """
    n = data.x.shape[-1]
    key = jax.random.PRNGKey(seed)
    k_init, k_shuffle = jax.random.split(key)
    state = init_state(
        k_init, cfg, n=n, nlift=nlift, hidden=hidden, dtype=dtype,
        optimizer=optimizer,
    )
    start_epoch = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        state, start_epoch = load_checkpoint(checkpoint_path, state)

    x_snap = data.x.astype(dtype)
    y_snap = data.y.astype(dtype)
    u_snap = data.u.astype(dtype)
    x_win, u_win = make_windows(x_snap, y_snap, u_snap, n_step, cfg.pred_horizon)
    n_win = x_win.shape[0]

    train_step, _ = make_train_step(cfg, optimizer=optimizer)
    # two jitted variants (rec_only is a python bool branching the loss)
    step_full = jax.jit(
        lambda s, xw, uw: train_step(s, x_snap, y_snap, u_snap, xw, uw, False)
    )
    step_rec = jax.jit(
        lambda s, xw, uw: train_step(s, x_snap, y_snap, u_snap, xw, uw, True)
    )

    steps_per_epoch = max(1, n_win // batch_windows)
    history = []
    best_state, best_score = None, float("inf")

    def maybe_eval(epoch, rec):
        nonlocal best_state, best_score
        if eval_callback is None:
            return
        score = float(eval_callback(state, epoch))
        rec["val_score"] = score
        if score < best_score:
            best_score, best_state = score, state
            rec["val_best"] = True
        if verbose:
            print(f"  [val] epoch {epoch}: score={score:.5g} "
                  f"(best {best_score:.5g})")

    for epoch in range(start_epoch, cfg.epochs):
        rec_only = (
            cfg.rec_only_after_epoch is not None
            and epoch > cfg.rec_only_after_epoch
        )
        k_shuffle, k_ep = jax.random.split(k_shuffle)
        perm = jax.random.permutation(k_ep, n_win)
        losses = []
        for b in range(steps_per_epoch):
            idx = perm[b * batch_windows : (b + 1) * batch_windows]
            xw = x_win[idx]
            uw = u_win[idx]
            fn = step_rec if rec_only else step_full
            state, loss, aux = fn(state, xw, uw)
            losses.append(float(loss))
        rec = {
            "epoch": epoch,
            "loss": float(np.mean(losses)),
            "l_rec": float(aux["l_rec"]),
            "l_lin": float(aux["l_lin"]),
            "l_pred": float(aux["l_pred"]),
            "rec_only": rec_only,
        }
        if verbose and epoch % log_every == 0:
            print(
                f"epoch {epoch}: loss={rec['loss']:.4f} "
                f"(rec {rec['l_rec']:.4f} lin {rec['l_lin']:.4f} "
                f"pred {rec['l_pred']:.4f}){' [rec-only]' if rec_only else ''}"
            )
        if (epoch + 1) % eval_every == 0 or epoch == cfg.epochs - 1:
            maybe_eval(epoch, rec)
        history.append(rec)
        if checkpoint_path and (epoch + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, state, epoch + 1)
    if best_state is not None:
        # best-checkpoint selection: what we RETURN (and callers export)
        # must be what the on-disk checkpoint holds — saving the
        # last-epoch state here would silently diverge from the published
        # weights on the next resume/load
        if checkpoint_path:
            save_checkpoint(checkpoint_path, best_state, cfg.epochs)
        return best_state, history
    if checkpoint_path:
        save_checkpoint(checkpoint_path, state, cfg.epochs)
    return state, history


def export_weights(state: KMAEState, path_prefix: str) -> None:
    """Write encoder/decoder in the reference ``.mat`` schema
    (duffing.py:61-64: W (out,in), b (1,out))."""
    save_mat_mlp(path_prefix + "_encoder.mat", state.params.encoder)
    save_mat_mlp(path_prefix + "_decoder.mat", state.params.decoder)


def evaluate(
    state: KMAEState,
    data: Snapshots,
    n_step: int,
    cfg: KMAEConfig = KMAEConfig(),
    dtype=jnp.float32,
) -> dict:
    """Inference-side loss report on fresh data (the reference's
    no-backward harness, duffing.py:179-235: recompute L_rec/L_lin/L_pred
    once and print)."""
    from .kmae import kmae_loss

    x = data.x.astype(dtype)
    y = data.y.astype(dtype)
    u = data.u.astype(dtype)
    x_win, u_win = make_windows(x, y, u, n_step, cfg.pred_horizon)
    loss, aux = kmae_loss(
        state.params, state.a_prev, state.b_prev, x, y, u, x_win, u_win, cfg
    )
    return {
        "loss": float(loss),
        "l_rec": float(aux["l_rec"]),
        "l_lin": float(aux["l_lin"]),
        "l_pred": float(aux["l_pred"]),
    }

"""L6 — result archiving and run checkpointing.

The reference persists results as ``.mat`` bundles
(``DuffingPlotrealtime.mat`` with logX/logR/A_error/... keys,
``duffing.py:1015``; ``savemat`` calls listed in SURVEY §2.1
"Persistence"). This module writes the same quantities as ``.npz`` (native)
and ``.mat`` (interchange, reference-compatible key names), and
saves/loads arbitrary pytrees (closed-loop carries, RLS states) for
checkpoint/resume — a capability the reference lacks entirely (SURVEY §5).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree: Any, meta: int = 0) -> None:
    """Serialize any pytree of arrays to ``.npz`` (flattened leaves)."""
    leaves, _ = jax.tree_util.tree_flatten(tree)
    np.savez(
        path,
        __meta__=meta,
        __n_leaves__=len(leaves),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_pytree(path: str, template: Any) -> Tuple[Any, int]:
    """Load a pytree saved by :func:`save_pytree` using ``template`` for
    structure; returns (tree, meta)."""
    data = np.load(path)
    _, treedef = jax.tree_util.tree_flatten(template)
    n = int(data["__n_leaves__"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves), int(data["__meta__"])


def archive_run(path: str, log, h: float = 0.05, mat: bool = False) -> None:
    """Write a closed-loop StepLog as a results bundle.

    ``.npz`` always; with ``mat=True`` additionally writes ``<path>.mat``
    using the reference's key vocabulary (duffing.py:1015:
    logX (n, T), logR, T_EX, A_error/B_error/C_error, tspan) so MATLAB-side
    tooling consuming the reference bundles can read ours.
    """
    t = np.asarray(log.x).shape[0]
    tspan = h * np.arange(t)
    arrays = {
        "x": np.asarray(log.x),
        "u": np.asarray(log.u),
        "r": np.asarray(log.r),
        "drift_a": np.asarray(log.drift_a),
        "drift_b": np.asarray(log.drift_b),
        "drift_c": np.asarray(log.drift_c),
        "residual": np.asarray(log.residual),
        "qp_primal_res": np.asarray(log.qp_primal_res),
        "lyapunov": np.asarray(log.lyapunov),
        "tspan": tspan,
    }
    # Revise_2 certificate monitor series (zeros unless terminal synthesis
    # was on; field names mirror the reference collections)
    for field in (
        "gamma", "eps_state", "eps_op", "compensator",
        "gamma_margin", "compare_state", "minus_set", "ellipse",
    ):
        if hasattr(log, field):
            arrays[field] = np.asarray(getattr(log, field))
    np.savez(path, **arrays)
    if mat:
        import scipy.io as sio

        sio.savemat(
            str(path) + ".mat",
            {
                "tspan": tspan,
                "logX": arrays["x"].T,  # reference stores states column-major
                "logU": arrays["u"].T,
                "logR": arrays["r"].T,
                "T_EX": tspan,
                "A_error": arrays["drift_a"],
                "B_error": arrays["drift_b"],
                "C_error": arrays["drift_c"],
                "epsilon_Set": arrays.get("eps_state", arrays["residual"]),
                "V_Set": arrays["lyapunov"],
                # Revise_2 collections (Koopman_update.m:251-254, :369-387)
                "Gamma_Collection": arrays.get("gamma", np.zeros(t)),
                "Gamma_Set": arrays.get("gamma_margin", np.zeros(t)),
                "Compensator": arrays.get(
                    "compensator", np.zeros((t, 1))
                ).T,
                "Compare_State": arrays.get("compare_state", np.zeros(t)),
                "Minus_Set": arrays.get("minus_set", np.zeros(t)),
            },
        )

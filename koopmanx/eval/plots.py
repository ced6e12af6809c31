"""L6 — plotting (the reference's matplotlib figure set, SURVEY §2.1).

Each function takes logged arrays and an optional matplotlib Axes; figures
mirror the reference's: tracking with/without update overlay
(duffing.py:1031-1051), lifted-coordinate panels (:346-390), drift curves
(:1100s), input trace, phase portrait with invariant-ellipsoid section
(Revise_2/Koopman_update.m:521-535). Import of matplotlib is deferred so
headless/production paths never pay for it.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def tracking(
    x,
    r,
    h: float = 0.05,
    x_compare=None,
    labels=("online update", "static model"),
    channel: int = 0,
    ax=None,
):
    """Tracking trajectory vs reference; optionally overlay a second run
    (the reference's central with/without-update comparison figure)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    t = h * np.arange(np.asarray(x).shape[0])
    ax.plot(t, np.asarray(x)[:, channel], label=labels[0], linewidth=2.0)
    if x_compare is not None:
        ax.plot(
            t,
            np.asarray(x_compare)[:, channel],
            label=labels[1],
            linewidth=1.5,
            alpha=0.8,
        )
    ax.plot(
        t,
        np.asarray(r)[:, 0],
        linestyle="--",
        label="reference",
        linewidth=1.5,
    )
    ax.set_xlabel("$t/s$")
    ax.set_ylabel(f"$x_{channel + 1}$")
    ax.grid(True)
    ax.legend()
    return ax


def lifted_coordinates(z_traj, h: float = 0.05, ncols: int = 4, fig=None):
    """Panel per lifted coordinate Ψ_i(x) (duffing.py:346-369)."""
    plt = _plt()
    z = np.asarray(z_traj)
    nlift = z.shape[1]
    nrows = -(-nlift // ncols)
    if fig is None:
        fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 2 * nrows))
    else:
        axes = fig.subplots(nrows, ncols)
    t = h * np.arange(z.shape[0])
    for i in range(nlift):
        ax = np.asarray(axes).ravel()[i]
        ax.plot(t, z[:, i])
        ax.set_ylabel(f"$\\Psi_{{{i + 1}}}$")
        ax.grid(True)
    fig.tight_layout()
    return fig


def drift_curves(drift_a, drift_b, drift_c, h: float = 0.05, ax=None):
    """Per-step model-drift norms (duffing.py:985-990)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    t = h * np.arange(len(np.asarray(drift_a)))
    ax.semilogy(t, np.asarray(drift_a), label="$\\|A_{k+1}-A_k\\|$")
    ax.semilogy(t, np.asarray(drift_b), label="$\\|B_{k+1}-B_k\\|$")
    ax.semilogy(t, np.asarray(drift_c), label="$\\|C_{k+1}-C_k\\|$")
    ax.set_xlabel("$t/s$")
    ax.grid(True)
    ax.legend()
    return ax


def input_trace(u, h: float = 0.05, bounds=None, ax=None):
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    u = np.asarray(u)
    t = h * np.arange(u.shape[0])
    ax.plot(t, u[:, 0], label="$u$")
    if bounds is not None:
        ax.axhline(bounds[0], linestyle=":", color="r")
        ax.axhline(bounds[1], linestyle=":", color="r")
    ax.set_xlabel("$t/s$")
    ax.set_ylabel("$u$")
    ax.grid(True)
    return ax


def phase_portrait(x, ellipsoid: Optional[np.ndarray] = None, center=None, ax=None):
    """(x1, x2) phase plot with optional invariant-ellipsoid section: given
    the 2x2 section matrix E (from chol(C P C'/gamma)), draws
    {c + E^{-1} [cos t; sin t]} (Revise_2/Koopman_update.m:521-535)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    x = np.asarray(x)
    ax.plot(x[:, 0], x[:, 1], linewidth=1.5)
    ax.scatter([x[0, 0]], [x[0, 1]], marker="o", c="g", label="start")
    ax.scatter([x[-1, 0]], [x[-1, 1]], marker="x", c="r", label="end")
    if ellipsoid is not None:
        th = np.linspace(0, 2 * np.pi, 200)
        circ = np.stack([np.cos(th), np.sin(th)])
        pts = np.linalg.solve(np.asarray(ellipsoid), circ)
        c = np.zeros(2) if center is None else np.asarray(center)
        ax.plot(c[0] + pts[0], c[1] + pts[1], "k--", label="invariant set")
    ax.set_xlabel("$x_1$")
    ax.set_ylabel("$x_2$")
    ax.grid(True)
    ax.legend()
    return ax


def save_figure_bundle(prefix: str, log, h: float = 0.05, u_bounds=None):
    """Write the standard figure set for a closed-loop run."""
    plt = _plt()
    ax = tracking(log.x, log.r, h)
    ax.figure.savefig(f"{prefix}_tracking.png", dpi=120)
    plt.close(ax.figure)
    ax = drift_curves(log.drift_a, log.drift_b, log.drift_c, h)
    ax.figure.savefig(f"{prefix}_drift.png", dpi=120)
    plt.close(ax.figure)
    ax = input_trace(log.u, h, u_bounds)
    ax.figure.savefig(f"{prefix}_input.png", dpi=120)
    plt.close(ax.figure)
    ax = phase_portrait(log.x)
    ax.figure.savefig(f"{prefix}_phase.png", dpi=120)
    plt.close(ax.figure)

"""L4 — condensed (dense) MPC QP construction.

Reference formulation (``Tank_System.m:116-159`` and
``Revise_2/Koopman_update.m:113-189``): prediction matrices

  F1 = [Cy C A; Cy C A^2; ...; Cy C A^N]              (N*py, nz)
  F2 = block-lower-triangular Toeplitz of Cy C A^{j-1} B  (N*py, N*m)

cost  H = F2' Qbar F2 + Rbar  (symmetrized), linear term
  f = 2 (F1 z0)' Qbar F2 - 2 Yr' Qbar F2,
solved as ``quadprog(2H, f, ...)``.

TPU-first: the reference rebuilds these with O(N) dense matrix-power loops
per control step (``Tank_System.m:272-290``). Here the Markov parameters
``Cy C A^{j-1} B`` and the rows ``Cy C A^i`` come from a single
``lax.scan`` (sequential in N but each step is one small GEMM), the
Toeplitz assembly is one masked gather (no python loops), and everything is
``vmap``-able over scenario-batched models — the flop-heavy per-step
rebuild the survey flags (§7.4) becomes a batched fused kernel.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..types import LinearModel, QPData


class PredictionMatrices(NamedTuple):
    f1: Array  # (N*py, nz)
    f2: Array  # (N*py, N*m)


def markov_scan(a: Array, b: Array, cy_c: Array, horizon: int):
    """One scan producing (rows of F1, Markov parameters).

    carry G_j = Cy C A^j; at step j (0-based) emits
      row_j   = Cy C A^{j+1}     (F1 row block)
      markov_j = (Cy C A^j) B    (F2 Toeplitz generator)
    """

    def body(g, _):
        g_next = g @ a  # Cy C A^{j+1}
        return g_next, (g_next, g @ b)

    _, (rows, markov) = jax.lax.scan(body, cy_c, None, length=horizon)
    return rows, markov  # (N, py, nz), (N, py, m)


def prediction_matrices(
    model: LinearModel,
    horizon: int,
    cy: Optional[Array] = None,
    method: str = "dag",
) -> PredictionMatrices:
    """Build F1/F2 for a (possibly Δu-augmented) model.

    ``cy`` selects tracked outputs from ``C z`` (``Cy = [0 1]``,
    Tank_System.m:113); ``None`` tracks the full output ``C z``.
    ``method``: 'dag' (default — log-depth per-row binary composition,
    relayout-free under vmap, the fastest on TPU), 'doubling' (log-depth
    power-stack concatenation), 'assoc' (associative_scan; slow lowering,
    kept for study) or 'scan' (linear-depth recursion, bitwise-closest to
    the reference's power loop).
    """
    c = model.C
    cy_c = c if cy is None else cy @ c
    py = cy_c.shape[-2]
    nz = model.A.shape[-1]
    m = model.B.shape[-1]

    if method == "doubling":
        rows, markov = markov_doubling(model.A, model.B, cy_c, horizon)
    elif method == "assoc":
        rows, markov = markov_assoc(model.A, model.B, cy_c, horizon)
    elif method == "dag":
        rows, markov = markov_dag(model.A, model.B, cy_c, horizon)
    else:
        rows, markov = markov_scan(model.A, model.B, cy_c, horizon)
    f1 = rows.reshape(horizon * py, nz)

    # F2[i, j] = markov[i - j] for i >= j (block indices), else 0.
    idx_i = jnp.arange(horizon)[:, None]
    idx_j = jnp.arange(horizon)[None, :]
    diff = idx_i - idx_j  # (N, N)
    mask = (diff >= 0).astype(markov.dtype)
    blocks = markov[jnp.clip(diff, 0, horizon - 1)]  # (N, N, py, m)
    blocks = blocks * mask[:, :, None, None]
    f2 = blocks.transpose(0, 2, 1, 3).reshape(horizon * py, horizon * m)
    return PredictionMatrices(f1=f1, f2=f2)


def augment_delta_u(model: LinearModel) -> LinearModel:
    """Δu (incremental-input) augmentation (``Tank_System.m:107-112``):
    state becomes [z; u], decision becomes Δu:
      A <- [A B; 0 I], B <- [B; I], C <- [C 0].
    """
    nz, m = model.B.shape[-2], model.B.shape[-1]
    p = model.C.shape[-2]
    dtype = model.A.dtype
    a_aug = jnp.block(
        [
            [model.A, model.B],
            [jnp.zeros((m, nz), dtype), jnp.eye(m, dtype=dtype)],
        ]
    )
    b_aug = jnp.concatenate([model.B, jnp.eye(m, dtype=dtype)], axis=-2)
    c_aug = jnp.concatenate([model.C, jnp.zeros((p, m), dtype)], axis=-1)
    return LinearModel(A=a_aug, B=b_aug, C=c_aug)


def weight_bar(q_block: Array, horizon: int, terminal: Optional[Array] = None) -> Array:
    """``Qbar = kron(I_N, Q)`` with optional terminal-block override
    (``Revise_2/Koopman_update.m:379-381`` injects ``C P C'`` into the last
    block; ``VDP_Revise_2`` injects full ``P``)."""
    py = q_block.shape[-1]
    qbar = jnp.kron(jnp.eye(horizon, dtype=q_block.dtype), q_block)
    if terminal is not None:
        qbar = qbar.at[-py:, -py:].set(terminal)
    return qbar


def condensed_qp(
    pred: PredictionMatrices,
    z0: Array,
    yr: Array,
    qbar: Array,
    rbar: Array,
    u_min: Array,
    u_max: Array,
    a_ineq: Optional[Array] = None,
    l_ineq: Optional[Array] = None,
    u_ineq: Optional[Array] = None,
) -> QPData:
    """Assemble the OSQP-standard-form QP for one control step.

    Matches the reference cost exactly: quadprog(2H, f) with
    H = F2' Qbar F2 + Rbar (symmetrized, Tank_System.m:152-153) and
    f = 2 (F1 z0 - Yr)' Qbar F2 (Tank_System.m:157) — i.e.
    P = 2H, q = f in 1/2 x'Px + q'x form.

    ``yr`` is the stacked reference (N*py,); box bounds become identity
    constraint rows, extra linear inequalities (e.g. the Tank's input-sum
    constraint, Tank_System.m:147-150, or Revise_2 state boxes) append rows.
    """
    f1, f2 = pred
    h = f2.T @ qbar @ f2 + rbar
    h = 0.5 * (h + h.T)
    err = f1 @ z0 - yr
    q = 2.0 * (f2.T @ (qbar @ err))
    p = 2.0 * h

    nx = f2.shape[-1]
    eye = jnp.eye(nx, dtype=f2.dtype)
    if a_ineq is None:
        a = eye
        l = jnp.broadcast_to(u_min, (nx,))
        u = jnp.broadcast_to(u_max, (nx,))
    else:
        a = jnp.concatenate([eye, a_ineq], axis=0)
        l = jnp.concatenate(
            [jnp.broadcast_to(u_min, (nx,)), l_ineq], axis=0
        )
        u = jnp.concatenate(
            [jnp.broadcast_to(u_max, (nx,)), u_ineq], axis=0
        )
    return QPData(P=p, q=q, A=a, l=l, u=u)


def markov_doubling(a: Array, b: Array, cy_c: Array, horizon: int):
    """Markov parameters + F1 rows with log-depth doubling.

    The scan in :func:`markov_scan` is ``horizon`` sequential tiny GEMMs —
    inside the closed-loop time scan that sequential chain dominates
    latency. Doubling builds the power stack [A^1..A^N] in ceil(log2 N)
    rounds of progressively wider batched matmuls (stack @ A^(2^k)), then
    gets all rows/Markov params with two einsums:

      rows_j   = CyC A^{j+1}
      markov_j = (CyC A^j) B

    Identical results (up to float reassociation), ~4x shorter critical
    path and MXU-friendlier shapes.
    """
    # power stack [A^1] -> [A^1..A^2] -> ... (doubling) -> [A^1..A^N]
    powers = a[None]  # (1, nz, nz)
    while powers.shape[0] < horizon:
        top = powers[-1]  # A^(len)
        powers = jnp.concatenate([powers, powers @ top], axis=0)
    powers = powers[:horizon]  # A^1..A^N
    return _rows_markov_from_powers(powers, b, cy_c)


def _rows_markov_from_powers(powers: Array, b: Array, cy_c: Array):
    """(rows, markov) from the stack [A^1..A^N]."""
    nz = powers.shape[-1]
    eye = jnp.eye(nz, dtype=powers.dtype)
    pow0 = jnp.concatenate([eye[None], powers[:-1]], axis=0)  # A^0..A^(N-1)
    cyc_pows = jnp.einsum("pn,jnk->jpk", cy_c, pow0)  # (N, py, nz) CyC A^j
    markov = cyc_pows @ b  # (N, py, m)
    rows = jnp.einsum("pn,jnk->jpk", cy_c, powers)  # (N, py, nz) CyC A^{j+1}
    return rows, markov


def markov_assoc(a: Array, b: Array, cy_c: Array, horizon: int):
    """Markov parameters via ``lax.associative_scan`` on a broadcast stack.

    Same log-depth critical path as :func:`markov_doubling`, but the power
    stack is built by XLA's associative-scan lowering on one fixed-shape
    (N, nz, nz) buffer instead of progressively wider concatenations —
    under vmap the concatenation rounds force physical relayout copies of
    the whole batched stack between rounds (the dominant copy cost seen in
    the per-op TPU profile), which this formulation avoids.
    """
    stack = jnp.broadcast_to(a, (horizon,) + a.shape)
    powers = jax.lax.associative_scan(jnp.matmul, stack)  # A^1..A^N
    return _rows_markov_from_powers(powers, b, cy_c)


def markov_dag(a: Array, b: Array, cy_c: Array, horizon: int):
    """Markov parameters via a per-row binary-composition DAG.

    Builds the binary power ladder A^(2^r) (log N squarings), then each
    row g_j = CyC A^j individually as g_{j-2^r} @ A^(2^r) — a log-depth
    DAG of (py, nz) @ (nz, nz) products — and stacks the rows once. Unlike
    the doubling rounds there is no progressively wider concatenation, so
    under vmap XLA inserts no whole-stack relayout copies (the dominant
    copy cost in the per-op TPU profile of the doubling build); every
    intermediate is a (py, nz) row, not an (N, nz, nz) stack.
    """
    ladder = [a]  # A^(2^r)
    # must contain A^(2^r) for r = floor(log2(horizon)), i.e. horizon.bit_length()
    # entries — `< horizon` under-built it for exact powers of two.
    while len(ladder) < horizon.bit_length():
        top = ladder[-1]
        ladder.append(top @ top)
    g = [cy_c]  # g_j = CyC A^j
    for j in range(1, horizon + 1):
        r = j.bit_length() - 1  # largest 2^r <= j
        g.append(g[j - (1 << r)] @ ladder[r])
    rows = jnp.stack(g[1:], axis=0)  # (N, py, nz) CyC A^{j+1}
    markov = jnp.stack(g[:horizon], axis=0) @ b  # (N, py, m) (CyC A^j) B
    return rows, markov

"""L3 — online recursive-least-squares (rank-one Sherman–Morrison) updates.

Reference semantics reproduced:
  - ``[A B]`` update: ``K_A += z+ [z;u]^T`` and
    ``invG <- invG - (invG v v^T invG) / (1 + v^T invG v)``
    (``duffing.py:927-938``, ``Tank_System.m:233-248``), with the
    ``Revise_2`` forgetting-factor generalization
    ``invG <- (1/λ)(invG - (invG v v^T invG)/(λ + v^T invG v))``
    (``Revise_2/Koopman_update.m:270-273``).
  - ``C`` update: same scheme on ``(barX, barQ)`` with observation pair
    ``(x_target, z)`` (``duffing.py:942-953``). NOTE the Python scripts
    pair the *next* plant state with the lift of the *current* state
    (``bar_X += x_loc @ xlift^T``, duffing.py:943) while the MATLAB loops
    pair a state with its own lift (``Tank_System.m:259``). The engine
    chooses which pair to feed; this module is pairing-agnostic.

Initialization variants (SURVEY §2.1): scaled identity with
c ∈ {1e2, 1e4, 1e5} or warm start from the batch Gram
(``Revise_2/Koopman_update.m:264-265``).

Numerical-stability note (f32 / long horizons): the raw SM recursion drifts
off symmetry; ``symmetrize=True`` re-symmetrizes the inverse Grams each step
— cheap (two tiny adds) and keeps 10^4-step f32 runs sane (SURVEY §7.4).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
from jax import Array

from ..types import LinearModel, RLSState
from .batch import GramStats


def rls_init(
    nlift: int,
    m: int,
    n: int,
    c_ab: float = 1e4,
    c_c: float = 1e2,
    dtype=jnp.float32,
) -> RLSState:
    """Scaled-identity initialization: ``invG = c_ab I``, ``barQ = c_c I``
    (duffing.py:929-946 uses pinv(1e-4 I) = 1e4 I and 100 I;
    vanderpol.py:874,888 uses 1e5; Tank_System.m:237,255 uses 1e4)."""
    return RLSState(
        K_A=jnp.zeros((nlift, nlift + m), dtype=dtype),
        invG=c_ab * jnp.eye(nlift + m, dtype=dtype),
        barX=jnp.zeros((n, nlift), dtype=dtype),
        barQ=c_c * jnp.eye(nlift, dtype=dtype),
    )


def rls_init_from_grams(stats: GramStats, rcond: Optional[float] = None) -> RLSState:
    """Warm start from batch statistics: ``K_A = Zy^T V``,
    ``invG = pinv(V^T V)`` (Revise_2/Koopman_update.m:264-265), and the
    analogous C-side warm start."""
    return RLSState(
        K_A=stats.syv,
        invG=jnp.linalg.pinv(stats.gvv, rcond=rcond),
        barX=stats.sxz,
        barQ=jnp.linalg.pinv(stats.gzz, rcond=rcond),
    )


def _sm_downdate(inv_g: Array, v: Array, lam: float) -> Array:
    """One Sherman–Morrison step on an inverse Gram:
    ``invG' = (1/λ)(invG − (invG v)(invG v)^T / (λ + v^T invG v))``.

    Written with a single matrix-vector product (``gv``) so the batched
    (vmapped) version is two small GEMVs + one outer product per scenario —
    exactly the shape the VPU/MXU likes.
    """
    gv = inv_g @ v  # (d,)
    denom = lam + v @ gv
    return (inv_g - jnp.outer(gv, gv) / denom) / lam


def rls_update_ab(
    state: RLSState,
    z: Array,
    u: Array,
    z_next: Array,
    lam: float = 1.0,
    symmetrize: bool = False,
) -> RLSState:
    """Rank-one update of the ``[A B]`` regression with observation
    ``(v=[z;u], ζ=z_next)`` (duffing.py:932-937)."""
    v = jnp.concatenate([z, u], axis=-1)
    inv_g = _sm_downdate(state.invG, v, lam)
    if symmetrize:
        inv_g = 0.5 * (inv_g + inv_g.T)
    k_a = state.K_A + jnp.outer(z_next, v)
    return state._replace(K_A=k_a, invG=inv_g)


def rls_update_c(
    state: RLSState,
    z: Array,
    x_target: Array,
    lam: float = 1.0,
    symmetrize: bool = False,
) -> RLSState:
    """Rank-one update of the output regression ``C z ≈ x`` with pair
    ``(z, x_target)`` (duffing.py:942-953)."""
    bar_q = _sm_downdate(state.barQ, z, lam)
    if symmetrize:
        bar_q = 0.5 * (bar_q + bar_q.T)
    bar_x = state.barX + jnp.outer(x_target, z)
    return state._replace(barX=bar_x, barQ=bar_q)


class StorageState(NamedTuple):
    """Carry for the 'storage method' online refit (duffing_RBF.py:404-438):
    accumulate raw Grams and re-pinv every step. Equivalent to keeping the
    full growing snapshot buffers (the Grams are sufficient statistics), but
    static-shape and O(d^2) memory instead of O(S·d)."""

    syv: Array  # (N, N+m)
    gvv: Array  # (N+m, N+m)
    sxz: Array  # (n, N)
    gzz: Array  # (N, N)


def storage_init(stats: GramStats) -> StorageState:
    return StorageState(stats.syv, stats.gvv, stats.sxz, stats.gzz)


def storage_update(
    state: StorageState, z: Array, u: Array, z_next: Array, x_target: Array
) -> StorageState:
    v = jnp.concatenate([z, u], axis=-1)
    return StorageState(
        syv=state.syv + jnp.outer(z_next, v),
        gvv=state.gvv + jnp.outer(v, v),
        sxz=state.sxz + jnp.outer(x_target, z),
        gzz=state.gzz + jnp.outer(z, z),
    )


def storage_model(state: StorageState, nlift: int) -> LinearModel:
    k_ext = state.syv @ jnp.linalg.pinv(state.gvv)
    c = state.sxz @ jnp.linalg.pinv(state.gzz)
    return LinearModel(A=k_ext[..., :, :nlift], B=k_ext[..., :, nlift:], C=c)

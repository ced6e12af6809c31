"""Polynomial dictionaries: Hermite tensor products and monomials.

Reference: ``DeepLearning_KoopmanControl_Approach3.py:207-224`` builds a
25-function tensor-product Hermite dictionary over (x1, x2); the monomial
lift ``[x; x1 x2; x1 x2^2; x1^2 x2]`` is the commented option at
``Revise_2/Koopman_update.m:66``.

Note on the reference's recurrence: its ``Hermite(0, x)`` falls through to
the generic branch and evaluates to ``2x + 2`` rather than the standard
``H0 = 1`` (DeepLearning...py:207-213). We implement the standard physicists'
Hermite by default and reproduce the reference behavior under
``reference_quirk=True`` so parity fixtures can be matched exactly.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from .base import Dictionary


def hermite_sequence(x: Array, degree: int, reference_quirk: bool = False):
    """Return [H0(x), ..., H_degree(x)] (physicists' Hermite)."""
    if reference_quirk:
        # H_{-1} = H_{-2} = 1 seeds; H0 = 2x + 2; H1 = 2x; Hn per recurrence.
        hm2 = jnp.ones_like(x)
        hm1 = jnp.ones_like(x)
        seq = []
        for nn in range(degree + 1):
            if nn == 1:
                h = 2.0 * x
            else:
                h = 2.0 * x * hm1 - 2.0 * (nn - 1) * hm2
            seq.append(h)
            hm2, hm1 = hm1, h
        return seq
    seq = [jnp.ones_like(x)]
    if degree >= 1:
        seq.append(2.0 * x)
    for nn in range(2, degree + 1):
        seq.append(2.0 * x * seq[-1] - 2.0 * (nn - 1) * seq[-2])
    return seq


def hermite_dictionary(
    degree: int = 4, reference_quirk: bool = False
) -> Dictionary:
    """Tensor-product Hermite dictionary over 2-D states: (degree+1)^2
    functions H_i(x1) * H_j(x2) (DeepLearning...py:215-224)."""
    nlift = (degree + 1) ** 2

    def apply_fn(params, x: Array) -> Array:
        del params
        hx = hermite_sequence(x[..., 0], degree, reference_quirk)
        hy = hermite_sequence(x[..., 1], degree, reference_quirk)
        # reference order: j (y-degree) outer, i (x-degree) inner
        feats = [hx[i] * hy[j] for j in range(degree + 1) for i in range(degree + 1)]
        return jnp.stack(feats, axis=-1)

    return Dictionary(apply_fn, None, nlift=nlift, n=2)


def monomial_dictionary() -> Dictionary:
    """ψ(x) = [x1, x2, x1 x2, x1 x2^2, x1^2 x2]
    (Revise_2/Koopman_update.m:66, commented variant)."""

    def apply_fn(params, x: Array) -> Array:
        del params
        x1, x2 = x[..., 0], x[..., 1]
        return jnp.stack([x1, x2, x1 * x2, x1 * x2**2, x1**2 * x2], axis=-1)

    return Dictionary(apply_fn, None, nlift=5, n=2)

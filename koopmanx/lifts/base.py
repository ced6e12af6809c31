"""L2 — lifting dictionaries ψ: R^n -> R^N.

A :class:`Dictionary` is a registered pytree holding a pure apply function
(static) and its parameter pytree (traced), so dictionaries flow through
``jit``/``vmap``/``grad``/``shard_map`` like any other JAX value. Encoders
used by the reference (MLP ``duffing.py:17-44``, RBF ``rbf.m``, Hermite
``DeepLearning_KoopmanControl_Approach3.py:207-224``, state-augmented
``Revise_2/Koopman_update.m:64-70``) are all instances.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import Array


@jax.tree_util.register_pytree_node_class
class Dictionary:
    """ψ(x) with optional decoder. ``apply(params, x)`` maps (..., n) ->
    (..., nlift); ``decode(decode_params, z)`` maps back when present."""

    def __init__(
        self,
        apply_fn: Callable[[Any, Array], Array],
        params: Any,
        nlift: int,
        n: int,
        decode_fn: Optional[Callable[[Any, Array], Array]] = None,
        decode_params: Any = None,
    ):
        self.apply_fn = apply_fn
        self.params = params
        self.nlift = nlift
        self.n = n
        self.decode_fn = decode_fn
        self.decode_params = decode_params

    def __call__(self, x: Array) -> Array:
        return self.apply_fn(self.params, x)

    def decode(self, z: Array) -> Array:
        if self.decode_fn is None:
            raise ValueError("this dictionary has no decoder")
        return self.decode_fn(self.decode_params, z)

    @property
    def has_decoder(self) -> bool:
        return self.decode_fn is not None

    # pytree protocol: params are children, functions/sizes are aux data
    def tree_flatten(self):
        return (self.params, self.decode_params), (
            self.apply_fn,
            self.nlift,
            self.n,
            self.decode_fn,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        apply_fn, nlift, n, decode_fn = aux
        params, decode_params = children
        return cls(apply_fn, params, nlift, n, decode_fn, decode_params)

    def replace_params(self, params: Any, decode_params: Any = None) -> "Dictionary":
        return Dictionary(
            self.apply_fn,
            params,
            self.nlift,
            self.n,
            self.decode_fn,
            self.decode_params if decode_params is None else decode_params,
        )


def identity_dictionary(n: int) -> Dictionary:
    """ψ(x) = x (``Revise_2/Koopman_update.m:65`` commented option)."""
    return Dictionary(lambda p, x: x, None, nlift=n, n=n)


def constant_augmented(n: int) -> Dictionary:
    """ψ(x) = [x; 1] — the affine Koopman lift.

    The constant function is a Koopman eigenfunction (eigenvalue 1), so an
    affine model ``x+ = A x + B u + d`` is EXACTLY the linear lifted model
    ``[[A, d], [0, 1]]`` on this dictionary. Used by the local-linearization
    MPC baseline (:mod:`koopmanx.engine.local_linear`) to run the
    reference's Jacobian-model comparison (``duffing.py:691-706``) through
    the SAME condensed-QP engine as every Koopman controller."""

    def apply_fn(params, x):
        one = jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
        return jnp.concatenate([x, one], axis=-1)

    return Dictionary(apply_fn, None, nlift=n + 1, n=n)


def state_augmented(inner: Dictionary, zero_offset: bool = False) -> Dictionary:
    """ψ(x) = [x; inner(x)], optionally minus its value at 0.

    Reproduces ``liftFun = @(x) [x; Encoder(x)] - [0; Encoder(0)]``
    (``Revise_2/Koopman_update.m:67``) and the un-offset variant
    ``One_Dimensional_Toy_Example_Continuous_System.m:25``.
    """
    n = inner.n

    def apply_fn(params, x):
        z = jnp.concatenate([x, inner.apply_fn(params, x)], axis=-1)
        if zero_offset:
            zero = jnp.zeros(x.shape[-1:], dtype=x.dtype)
            z0 = jnp.concatenate(
                [zero, inner.apply_fn(params, zero)], axis=-1
            )
            z = z - z0
        return z

    return Dictionary(apply_fn, inner.params, nlift=n + inner.nlift, n=n)


def zero_offset(inner: Dictionary) -> Dictionary:
    """ψ(x) = inner(x) - inner(0)."""

    def apply_fn(params, x):
        zero = jnp.zeros((inner.n,), dtype=x.dtype)
        return inner.apply_fn(params, x) - inner.apply_fn(params, zero)

    return Dictionary(apply_fn, inner.params, nlift=inner.nlift, n=inner.n)


def normalized(inner: Dictionary, mean: Array, scale: Array) -> Dictionary:
    """ψ'(x) = (ψ(x) - mean) / scale — lifted-feature standardization.

    Not in the reference (its f64 pinv papers over the conditioning), but
    essential on TPU: raw thinplate/NN features span orders of magnitude,
    pushing the EDMD/RLS Gram condition number past what f32 carries. With
    unit-variance features the square-root RLS stays accurate in f32
    (the production precision). Statistics come from the training
    snapshots via :func:`fit_normalizer`.
    """

    def apply_fn(params, x):
        inner_params, mu, sc = params
        return (inner.apply_fn(inner_params, x) - mu) / sc

    return Dictionary(
        apply_fn,
        (inner.params, mean, scale),
        nlift=inner.nlift,
        n=inner.n,
        decode_fn=inner.decode_fn,
        decode_params=inner.decode_params,
    )


def fit_normalizer(inner: Dictionary, x_samples: Array, eps: float = 1e-6):
    """Compute (mean, scale) of the lifted features over training states."""
    z = inner(x_samples)
    mu = jnp.mean(z, axis=0)
    sc = jnp.maximum(jnp.std(z, axis=0), eps)
    return mu, sc

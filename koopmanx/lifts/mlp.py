"""MLP encoder/decoder lift (the θ_E/θ_D autoencoder).

Reference architecture (``duffing.py:17-44``): Encoder
2→100→100→100→8 with ReLU between layers, Decoder 8→100→100→100→2.
The MATLAB forward pass against exported ``.mat`` weights
(``Encoder_Tank.m``, ``Revise_2/Encoder_Duffing.m``: ``poslin`` = ReLU)
uses the same weight convention: ``W_i`` of shape (out, in), ``b_i`` of
shape (1, out) — that convention is preserved by the importer in
:mod:`koopmanx.lifts.io`.

TPU note: params are a flat list of ``(W, b)``; the batched forward over
thousands of scenarios is a chain of (batch, hidden) matmuls which XLA maps
straight onto the MXU — no Pallas needed for this op.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from .base import Dictionary

MLPParams = List[Tuple[Array, Array]]  # [(W (out,in), b (out,)), ...]


def mlp_apply(params: MLPParams, x: Array) -> Array:
    """ReLU MLP forward; linear final layer. x: (..., in) -> (..., out)."""
    h = x
    for w, b in params[:-1]:
        h = jax.nn.relu(h @ w.T + b)
    w, b = params[-1]
    return h @ w.T + b


def mlp_init(
    key: Array, sizes: Sequence[int], dtype=jnp.float32, scale: str = "he"
) -> MLPParams:
    """Initialize an MLP with layer ``sizes`` (e.g. (2, 100, 100, 100, 8))."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for k, fan_in, fan_out in zip(keys, sizes[:-1], sizes[1:]):
        if scale == "he":
            std = jnp.sqrt(2.0 / fan_in)
        else:
            std = 1.0 / jnp.sqrt(fan_in)
        w = std * jax.random.normal(k, (fan_out, fan_in), dtype=dtype)
        b = jnp.zeros((fan_out,), dtype=dtype)
        params.append((w, b))
    return params


def encoder_dictionary(params: MLPParams, n: int) -> Dictionary:
    nlift = params[-1][0].shape[0]
    return Dictionary(mlp_apply, params, nlift=nlift, n=n)


def autoencoder_dictionary(
    enc_params: MLPParams, dec_params: MLPParams, n: int
) -> Dictionary:
    nlift = enc_params[-1][0].shape[0]
    return Dictionary(
        mlp_apply,
        enc_params,
        nlift=nlift,
        n=n,
        decode_fn=mlp_apply,
        decode_params=dec_params,
    )


def reference_autoencoder_sizes(n: int = 2, nlift: int = 8, hidden: int = 100):
    """The reference autoencoder dims (duffing.py:21-38)."""
    enc = (n, hidden, hidden, hidden, nlift)
    dec = (nlift, hidden, hidden, hidden, n)
    return enc, dec

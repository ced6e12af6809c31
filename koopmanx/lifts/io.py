"""Weight interchange (L8): ``.mat`` and torch-pickle importers/exporters.

The de-facto interchange schema (SURVEY §5): ``W1..Wk`` with shape
(out, in) and ``b1..bk`` with shape (1, out) — produced by
``duffing.py:61-64`` and consumed by the MATLAB encoders
(``Encoder_Tank.m:2-5``). Pretrained artifacts in the reference repo:
``Weights/Tank_New.mat`` (3 layers), ``Revise_2/duffing_weights.mat``,
``VDP_Revise_2/Good_VDP.mat``, ``One_Dimensional_System22.mat`` (4 layers),
and full-model pickles ``AutoEncoder_*.pkl``.
"""
from __future__ import annotations

import io
import pickle
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .mlp import MLPParams


def load_mat_mlp(path: str, dtype=jnp.float32) -> MLPParams:
    """Load ``W1..Wk / b1..bk`` MLP weights from a ``.mat`` file."""
    import scipy.io as sio

    data = sio.loadmat(path)
    params: MLPParams = []
    i = 1
    while f"W{i}" in data:
        w = np.asarray(data[f"W{i}"], dtype=np.float64)
        b = np.asarray(data[f"b{i}"], dtype=np.float64).reshape(-1)
        params.append((jnp.asarray(w, dtype), jnp.asarray(b, dtype)))
        i += 1
    if not params:
        raise ValueError(f"no W1..Wk keys found in {path}")
    return params


def save_mat_mlp(path: str, params: MLPParams) -> None:
    """Export MLP weights in the reference's ``.mat`` schema
    (mirrors duffing.py:61-64: W (out,in), b (1,out))."""
    import scipy.io as sio

    out = {}
    for i, (w, b) in enumerate(params, start=1):
        out[f"W{i}"] = np.asarray(w)
        out[f"b{i}"] = np.asarray(b).reshape(1, -1)
    sio.savemat(path, out)


class _TorchStubUnpickler(pickle.Unpickler):
    """Resolve ``__main__.AutoEncoder``-style classes in reference pickles
    without importing the original training script."""

    def find_class(self, module, name):
        if name in ("AutoEncoder", "Encoder", "Decoder"):
            import torch.nn as nn

            return type(name, (nn.Module,), {})
        return super().find_class(module, name)


def load_torch_autoencoder(
    path: str, dtype=jnp.float32
) -> Tuple[MLPParams, MLPParams]:
    """Extract (encoder_params, decoder_params) from a reference full-model
    torch pickle (``torch.load('AutoEncoder_*.pkl')``, duffing.py:57).

    Returns weights in the (out, in)/(out,) convention of
    :func:`koopmanx.lifts.mlp.mlp_apply`.
    """
    import torch

    with open(path, "rb") as f:
        model = torch.load(
            f, map_location="cpu", pickle_module=_StubPickleModule, weights_only=False
        )
    state = model.state_dict()
    enc: MLPParams = []
    dec: MLPParams = []
    for key in sorted(
        (k for k in state if k.endswith(".weight")),
        key=lambda k: (k.split(".")[0], int(k.split(".")[1])),
    ):
        prefix = key[: -len(".weight")]
        w = state[key].detach().cpu().numpy()
        b = state[prefix + ".bias"].detach().cpu().numpy()
        pair = (jnp.asarray(w, dtype), jnp.asarray(b, dtype))
        if key.startswith("Encoder"):
            enc.append(pair)
        else:
            dec.append(pair)
    return enc, dec


class _StubPickleModule:
    """Minimal pickle-module shim handing torch our stub unpickler."""

    Unpickler = _TorchStubUnpickler

    @staticmethod
    def load(f, **kwargs):
        return _TorchStubUnpickler(f).load()

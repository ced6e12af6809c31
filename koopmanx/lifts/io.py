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


_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _Stub:
    """Generic stand-in for any pickled torch object (nn.Module subclasses,
    Sequential, Linear, activations, ...). torch modules pickle as plain
    ``__dict__`` state, so recording it is enough to walk the tree."""

    def __init__(self, *args, **kwargs):  # REDUCE-with-args torch objects
        self.__dict__["_args"] = args
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # pragma: no cover - tuple-state torch objects
            self.__dict__["_state"] = state


def _rebuild_tensor_v2(storage, offset, size, stride, *_):
    """numpy re-implementation of ``torch._utils._rebuild_tensor_v2``:
    view into the flat storage buffer with element strides."""
    flat, dtype = storage
    if not size:
        return np.asarray(flat[offset], dtype=dtype)
    itemsize = np.dtype(dtype).itemsize
    view = np.lib.stride_tricks.as_strided(
        flat[offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return np.array(view)  # own the memory


def _rebuild_parameter(data, *_):
    return data


class _TorchFreeUnpickler(pickle.Unpickler):
    """Storage-level unpickler for torch-zip checkpoints — NO torch import.

    Resolves every ``torch.*`` global to either a numpy rebuild function, a
    storage-dtype marker, or a generic :class:`_Stub`; ``persistent_load``
    materializes storages straight from the zip's ``data/<key>`` entries as
    numpy arrays. Training-script classes (``__main__.AutoEncoder`` etc.)
    become stubs too, so the original script is never needed.
    """

    def __init__(self, file, read_record):
        super().__init__(file)
        self._read_record = read_record

    def find_class(self, module, name):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _STORAGE_DTYPES[name]
        if module == "collections" and name == "OrderedDict":
            return __import__("collections").OrderedDict
        if module == "builtins" and name in (
            "set", "frozenset", "dict", "list", "tuple", "complex",
            "bytearray", "slice", "range",
        ):
            return getattr(__import__("builtins"), name)
        # any other torch class, or the training script's own classes —
        # NEVER execute foreign code from the (untrusted) checkpoint
        return type(name, (_Stub,), {"__module__": module})

    def persistent_load(self, pid):
        # ('storage', dtype-or-StorageClass, key, location, numel)
        assert pid[0] == "storage", f"unknown persistent id {pid!r}"
        _, storage_type, key, _location, numel = pid
        dtype = (
            storage_type
            if isinstance(storage_type, type) and issubclass(storage_type, np.generic)
            else np.float32
        )
        raw = self._read_record(str(key))
        flat = np.frombuffer(raw, dtype=dtype, count=int(numel))
        return (flat, dtype)


def _walk_parameters(obj, prefix=""):
    """Flatten a stubbed nn.Module tree into a ``state_dict``-style mapping
    (the pickled module stores children in ``_modules`` and tensors in
    ``_parameters``/``_buffers``)."""
    out = {}
    d = getattr(obj, "__dict__", {})
    for store in ("_parameters", "_buffers"):
        for name, val in (d.get(store) or {}).items():
            if val is not None:
                out[prefix + name] = np.asarray(val)
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            out.update(_walk_parameters(child, prefix + name + "."))
    return out


def load_torch_state_dict(path: str) -> dict:
    """Read a torch-zip checkpoint (``torch.save(model)``, post-1.6 zip
    container) into a flat ``{name: np.ndarray}`` dict without importing
    torch: unzip ``data.pkl``, unpickle with torch globals stubbed, and
    decode each ``data/<key>`` storage with ``np.frombuffer``."""
    import zipfile

    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        root = pkl_name[: -len("data.pkl")]

        def read_record(key: str) -> bytes:
            return zf.read(f"{root}data/{key}")

        with zf.open(pkl_name) as f:
            obj = _TorchFreeUnpickler(io.BytesIO(f.read()), read_record).load()
    if isinstance(obj, dict):  # torch.save(model.state_dict())
        return {k: np.asarray(v) for k, v in obj.items() if v is not None}
    return _walk_parameters(obj)


def load_torch_autoencoder(
    path: str, dtype=jnp.float32
) -> Tuple[MLPParams, MLPParams]:
    """Extract (encoder_params, decoder_params) from a reference full-model
    torch pickle (``torch.load('AutoEncoder_*.pkl')``, duffing.py:57) —
    torch-free (storage-level unpickling of the zip container).

    Returns weights in the (out, in)/(out,) convention of
    :func:`koopmanx.lifts.mlp.mlp_apply`.
    """
    state = load_torch_state_dict(path)
    enc: MLPParams = []
    dec: MLPParams = []
    for key in sorted(
        (k for k in state if k.endswith(".weight")),
        key=lambda k: (k.split(".")[0], int(k.split(".")[1])),
    ):
        prefix = key[: -len(".weight")]
        w = np.asarray(state[key], dtype=np.float64)
        b = np.asarray(state[prefix + ".bias"], dtype=np.float64).reshape(-1)
        pair = (jnp.asarray(w, dtype), jnp.asarray(b, dtype))
        if key.startswith("Encoder"):
            enc.append(pair)
        else:
            dec.append(pair)
    return enc, dec

"""Torch checkpoint reader without a torch runtime dependency.

The reference loads ``.pth``/``.bin`` checkpoints via ``torch.load``
(e.g. reference image/vit.py:250, text/bert.py:67-70). To keep torch out of the
runtime dependency set (SURVEY.md §7 hard part 1), this module implements a
minimal unpickler for the ``torch.save`` zip format: the archive holds
``<name>/data.pkl`` plus one raw little-endian buffer per storage under
``<name>/data/<key>``; tensors are rebuilt with
``torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)``.

Falls back to ``torch.load`` (if importable) for legacy non-zip pickles.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

try:  # bf16/fp8 numpy dtypes ship with JAX
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "BFloat16Storage": _BFLOAT16,
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}


class _StorageType:
    def __init__(self, name: str):
        self.dtype = _STORAGE_DTYPES[name]


class _LazyStorage:
    def __init__(self, zf: zipfile.ZipFile, entry: str, dtype: np.dtype):
        self._zf, self._entry, self.dtype = zf, entry, dtype
        self._arr: np.ndarray | None = None

    @property
    def array(self) -> np.ndarray:
        if self._arr is None:
            buf = self._zf.read(self._entry)
            self._arr = np.frombuffer(buf, dtype=self.dtype)
        return self._arr


def _rebuild_tensor(storage: _LazyStorage, offset, size, stride, *_args) -> np.ndarray:
    arr = storage.array
    if not size:
        return arr[offset:offset + 1].reshape(()).copy()
    itemsize = arr.itemsize
    strides = tuple(s * itemsize for s in stride)
    out = np.lib.stride_tricks.as_strided(arr[offset:], shape=tuple(size), strides=strides)
    out = np.ascontiguousarray(out)
    if _BFLOAT16 is not None and out.dtype == _BFLOAT16:
        out = out.astype(np.float32)
    return out


def _noop(*args, **kwargs):
    return None


class _Stub:
    """Inert container for benign non-tensor metadata (e.g. argparse.Namespace)."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)


# Safe non-torch globals seen in real checkpoints. Anything else raises:
# a checkpoint from an arbitrary repo tag must never reach
# pickle.Unpickler.find_class, which would let __reduce__ payloads execute
# arbitrary code (the hazard torch.load(weights_only=True) guards against).
_np_multiarray = getattr(np, "_core", np.core).multiarray
_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("argparse", "Namespace"): _Stub,  # e.g. DETR training checkpoints carry 'args'
    ("numpy.core.multiarray", "_reconstruct"): _np_multiarray._reconstruct,
    ("numpy.core.multiarray", "scalar"): _np_multiarray.scalar,
    ("numpy._core.multiarray", "_reconstruct"): _np_multiarray._reconstruct,
    ("numpy._core.multiarray", "scalar"): _np_multiarray.scalar,
    ("numpy", "ndarray"): np.ndarray,
    ("numpy", "dtype"): np.dtype,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file, encoding="latin1")
        self._zf, self._prefix = zf, prefix

    def find_class(self, module: str, name: str):
        if name in _STORAGE_DTYPES:
            return _StorageType(name)
        if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor
        if name == "_rebuild_parameter":
            return lambda data, *_: data
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module.startswith("torch"):
            return _noop  # device specs, size hints, hooks — irrelevant to data
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name}: not on the checkpoint allowlist")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid[0], pid[1], pid[2], pid[3], pid[4]
        assert kind == "storage", f"unknown persistent id {pid!r}"
        dtype = storage_type.dtype
        if dtype is None:
            raise ValueError("bfloat16 checkpoint requires ml_dtypes")
        return _LazyStorage(self._zf, f"{self._prefix}data/{key}", dtype)


def load_torch_checkpoint(path: str) -> dict:
    """Load a ``torch.save`` checkpoint as a dict of numpy arrays."""
    if zipfile.is_zipfile(path):
        zf = zipfile.ZipFile(path)
        pkl = next(n for n in zf.namelist() if n.endswith("/data.pkl") or n == "data.pkl")
        prefix = pkl[: -len("data.pkl")]
        return _Unpickler(io.BytesIO(zf.read(pkl)), zf, prefix).load()
    # legacy torch serialization — delegate to torch when available
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sd

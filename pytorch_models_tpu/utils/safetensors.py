"""Minimal safetensors reader (no dependency on the safetensors package).

Format: 8-byte little-endian header length, a JSON header mapping tensor name
-> {"dtype", "shape", "data_offsets": [start, end]} (offsets relative to the
end of the header), then the raw little-endian buffers. Modern HF repos often
ship only ``model.safetensors``; the reference predates this and reads
``pytorch_model.bin`` only.
"""

from __future__ import annotations

import json
import struct

import numpy as np

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = None

_DTYPES = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": _BF16,
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "BOOL": np.dtype(np.bool_),
}


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Load a .safetensors file as a dict of numpy arrays (bf16 -> fp32)."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
        data = f.read()

    out: dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dtype = _DTYPES[meta["dtype"]]
        if dtype is None:
            raise ValueError(f"bf16 tensor {name!r} requires ml_dtypes")
        start, end = meta["data_offsets"]
        count = (end - start) // dtype.itemsize
        arr = np.frombuffer(data, dtype=dtype, count=count, offset=start).reshape(meta["shape"])
        if _BF16 is not None and arr.dtype == _BF16:
            arr = arr.astype(np.float32)
        out[name] = arr
    return out

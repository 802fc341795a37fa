"""Oracle utilities: the mounted PyTorch reference is the parity baseline.

Tests build a reference model and ours from the *same* synthetic checkpoint
(random values, correct source format/keys) and compare outputs — validating
both the numerics and the converters, including their quirks (qkv split,
LayerScale folding, weight-norm reversal, ...). This mirrors the reference's
own EnCodec round-trip pattern (reference tests/audio/test_encodec.py:36-50).
"""

from __future__ import annotations

import numpy as np
import pytest

try:
    import torch

    torch.manual_seed(0)
    HAS_TORCH = True
except ImportError:  # pragma: no cover
    HAS_TORCH = False


def require_reference():
    """Import the mounted PyTorch reference package or skip."""
    if not HAS_TORCH:
        pytest.skip("torch unavailable")
    try:
        import pytorch_models  # noqa: F401
        import pytorch_models.audio  # noqa: F401
        import pytorch_models.audio2text  # noqa: F401
        import pytorch_models.image  # noqa: F401
        import pytorch_models.text  # noqa: F401

        return pytorch_models
    except ImportError:
        pytest.skip("reference repo unavailable")


def t(x: np.ndarray):
    import torch

    x = np.asarray(x)
    if x.ndim:  # ascontiguousarray promotes 0-d to 1-d — keep scalars 0-d
        x = np.ascontiguousarray(x)
    return torch.from_numpy(x)


def rng(seed: int = 0) -> np.random.Generator:
    return np.random.default_rng(seed)


def randn(r: np.random.Generator, *shape, scale: float = 1.0) -> np.ndarray:
    return (r.standard_normal(shape) * scale).astype(np.float32)


def max_abs_diff(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))

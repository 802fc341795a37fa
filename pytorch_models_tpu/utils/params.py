"""Pytree parameter utilities and checkpoint state-dict handling.

The reference converts checkpoints by in-place ``Tensor.copy_`` into module
attributes and prints leftover keys (e.g. reference image/vit.py:306,
text/bert.py:107). Here converters are pure functions ``state_dict -> pytree``;
:class:`StateDict` enforces the stricter MobileViT-style contract that every
source tensor is consumed (reference image/mobile_vit.py:184-186).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_MISSING = object()


def to_np(x: Any) -> np.ndarray:
    """Convert a torch tensor / jax array / array-like to a numpy array."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "detach"):  # torch.Tensor without importing torch
        x = x.detach()
        if hasattr(x, "cpu"):
            x = x.cpu()
        # contiguous float conversion handles bf16 torch tensors
        if hasattr(x, "float") and str(getattr(x, "dtype", "")) == "torch.bfloat16":
            x = x.float()
        return x.numpy()
    return np.asarray(x)


class StateDict:
    """A source checkpoint wrapper with strict-consumption semantics.

    ``pop`` returns numpy arrays; ``finalize`` raises if any key is left over,
    upgrading the reference's debug-print pattern (image/vit.py:199-200) to the
    hard assert it uses for MobileViT (image/mobile_vit.py:184-186).
    """

    def __init__(self, d: dict[str, Any]):
        self._d = dict(d)

    def __contains__(self, key: str) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    def keys(self):
        return self._d.keys()

    def pop(self, key: str, default: Any = _MISSING) -> np.ndarray:
        if key not in self._d:
            if default is _MISSING:
                raise KeyError(f"missing checkpoint key: {key!r}")
            return default
        return to_np(self._d.pop(key))

    def pop_linear(self, key_prefix: str, bias: bool = True, transpose: bool = True) -> dict:
        """Pop a torch ``nn.Linear``'s (out,in) weight [+bias] as a JAX (in,out) kernel."""
        w = self.pop(f"{key_prefix}.weight")
        p = {"w": w.T if transpose else w}
        if bias:
            p["b"] = self.pop(f"{key_prefix}.bias")
        return p

    def pop_ln(self, key_prefix: str) -> dict:
        return {"scale": self.pop(f"{key_prefix}.weight"), "bias": self.pop(f"{key_prefix}.bias")}

    def pop_conv2d(self, key_prefix: str, bias: bool = True) -> dict:
        """Pop a torch ``nn.Conv2d`` OIHW weight as an HWIO kernel."""
        w = self.pop(f"{key_prefix}.weight")
        p = {"w": np.transpose(w, (2, 3, 1, 0))}
        if bias:
            p["b"] = self.pop(f"{key_prefix}.bias")
        return p

    def pop_conv1d(self, key_prefix: str, bias: bool = True) -> dict:
        """Pop a torch ``nn.Conv1d`` (out,in,k) weight as a (k,in,out) kernel."""
        w = self.pop(f"{key_prefix}.weight")
        p = {"w": np.transpose(w, (2, 1, 0))}
        if bias:
            p["b"] = self.pop(f"{key_prefix}.bias")
        return p

    def finalize(self) -> None:
        if self._d:
            raise ValueError(f"unconsumed checkpoint keys: {sorted(self._d.keys())}")


def stack_layers(layers: list) -> Any:
    """Stack a list of identical per-layer param pytrees along a new leading axis.

    This turns the reference's ``nn.Sequential`` of layers (transformer.py:133-176)
    into the stacked-params layout consumed by ``lax.scan``.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def cast_tree(tree: Any, dtype) -> Any:
    """Cast all floating leaves of a param pytree to ``dtype`` (e.g. bf16 for bench)."""
    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(_cast, tree)


def quantize_tree_int8(tree: Any) -> Any:
    """Weight-only int8: replace every linear kernel leaf ``['w']`` (ndim >= 2)
    with ``{"w_q": int8, "w_s": f32 per-output-channel scales}``.

    Symmetric per-out-channel quantization; ``ops.layers.linear`` dequantizes
    on the fly (bf16 compute). Halves weight HBM traffic — the decode
    bottleneck — at ~0.3% weight error. Opt-in via ``model.quantize_int8()``.
    """
    _PROJ_KEYS = ("['q']", "['k']", "['v']", "['o']", "['fc1']", "['fc2']", "['wo']", "['mlp']",
                  "['proj']", "['classifier']", "['upsample']")

    def convert(path, leaf):
        path_str = jax.tree_util.keystr(path)
        # only attention/MLP projection kernels: conv kernels keep plain arrays
        # (model code reads their static shapes for padding/groups)
        if (
            not path_str.endswith("['w']")
            or leaf.ndim < 2
            or not jnp.issubdtype(leaf.dtype, jnp.floating)
            or not any(k in path_str for k in _PROJ_KEYS)
        ):
            return leaf
        # reduce only the contraction (in) dim: per-(layer,)out-channel scales
        scale = jnp.max(jnp.abs(leaf), axis=leaf.ndim - 2, keepdims=True) / 127.0
        scale = jnp.where(scale == 0, 1.0, scale).astype(jnp.float32)
        q = jnp.clip(jnp.round(leaf.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
        return {"w_q": q, "w_s": scale}

    return jax.tree_util.tree_map_with_path(convert, tree)

"""MaxViT (reference pytorch_models/image/maxvit.py).

Stem convs → 4 stages of MaxViTBlock = pre-norm MBConv (SqueezeExcitation,
TF-"same" asymmetric stride-2 padding, ref maxvit.py:12-22) + block attention
(7×7 non-overlapping windows, ref 71-81) + grid attention (dilated global
grid, ref 85-95), both with learned 2D relative position bias (ref 98-113).
NHWC end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ... import transformer as tfm
from ...ops import ACT_FNS, layer_norm, sdpa
from ...ops.layers import avg_pool2d, batch_norm, bn_init, conv2d, conv2d_init
from ...utils import StateDict  # noqa: F401  (converter helpers)
from pytorch_models_tpu.utils.module import InferenceModel

BN_EPS = 1e-3  # ref maxvit.py:28
GELU_TANH = ACT_FNS["approximate_gelu"]

# ref maxvit.py:182-188 (table 1)
VARIANTS = dict(
    tiny=(64, (2, 2, 5, 2), (64, 128, 256, 512)),
    small=(64, (2, 2, 5, 2), (96, 192, 384, 768)),
    base=(64, (2, 6, 14, 2), (96, 192, 384, 768)),
    large=(128, (2, 6, 14, 2), (128, 256, 512, 1024)),
    xlarge=(192, (2, 6, 14, 2), (192, 384, 768, 1536)),
)


@dataclass(frozen=True)
class MaxViTConfig:
    stem_dim: int
    n_blocks: tuple[int, ...]
    dims: tuple[int, ...]
    window_size: int = 7
    head_dim: int = 32


def _tf_conv(p, x, stride=1, groups=1):
    """The reference's custom Conv2d (maxvit.py:12-22): symmetric (k-1)//2 pad
    at stride 1; TF-"same" asymmetric (0,1) pad at stride 2."""
    k = p["w"].shape[0]
    if stride == 2:
        padding = ((0, 1), (0, 1))
    else:
        padding = (k - 1) // 2
    return conv2d(p, x, stride=stride, padding=padding, groups=groups)


def _cna(p, x, stride=1, groups=1):
    x = _tf_conv(p["conv"], x, stride, groups)
    return GELU_TANH(batch_norm(p["bn"], x, BN_EPS))


def _se(p, x):
    """SqueezeExcitation (ref maxvit.py:33-44)."""
    s = x.mean(axis=(1, 2), keepdims=True)
    s = jax.nn.silu(conv2d(p["reduce"], s))
    s = jax.nn.sigmoid(conv2d(p["expand"], s))
    return x * s


def _mbconv(p, x, stride):
    """Pre-norm MBConv (ref maxvit.py:49-68)."""
    h = batch_norm(p["pre_norm"], x, BN_EPS)
    h = _cna(p["expand"], h, 1)
    hidden = h.shape[-1]
    h = _cna(p["dw"], h, stride, groups=hidden)
    h = _se(p["se"], h)
    h = conv2d(p["shrink"], h)
    short = x
    if stride > 1:
        short = avg_pool2d(short, stride)
    if "shortcut_conv" in p:
        short = conv2d(p["shortcut_conv"], short)
    return short + h


# window partitioning (ref maxvit.py:71-95) — NHWC
def window_block(x, s):
    n, h, w, c = x.shape
    nh, nw = h // s, w // s
    x = x.reshape(n, nh, s, nw, s, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, nh * nw, s * s, c), nh, nw


def window_unblock(x, nh, nw, s):
    n, c = x.shape[0], x.shape[-1]
    x = x.reshape(n, nh, nw, s, s, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, nh * s, nw * s, c)


def window_grid(x, s):
    n, h, w, c = x.shape
    nh, nw = h // s, w // s
    x = x.reshape(n, s, nh, s, nw, c).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(n, nh * nw, s * s, c), nh, nw


def window_ungrid(x, nh, nw, s):
    n, c = x.shape[0], x.shape[-1]
    x = x.reshape(n, nh, nw, s, s, c).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(n, s * nh, s * nw, c)


def _relative_bias(attn_bias: jnp.ndarray, s: int) -> jnp.ndarray:
    """(H, 2s-1, 2s-1) table -> (H, s², s²) bias via 2D relative indices
    (ref maxvit.py:104-112)."""
    idx = np.arange(s)[None, :] - np.arange(s)[:, None] + s - 1  # (s, s)
    b = jnp.take(attn_bias, jnp.asarray(idx), axis=1)  # (H, s, s, 2s-1)
    b = jnp.take(b, jnp.asarray(idx), axis=3)  # (H, s, s, s, s)
    n_heads = attn_bias.shape[0]
    return jnp.transpose(b, (0, 1, 3, 2, 4)).reshape(n_heads, s * s, s * s)


def _rel_attn_layer(p, cfg: MaxViTConfig, x, d_model):
    """Pre-norm EncoderLayer with RelativeMHA (ref maxvit.py:98-127)."""
    lc = tfm.LayerConfig.make(d_model, head_dim=cfg.head_dim, act="approximate_gelu")
    bias = _relative_bias(p["sa"]["attn_bias"], cfg.window_size)
    h = layer_norm(p["sa_norm"], x)
    qh = tfm.split_heads(tfm.linear(p["sa"]["q"], h), lc.n_heads, lc.head_dim)
    kh = tfm.split_heads(tfm.linear(p["sa"]["k"], h), lc.n_heads, lc.head_dim)
    vh = tfm.split_heads(tfm.linear(p["sa"]["v"], h), lc.n_heads, lc.head_dim)
    out = sdpa(qh, kh, vh, attn_bias=bias)
    x = x + tfm.linear(p["sa"]["o"], tfm.merge_heads(out))
    x = x + tfm.mlp_apply(p["mlp"], layer_norm(p["mlp_norm"], x), "approximate_gelu")
    return x


def _block_apply(p, cfg: MaxViTConfig, x, d_model, stride):
    x = _mbconv(p["mbconv"], x, stride)
    s = cfg.window_size
    xb, nh, nw = window_block(x, s)
    xb = _rel_attn_layer(p["block_layer"], cfg, xb, d_model)
    x = window_unblock(xb, nh, nw, s)
    xg, nh, nw = window_grid(x, s)
    xg = _rel_attn_layer(p["grid_layer"], cfg, xg, d_model)
    return window_ungrid(xg, nh, nw, s)


@partial(jax.jit, static_argnums=1)
def maxvit_apply(params, cfg: MaxViTConfig, imgs: jnp.ndarray) -> jnp.ndarray:
    x = jnp.transpose(imgs, (0, 2, 3, 1))
    x = _tf_conv(params["stem"]["conv1"], x, 2)
    x = GELU_TANH(batch_norm(params["stem"]["bn"], x, BN_EPS))
    x = _tf_conv(params["stem"]["conv2"], x, 1)
    for stage, dim in zip(params["stages"], cfg.dims):
        for i, bp in enumerate(stage):
            x = _block_apply(bp, cfg, x, dim, 2 if i == 0 else 1)
    x = x.mean(axis=(1, 2))
    return layer_norm(params["norm"], x)


def maxvit_init(key, cfg: MaxViTConfig) -> dict:
    ks = iter(jax.random.split(key, 256))
    s = cfg.window_size

    def mbconv_p(in_dim, out_dim, stride):
        hidden = out_dim * 4
        p = {
            "pre_norm": bn_init(in_dim),
            "expand": {"conv": conv2d_init(next(ks), 1, 1, in_dim, hidden, bias=False), "bn": bn_init(hidden)},
            "dw": {"conv": conv2d_init(next(ks), 3, 3, hidden, hidden, bias=False, groups=hidden), "bn": bn_init(hidden)},
            "se": {"reduce": conv2d_init(next(ks), 1, 1, hidden, hidden // 16),
                   "expand": conv2d_init(next(ks), 1, 1, hidden // 16, hidden)},
            "shrink": conv2d_init(next(ks), 1, 1, hidden, out_dim),
        }
        if in_dim != out_dim:
            p["shortcut_conv"] = conv2d_init(next(ks), 1, 1, in_dim, out_dim)
        return p

    def attn_layer_p(d):
        n_heads = d // cfg.head_dim
        return {
            "sa_norm": tfm.ln_init(d),
            "sa": {
                "attn_bias": jnp.zeros((n_heads, 2 * s - 1, 2 * s - 1), jnp.float32),
                "q": tfm.linear_init(next(ks), d, d),
                "k": tfm.linear_init(next(ks), d, d),
                "v": tfm.linear_init(next(ks), d, d),
                "o": tfm.linear_init(next(ks), d, d),
            },
            "mlp_norm": tfm.ln_init(d),
            "mlp": tfm.mlp_init(next(ks), d, d * 4),
        }

    p = {
        "stem": {
            "conv1": conv2d_init(next(ks), 3, 3, 3, cfg.stem_dim),
            "bn": bn_init(cfg.stem_dim),
            "conv2": conv2d_init(next(ks), 3, 3, cfg.stem_dim, cfg.stem_dim),
        }
    }
    stages = []
    in_dim = cfg.stem_dim
    for n_block, dim in zip(cfg.n_blocks, cfg.dims):
        stage = []
        for i in range(n_block):
            stage.append({"mbconv": mbconv_p(in_dim, dim, 2 if i == 0 else 1),
                          "block_layer": attn_layer_p(dim), "grid_layer": attn_layer_p(dim)})
            in_dim = dim
        stages.append(stage)
    p["stages"] = stages
    p["norm"] = tfm.ln_init(in_dim)
    return p


class MaxViT(InferenceModel):
    def __init__(self, stem_dim: int, n_blocks, dims, dropout: float = 0.0, rng: int = 0) -> None:
        self.cfg = MaxViTConfig(stem_dim, tuple(n_blocks), tuple(dims))
        self.params = maxvit_init(jax.random.PRNGKey(rng), self.cfg)

    def __call__(self, imgs) -> jnp.ndarray:
        return maxvit_apply(self.params, self.cfg, jnp.asarray(imgs))

    @staticmethod
    def from_google(variant: str, *, pretrained: bool = False, **kwargs) -> "MaxViT":
        stem_dim, n_blocks, dims = VARIANTS[variant]
        m = MaxViT(stem_dim, n_blocks, dims, **kwargs)
        if pretrained:
            from ...utils import hub_download
            from ...utils.tf_ckpt import load_tf_checkpoint  # no tensorflow needed (vs ref maxvit.py:193)

            ds, step = ("i1k", 92002) if variant in ("tiny", "small") else ("i21k_pt", 279498)
            url = f"https://storage.googleapis.com/gresearch/maxvit/ckpts/maxvit{variant}/{ds}/224/model.ckpt-{step}"
            hub_download(f"{url}.data-00000-of-00001", f"maxvit_{variant}")
            ckpt_path = hub_download(f"{url}.index", f"maxvit_{variant}").removesuffix(".index")
            m.load_google_state_dict(load_tf_checkpoint(ckpt_path))
        return m

    def load_google_state_dict(self, reader) -> None:
        """Convert a TF checkpoint reader's EMA variables (ref maxvit.py:211-274).

        ``reader`` needs ``get_variable_to_shape_map()`` and ``get_tensor(name)``.
        TF kernels are HWIO — already our layout; depthwise (kh,kw,C,1) swaps
        the last two axes; q/k/v weights (d,H,hd) flatten to (d,H*hd).
        """
        keys = set(k for k in reader.get_variable_to_shape_map().keys() if k.endswith("ExponentialMovingAverage"))

        def get(name):
            full = f"maxvit/{name}/ExponentialMovingAverage"
            keys.remove(full)
            return np.asarray(reader.get_tensor(full))

        def conv(pfx, bias=True, depthwise=False):
            if depthwise:
                w = get(f"{pfx}/depthwise_kernel")  # (kh, kw, C, 1) -> (kh, kw, 1, C)
                p = {"w": np.transpose(w, (0, 1, 3, 2))}
            else:
                p = {"w": get(f"{pfx}/kernel")}
            if bias:
                p["b"] = get(f"{pfx}/bias")
            return p

        def lin(pfx, flatten_out=True):
            w = get(f"{pfx}/weight")
            if w.ndim == 3:
                w = w.reshape(w.shape[0], -1) if flatten_out else w.reshape(-1, w.shape[-1])
            return {"w": w, "b": get(f"{pfx}/bias").reshape(-1)}

        def ln(pfx):
            return {"scale": get(f"{pfx}/gamma"), "bias": get(f"{pfx}/beta")}

        def bn(pfx):
            return {"scale": get(f"{pfx}/gamma"), "bias": get(f"{pfx}/beta"),
                    "mean": get(f"{pfx}/moving_mean"), "var": get(f"{pfx}/moving_variance")}

        def attn_layer(pfx, suffix):
            return {
                "sa_norm": ln(f"{pfx}/attn_layer_norm{suffix}"),
                "sa": {
                    "attn_bias": get(f"{pfx}/attention{suffix}/relative_bias"),
                    "q": lin(f"{pfx}/attention{suffix}/q"),
                    "k": lin(f"{pfx}/attention{suffix}/k"),
                    "v": lin(f"{pfx}/attention{suffix}/v"),
                    "o": lin(f"{pfx}/attention{suffix}/o", flatten_out=False),
                },
                "mlp_norm": ln(f"{pfx}/ffn_layer_norm{suffix}"),
                "mlp": {"fc1": lin(f"{pfx}/ffn{suffix}/expand_dense"), "fc2": lin(f"{pfx}/ffn{suffix}/shrink_dense")},
            }

        cfg = self.cfg
        p = {"stem": {"conv1": conv("stem/conv_0"), "bn": bn("stem/norm_0"), "conv2": conv("stem/conv_1")}}
        stages = []
        in_dim = cfg.stem_dim
        for stage_idx, (n_block, dim) in enumerate(zip(cfg.n_blocks, cfg.dims)):
            stage = []
            for block_idx in range(n_block):
                pfx = f"block_{stage_idx:02d}_{block_idx:02d}"
                bp = {
                    "mbconv": {
                        "pre_norm": bn(f"{pfx}/mbconv/pre_norm"),
                        "expand": {"conv": conv(f"{pfx}/mbconv/expand_conv", bias=False),
                                   "bn": bn(f"{pfx}/mbconv/expand_norm")},
                        "dw": {"conv": conv(f"{pfx}/mbconv/depthwise_conv", bias=False, depthwise=True),
                               "bn": bn(f"{pfx}/mbconv/depthwise_norm")},
                        "se": {"reduce": conv(f"{pfx}/mbconv/se/reduce_conv2d"),
                               "expand": conv(f"{pfx}/mbconv/se/expand_conv2d")},
                        "shrink": conv(f"{pfx}/mbconv/shrink_conv"),
                    },
                    "block_layer": attn_layer(pfx, ""),
                    "grid_layer": attn_layer(pfx, "_1"),
                }
                if in_dim != dim:
                    bp["mbconv"]["shortcut_conv"] = conv(f"{pfx}/mbconv/shortcut_conv")
                stage.append(bp)
                in_dim = dim
            stages.append(stage)
        p["stages"] = stages
        p["norm"] = ln("final_layer_norm")
        assert not keys, f"unconsumed TF variables: {sorted(keys)[:5]}..."
        self.params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p)

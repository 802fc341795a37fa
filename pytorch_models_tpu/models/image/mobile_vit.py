"""MobileViT (reference pytorch_models/image/mobile_vit.py).

MobileNetV2 ``MBConv`` stages (pw-dw-pw + residual, ref mobile_vit.py:19-29)
interleaved with ``MobileViTBlock``: conv → unfold into 2×2-strided patch
groups (ref 32-51) → shared Transformer Encoder (n_heads=4, silu,
mlp_ratio=2) → fold back → 1×1 proj → concat-fusion conv. BatchNorm+SiLU conv
stacks throughout (ref 10-15). Runs NHWC end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ... import transformer as tfm
from ...ops import layer_norm
from ...ops.layers import batch_norm, bn_init, conv2d, conv2d_init
from ...utils import StateDict, hub_download, stack_layers
from pytorch_models_tpu.utils.module import InferenceModel

SILU = jax.nn.silu

# ref mobile_vit.py:101-105
VARIANTS = dict(
    xxs=([16, 24, 48, 64, 80], [64, 80, 96], 320, 2),
    xs=([32, 48, 64, 80, 96], [96, 120, 144], 384, 4),
    s=([32, 64, 96, 128, 160], [144, 192, 240], 640, 4),
)


@dataclass(frozen=True)
class MobileViTConfig:
    channels: tuple[int, ...]
    d_models: tuple[int, ...]
    out_dim: int
    expansion: int
    patch_size: int = 2

    def vit_layer(self, d_model: int) -> tfm.LayerConfig:
        return tfm.LayerConfig.make(d_model, n_heads=4, mlp_ratio=2.0, act="silu")


# -- conv + BN + SiLU (ref mobile_vit.py:10-15) -----------------------------


def _cna_init(key, in_dim, out_dim, k, groups=1):
    return {"conv": conv2d_init(key, k, k, in_dim, out_dim, bias=False, groups=groups), "bn": bn_init(out_dim)}


def _cna(p, x, stride=1, groups=1, act=True):
    k = p["conv"]["w"].shape[0]
    x = conv2d(p["conv"], x, stride=stride, padding=(k - 1) // 2, groups=groups)
    x = batch_norm(p["bn"], x)
    return SILU(x) if act else x


def _mbconv_init(key, in_dim, expansion, out_dim):
    hidden = in_dim * expansion
    k1, k2, k3 = jax.random.split(key, 3)
    return {"pw1": _cna_init(k1, in_dim, hidden, 1), "dw": _cna_init(k2, hidden, hidden, 3, groups=hidden),
            "pw2": _cna_init(k3, hidden, out_dim, 1)}


def _mbconv(p, x, stride=1):
    hidden = p["dw"]["conv"]["w"].shape[-1]
    out = _cna(p["pw1"], x, 1)
    out = _cna(p["dw"], out, stride, groups=hidden)
    out = _cna(p["pw2"], out, 1, act=False)
    residual = x.shape[-1] == out.shape[-1] and stride == 1
    return x + out if residual else out


# -- unfold / fold (ref mobile_vit.py:32-51) — NHWC --------------------------


def unfold(x: jnp.ndarray, p: int):
    n, h, w, c = x.shape
    nh, nw = h // p, w // p
    x = x.reshape(n, nh, p, nw, p, c).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(n, p * p, nh * nw, c), (nh, nw)


def fold(x: jnp.ndarray, p: int, n_patches) -> jnp.ndarray:
    nh, nw = n_patches
    n, c = x.shape[0], x.shape[-1]
    x = x.reshape(n, p, p, nh, nw, c).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(n, nh * p, nw * p, c)


def _vit_block_init(key, cfg: MobileViTConfig, in_dim, d_model, n_layers):
    ks = jax.random.split(key, 5)
    return {
        "in_cna": _cna_init(ks[0], in_dim, in_dim, 3),
        "in_proj": {"w": conv2d_init(ks[1], 1, 1, in_dim, d_model, bias=False)["w"]},
        "encoder": tfm.encoder_init(ks[2], n_layers, cfg.vit_layer(d_model)),
        "norm": tfm.ln_init(d_model),
        "out_proj": _cna_init(ks[3], d_model, in_dim, 1),
        "out_fusion": _cna_init(ks[4], in_dim * 2, in_dim, 3),
    }


def _vit_block(p, cfg: MobileViTConfig, x, d_model):
    out = _cna(p["in_cna"], x, 1)
    out = conv2d({"w": p["in_proj"]["w"]}, out)
    out, n_patches = unfold(out, cfg.patch_size)
    out = tfm.encoder_apply(p["encoder"], cfg.vit_layer(d_model), out)
    out = layer_norm(p["norm"], out)
    out = fold(out, cfg.patch_size, n_patches)
    out = _cna(p["out_proj"], out, 1)
    return _cna(p["out_fusion"], jnp.concatenate([x, out], axis=-1), 1)


def mobilevit_init(key, cfg: MobileViTConfig) -> dict:
    ch, dm, e = cfg.channels, cfg.d_models, cfg.expansion
    ks = iter(jax.random.split(key, 16))
    return {
        "stem_cna": _cna_init(next(ks), 3, 16, 3),
        "stem_mb": _mbconv_init(next(ks), 16, e, ch[0]),
        "s2": [_mbconv_init(next(ks), ch[0], e, ch[1]), _mbconv_init(next(ks), ch[1], e, ch[1]),
               _mbconv_init(next(ks), ch[1], e, ch[1])],
        "s3_mb": _mbconv_init(next(ks), ch[1], e, ch[2]),
        "s3_vit": _vit_block_init(next(ks), cfg, ch[2], dm[0], 2),
        "s4_mb": _mbconv_init(next(ks), ch[2], e, ch[3]),
        "s4_vit": _vit_block_init(next(ks), cfg, ch[3], dm[1], 4),
        "s5_mb": _mbconv_init(next(ks), ch[3], e, ch[4]),
        "s5_vit": _vit_block_init(next(ks), cfg, ch[4], dm[2], 3),
        "head_cna": _cna_init(next(ks), ch[4], cfg.out_dim, 1),
    }


@partial(jax.jit, static_argnums=1)
def mobilevit_apply(params, cfg: MobileViTConfig, imgs: jnp.ndarray) -> jnp.ndarray:
    """Forward (ref mobile_vit.py:71-97). ``imgs``: (N, 3, H, W)."""
    dm = cfg.d_models
    x = jnp.transpose(imgs, (0, 2, 3, 1))
    x = _cna(params["stem_cna"], x, 2)
    x = _mbconv(params["stem_mb"], x)
    x = _mbconv(params["s2"][0], x, 2)
    x = _mbconv(params["s2"][1], x)
    x = _mbconv(params["s2"][2], x)
    x = _mbconv(params["s3_mb"], x, 2)
    x = _vit_block(params["s3_vit"], cfg, x, dm[0])
    x = _mbconv(params["s4_mb"], x, 2)
    x = _vit_block(params["s4_vit"], cfg, x, dm[1])
    x = _mbconv(params["s5_mb"], x, 2)
    x = _vit_block(params["s5_vit"], cfg, x, dm[2])
    x = _cna(params["head_cna"], x, 1)
    return x.mean(axis=(1, 2))


class MobileViT(InferenceModel):
    def __init__(self, channels, d_models, out_dim: int, expansion: int, rng: int = 0) -> None:
        self.cfg = MobileViTConfig(tuple(channels), tuple(d_models), out_dim, expansion)
        self.params = mobilevit_init(jax.random.PRNGKey(rng), self.cfg)

    def __call__(self, imgs) -> jnp.ndarray:
        return mobilevit_apply(self.params, self.cfg, jnp.asarray(imgs))

    @staticmethod
    def from_apple(variant: str, *, pretrained: bool = False) -> "MobileViT":
        channels, d_models, out_dim, expansion = VARIANTS[variant]
        m = MobileViT(channels, d_models, out_dim, expansion)
        if pretrained:
            from ...utils.torch_ckpt import load_torch_checkpoint

            url = f"https://docs-assets.developer.apple.com/ml-research/models/cvnets/classification/mobilevit_{variant}.pt"
            m.load_apple_state_dict(load_torch_checkpoint(hub_download(url)))
        return m

    def load_apple_state_dict(self, state_dict: dict) -> None:
        """Apple CVNets checkpoint (key layout per ref mobile_vit.py:117-186),
        including the BGR→RGB first-conv flip for OpenCV-trained v0.1 weights
        (ref mobile_vit.py:165-167) and the fused-qkv split (ref 143-150)."""
        sd = StateDict(state_dict)
        cfg = self.cfg

        def bn(pfx):
            p = {"scale": sd.pop(f"{pfx}.weight"), "bias": sd.pop(f"{pfx}.bias"),
                 "mean": sd.pop(f"{pfx}.running_mean"), "var": sd.pop(f"{pfx}.running_var")}
            sd.pop(f"{pfx}.num_batches_tracked")
            return p

        def cna(pfx, bias=False):
            return {"conv": sd.pop_conv2d(f"{pfx}.block.conv", bias=bias), "bn": bn(f"{pfx}.block.norm")}

        def mbconv(pfx):
            return {"pw1": cna(f"{pfx}.exp_1x1"), "dw": cna(f"{pfx}.conv_3x3"), "pw2": cna(f"{pfx}.red_1x1")}

        def encoder(pfx, n_layers):
            layers = []
            for i in range(n_layers):
                qkv_w = np.split(sd.pop(f"{pfx}.{i}.pre_norm_mha.1.qkv_proj.weight"), 3, axis=0)
                qkv_b = np.split(sd.pop(f"{pfx}.{i}.pre_norm_mha.1.qkv_proj.bias"), 3, axis=0)
                layers.append(
                    {
                        "sa_norm": sd.pop_ln(f"{pfx}.{i}.pre_norm_mha.0"),
                        "sa": {
                            "q": {"w": qkv_w[0].T, "b": qkv_b[0]},
                            "k": {"w": qkv_w[1].T, "b": qkv_b[1]},
                            "v": {"w": qkv_w[2].T, "b": qkv_b[2]},
                            "o": sd.pop_linear(f"{pfx}.{i}.pre_norm_mha.1.out_proj"),
                        },
                        "mlp_norm": sd.pop_ln(f"{pfx}.{i}.pre_norm_ffn.0"),
                        "mlp": {"fc1": sd.pop_linear(f"{pfx}.{i}.pre_norm_ffn.1"),
                                "fc2": sd.pop_linear(f"{pfx}.{i}.pre_norm_ffn.4")},
                    }
                )
            return {"layers": stack_layers([jax.tree.map(jnp.asarray, l) for l in layers])}

        def vit_block(pfx, n_layers):
            return {
                "in_cna": cna(f"{pfx}.local_rep.conv_3x3"),
                "in_proj": {"w": np.transpose(sd.pop(f"{pfx}.local_rep.conv_1x1.block.conv.weight"), (2, 3, 1, 0))},
                "encoder": encoder(f"{pfx}.global_rep", n_layers),
                "norm": sd.pop_ln(f"{pfx}.global_rep.{n_layers}"),
                "out_proj": cna(f"{pfx}.conv_proj"),
                "out_fusion": cna(f"{pfx}.fusion"),
            }

        stem_cna = cna("conv_1")
        stem_cna["conv"]["w"] = stem_cna["conv"]["w"][:, :, ::-1]  # BGR -> RGB (HWIO axis 2)
        p = {
            "stem_cna": stem_cna,
            "stem_mb": mbconv("layer_1.0.block"),
            "s2": [mbconv(f"layer_2.{i}.block") for i in range(3)],
            "s3_mb": mbconv("layer_3.0.block"),
            "s3_vit": vit_block("layer_3.1", 2),
            "s4_mb": mbconv("layer_4.0.block"),
            "s4_vit": vit_block("layer_4.1", 4),
            "s5_mb": mbconv("layer_5.0.block"),
            "s5_vit": vit_block("layer_5.1", 3),
            "head_cna": cna("conv_1x1_exp"),
        }
        sd.pop("classifier.fc.weight")
        sd.pop("classifier.fc.bias")
        sd.finalize()
        self.params = jax.tree.map(lambda x: jnp.asarray(np.ascontiguousarray(x), jnp.float32), p)

"""MLP-Mixer (reference pytorch_models/image/mlp_mixer.py).

Patch-embed → N× MixerBlock (token-mixing MLP over transposed tokens +
channel-mixing MLP) → LayerNorm → mean pool (ref mlp_mixer.py:12-60). Blocks
are a ``lax.scan`` over stacked per-block params.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ... import transformer as tfm
from ...ops import layer_norm
from ...ops.layers import conv2d, conv2d_init
from ...utils import StateDict, hub_download, stack_layers
from pytorch_models_tpu.utils.module import InferenceModel

NORM_EPS = 1e-6

# Table 1 in the paper; ref mlp_mixer.py:73-78
SIZES = dict(S=(8, 512), B=(12, 768), L=(24, 1024), H=(32, 1280))


@dataclass(frozen=True)
class MLPMixerConfig:
    n_layers: int
    d_model: int
    patch_size: int
    img_size: int = 224
    mlp_ratio: tuple[float, float] = (0.5, 4.0)


def mixer_init(key, cfg: MLPMixerConfig) -> dict:
    assert cfg.img_size % cfg.patch_size == 0
    n_tokens = (cfg.img_size // cfg.patch_size) ** 2
    tokens_dim, channels_dim = (int(cfg.d_model * r) for r in cfg.mlp_ratio)
    ks = jax.random.split(key, cfg.n_layers + 1)

    def block(k):
        k1, k2 = jax.random.split(k)
        return {
            "norm1": tfm.ln_init(cfg.d_model),
            "token_mixing": tfm.mlp_init(k1, n_tokens, tokens_dim),
            "norm2": tfm.ln_init(cfg.d_model),
            "channel_mixing": tfm.mlp_init(k2, cfg.d_model, channels_dim),
        }

    return {
        "patch_embed": conv2d_init(ks[0], cfg.patch_size, cfg.patch_size, 3, cfg.d_model),
        "blocks": stack_layers([block(k) for k in ks[1:]]),
        "norm": tfm.ln_init(cfg.d_model),
    }


def _mixer_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Token-mixing over the transposed token axis + channel-mixing (ref mlp_mixer.py:28-32)."""
    h = jnp.swapaxes(layer_norm(p["norm1"], x, NORM_EPS), -1, -2)
    x = x + jnp.swapaxes(tfm.mlp_apply(p["token_mixing"], h), -1, -2)
    x = x + tfm.mlp_apply(p["channel_mixing"], layer_norm(p["norm2"], x, NORM_EPS))
    return x


@partial(jax.jit, static_argnums=1)
def mixer_apply(params: dict, cfg: MLPMixerConfig, imgs: jnp.ndarray) -> jnp.ndarray:
    x = jnp.transpose(imgs, (0, 2, 3, 1))
    x = conv2d(params["patch_embed"], x, stride=cfg.patch_size)
    x = x.reshape(x.shape[0], -1, cfg.d_model)

    def body(h, bp):
        return _mixer_block(bp, h), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(params["norm"], x, NORM_EPS)
    return x.mean(axis=1)


class MLPMixer(InferenceModel):
    def __init__(
        self,
        n_layers: int,
        d_model: int,
        patch_size: int,
        img_size: int = 224,
        mlp_ratio: tuple[float, float] = (0.5, 4.0),
        dropout: float = 0.0,
        norm_eps: float = 1e-6,
        rng: int = 0,
    ) -> None:
        self.cfg = MLPMixerConfig(n_layers, d_model, patch_size, img_size, tuple(mlp_ratio))
        self.params = mixer_init(jax.random.PRNGKey(rng), self.cfg)

    def __call__(self, imgs) -> jnp.ndarray:
        return mixer_apply(self.params, self.cfg, jnp.asarray(imgs))

    @staticmethod
    def from_google(model_tag: str, *, pretrained: bool = False, **kwargs) -> "MLPMixer":
        model_tag, _, weights = model_tag.partition("_")
        weights = weights or "gsam"
        size, patch_size = model_tag.split("/")
        n_layers, d_model = SIZES[size]
        m = MLPMixer(n_layers, d_model, int(patch_size), **kwargs)
        if pretrained:
            url = f"https://storage.googleapis.com/mixer_models/{weights}/Mixer-{size}_{patch_size}.npz"
            m.load_jax_weights(dict(np.load(hub_download(url))))
        return m

    def load_jax_weights(self, ckpt: dict) -> None:
        """Convert the Flax .npz layout (keys per ref mlp_mixer.py:87-101)."""
        sd = StateDict(ckpt)

        def flax_linear(pfx):
            return {"w": sd.pop(f"{pfx}/kernel"), "b": sd.pop(f"{pfx}/bias")}

        def flax_ln(pfx):
            return {"scale": sd.pop(f"{pfx}/scale"), "bias": sd.pop(f"{pfx}/bias")}

        blocks = []
        for i in range(self.cfg.n_layers):
            blk = f"MixerBlock_{i}"
            blocks.append(
                {
                    "norm1": flax_ln(f"{blk}/LayerNorm_0"),
                    "token_mixing": {
                        "fc1": flax_linear(f"{blk}/token_mixing/Dense_0"),
                        "fc2": flax_linear(f"{blk}/token_mixing/Dense_1"),
                    },
                    "norm2": flax_ln(f"{blk}/LayerNorm_1"),
                    "channel_mixing": {
                        "fc1": flax_linear(f"{blk}/channel_mixing/Dense_0"),
                        "fc2": flax_linear(f"{blk}/channel_mixing/Dense_1"),
                    },
                }
            )
        p = {
            "patch_embed": {"w": sd.pop("stem/kernel"), "b": sd.pop("stem/bias")},
            "blocks": stack_layers([jax.tree.map(jnp.asarray, b) for b in blocks]),
            "norm": flax_ln("pre_head_layer_norm"),
        }
        sd.finalize()
        self.params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p)

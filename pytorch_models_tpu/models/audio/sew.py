"""SEW — Squeezed and Efficient Wav2Vec (reference pytorch_models/audio/sew.py).

Subclass of Wav2Vec2: deeper 13-layer stem with interleaved stride-1 convs
(ref sew.py:12-14), PE conv stride 2 running in parallel with an
``avg_pool1d(2)`` time-squeeze (ref sew.py:33), post-norm transformer at half
rate, then an upsample Linear(d→2d)+GELU unflattened back to full rate and
right-padded to the original length (ref sew.py:35-37).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ... import transformer as tfm
from ...ops import ACT_FNS, layer_norm
from ...utils import StateDict
from .wav2vec2 import Wav2Vec2, Wav2Vec2Config, _pop_weight_norm_conv, pe_conv_apply, stem_apply, wav2vec2_init


@partial(jax.jit, static_argnums=1)
def sew_apply(params: dict, cfg: Wav2Vec2Config, x: jnp.ndarray) -> jnp.ndarray:
    """Forward (ref sew.py:26-38)."""
    x = stem_apply(params["stem"], cfg, x)
    x = layer_norm(params["proj_norm"], x)
    if "proj" in params:
        x = tfm.linear(params["proj"], x)

    t = x.shape[1]
    pooled = x[:, : (t // 2) * 2].reshape(x.shape[0], t // 2, 2, x.shape[-1]).mean(axis=2)
    x = pooled + pe_conv_apply(params["pe_conv"], cfg, x, stride=2)
    x = tfm.encoder_apply(params["encoder"], cfg.layer, layer_norm(params["norm"], x))
    x = ACT_FNS["gelu"](tfm.linear(params["upsample"], x))
    x = x.reshape(x.shape[0], -1, x.shape[-1] // 2)  # (B, 2*T/2, d)
    if x.shape[1] < t:
        x = jnp.pad(x, ((0, 0), (0, t - x.shape[1]), (0, 0)))
    return x


class SEW(Wav2Vec2):
    STEM_DIMS = (64,) + (128,) * 4 + (256,) * 4 + (512,) * 4
    STEM_KERNELS = (10,) + (3, 1) * 4 + (2, 1) * 2
    STEM_STRIDES = (5,) + (2, 1) * 6
    PE_KERNEL = 31

    def __init__(self, n_layers: int, d_model: int, stem_bias: bool = True, stem_legacy: bool = True,
                 dropout: float = 0.0, rng: int = 0) -> None:
        assert stem_legacy
        self.cfg = Wav2Vec2Config(
            n_layers, d_model, self.STEM_DIMS, self.STEM_KERNELS, self.STEM_STRIDES,
            self.PE_KERNEL, self.PE_GROUPS, stem_bias, stem_legacy, pre_norm=False,
        )
        self.params = wav2vec2_init(jax.random.PRNGKey(rng), self.cfg)
        k = jax.random.PRNGKey(rng + 1)
        self.params["upsample"] = tfm.linear_init(k, d_model, d_model * 2)

    def __call__(self, x) -> jnp.ndarray:
        return sew_apply(self.params, self.cfg, jnp.asarray(x))

    def load_hf_state_dict(self, state_dict: dict) -> None:
        """SEW's HF key layout (ref sew.py:40-80): bare ``layer_norm`` /
        ``feature_projection`` and an ``encoder.upsample.projection`` head."""
        sd = StateDict(state_dict)
        p: dict = {"stem": self._pop_stem(sd)}
        p["proj_norm"] = sd.pop_ln("layer_norm")
        if "feature_projection.weight" in sd:
            p["proj"] = sd.pop_linear("feature_projection")
        p["pe_conv"] = [{"conv": _pop_weight_norm_conv(sd, "encoder.pos_conv_embed.conv")}]
        p["norm"] = sd.pop_ln("encoder.layer_norm")
        p["encoder"] = self._pop_encoder(sd)
        p["upsample"] = sd.pop_linear("encoder.upsample.projection")
        self._drop_extra(sd)
        sd.finalize()
        self.params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p)

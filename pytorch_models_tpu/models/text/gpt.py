"""GPT-1 (reference pytorch_models/text/gpt.py).

Post-norm causal decoder with tanh GELU, fixed vocab 40478 / context 512
(ref gpt.py:15-30); weight-tied logits. ``from_openai`` reconstructs params
from OpenAI's 10 raw ``.npy`` shards + ``params_shapes.json`` (ref gpt.py:32-86).
"""

from __future__ import annotations

import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import hub_download, stack_layers
from pytorch_models_tpu.utils.module import InferenceModel
from ._decoder_lm import DecoderLMConfig, decoder_lm_apply, decoder_lm_init


class GPT(InferenceModel):
    vocab_size = 40478
    max_seq_len = 512

    def __init__(self, n_layers: int = 12, d_model: int = 768, dropout: float = 0.0, rng: int = 0) -> None:
        self.cfg = DecoderLMConfig(
            vocab_size=self.vocab_size,
            max_seq_len=self.max_seq_len,
            n_layers=n_layers,
            d_model=d_model,
            pre_norm=False,
            final_norm=False,
            act="approximate_gelu",
        )
        self.params = decoder_lm_init(jax.random.PRNGKey(rng), self.cfg)

    def __call__(self, tokens) -> jnp.ndarray:
        return _gpt_apply(self.params, self.cfg, jnp.asarray(tokens))

    @staticmethod
    def from_openai(*, pretrained: bool = False, **kwargs) -> "GPT":
        m = GPT(**kwargs)
        if pretrained:
            base = "https://github.com/openai/finetune-transformer-lm/raw/master/model"
            shapes = json.loads(open(hub_download(f"{base}/params_shapes.json", "openai_gpt"), "rb").read())
            shards = [np.load(hub_download(f"{base}/params_{i}.npy", "openai_gpt")) for i in range(10)]
            m.load_openai_params(shapes, shards)
        return m

    def load_openai_params(self, shapes: list, shards: list[np.ndarray]) -> None:
        """Rebuild flat-shard params and map them (layout per ref gpt.py:40-84).

        Per layer (n=12 tensors): fused-qkv kernel/bias (split 3-way), attn out
        kernel/bias, sa_norm scale/bias, mlp fc1/fc2 kernel/bias, mlp_norm
        scale/bias. Kernels are stored (1, in, out) — already JAX layout.
        """
        offsets = np.cumsum([int(np.prod(s)) for s in shapes])
        flat = np.concatenate(shards, axis=0)
        params = [p.reshape(s) for p, s in zip(np.split(flat, offsets)[:-1], shapes)]

        p = dict(self.params)
        p["pos_embs"] = jnp.asarray(params[0])
        tok = np.asarray(self.params["token_embs"]).copy()
        tok[: params[1].shape[0]] = params[1]
        p["token_embs"] = jnp.asarray(tok)

        n = 12
        layers = []
        for i in range(self.cfg.n_layers):
            qkv_w = np.split(params[2 + i * n].squeeze(0), 3, axis=-1)
            qkv_b = np.split(params[3 + i * n], 3, axis=-1)
            layers.append(
                {
                    "sa": {
                        "q": {"w": qkv_w[0], "b": qkv_b[0]},
                        "k": {"w": qkv_w[1], "b": qkv_b[1]},
                        "v": {"w": qkv_w[2], "b": qkv_b[2]},
                        "o": {"w": params[4 + i * n].squeeze(0), "b": params[5 + i * n]},
                    },
                    "sa_norm": {"scale": params[6 + i * n], "bias": params[7 + i * n]},
                    "mlp": {
                        "fc1": {"w": params[8 + i * n].squeeze(0), "b": params[9 + i * n]},
                        "fc2": {"w": params[10 + i * n].squeeze(0), "b": params[11 + i * n]},
                    },
                    "mlp_norm": {"scale": params[12 + i * n], "bias": params[13 + i * n]},
                }
            )
        p["decoder"] = {"layers": stack_layers([jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), l) for l in layers])}
        self.params = p


@partial(jax.jit, static_argnums=1)
def _gpt_apply(params, cfg, tokens):
    return decoder_lm_apply(params, cfg, tokens)

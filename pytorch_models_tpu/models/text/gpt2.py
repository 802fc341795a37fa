"""GPT-2 (reference pytorch_models/text/gpt2.py).

Pre-norm causal decoder + final LayerNorm, tanh GELU, vocab 50257 / context
1024, weight-tied logits (ref gpt2.py:10-27). The HF loader handles Conv1D
transposed weights and the fused ``c_attn`` split (ref gpt2.py:47-81).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import StateDict, stack_layers
from pytorch_models_tpu.utils.module import InferenceModel
from ._decoder_lm import DecoderLMConfig, decoder_lm_apply, decoder_lm_init

# ref gpt2.py:31-36
VARIANTS = {
    "gpt2": (12, 768),
    "gpt2-medium": (24, 1024),
    "gpt2-large": (36, 1280),
    "gpt2-xl": (48, 1600),
}


class GPT2(InferenceModel):
    vocab_size = 50257
    max_seq_len = 1024

    def __init__(self, n_layers: int, d_model: int, dropout: float = 0.0, rng: int = 0) -> None:
        self.cfg = DecoderLMConfig(
            vocab_size=self.vocab_size,
            max_seq_len=self.max_seq_len,
            n_layers=n_layers,
            d_model=d_model,
            pre_norm=True,
            final_norm=True,
            act="approximate_gelu",
        )
        self.params = decoder_lm_init(jax.random.PRNGKey(rng), self.cfg)

    def __call__(self, tokens) -> jnp.ndarray:
        return _gpt2_apply(self.params, self.cfg, jnp.asarray(tokens))

    @staticmethod
    def from_hf(model_tag: str, *, pretrained: bool = False, **kwargs) -> "GPT2":
        n_layers, d_model = VARIANTS[model_tag]
        m = GPT2(n_layers, d_model, **kwargs)
        if pretrained:
            from ...utils.download import load_hf_checkpoint

            m.load_hf_state_dict(load_hf_checkpoint(model_tag))
        return m

    def load_hf_state_dict(self, state_dict: dict) -> None:
        """HF GPT-2 keys (Conv1D (in,out) weights — native JAX layout; ref gpt2.py:47-81)."""
        sd = StateDict({k.removeprefix("transformer."): v for k, v in state_dict.items()})

        def lin(pfx):  # HF Conv1D stores (in, out) — exactly our layout
            return {"w": sd.pop(f"{pfx}.weight"), "b": sd.pop(f"{pfx}.bias")}

        tok = np.asarray(self.params["token_embs"]).copy()
        wte = sd.pop("wte.weight")
        tok[: wte.shape[0]] = wte
        p = dict(self.params)
        p["token_embs"] = jnp.asarray(tok)
        p["pos_embs"] = jnp.asarray(sd.pop("wpe.weight"))
        p["norm"] = sd.pop_ln("ln_f")

        layers = []
        for i in range(self.cfg.n_layers):
            pfx = f"h.{i}"
            qkv_w = np.split(sd.pop(f"{pfx}.attn.c_attn.weight"), 3, axis=1)
            qkv_b = np.split(sd.pop(f"{pfx}.attn.c_attn.bias"), 3, axis=0)
            layers.append(
                {
                    "sa_norm": sd.pop_ln(f"{pfx}.ln_1"),
                    "sa": {
                        "q": {"w": qkv_w[0], "b": qkv_b[0]},
                        "k": {"w": qkv_w[1], "b": qkv_b[1]},
                        "v": {"w": qkv_w[2], "b": qkv_b[2]},
                        "o": lin(f"{pfx}.attn.c_proj"),
                    },
                    "mlp_norm": sd.pop_ln(f"{pfx}.ln_2"),
                    "mlp": {"fc1": lin(f"{pfx}.mlp.c_fc"), "fc2": lin(f"{pfx}.mlp.c_proj")},
                }
            )
        # HF ships attn.bias causal-mask buffers in some exports; drop if present
        for k in list(sd.keys()):
            if k.endswith(".attn.bias") or k.endswith(".attn.masked_bias") or k == "lm_head.weight":
                sd.pop(k)
        p["decoder"] = {"layers": stack_layers([jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), l) for l in layers])}
        sd.finalize()
        self.params = p


@partial(jax.jit, static_argnums=1)
def _gpt2_apply(params, cfg, tokens):
    return decoder_lm_apply(params, cfg, tokens)

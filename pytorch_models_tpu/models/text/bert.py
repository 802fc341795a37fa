"""BERT / RoBERTa encoder (reference pytorch_models/text/bert.py).

Token emb (vocab padded to a multiple of 64, ref bert.py:28) + learned PE
sliced to seq len + LayerNorm → post-norm Encoder. Token-type embeddings are
folded into the PE at load time; RoBERTa's 2 unused PE rows are stripped
(ref bert.py:54-56, 87-92).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ... import transformer as tfm
from ...ops import layer_norm
from ...utils import StateDict, stack_layers
from pytorch_models_tpu.utils.module import InferenceModel


@dataclass(frozen=True)
class BERTConfig:
    vocab_size: int
    n_layers: int
    d_model: int
    max_seq_len: int = 512
    norm_eps: float = 1e-12

    @property
    def layer(self) -> tfm.LayerConfig:
        return tfm.LayerConfig.make(self.d_model, pre_norm=False, norm_eps=self.norm_eps)


def bert_init(key, cfg: BERTConfig) -> dict:
    k_emb, k_enc = jax.random.split(key)
    return {
        "token_embs": jax.random.normal(k_emb, (cfg.vocab_size, cfg.d_model), jnp.float32),
        "pos_embs": jnp.zeros((cfg.max_seq_len, cfg.d_model), jnp.float32),
        "norm": tfm.ln_init(cfg.d_model),
        "encoder": tfm.encoder_init(k_enc, cfg.n_layers, cfg.layer),
    }


@partial(jax.jit, static_argnums=1)
def bert_apply(params: dict, cfg: BERTConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Forward (ref bert.py:34-39); tokens ``(..., L)`` batched or unbatched."""
    x = jnp.take(params["token_embs"], tokens, axis=0)
    x = x + params["pos_embs"][: tokens.shape[-1]].astype(x.dtype)
    x = layer_norm(params["norm"], x, cfg.norm_eps)
    return tfm.encoder_apply(params["encoder"], cfg.layer, x)


class BERT(InferenceModel):
    def __init__(
        self,
        vocab_size: int,
        n_layers: int,
        d_model: int,
        max_seq_len: int = 512,
        dropout: float = 0.0,
        norm_eps: float = 1e-12,
        rng: int = 0,
    ) -> None:
        vocab_size = math.ceil(vocab_size / 64) * 64  # pad (ref bert.py:28)
        self.cfg = BERTConfig(vocab_size, n_layers, d_model, max_seq_len, norm_eps)
        self.params = bert_init(jax.random.PRNGKey(rng), self.cfg)

    def __call__(self, tokens) -> jnp.ndarray:
        return bert_apply(self.params, self.cfg, jnp.asarray(tokens))

    @staticmethod
    def from_hf(model_tag: str, *, pretrained: bool = False, config: dict | None = None, **kwargs) -> "BERT":
        """Build from the HF config.json (fetched like ref bert.py:42-52, or injected)."""
        resolved_tag = model_tag
        if config is None:
            import requests

            for resolved_tag in (model_tag, f"gaunernst/{model_tag}"):
                resp = requests.get(f"https://huggingface.co/{resolved_tag}/raw/main/config.json", timeout=30)
                if resp.ok:
                    config = json.loads(resp.content)
                    break
            if config is None:
                raise ValueError(f"Unsupported model {model_tag}")

        config = dict(config)
        if "roberta" in config["model_type"]:  # ref bert.py:54-56
            config["max_position_embeddings"] -= 2

        m = BERT(
            vocab_size=config["vocab_size"],
            n_layers=config["num_hidden_layers"],
            d_model=config["hidden_size"],
            max_seq_len=config["max_position_embeddings"],
            norm_eps=config["layer_norm_eps"],
            **kwargs,
        )
        if pretrained:
            from ...utils.download import load_hf_checkpoint

            m.load_hf_state_dict(load_hf_checkpoint(resolved_tag))
        return m

    def load_hf_state_dict(self, state_dict: dict) -> None:
        """HF BERT/RoBERTa keys (ref bert.py:74-107); folds token-type emb row 0
        into the position embeddings and strips RoBERTa's first two PE rows."""
        is_roberta = any(k.startswith("roberta.") for k in state_dict)
        sd = StateDict({k.removeprefix("bert.").removeprefix("roberta."): v for k, v in state_dict.items()})

        p = dict(self.params)
        tok = np.asarray(self.params["token_embs"]).copy()
        word = sd.pop("embeddings.word_embeddings.weight")
        tok[: word.shape[0]] = word
        p["token_embs"] = jnp.asarray(tok)

        pos = sd.pop("embeddings.position_embeddings.weight")
        if is_roberta:
            pos = pos[2:]
        pos = pos + sd.pop("embeddings.token_type_embeddings.weight")[0]
        p["pos_embs"] = jnp.asarray(pos)
        p["norm"] = sd.pop_ln("embeddings.LayerNorm")

        layers = []
        for i in range(self.cfg.n_layers):
            pfx = f"encoder.layer.{i}"
            layers.append(
                {
                    "sa": {
                        "q": sd.pop_linear(f"{pfx}.attention.self.query"),
                        "k": sd.pop_linear(f"{pfx}.attention.self.key"),
                        "v": sd.pop_linear(f"{pfx}.attention.self.value"),
                        "o": sd.pop_linear(f"{pfx}.attention.output.dense"),
                    },
                    "sa_norm": sd.pop_ln(f"{pfx}.attention.output.LayerNorm"),
                    "mlp": {
                        "fc1": sd.pop_linear(f"{pfx}.intermediate.dense"),
                        "fc2": sd.pop_linear(f"{pfx}.output.dense"),
                    },
                    "mlp_norm": sd.pop_ln(f"{pfx}.output.LayerNorm"),
                }
            )
        p["encoder"] = {"layers": stack_layers([jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), l) for l in layers])}
        # ignore heads the model does not include (pooler/cls), like the reference's
        # leftover-print (bert.py:107) but explicit
        for k in list(sd.keys()):
            if k.startswith(("pooler.", "cls.", "lm_head.")) or k == "embeddings.position_ids":
                sd.pop(k)
        sd.finalize()
        self.params = p

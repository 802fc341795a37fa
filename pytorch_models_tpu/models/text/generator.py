"""Autoregressive text generation with a jitted KV-cached decode loop.

API-compatible with the reference ``DecoderGenerator`` (reference
text/generator.py:11-37): greedy (``topk=1``) or top-k sampling, EOS stop,
same tokenizer protocol. The implementation is TPU-native instead of the
reference's per-token full re-forward + ``.item()`` host sync: one jitted
prefill over the (bucket-padded) prompt fills the KV cache, then a single
``lax.while_loop`` generates tokens on-device with no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ._decoder_lm import decoder_lm_forward_cached, decoder_lm_make_cache

PROMPT_BUCKET = 64  # prompts are right-padded to a multiple of this to bound recompiles


def _sample(logits: jnp.ndarray, key, topk: int) -> jnp.ndarray:
    """Greedy or top-k sampling over 1D logits (ref generator.py:26-31)."""
    if topk == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    vals, idx = lax.top_k(logits, topk)
    choice = jax.random.categorical(key, vals)
    return idx[choice].astype(jnp.int32)


@partial(jax.jit, static_argnums=(1, 5))
def _generate(params, cfg, prompt_buf, n_prompt, limit, topk, eos_id, key):
    """Prefill + while_loop decode, fully on device.

    ``prompt_buf``: (P,) right-padded prompt, P a static bucket multiple.
    ``limit``: total token budget (prompt + max_tokens, ≤ cfg.max_seq_len).
    Returns ``(tokens_buf (max_seq_len,), length)``.
    """
    caches = decoder_lm_make_cache(cfg)
    logits, caches = decoder_lm_forward_cached(params, cfg, prompt_buf, caches, 0)
    last_logits = lax.dynamic_index_in_dim(logits, n_prompt - 1, axis=0, keepdims=False)

    tokens_buf = jnp.zeros((cfg.max_seq_len,), jnp.int32)
    tokens_buf = lax.dynamic_update_slice(tokens_buf, prompt_buf.astype(jnp.int32), (0,))

    key, sub = jax.random.split(key)
    first = _sample(last_logits, sub, topk)
    tokens_buf = lax.dynamic_update_slice(tokens_buf, first[None], (n_prompt,))
    state = (tokens_buf, n_prompt + 1, caches, key, first == eos_id)

    def cond(s):
        _, pos, _, _, done = s
        return jnp.logical_and(jnp.logical_not(done), pos < limit)

    def body(s):
        buf, pos, caches, key, _ = s
        tok = lax.dynamic_slice(buf, (pos - 1,), (1,))
        logits, caches = decoder_lm_forward_cached(params, cfg, tok, caches, pos - 1)
        key, sub = jax.random.split(key)
        nxt = _sample(logits[0], sub, topk)
        buf = lax.dynamic_update_slice(buf, nxt[None], (pos,))
        return (buf, pos + 1, caches, key, nxt == eos_id)

    tokens_buf, length, _, _, _ = lax.while_loop(cond, body, state)
    return tokens_buf, length


class DecoderGenerator:
    """Drop-in equivalent of the reference DecoderGenerator (generator.py:11-37)."""

    def __init__(self, model, tokenizer) -> None:
        self.model = model
        self.tokenizer = tokenizer

    def generate(self, prompt: str, max_tokens: int = 100, topk: int = 1, seed: int = 0) -> str:
        tokens = self.tokenizer.encode(prompt)
        out = self.generate_tokens(tokens, max_tokens=max_tokens, topk=topk, seed=seed)
        return self.tokenizer.decode(out)

    def generate_tokens(self, tokens: list[int], max_tokens: int = 100, topk: int = 1, seed: int = 0) -> list[int]:
        cfg = self.model.cfg
        n = len(tokens)
        if max_tokens <= 0 or n >= cfg.max_seq_len:
            return list(tokens)
        pad = -(-n // PROMPT_BUCKET) * PROMPT_BUCKET
        pad = min(pad, cfg.max_seq_len)
        assert n <= pad, f"prompt too long for context {cfg.max_seq_len}"
        prompt_buf = np.zeros((pad,), np.int32)
        prompt_buf[:n] = tokens

        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is None:
            eos = -1  # never matches
        limit = min(n + max_tokens, cfg.max_seq_len)
        buf, length = _generate(
            self.model.params, cfg, jnp.asarray(prompt_buf), n, limit, topk, eos, jax.random.PRNGKey(seed)
        )
        length = int(length)
        return np.asarray(buf)[:length].tolist()

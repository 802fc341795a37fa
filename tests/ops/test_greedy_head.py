"""Fused greedy head: argmax parity vs the logits path (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pytorch_models_tpu.ops.greedy_head import greedy_argmax_tied
from tests.oracle import rng


def test_greedy_argmax_parity():
    r = rng(201)
    b, d, v = 8, 128, 5000  # v not a chunk multiple -> edge-block masking
    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    emb = jnp.asarray(r.standard_normal((v, d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = greedy_argmax_tied(x, emb)
    expected = jnp.argmax(x @ emb.T, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_greedy_argmax_multi_chunk():
    r = rng(202)
    b, d, v = 2, 128, 9000  # > 2 chunks at CHUNK=4096
    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    emb = jnp.asarray(r.standard_normal((v, d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = greedy_argmax_tied(x, emb)
    expected = jnp.argmax(x @ emb.T, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_greedy_head_end_to_end_generation():
    """Generation with the fused head == the logits+argmax path."""
    jax.clear_caches()
    from pytorch_models_tpu.models.text import GPT2, DecoderGenerator
    from pytorch_models_tpu.ops import attention as attn_mod

    class Tok:
        eos_token_id = -1

    GPT2.vocab_size, GPT2.max_seq_len = 300, 128
    try:
        m = GPT2(2, 128)
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024
    gen = DecoderGenerator(m, Tok())
    prompts = [[5, 6, 7], [9] * 40, [11, 12]]
    attn_mod.USE_GREEDY_HEAD = False
    try:
        base_s = gen.generate_tokens([5, 6, 7], max_tokens=8)
        base_b = gen.generate_tokens_batch(prompts, max_tokens=6)
    finally:
        attn_mod.USE_GREEDY_HEAD = None

    attn_mod.USE_GREEDY_HEAD = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            fused_s = gen.generate_tokens([5, 6, 7], max_tokens=8)
            fused_b = gen.generate_tokens_batch(prompts, max_tokens=6)
    finally:
        attn_mod.USE_GREEDY_HEAD = None
        jax.clear_caches()
    assert fused_s == base_s
    assert fused_b == base_b

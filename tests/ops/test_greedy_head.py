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


def test_greedy_argmax_classifier_parity():
    """(d, V) classifier layout (T5)."""
    r = rng(203)
    b, d, v = 4, 128, 3000
    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    w = jnp.asarray(r.standard_normal((d, v)), jnp.float32)
    from pytorch_models_tpu.ops.greedy_head import greedy_argmax

    with pltpu.force_tpu_interpret_mode():
        got = greedy_argmax(x, w)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.argmax(x @ w, axis=-1).astype(jnp.int32)))


def test_greedy_head_whisper_t5_generation():
    """Whisper + T5 generation with the fused head == the logits path."""
    import numpy as np_

    jax.clear_caches()
    from pytorch_models_tpu.models.audio2text.whisper import Whisper, WhisperGenerator
    from pytorch_models_tpu.models.text.t5 import T5Generator, T5Model
    from pytorch_models_tpu.ops import attention as attn_mod

    w = Whisper(vocab_size=64, n_layers=2, d_model=128)
    wg = WhisperGenerator(w)
    audio = np_.random.default_rng(0).standard_normal(16000 * 2).astype(np_.float32) * 0.1
    t5 = T5Model(vocab_size=100, dim=64, n_heads=2, n_layers=2, mlp_dim=128)
    tg = T5Generator(model=t5, tokenizer=object())

    attn_mod.USE_GREEDY_HEAD = False
    try:
        base_w = wg.transcribe_tokens(audio, [1, 2], eot_id=-1, max_tokens=8)
        base_wb = wg.transcribe_tokens_batch([audio, audio * 0.5], [1, 2], eot_id=-1, max_tokens=6)
        base_t = tg.generate_tokens([7, 8, 9], 10, 0, 1)
        base_tb = tg.generate_tokens_batch([[7, 8, 9], [5] * 6], 10, 0, 1)
    finally:
        attn_mod.USE_GREEDY_HEAD = None

    attn_mod.USE_GREEDY_HEAD = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            assert wg.transcribe_tokens(audio, [1, 2], eot_id=-1, max_tokens=8) == base_w
            assert wg.transcribe_tokens_batch([audio, audio * 0.5], [1, 2], eot_id=-1,
                                              max_tokens=6) == base_wb
            assert tg.generate_tokens([7, 8, 9], 10, 0, 1) == base_t
            assert tg.generate_tokens_batch([[7, 8, 9], [5] * 6], 10, 0, 1) == base_tb
    finally:
        attn_mod.USE_GREEDY_HEAD = None
        jax.clear_caches()

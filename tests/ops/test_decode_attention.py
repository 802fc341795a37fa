"""Decode-attention kernel parity vs the einsum path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pytorch_models_tpu.ops.attention import _sdpa_xla
from pytorch_models_tpu.ops.decode_attention import decode_attention
from tests.oracle import rng


@pytest.mark.parametrize("pos", [0, 5, 511, 700, 1023])
def test_decode_attention_parity(pos):
    r = rng(161)
    b, h, l_max, d = 2, 3, 1024, 64
    q = jnp.asarray(r.standard_normal((b, h, 1, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, h, l_max, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, h, l_max, d)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        out = decode_attention(q, k, v, pos)

    # oracle: mask positions > pos, full einsum
    col = jnp.arange(l_max)
    bias = jnp.where(col <= pos, 0.0, -1e30).astype(jnp.float32)[None, None, None, :]
    expected = _sdpa_xla(q, k, v, bias, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_decode_kernel_end_to_end_generation():
    """GPT-2 generation with the decode kernel == the masked-sdpa path."""
    import jax

    jax.clear_caches()
    from pytorch_models_tpu.models.text import GPT2, DecoderGenerator
    from pytorch_models_tpu.ops import attention as attn_mod

    class Tok:
        eos_token_id = -1

        def encode(self, s):
            return [1, 2, 3]

        def decode(self, t):
            return t

    m = GPT2.__new__(GPT2)
    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        m = GPT2(2, 64)
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024
    gen = DecoderGenerator(m, Tok())
    baseline = gen.generate_tokens([5, 6, 7], max_tokens=10)

    attn_mod.USE_DECODE_KERNEL = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            kernel_out = gen.generate_tokens([5, 6, 7], max_tokens=10)
    finally:
        attn_mod.USE_DECODE_KERNEL = False
        jax.clear_caches()
    assert kernel_out == baseline


def test_decode_kernel_end_to_end_batched_generation():
    """LEFT-padded batched generation with the decode kernel engaged (pad_lens
    threaded through decoder_apply/mha_apply) == the masked-sdpa path."""
    import jax

    jax.clear_caches()
    from pytorch_models_tpu.models.text import GPT2, DecoderGenerator
    from pytorch_models_tpu.ops import attention as attn_mod

    class Tok:
        eos_token_id = -1

    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        m = GPT2(2, 64)
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024
    gen = DecoderGenerator(m, Tok())
    prompts = [[5, 6, 7], [9] * 40, [11, 12]]  # unequal lengths -> real left-padding
    baseline = gen.generate_tokens_batch(prompts, max_tokens=8)

    attn_mod.USE_DECODE_KERNEL = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            kernel_out = gen.generate_tokens_batch(prompts, max_tokens=8)
    finally:
        attn_mod.USE_DECODE_KERNEL = False
        jax.clear_caches()
    assert kernel_out == baseline


def test_decode_attention_left_padded_rows():
    """Per-row left-pad masking (batched generation) matches the einsum oracle."""
    r = rng(162)
    b, h, l_max, d = 3, 2, 512, 64
    q = jnp.asarray(r.standard_normal((b, h, 1, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, h, l_max, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, h, l_max, d)), jnp.float32)
    pos, pads = 300, jnp.asarray([0, 7, 299], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out = decode_attention(q, k, v, pos, pad_lens=pads)

    col = jnp.arange(l_max)
    valid = (col[None, :] <= pos) & (col[None, :] >= pads[:, None])  # (B, L)
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    expected = _sdpa_xla(q, k, v, bias, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)

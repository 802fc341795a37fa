"""Decode-attention kernel parity vs the einsum path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pytorch_models_tpu.ops.attention import _sdpa_xla
from pytorch_models_tpu.ops.decode_attention import decode_attention
from tests.oracle import rng


def _split(x, h):
    b, l, hd = x.shape
    return x.reshape(b, l, h, hd // h).transpose(0, 2, 1, 3)


def _oracle(q, k, v, h, bias):
    qh, kh, vh = _split(q, h), _split(k, h), _split(v, h)
    out = _sdpa_xla(qh, kh, vh, bias, False)  # (B, H, 1, D)
    b = out.shape[0]
    return out.transpose(0, 2, 1, 3).reshape(b, 1, -1)


@pytest.mark.parametrize("pos", [0, 5, 511, 700, 1023])
def test_decode_attention_parity(pos):
    r = rng(161)
    b, h, l_max, d = 2, 3, 1024, 64
    q = jnp.asarray(r.standard_normal((b, 1, h * d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        out = decode_attention(q, k, v, pos + 1, h)

    col = jnp.arange(l_max)
    bias = jnp.where(col <= pos, 0.0, -1e30).astype(jnp.float32)[None, None, None, :]
    expected = _oracle(q, k, v, h, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_decode_attention_unbatched():
    r = rng(163)
    h, l_max, d = 4, 256, 32
    q = jnp.asarray(r.standard_normal((1, h * d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((l_max, h * d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((l_max, h * d)), jnp.float32)
    pos = 77

    with pltpu.force_tpu_interpret_mode():
        out = decode_attention(q, k, v, pos + 1, h)

    col = jnp.arange(l_max)
    bias = jnp.where(col <= pos, 0.0, -1e30).astype(jnp.float32)[None, None, None, :]
    expected = _oracle(q[None], k[None], v[None], h, bias)[0]
    assert out.shape == (1, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_decode_attention_per_row_ends():
    """Per-row ends (cross-attention over right-padded memory rows)."""
    r = rng(164)
    b, h, l_max, d = 3, 2, 512, 64
    q = jnp.asarray(r.standard_normal((b, 1, h * d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)
    ends = jnp.asarray([512, 300, 1], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out = decode_attention(q, k, v, ends, h)

    col = jnp.arange(l_max)
    bias = jnp.where(col[None, :] < ends[:, None], 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    expected = _oracle(q, k, v, h, bias)
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

    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        m = GPT2(2, 64)
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024
    gen = DecoderGenerator(m, Tok())
    attn_mod.USE_DECODE_KERNEL = False
    try:
        baseline = gen.generate_tokens([5, 6, 7], max_tokens=10)
    finally:
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_DECODE_KERNEL = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            kernel_out = gen.generate_tokens([5, 6, 7], max_tokens=10)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
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
    attn_mod.USE_DECODE_KERNEL = False
    try:
        baseline = gen.generate_tokens_batch(prompts, max_tokens=8)
    finally:
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_DECODE_KERNEL = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            kernel_out = gen.generate_tokens_batch(prompts, max_tokens=8)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
        jax.clear_caches()
    assert kernel_out == baseline


def test_decode_attention_left_padded_rows():
    """Per-row left-pad masking (batched generation) matches the einsum oracle."""
    r = rng(162)
    b, h, l_max, d = 3, 2, 512, 64
    q = jnp.asarray(r.standard_normal((b, 1, h * d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)
    pos, pads = 300, jnp.asarray([0, 7, 299], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out = decode_attention(q, k, v, pos + 1, h, pad_lens=pads)

    col = jnp.arange(l_max)
    valid = (col[None, :] <= pos) & (col[None, :] >= pads[:, None])  # (B, L)
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    expected = _oracle(q, k, v, h, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_decode_attention_shared_bias():
    """Batch-shared key-major additive bias (T5 rel-pos layout)."""
    r = rng(165)
    b, h, l_max, d = 2, 3, 512, 64
    q = jnp.asarray(r.standard_normal((b, 1, h * d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)
    bias_kh = jnp.asarray(r.standard_normal((1, l_max, h)), jnp.float32)
    pos = 300

    with pltpu.force_tpu_interpret_mode():
        out = decode_attention(q, k, v, pos + 1, h, bias=bias_kh)

    col = jnp.arange(l_max)
    mask = jnp.where(col <= pos, 0.0, -1e30).astype(jnp.float32)[None, None, None, :]
    bias_hql = jnp.moveaxis(bias_kh, -1, 0)[:, None, :].transpose(1, 0, 2, 3)  # (1,H,1,L)
    expected = _oracle(q, k, v, h, bias_hql + mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_decode_attention_per_row_bias_and_pads():
    """Per-row bias composed with left pads and a shared end."""
    r = rng(166)
    b, h, l_max, d = 3, 2, 256, 64
    q = jnp.asarray(r.standard_normal((b, 1, h * d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, l_max, h * d)), jnp.float32)
    bias_kh = jnp.asarray(r.standard_normal((b, l_max, h)), jnp.float32)
    pos, pads = 200, jnp.asarray([0, 3, 128], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out = decode_attention(q, k, v, pos + 1, h, pad_lens=pads, bias=bias_kh)

    col = jnp.arange(l_max)
    valid = (col[None, :] <= pos) & (col[None, :] >= pads[:, None])
    mask = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    bias_bhql = jnp.moveaxis(bias_kh, -1, 1)[:, :, None, :]  # (B,H,1,L)
    expected = _oracle(q, k, v, h, bias_bhql + mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_decode_kernel_end_to_end_t5_generation():
    """T5 greedy generation (rel-pos bias through the kernel) == einsum path."""
    import jax

    jax.clear_caches()
    from pytorch_models_tpu.models.text.t5 import T5Generator, T5Model
    from pytorch_models_tpu.ops import attention as attn_mod

    m = T5Model(vocab_size=100, dim=64, n_heads=2, n_layers=2, mlp_dim=128)
    gen = T5Generator(model=m, tokenizer=object())
    prompt = [7, 8, 9, 4, 5]
    attn_mod.USE_DECODE_KERNEL = False
    try:
        baseline = gen.generate_tokens(prompt, 12, 0, 1)
    finally:
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_DECODE_KERNEL = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            kernel_out = gen.generate_tokens(prompt, 12, 0, 1)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
        jax.clear_caches()
    assert kernel_out == baseline

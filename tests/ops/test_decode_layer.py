"""Fused decode-layer kernels: parity vs the op-per-op path (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pytorch_models_tpu import transformer as tfm
from pytorch_models_tpu.ops import layer_norm, linear
from pytorch_models_tpu.ops.decode_layer import decode_ffn, decode_qkv
from tests.oracle import rng


@pytest.fixture
def layer():
    cfg = tfm.LayerConfig.make(128, n_heads=2, act="approximate_gelu")
    params = tfm.layer_init(jax.random.PRNGKey(5), cfg)
    return cfg, params


def test_decode_qkv_parity(layer):
    cfg, p = layer
    r = rng(191)
    x = jnp.asarray(r.standard_normal((4, cfg.d_model)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        q, k, v = decode_qkv(x, p["sa_norm"], p["sa"], cfg.norm_eps)
    h = layer_norm(p["sa_norm"], x, cfg.norm_eps)
    for got, key in ((q, "q"), (k, "k"), (v, "v")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(linear(p["sa"][key], h)),
                                   rtol=2e-5, atol=2e-5)


def test_decode_ffn_parity(layer):
    cfg, p = layer
    r = rng(192)
    x = jnp.asarray(r.standard_normal((4, cfg.d_model)), jnp.float32)
    ctx = jnp.asarray(r.standard_normal((4, cfg.n_heads * cfg.head_dim)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = decode_ffn(x, ctx, p["sa"]["o"], p["mlp_norm"], p["mlp"], cfg.act, cfg.norm_eps)
    x1 = x + linear(p["sa"]["o"], ctx)
    expected = x1 + tfm.mlp_apply(p["mlp"], layer_norm(p["mlp_norm"], x1, cfg.norm_eps), cfg.act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_fused_layer_end_to_end_generation():
    """GPT-2 generation with the fused decode layer == the op-per-op path."""
    jax.clear_caches()
    from pytorch_models_tpu.models.text import GPT2, DecoderGenerator
    from pytorch_models_tpu.ops import attention as attn_mod

    class Tok:
        eos_token_id = -1

    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        m = GPT2(2, 128)
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024
    gen = DecoderGenerator(m, Tok())
    prompts = [[5, 6, 7], [9] * 40, [11, 12]]
    attn_mod.USE_DECODE_KERNEL = False
    try:
        base_s = gen.generate_tokens([5, 6, 7], max_tokens=8)
        base_b = gen.generate_tokens_batch(prompts, max_tokens=6)
    finally:
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_DECODE_KERNEL = attn_mod.USE_FUSED_LAYER = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            fused_s = gen.generate_tokens([5, 6, 7], max_tokens=8)
            fused_b = gen.generate_tokens_batch(prompts, max_tokens=6)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
        attn_mod.USE_FUSED_LAYER = False
        jax.clear_caches()
    assert fused_s == base_s
    assert fused_b == base_b

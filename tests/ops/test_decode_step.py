"""Fused decode-step megakernel parity vs the per-layer path (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

import pytorch_models_tpu.transformer as tfm
from pytorch_models_tpu.ops import attention as attn_mod
from pytorch_models_tpu.ops.decode_step import (
    fused_decode_step,
    fused_step_eligible,
    pack_decode_weights,
)
from tests.oracle import rng


def _setup(b=4, d=128, n_heads=2, dff_ratio=4.0, n_layers=2, l_max=128):
    cfg = tfm.LayerConfig.make(d, n_heads=n_heads, mlp_ratio=dff_ratio,
                               act="approximate_gelu")
    params = tfm.decoder_init(jax.random.PRNGKey(0), n_layers, cfg)
    return cfg, params


def test_fused_step_matches_layer_stack():
    r = rng(191)
    b, d, n_layers, l_max, pos = 4, 128, 2, 128, 37
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    hd = cfg.n_heads * cfg.head_dim
    assert fused_step_eligible(params["layers"], cfg, l_max)

    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    pads = jnp.asarray([0, 1, 5, 0], jnp.int32)

    packed = pack_decode_weights(params["layers"], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new = fused_decode_step(
            x, packed, caches["k"], caches["v"], pos, pads,
            n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps)

    # oracle: the per-layer einsum path (cache write at pos, then attend)
    attn_mod.USE_DECODE_KERNEL = False
    try:
        ref, new_caches = tfm.decoder_apply(
            params, cfg, x[:, None, :], self_caches=dict(caches), pos=pos, pad_lens=pads)
    finally:
        attn_mod.USE_DECODE_KERNEL = None

    np.testing.assert_allclose(np.asarray(x_out), np.asarray(ref[:, 0, :]),
                               rtol=2e-4, atol=2e-4)
    # the k/v the caller writes at ``pos`` must match the oracle's cache write
    np.testing.assert_allclose(np.asarray(k_new), np.asarray(new_caches["k"][:, :, pos, :]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(new_caches["v"][:, :, pos, :]),
                               rtol=2e-5, atol=2e-5)


def test_fused_step_pos_zero():
    """First generated position: no cache blocks, only the current K/V."""
    r = rng(192)
    b, d, n_layers, l_max = 2, 128, 2, 64
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    hd = cfg.n_heads * cfg.head_dim
    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    zeros = jnp.zeros((n_layers, b, l_max, hd), jnp.float32)
    packed = pack_decode_weights(params["layers"], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x_out, _, _ = fused_decode_step(x, packed, zeros, zeros, 0, None,
                                        n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps)

    attn_mod.USE_DECODE_KERNEL = False
    try:
        ref, _ = tfm.decoder_apply(params, cfg, x[:, None, :],
                                   self_caches={"k": zeros, "v": zeros}, pos=0)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(ref[:, 0, :]),
                               rtol=2e-4, atol=2e-4)


def test_fused_step_end_to_end_batched_generation():
    """LEFT-padded batched generation through the fused step == per-op path."""
    jax.clear_caches()
    from pytorch_models_tpu.models.text import GPT2, DecoderGenerator

    class Tok:
        eos_token_id = -1

    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        m = GPT2(2, 128)
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024
    gen = DecoderGenerator(m, Tok())
    prompts = [[5, 6, 7], [9] * 40, [11, 12]]

    attn_mod.USE_FUSED_STEP = False
    attn_mod.USE_DECODE_KERNEL = False
    try:
        baseline = gen.generate_tokens_batch(prompts, max_tokens=8)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_FUSED_STEP = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            fused_out = gen.generate_tokens_batch(prompts, max_tokens=8)
    finally:
        attn_mod.USE_FUSED_STEP = None
        jax.clear_caches()
    assert fused_out == baseline

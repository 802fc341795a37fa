"""Fused decode-step megakernel parity vs the per-layer path (interpret).

Deep-ring configs (>= 3 blocks/tiles per double-buffered stream) are
interpret-testable since the round-4 post-read prefetch fix (PERF.md #35):
interpret executes every ``start()`` eagerly, so it deterministically
catches any prefetch that overwrites a slot before its last read — the
exact hazard that corrupted deep rings on hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


@pytest.mark.parametrize("l_max,pos", [(128, 37), (1024, 960)])
def test_fused_step_matches_layer_stack(l_max, pos):
    """(1024, 960) = 8-block self-KV ring (deep-ring regression, PERF #35)."""
    r = rng(191)
    b, d, n_layers = 4, 128, 2
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


@pytest.mark.parametrize("v", [300, 16384])
def test_fused_step_with_head_phase(v):
    """The in-kernel greedy head (final norm + streamed argmax) must pick the
    same token as the reference head path. v=16384 streams the table as a
    4-tile deep ring (deep-ring regression, PERF #35)."""
    from pytorch_models_tpu.ops.decode_step import fused_decode_step, pack_greedy_head

    r = rng(196)
    b, d, n_layers, l_max, pos = 4, 128, 2, 128, 17
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    hd = cfg.n_heads * cfg.head_dim
    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    emb = jnp.asarray(r.standard_normal((v, d)), jnp.float32)
    fnorm = {"scale": jnp.asarray(1 + 0.1 * r.standard_normal(d), jnp.float32),
             "bias": jnp.asarray(0.1 * r.standard_normal(d), jnp.float32)}

    packed = pack_decode_weights(params["layers"], jnp.float32)
    head, head_v = pack_greedy_head(emb, fnorm, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x_out, _, _, tok = fused_decode_step(
            x, packed, caches["k"], caches["v"], pos, None,
            n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps,
            head=head, head_v=head_v)

    attn_mod.USE_DECODE_KERNEL = False
    try:
        ref, _ = tfm.decoder_apply(params, cfg, x[:, None, :],
                                   self_caches=dict(caches), pos=pos)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
    from pytorch_models_tpu.ops import layer_norm

    logits = layer_norm(fnorm, ref[:, 0, :]) @ emb.T
    np.testing.assert_array_equal(np.asarray(tok), np.argmax(np.asarray(logits), axis=-1))
    assert tok.shape == (b,) and tok.dtype == jnp.int32


@pytest.mark.parametrize("l_max,pos,l_mem,valid_lens",
                         [(128, 21, 40, (40, 17, 3, 40)),
                          (1024, 960, 1024, (1000, 17, 3, 640))])
def test_fused_cross_step_matches_layer_stack(l_max, pos, l_mem, valid_lens):
    """Whisper-style decoder: self-attn + cross-attn over padded memory.

    The (1024, 960, 1024) case runs BOTH streams as 8-block deep rings
    (deep-ring regression, PERF #35)."""
    from pytorch_models_tpu.ops.decode_step import fused_cross_decode_step

    r = rng(193)
    b, d, n_layers = 4, 128, 2
    cfg = tfm.LayerConfig.make(d, n_heads=2, cross_attn=True)
    params = tfm.decoder_init(jax.random.PRNGKey(1), n_layers, cfg)
    hd = cfg.n_heads * cfg.head_dim

    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    memory = jnp.asarray(r.standard_normal((b, l_mem, d)), jnp.float32)
    valid = jnp.asarray(valid_lens, jnp.int32)
    cross = tfm.precompute_cross_caches(params, cfg, memory, valid_lens=valid)
    pads = jnp.asarray([0, 2, 0, 1], jnp.int32)

    packed = pack_decode_weights(params["layers"], jnp.float32, cross=True)
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new = fused_cross_decode_step(
            x, packed, caches["k"], caches["v"], cross["k"], cross["v"],
            cross["len"][0], pos, pads, n_heads=cfg.n_heads, act=cfg.act,
            eps=cfg.norm_eps, norm="ln")

    attn_mod.USE_DECODE_KERNEL = False
    try:
        ref, new_caches = tfm.decoder_apply(
            params, cfg, x[:, None, :], self_caches=dict(caches),
            cross_caches=cross, pos=pos, pad_lens=pads)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(ref[:, 0, :]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(k_new), np.asarray(new_caches["k"][:, :, pos, :]),
                               rtol=2e-5, atol=2e-5)


def test_fused_cross_step_b1_large_kv_blocks():
    """B=1 with 512-slot self cache and 512-key cross memory: _pick_kv_block
    grows both streams to the 512-key cap (one block each) — the whisper
    single-segment serving configuration (PERF.md ledger #21)."""
    from pytorch_models_tpu.ops.decode_step import _pick_kv_block, fused_cross_decode_step

    # f32 at B=1: 32-key block = 16 KB, so the picker should hit the cap
    assert _pick_kv_block(512, 1, 128, 4) == 512
    assert _pick_kv_block(512, 1, 128, 2) == 512

    r = rng(311)
    b, d, n_layers, l_max, pos, l_mem = 1, 128, 2, 512, 37, 512
    cfg = tfm.LayerConfig.make(d, n_heads=2, cross_attn=True)
    params = tfm.decoder_init(jax.random.PRNGKey(7), n_layers, cfg)
    hd = cfg.n_heads * cfg.head_dim

    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    memory = jnp.asarray(r.standard_normal((b, l_mem, d)), jnp.float32)
    valid = jnp.asarray([409], jnp.int32)  # partial validity inside one big block
    cross = tfm.precompute_cross_caches(params, cfg, memory, valid_lens=valid)
    pads = jnp.zeros((b,), jnp.int32)

    packed = pack_decode_weights(params["layers"], jnp.float32, cross=True)
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new = fused_cross_decode_step(
            x, packed, caches["k"], caches["v"], cross["k"], cross["v"],
            cross["len"][0], pos, pads, n_heads=cfg.n_heads, act=cfg.act,
            eps=cfg.norm_eps, norm="ln")

    attn_mod.USE_DECODE_KERNEL = False
    try:
        ref, new_caches = tfm.decoder_apply(
            params, cfg, x[:, None, :], self_caches=dict(caches),
            cross_caches=cross, pos=pos, pad_lens=pads)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(ref[:, 0, :]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(k_new), np.asarray(new_caches["k"][:, :, pos, :]),
                               rtol=2e-5, atol=2e-5)


def test_fused_t5_step_matches_block_stack():
    """T5-style decoder: RMSNorm, bias-free projections, GEGLU, rel-pos bias."""
    from pytorch_models_tpu.models.text.t5 import (
        T5Config,
        relative_position_bias,
        t5_block_apply,
        t5_stack_init,
    )
    from pytorch_models_tpu.ops.decode_step import fused_cross_decode_step

    r = rng(194)
    b, pos, l_mem = 3, 13, 24
    cfg = T5Config(vocab_size=100, dim=128, n_heads=2, n_layers=2, mlp_dim=256)
    lc = cfg.layer
    hd = lc.n_heads * lc.head_dim
    l_max = tfm.padded_cache_len(48)
    dec = t5_stack_init(jax.random.PRNGKey(2), cfg, cross_attn=True)

    x = jnp.asarray(r.standard_normal((b, 1, cfg.dim)), jnp.float32)
    caches = [
        {"k": jnp.asarray(r.standard_normal((b, l_max, hd)), jnp.float32),
         "v": jnp.asarray(r.standard_normal((b, l_max, hd)), jnp.float32)}
        for _ in range(cfg.n_layers)
    ]
    memory = jnp.asarray(r.standard_normal((b, l_mem, cfg.dim)), jnp.float32)
    valid = jnp.asarray([24, 9, 24], jnp.int32)
    cross = tfm.precompute_cross_caches(dec, lc, memory, valid_lens=valid)

    bias_table = relative_position_bias(
        dec["attn_bias"], jnp.arange(48), jnp.arange(l_max), False, cfg)
    bias = jax.lax.dynamic_slice(bias_table, (0, pos, 0),
                                 (bias_table.shape[0], 1, l_max))  # (H, 1, L)

    # oracle: per-layer t5 blocks with list caches (the production decode path)
    attn_mod.USE_DECODE_KERNEL = False
    try:
        h = x
        new_caches = []
        for i in range(cfg.n_layers):
            lp = jax.tree.map(lambda a: a[i], dec["layers"])
            cc = jax.tree.map(lambda a: a[i], cross)
            h, nc = t5_block_apply(lp, cfg, h, attn_bias=bias, self_cache=caches[i],
                                   cross_cache=cc, pos=pos)
            new_caches.append(nc)
    finally:
        attn_mod.USE_DECODE_KERNEL = None

    packed = pack_decode_weights(dec["layers"], jnp.float32, gated=True,
                                 cross=True, norm="rms")
    kc = jnp.stack([c["k"] for c in caches])
    vc = jnp.stack([c["v"] for c in caches])
    sbias = jnp.moveaxis(bias[:, 0, :], 0, -1)  # (L, H) key-major
    sbias = jnp.pad(sbias, ((0, 0), (0, 128 - sbias.shape[-1]))).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new = fused_cross_decode_step(
            x[:, 0, :], packed, kc, vc, cross["k"], cross["v"], cross["len"][0],
            pos, None, n_heads=lc.n_heads, act="approximate_gelu", eps=1e-5,
            norm="rms", gated=True, sbias=sbias)

    np.testing.assert_allclose(np.asarray(x_out), np.asarray(h[:, 0, :]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(k_new[0]), np.asarray(new_caches[0]["k"][:, pos, :]),
                               rtol=2e-5, atol=2e-5)


def test_fused_whisper_end_to_end_generation():
    """Whisper batched greedy decode through the fused cross step == per-op."""
    jax.clear_caches()
    from pytorch_models_tpu.models.audio2text.whisper import (
        Whisper,
        _whisper_generate_batch_body,
    )

    m = Whisper(vocab_size=64, n_layers=2, d_model=128)
    r = rng(195)
    memory = jnp.asarray(r.standard_normal((2, 64, 128)) * 0.3, jnp.float32)
    init = jnp.asarray([3, 5], jnp.int32)

    attn_mod.USE_FUSED_STEP = False
    attn_mod.USE_DECODE_KERNEL = False
    try:
        base_buf, base_len = _whisper_generate_batch_body(
            m.params, m.cfg, memory, init, 16, eot_id=-1)
        base_buf, base_len = np.asarray(base_buf), np.asarray(base_len)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_FUSED_STEP = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            f_buf, f_len = _whisper_generate_batch_body(
                m.params, m.cfg, memory, init, 16, eot_id=-1)
    finally:
        attn_mod.USE_FUSED_STEP = None
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(f_buf), base_buf)
    np.testing.assert_array_equal(np.asarray(f_len), base_len)


def test_fused_t5_end_to_end_generation():
    """T5 greedy generation through the fused step (single prompt routes as
    batch-of-1) == the per-op path."""
    jax.clear_caches()
    from pytorch_models_tpu.models.text.t5 import T5Generator, T5Model

    m = T5Model(vocab_size=100, dim=128, n_heads=2, n_layers=2, mlp_dim=256)
    gen = T5Generator(model=m, tokenizer=object())
    prompt = [7, 8, 9, 4, 5]

    attn_mod.USE_FUSED_STEP = False
    attn_mod.USE_DECODE_KERNEL = False
    try:
        baseline = gen.generate_tokens(prompt, 12, 0, 1)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_FUSED_STEP = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            fused_out = gen.generate_tokens(prompt, 12, 0, 1)
    finally:
        attn_mod.USE_FUSED_STEP = None
        jax.clear_caches()
    assert fused_out == baseline


def test_fused_step_topk_sampling_path():
    """topk>1 fused generation (hidden -> logits -> sample) == per-op path
    (same PRNG key stream: both paths split once per sampled token)."""
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
    prompts = [[5, 6, 7], [9] * 12]

    attn_mod.USE_FUSED_STEP = False
    attn_mod.USE_DECODE_KERNEL = False
    try:
        baseline = gen.generate_tokens_batch(prompts, max_tokens=6, topk=4, seed=3)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_FUSED_STEP = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            fused_out = gen.generate_tokens_batch(prompts, max_tokens=6, topk=4, seed=3)
    finally:
        attn_mod.USE_FUSED_STEP = None
        jax.clear_caches()
    assert fused_out == baseline


def test_fused_step_single_prompt_routes_through_batch():
    """Greedy single-prompt generation routes as batch-of-1 through the fused
    step and must match the unbatched per-op path token-for-token."""
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

    attn_mod.USE_FUSED_STEP = False
    attn_mod.USE_DECODE_KERNEL = False
    try:
        baseline = gen.generate_tokens([5, 6, 7], max_tokens=8)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_FUSED_STEP = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            fused_out = gen.generate_tokens([5, 6, 7], max_tokens=8)
    finally:
        attn_mod.USE_FUSED_STEP = None
        jax.clear_caches()
    assert fused_out == baseline


def test_fused_step_int8_weights():
    """int8 weight streaming: cast-only in-tile dequant + post-accumulation
    per-channel scale must match the XLA dequantize-then-matmul path."""
    from pytorch_models_tpu.utils.params import quantize_tree_int8

    r = rng(197)
    b, d, n_layers, l_max, pos = 4, 128, 2, 128, 33
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    qparams = {"layers": quantize_tree_int8(params["layers"])}
    hd = cfg.n_heads * cfg.head_dim
    assert fused_step_eligible(qparams["layers"], cfg, l_max)

    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    packed = pack_decode_weights(qparams["layers"], jnp.float32)
    assert packed["wqkv"].dtype == jnp.int8 and "s_qkv" in packed
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, _ = fused_decode_step(
            x, packed, caches["k"], caches["v"], pos, None,
            n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps)

    # oracle: the per-op path on the SAME quantized tree (linear dequantizes
    # w_q*w_s to bf16, so allow bf16-level tolerance)
    attn_mod.USE_DECODE_KERNEL = False
    try:
        ref, _ = tfm.decoder_apply(qparams, cfg, x[:, None, :],
                                   self_caches=dict(caches), pos=pos)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
    ref = np.asarray(ref[:, 0, :], np.float32)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(np.asarray(x_out, np.float32) - ref).max() / scale < 3e-2


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


def test_fused_step_a8_matches_w8a8_oracle():
    """w8a8 mode (``a8=True``): per-row dynamic activation quantization +
    int8 x int8 int32-exact dots per weight-stream phase. The int32
    accumulation is order-independent and exact, so an XLA oracle doing the
    SAME quantize -> int-dot -> rescale math must agree to fp32 roundoff.
    Checked against a full w8a8 re-implementation of the 2-layer stack."""
    from pytorch_models_tpu.utils.params import quantize_tree_int8

    r = rng(211)
    b, d, n_layers, l_max, pos = 4, 128, 2, 128, 33
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    qparams = {"layers": quantize_tree_int8(params["layers"])}
    hd = cfg.n_heads * cfg.head_dim

    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    packed = pack_decode_weights(qparams["layers"], jnp.float32)
    assert packed["wqkv"].dtype == jnp.int8
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new = fused_decode_step(
            x, packed, caches["k"], caches["v"], pos, None,
            n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps, a8=True)

    # ---- oracle: the same math in plain jnp -------------------------------
    def q_dot(h, w_q, col_s):
        absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        r_scale = jnp.where(absmax == 0.0, 1.0, absmax) * (1.0 / 127.0)
        h_q = jnp.clip(jnp.round(h / r_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(h_q, w_q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * r_scale * col_s

    def ln(h, p):
        m = h.mean(axis=-1, keepdims=True)
        v = ((h - m) ** 2).mean(axis=-1, keepdims=True)
        return (h - m) / jnp.sqrt(v + cfg.norm_eps) * p["scale"] + p["bias"]

    lp = qparams["layers"]
    hcur = x
    for li in range(n_layers):
        h1 = ln(hcur, {k: lp["sa_norm"][k][li] for k in ("scale", "bias")})
        wq = jnp.concatenate([lp["sa"][n]["w"]["w_q"][li] for n in ("q", "k", "v")], axis=-1)
        sq = jnp.concatenate([lp["sa"][n]["w"]["w_s"][li][0] for n in ("q", "k", "v")], axis=-1)
        bq = jnp.concatenate([lp["sa"][n]["b"][li] for n in ("q", "k", "v")], axis=-1)
        qkv = q_dot(h1, wq, sq) + bq
        q, k_n, v_n = qkv[:, :hd], qkv[:, hd:2 * hd], qkv[:, 2 * hd:]
        np.testing.assert_allclose(np.asarray(k_new[li]), np.asarray(k_n), rtol=2e-5, atol=2e-5)

        # attention over the valid prefix + current position (merged heads)
        dh = cfg.head_dim
        qh = q.reshape(b, cfg.n_heads, dh)
        kc = jnp.concatenate([caches["k"][li][:, :pos, :], k_n[:, None, :]], axis=1)
        vc = jnp.concatenate([caches["v"][li][:, :pos, :], v_n[:, None, :]], axis=1)
        kh = kc.reshape(b, pos + 1, cfg.n_heads, dh)
        vh = vc.reshape(b, pos + 1, cfg.n_heads, dh)
        s = jnp.einsum("bhd,bphd->bhp", qh, kh) / np.sqrt(dh)
        a = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhp,bphd->bhd", a, vh).reshape(b, hd)

        o = q_dot(ctx, lp["sa"]["o"]["w"]["w_q"][li], lp["sa"]["o"]["w"]["w_s"][li][0]) \
            + lp["sa"]["o"]["b"][li]
        hcur = hcur + o
        h2 = ln(hcur, {k: lp["mlp_norm"][k][li] for k in ("scale", "bias")})
        m1 = q_dot(h2, lp["mlp"]["fc1"]["w"]["w_q"][li], lp["mlp"]["fc1"]["w"]["w_s"][li][0]) \
            + lp["mlp"]["fc1"]["b"][li]
        g = 0.5 * m1 * (1.0 + jnp.tanh(np.sqrt(2 / np.pi) * (m1 + 0.044715 * m1 ** 3)))
        m2 = q_dot(g, lp["mlp"]["fc2"]["w"]["w_q"][li], lp["mlp"]["fc2"]["w"]["w_s"][li][0]) \
            + lp["mlp"]["fc2"]["b"][li]
        hcur = hcur + m2

    ref = np.asarray(hcur, np.float32)
    got = np.asarray(x_out, np.float32)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 1e-4, np.abs(got - ref).max() / scale


def test_fused_step_a8_requires_int8():
    cfg, params = _setup()
    packed = pack_decode_weights(params["layers"], jnp.float32)
    caches_k = jnp.zeros((2, 4, 128, 128), jnp.float32)
    try:
        fused_decode_step(jnp.zeros((4, 128), jnp.float32), packed, caches_k,
                          caches_k, 8, None, n_heads=cfg.n_heads, act=cfg.act,
                          eps=cfg.norm_eps, a8=True)
        raised = False
    except AssertionError:
        raised = True
    assert raised, "a8 over bf16-packed weights must be rejected"


def test_eager_warmup_matches_chained(monkeypatch):
    """The small-batch eager warmup (all phases' first tiles issued at layer
    entry) is a pure DMA-scheduling change: b=1 outputs must equal the
    chained-warmup path bit-for-bit. Covers cross-attention + head phases."""
    import os

    from pytorch_models_tpu.ops.decode_step import (
        fused_cross_decode_step, pack_greedy_head)

    r = rng(223)
    b, d, n_layers, l_max, lx, pos = 1, 128, 2, 128, 128, 33
    cfg = tfm.LayerConfig.make(d, n_heads=2, cross_attn=True, act="approximate_gelu")
    params = tfm.decoder_init(jax.random.PRNGKey(3), n_layers, cfg)
    hd = cfg.n_heads * cfg.head_dim
    packed = pack_decode_weights(params["layers"], jnp.float32, cross=True)
    head, head_v = pack_greedy_head(
        jnp.asarray(r.standard_normal((100, d)), jnp.float32),
        {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)},
        jnp.float32)
    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    kc = jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32)
    vc = jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32)
    xk = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32)
    xv = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32)

    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("DECODE_EAGER", mode)
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            outs[mode] = fused_cross_decode_step(
                x, packed, kc, vc, xk, xv, jnp.asarray([lx], jnp.int32), pos, None,
                n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps,
                head=head, head_v=head_v)
    monkeypatch.delenv("DECODE_EAGER")
    jax.clear_caches()
    for a, c in zip(outs["1"], outs["0"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_fused_step_a8_cross_gated_close_to_w8a16():
    """a8 over the cross-attention + GEGLU + RMSNorm kernel variant: the
    int8-activation path must stay within activation-quantization noise of
    the w8a16 cast path (covers the s_qc/s_oc and gated-scale branches)."""
    from pytorch_models_tpu.utils.params import quantize_tree_int8
    from pytorch_models_tpu.ops.decode_step import fused_cross_decode_step

    r = rng(229)
    b, d, n_layers, l_max, lx, pos = 2, 128, 2, 128, 128, 17
    cfg = tfm.LayerConfig.make(d, n_heads=2, cross_attn=True, act="approximate_gelu")
    params = tfm.decoder_init(jax.random.PRNGKey(5), n_layers, cfg)
    qlayers = quantize_tree_int8(params["layers"])
    hd = cfg.n_heads * cfg.head_dim
    packed = pack_decode_weights(qlayers, jnp.float32, cross=True)
    assert packed["wqkv"].dtype == jnp.int8 and "s_qc" in packed

    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    kc = jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32)
    vc = jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32)
    xk = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32)
    xv = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32)
    lens = jnp.asarray([lx, lx - 32], jnp.int32)

    outs = {}
    for a8 in (False, True):
        with pltpu.force_tpu_interpret_mode():
            outs[a8] = fused_cross_decode_step(
                x, packed, kc, vc, xk, xv, lens, pos, None, n_heads=cfg.n_heads,
                act=cfg.act, eps=cfg.norm_eps, a8=a8)[0]
    ref = np.asarray(outs[False], np.float32)
    got = np.asarray(outs[True], np.float32)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 5e-2


def test_fused_step_embed_fold_matches_outside():
    """In-kernel embed phase (emb=/tok_ids=/pos_rows=) must be bit-identical
    to gathering the embeddings outside, across all three kernel variants:
    plain+pos (GPT-2), tok-only with head (T5-style), cross+pos (Whisper)."""
    from pytorch_models_tpu.ops.decode_step import (
        fused_cross_decode_step,
        pack_embed_tables,
        pack_greedy_head,
    )

    r = rng(231)
    b, d, n_layers, l_max, pos, v, pmax = 2, 128, 2, 128, 37, 300, 96
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    hd = cfg.n_heads * cfg.head_dim
    temb = jnp.asarray(r.standard_normal((v, d)), jnp.float32)
    pemb = jnp.asarray(r.standard_normal((pmax, d)), jnp.float32)
    tok = jnp.asarray([5, 299], jnp.int32)
    prow = jnp.full((b,), pos, jnp.int32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    packed = pack_decode_weights(params["layers"], jnp.float32)
    x = jnp.take(temb, tok, axis=0) + jnp.take(pemb, prow, axis=0)
    emb = pack_embed_tables(temb, pemb, jnp.float32)
    kw = dict(n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps)

    with pltpu.force_tpu_interpret_mode():
        ref = fused_decode_step(x, packed, caches["k"], caches["v"], pos, None, **kw)
        got = fused_decode_step(None, packed, caches["k"], caches["v"], pos, None,
                                emb=emb, tok_ids=tok, pos_rows=prow, **kw)
    for a, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(g))

    # tok-only (no position table) + greedy head phase
    fnorm = {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}
    head, head_v = pack_greedy_head(temb, fnorm, jnp.float32)
    x2 = jnp.take(temb, tok, axis=0)
    emb2 = pack_embed_tables(temb, None, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ref = fused_decode_step(x2, packed, caches["k"], caches["v"], pos, None,
                                head=head, head_v=head_v, **kw)
        got = fused_decode_step(None, packed, caches["k"], caches["v"], pos, None,
                                head=head, head_v=head_v, emb=emb2, tok_ids=tok, **kw)
    for a, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(g))

    # cross-attention variant (whisper): per-row memory lengths + pos table
    cfgx = tfm.LayerConfig.make(d, n_heads=2, cross_attn=True,
                                act="approximate_gelu")
    paramsx = tfm.decoder_init(jax.random.PRNGKey(1), n_layers, cfgx)
    packedx = pack_decode_weights(paramsx["layers"], jnp.float32, cross=True)
    lx = 64
    xk = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32)
    xv = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32)
    lens = jnp.asarray([40, 64], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        ref = fused_cross_decode_step(x, packedx, caches["k"], caches["v"],
                                      xk, xv, lens, pos, None, **kw)
        got = fused_cross_decode_step(None, packedx, caches["k"], caches["v"],
                                      xk, xv, lens, pos, None,
                                      emb=emb, tok_ids=tok, pos_rows=prow, **kw)
    for a, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(g))


def test_embed_fold_end_to_end_generation():
    """Batched GPT-2-style generation with the in-kernel embed phase forced on
    == the per-op baseline, token for token (left-padded rows exercise per-row
    position ids)."""
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
    prompts = [[5, 6, 7], [9] * 40]

    attn_mod.USE_FUSED_STEP = False
    attn_mod.USE_DECODE_KERNEL = False
    try:
        baseline = gen.generate_tokens_batch(prompts, max_tokens=8)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_FUSED_STEP = True
    attn_mod.USE_FUSED_EMBED = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            folded = gen.generate_tokens_batch(prompts, max_tokens=8)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_FUSED_EMBED = None
        jax.clear_caches()
    assert folded == baseline


def test_embed_fold_whisper_end_to_end():
    """Whisper batched greedy decode with the embed fold forced on == per-op."""
    jax.clear_caches()
    from pytorch_models_tpu.models.audio2text.whisper import (
        Whisper,
        _whisper_generate_batch_body,
    )

    m = Whisper(vocab_size=64, n_layers=2, d_model=128)
    r = rng(232)
    memory = jnp.asarray(r.standard_normal((2, 64, 128)) * 0.3, jnp.float32)
    init = jnp.asarray([3, 5], jnp.int32)

    attn_mod.USE_FUSED_STEP = False
    attn_mod.USE_DECODE_KERNEL = False
    try:
        base_buf, base_len = _whisper_generate_batch_body(
            m.params, m.cfg, memory, init, 16, eot_id=-1)
        base_buf, base_len = np.asarray(base_buf), np.asarray(base_len)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_FUSED_STEP = True
    attn_mod.USE_FUSED_EMBED = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            f_buf, f_len = _whisper_generate_batch_body(
                m.params, m.cfg, memory, init, 16, eot_id=-1)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_FUSED_EMBED = None
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(f_buf), base_buf)
    np.testing.assert_array_equal(np.asarray(f_len), base_len)


def test_embed_fold_t5_end_to_end():
    """T5 greedy generation with the embed fold forced on (tok-only embed
    phase, batch-of-1 route) == the per-op path."""
    jax.clear_caches()
    from pytorch_models_tpu.models.text.t5 import T5Generator, T5Model

    m = T5Model(vocab_size=100, dim=128, n_heads=2, n_layers=2, mlp_dim=256)
    gen = T5Generator(model=m, tokenizer=object())
    prompt = [7, 8, 9, 4, 5]

    attn_mod.USE_FUSED_STEP = False
    attn_mod.USE_DECODE_KERNEL = False
    try:
        baseline = gen.generate_tokens(prompt, 12, 0, 1)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_DECODE_KERNEL = None

    attn_mod.USE_FUSED_STEP = True
    attn_mod.USE_FUSED_EMBED = True
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            folded = gen.generate_tokens(prompt, 12, 0, 1)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_FUSED_EMBED = None
        jax.clear_caches()
    assert folded == baseline


def test_fused_step_a8_head_matches_int_oracle():
    """w8a8 greedy head (pack_greedy_head(a8=True)): the head table streams
    as per-vocab-row int8 and the head phase runs int8 x int8 -> int32 dots.
    int32 accumulation is exact, so an XLA oracle doing the SAME quantize ->
    int-dot -> per-row rescale -> argmax math must pick identical tokens.

    v=2000 -> TWO head tiles: exercises the per-tile scale slicing without
    reusing a double-buffer slot — interpret executes ``start()`` copies
    immediately, so any >=3-tile stream clobbers the slot it is reading
    (hardware's FIFO DMA queues serialize this; see stream()'s ring)."""
    from pytorch_models_tpu.ops.decode_step import fused_decode_step, pack_greedy_head
    from pytorch_models_tpu.utils.params import quantize_tree_int8

    r = rng(241)
    b, d, n_layers, l_max, pos, v = 4, 128, 2, 128, 21, 2000
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    qlayers = quantize_tree_int8(params["layers"])
    hd = cfg.n_heads * cfg.head_dim
    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    emb = jnp.asarray(r.standard_normal((v, d)), jnp.float32)
    fnorm = {"scale": jnp.asarray(1 + 0.1 * r.standard_normal(d), jnp.float32),
             "bias": jnp.asarray(0.1 * r.standard_normal(d), jnp.float32)}

    packed = pack_decode_weights(qlayers, jnp.float32)
    head, head_v = pack_greedy_head(emb, fnorm, jnp.float32, a8=True)
    assert head["emb"].dtype == jnp.int8 and "emb_s" in head
    assert head["emb"].shape[0] % head["emb_s"].shape[1] == 0
    kw = dict(n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps, a8=True)
    with pltpu.force_tpu_interpret_mode():
        x_out, _, _, tok = fused_decode_step(
            x, packed, caches["k"], caches["v"], pos, None,
            head=head, head_v=head_v, **kw)
        # same stack without the head phase -> the oracle's hidden state
        x_ref, _, _ = fused_decode_step(
            x, packed, caches["k"], caches["v"], pos, None, **kw)
    np.testing.assert_array_equal(np.asarray(x_out), np.asarray(x_ref))

    # ---- oracle: final norm -> per-row quant -> int32 dot -> rescale ------
    # (the kernel's own _norm: a different LN formulation differs in ULPs,
    # which flips int8 rounding and with it near-tie argmax winners)
    from pytorch_models_tpu.ops.decode_step import _norm

    xn = _norm(x_ref, fnorm["scale"][None], fnorm["bias"][None],
               cfg.norm_eps, "ln").astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xn), axis=1, keepdims=True)
    r_scale = jnp.where(absmax == 0.0, 1.0, absmax) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xn / r_scale), -127, 127).astype(jnp.int8)
    emb_q = head["emb"][:v]  # drop pad rows
    emb_s = head["emb_s"].reshape(-1)[:v]
    s_i = jax.lax.dot_general(xq, emb_q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    logits = s_i.astype(jnp.float32) * emb_s[None, :]
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_fused_step_a8_head_cross_gated():
    """a8 head over the cross-attention + GEGLU + RMSNorm variant with an
    untied (d, V) classifier (the T5 shape) picks the oracle's tokens."""
    from pytorch_models_tpu.models.text.t5 import T5Config, t5_stack_init
    from pytorch_models_tpu.ops.decode_step import (
        fused_cross_decode_step,
        pack_greedy_head,
    )
    from pytorch_models_tpu.utils.params import quantize_tree_int8

    r = rng(242)
    b, n_layers, l_max, lx, pos, v = 2, 2, 128, 64, 19, 1500
    cfg = T5Config(vocab_size=v, dim=128, n_heads=2, n_layers=n_layers, mlp_dim=256)
    d, lc = cfg.dim, cfg.layer
    dec = t5_stack_init(jax.random.PRNGKey(3), cfg, cross_attn=True)
    qlayers = quantize_tree_int8(dec["layers"])
    hd = lc.n_heads * lc.head_dim
    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    xk = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32)
    xv = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32)
    lens = jnp.asarray([40, 64], jnp.int32)
    clf = jnp.asarray(r.standard_normal((d, v)), jnp.float32)  # (d, V) untied
    fnorm = {"scale": jnp.asarray(1 + 0.1 * r.standard_normal(d), jnp.float32)}

    packed = pack_decode_weights(qlayers, jnp.float32, gated=True, cross=True,
                                 norm="rms")
    assert packed["wqkv"].dtype == jnp.int8
    head, head_v = pack_greedy_head(clf, fnorm, jnp.float32, tied=False, a8=True)
    kw = dict(n_heads=lc.n_heads, act="approximate_gelu", eps=1e-5,
              norm="rms", gated=True, a8=True)
    with pltpu.force_tpu_interpret_mode():
        x_out, _, _, tok = fused_cross_decode_step(
            x, packed, caches["k"], caches["v"], xk, xv, lens, pos, None,
            head=head, head_v=head_v, **kw)
        x_ref, _, _ = fused_cross_decode_step(
            x, packed, caches["k"], caches["v"], xk, xv, lens, pos, None, **kw)

    from pytorch_models_tpu.ops.decode_step import _norm

    xn = _norm(x_ref, fnorm["scale"][None],
               jnp.zeros((1, d), jnp.float32), 1e-5, "rms").astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xn), axis=1, keepdims=True)
    r_scale = jnp.where(absmax == 0.0, 1.0, absmax) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xn / r_scale), -127, 127).astype(jnp.int8)
    s_i = jax.lax.dot_general(xq, head["emb"][:v], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    logits = s_i.astype(jnp.float32) * head["emb_s"].reshape(-1)[None, :v]
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.argmax(np.asarray(logits), axis=-1))


@pytest.mark.parametrize("l_max,pos", [(256, 200), (1024, 960)])
def test_fused_step_int8_kv_matches_attention_oracle(l_max, pos):
    """int8 self-KV mode (``kv_scales=``): the megakernel's grouped int8
    attention must reproduce ops/int8_kv.py's exact quantized-math oracle
    layer by layer (int dots are exact; projections/LN/MLP stay the bf16
    path's f32 math). (1024, 960) = 8-block deep ring (PERF #35)."""
    from pytorch_models_tpu.models.text._decoder_lm import quantize_kv_caches
    from pytorch_models_tpu.ops.int8_kv import int8_attention_oracle

    r = rng(311)
    b, d, n_layers = 4, 128, 2
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    hd = cfg.n_heads * cfg.head_dim

    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    qcaches = quantize_kv_caches(caches)
    assert qcaches["k"].dtype == jnp.int8 and qcaches["ks"].shape == (n_layers, 8, l_max)
    pads = jnp.asarray([0, 3, 130, 7], jnp.int32)

    packed = pack_decode_weights(params["layers"], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new = fused_decode_step(
            x, packed, qcaches["k"], qcaches["v"], pos, pads,
            n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps,
            kv_scales={"ks": qcaches["ks"], "vs": qcaches["vs"]})

    # ---- replica: same layer math with int8_attention_oracle attention ----
    lp = params["layers"]

    def ln(h, p):
        m = h.mean(axis=-1, keepdims=True)
        v = ((h - m) ** 2).mean(axis=-1, keepdims=True)
        return (h - m) / jnp.sqrt(v + cfg.norm_eps) * p["scale"] + p["bias"]

    hcur = x
    for li in range(n_layers):
        h1 = ln(hcur, {k: lp["sa_norm"][k][li] for k in ("scale", "bias")})
        wq = jnp.concatenate([lp["sa"][n]["w"][li] for n in ("q", "k", "v")], axis=-1)
        bq = jnp.concatenate([lp["sa"][n]["b"][li] for n in ("q", "k", "v")], axis=-1)
        qkv = h1 @ wq + bq
        q, k_n, v_n = qkv[:, :hd], qkv[:, hd:2 * hd], qkv[:, 2 * hd:]
        np.testing.assert_allclose(np.asarray(k_new[li]), np.asarray(k_n),
                                   rtol=2e-5, atol=2e-5)
        ctx = int8_attention_oracle(
            q[:, None, :], qcaches["k"][li], qcaches["v"][li],
            qcaches["ks"][li], qcaches["vs"][li], jnp.full((b,), pos, jnp.int32),
            cfg.n_heads, pad_lens=pads, cur_k=k_n, cur_v=v_n)[:, 0, :]
        hcur = hcur + ctx @ lp["sa"]["o"]["w"][li] + lp["sa"]["o"]["b"][li]
        h2 = ln(hcur, {k: lp["mlp_norm"][k][li] for k in ("scale", "bias")})
        m1 = h2 @ lp["mlp"]["fc1"]["w"][li] + lp["mlp"]["fc1"]["b"][li]
        g = 0.5 * m1 * (1.0 + jnp.tanh(np.sqrt(2 / np.pi) * (m1 + 0.044715 * m1 ** 3)))
        hcur = hcur + g @ lp["mlp"]["fc2"]["w"][li] + lp["mlp"]["fc2"]["b"][li]

    ref = np.asarray(hcur, np.float32)
    got = np.asarray(x_out, np.float32)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 2e-4, np.abs(got - ref).max() / scale


def test_fused_step_int8_kv_write_roundtrip():
    """_write_caches quantizes a decode step's K/V with the same rule the
    kernel applies to the current position: re-reading the written slot on
    the NEXT step scores identically to the cur-position fold."""
    from pytorch_models_tpu.models.text._decoder_lm import (
        _write_caches, quantize_kv_caches)

    r = rng(313)
    n_layers, b, l_max, hd = 2, 4, 256, 128
    caches = quantize_kv_caches({
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    })
    k_new = jnp.asarray(r.standard_normal((n_layers, b, hd)), jnp.float32)
    v_new = jnp.asarray(r.standard_normal((n_layers, b, hd)), jnp.float32)
    out = _write_caches(caches, k_new, v_new, 100)
    from pytorch_models_tpu.ops.int8_kv import quantize_rows

    kq, ks = quantize_rows(k_new)
    np.testing.assert_array_equal(np.asarray(out["k"][:, :, 100, :]), np.asarray(kq))
    np.testing.assert_array_equal(np.asarray(out["ks"][:, :b, 100]),
                                  np.asarray(ks[..., 0]))
    # neighbours untouched
    np.testing.assert_array_equal(np.asarray(out["k"][:, :, 99, :]),
                                  np.asarray(caches["k"][:, :, 99, :]))


def test_fused_step_int8_kv_multi_group():
    """b=16 exercises the megakernel's MULTI-GROUP int8 path (ng=2 groups of
    8: per-group q-expander/scale-slice indexing) against the oracle — the
    b=4 test above only covers ng=1."""
    from pytorch_models_tpu.models.text._decoder_lm import quantize_kv_caches
    from pytorch_models_tpu.ops.int8_kv import int8_attention_oracle

    r = rng(317)
    b, d, n_layers, l_max, pos = 16, 128, 1, 256, 180
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    hd = cfg.n_heads * cfg.head_dim
    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    qcaches = quantize_kv_caches(caches)
    pads = jnp.asarray([0, 3, 130, 7] * 4, jnp.int32)

    packed = pack_decode_weights(params["layers"], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new = fused_decode_step(
            x, packed, qcaches["k"], qcaches["v"], pos, pads,
            n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps,
            kv_scales={"ks": qcaches["ks"], "vs": qcaches["vs"]})

    lp = params["layers"]

    def ln(h, p):
        m = h.mean(axis=-1, keepdims=True)
        v = ((h - m) ** 2).mean(axis=-1, keepdims=True)
        return (h - m) / jnp.sqrt(v + cfg.norm_eps) * p["scale"] + p["bias"]

    h1 = ln(x, {k: lp["sa_norm"][k][0] for k in ("scale", "bias")})
    wq = jnp.concatenate([lp["sa"][n]["w"][0] for n in ("q", "k", "v")], axis=-1)
    bq = jnp.concatenate([lp["sa"][n]["b"][0] for n in ("q", "k", "v")], axis=-1)
    qkv = h1 @ wq + bq
    q, k_n, v_n = qkv[:, :hd], qkv[:, hd:2 * hd], qkv[:, 2 * hd:]
    ctx = int8_attention_oracle(
        q[:, None, :], qcaches["k"][0], qcaches["v"][0],
        qcaches["ks"][0], qcaches["vs"][0], jnp.full((b,), pos, jnp.int32),
        cfg.n_heads, pad_lens=pads, cur_k=k_n, cur_v=v_n)[:, 0, :]
    hcur = x + ctx @ lp["sa"]["o"]["w"][0] + lp["sa"]["o"]["b"][0]
    h2 = ln(hcur, {k: lp["mlp_norm"][k][0] for k in ("scale", "bias")})
    m1 = h2 @ lp["mlp"]["fc1"]["w"][0] + lp["mlp"]["fc1"]["b"][0]
    g = 0.5 * m1 * (1.0 + jnp.tanh(np.sqrt(2 / np.pi) * (m1 + 0.044715 * m1 ** 3)))
    hcur = hcur + g @ lp["mlp"]["fc2"]["w"][0] + lp["mlp"]["fc2"]["b"][0]

    ref = np.asarray(hcur, np.float32)
    got = np.asarray(x_out, np.float32)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 2e-4, np.abs(got - ref).max() / scale


def test_fused_cross_step_int8_cross_kv_matches_oracle():
    """int8 CROSS-KV (``kv_scales_x=``): the cross-attention phase streams
    int8 encoder caches + per-key scale windows and must reproduce the
    ops/int8_kv.py oracle (ends = per-row memory lengths, no current
    position); the self stream stays f32."""
    import pytorch_models_tpu.transformer as tfm2
    from pytorch_models_tpu.models.text._decoder_lm import quantize_kv_caches
    from pytorch_models_tpu.ops.decode_step import fused_cross_decode_step
    from pytorch_models_tpu.ops.int8_kv import int8_attention_oracle

    r = rng(331)
    b, d, n_layers, l_max, lx, pos = 4, 128, 2, 128, 256, 37
    cfg = tfm2.LayerConfig.make(d, n_heads=2, mlp_ratio=4.0,
                                act="approximate_gelu", cross_attn=True)
    params = tfm2.decoder_init(jax.random.PRNGKey(3), n_layers, cfg)
    hd = cfg.n_heads * cfg.head_dim

    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    }
    cross = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32),
    }
    qcross = quantize_kv_caches(cross)
    xlens = jnp.asarray([256, 100, 0, 130], jnp.int32)  # incl. an empty row

    packed = pack_decode_weights(params["layers"], jnp.float32, cross=True)
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new = fused_cross_decode_step(
            x, packed, caches["k"], caches["v"], qcross["k"], qcross["v"],
            xlens, pos, None, n_heads=cfg.n_heads, act=cfg.act,
            eps=cfg.norm_eps,
            kv_scales_x={"ks": qcross["ks"], "vs": qcross["vs"]})

    # replica: plain einsum self-attention; int8 oracle cross-attention
    lp = params["layers"]

    def ln(h, p, li):
        m = h.mean(axis=-1, keepdims=True)
        v = ((h - m) ** 2).mean(axis=-1, keepdims=True)
        return (h - m) / jnp.sqrt(v + cfg.norm_eps) * p["scale"][li] + p["bias"][li]

    dh = cfg.head_dim
    hcur = x
    for li in range(n_layers):
        h1 = ln(hcur, lp["sa_norm"], li)
        wq = jnp.concatenate([lp["sa"][n]["w"][li] for n in ("q", "k", "v")], axis=-1)
        bq = jnp.concatenate([lp["sa"][n]["b"][li] for n in ("q", "k", "v")], axis=-1)
        qkv = h1 @ wq + bq
        q, k_n, v_n = qkv[:, :hd], qkv[:, hd:2 * hd], qkv[:, 2 * hd:]
        kc = jnp.concatenate([caches["k"][li][:, :pos, :], k_n[:, None, :]], axis=1)
        vc = jnp.concatenate([caches["v"][li][:, :pos, :], v_n[:, None, :]], axis=1)
        qh = q.reshape(b, cfg.n_heads, dh)
        s = jnp.einsum("bhd,bphd->bhp", qh, kc.reshape(b, pos + 1, cfg.n_heads, dh)) / np.sqrt(dh)
        a = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhp,bphd->bhd", a, vc.reshape(b, pos + 1, cfg.n_heads, dh)).reshape(b, hd)
        hcur = hcur + ctx @ lp["sa"]["o"]["w"][li] + lp["sa"]["o"]["b"][li]

        hc = ln(hcur, lp["ca_norm"], li)
        q_c = hc @ lp["ca"]["q"]["w"][li] + lp["ca"]["q"]["b"][li]
        ctx_c = int8_attention_oracle(
            q_c[:, None, :], qcross["k"][li], qcross["v"][li],
            qcross["ks"][li], qcross["vs"][li], xlens, cfg.n_heads)[:, 0, :]
        hcur = hcur + ctx_c @ lp["ca"]["o"]["w"][li] + lp["ca"]["o"]["b"][li]

        h2 = ln(hcur, lp["mlp_norm"], li)
        m1 = h2 @ lp["mlp"]["fc1"]["w"][li] + lp["mlp"]["fc1"]["b"][li]
        g = 0.5 * m1 * (1.0 + jnp.tanh(np.sqrt(2 / np.pi) * (m1 + 0.044715 * m1 ** 3)))
        hcur = hcur + g @ lp["mlp"]["fc2"]["w"][li] + lp["mlp"]["fc2"]["b"][li]

    ref = np.asarray(hcur, np.float32)
    got = np.asarray(x_out, np.float32)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 2e-4, np.abs(got - ref).max() / scale


def test_fused_t5_step_int8_self_kv_with_bias_matches_oracle():
    """T5-style int8 SELF-KV: rel-pos decode bias rides as a GROUP-TILED
    key-major table and the grouped kernel must reproduce the bias-aware
    oracle (RMSNorm + GEGLU + bf16 cross stay the standard paths)."""
    from pytorch_models_tpu.models.text._decoder_lm import quantize_kv_caches
    from pytorch_models_tpu.models.text.t5 import T5Config, t5_stack_init
    from pytorch_models_tpu.ops.decode_step import fused_cross_decode_step
    from pytorch_models_tpu.ops.int8_kv import int8_attention_oracle

    r = rng(337)
    b, n_layers, l_max, lx, pos = 4, 2, 256, 256, 200
    cfg = T5Config(vocab_size=64, dim=128, n_heads=2, n_layers=n_layers, mlp_dim=256)
    stack = t5_stack_init(jax.random.PRNGKey(7), cfg, cross_attn=True)
    hd = cfg.n_heads * 64
    g = b  # <= 8: single group

    x = jnp.asarray(r.standard_normal((b, cfg.dim)), jnp.float32)
    caches = quantize_kv_caches({
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    })
    cross = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, lx, hd)), jnp.float32),
    }
    xlens = jnp.asarray([256, 100, 50, 130], jnp.int32)
    bias = jnp.asarray(r.standard_normal((l_max, cfg.n_heads)) * 0.3, jnp.float32)
    # group-tiled key-major table, lane-padded to 128 (t5._t5_key_major_bias)
    sbias = jnp.pad(jnp.concatenate([bias] * g, axis=-1),
                    ((0, 0), (0, 128 - g * cfg.n_heads)))

    packed = pack_decode_weights(stack["layers"], jnp.float32, gated=True,
                                 cross=True, norm="rms")
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new = fused_cross_decode_step(
            x, packed, caches["k"], caches["v"], cross["k"], cross["v"],
            xlens, pos, None, n_heads=cfg.n_heads, act="approximate_gelu",
            eps=1e-5, norm="rms", gated=True, sbias=sbias,
            kv_scales={"ks": caches["ks"], "vs": caches["vs"]})

    lp = stack["layers"]
    dh = 64

    def rms(h, p, li):
        h32 = h.astype(jnp.float32)
        y = h32 * jax.lax.rsqrt(jnp.mean(h32 ** 2, axis=-1, keepdims=True) + 1e-5)
        return y * p["scale"][li]

    hcur = x
    for li in range(n_layers):
        h1 = rms(hcur, lp["sa_norm"], li)
        wq = jnp.concatenate([lp["sa"][n]["w"][li] for n in ("q", "k", "v")], axis=-1)
        qkv = h1 @ wq
        q, k_n, v_n = qkv[:, :hd], qkv[:, hd:2 * hd], qkv[:, 2 * hd:]
        np.testing.assert_allclose(np.asarray(k_new[li]), np.asarray(k_n),
                                   rtol=2e-5, atol=2e-5)
        ctx = int8_attention_oracle(
            q[:, None, :], caches["k"][li], caches["v"][li],
            caches["ks"][li], caches["vs"][li], jnp.full((b,), pos, jnp.int32),
            cfg.n_heads, cur_k=k_n, cur_v=v_n, bias=bias)[:, 0, :]
        hcur = hcur + ctx @ lp["sa"]["o"]["w"][li]

        hc = rms(hcur, lp["ca_norm"], li)
        q_c = hc @ lp["ca"]["q"]["w"][li]
        s = jnp.einsum("bhd,bphd->bhp", q_c.reshape(b, cfg.n_heads, dh),
                       cross["k"][li].reshape(b, lx, cfg.n_heads, dh)) / np.sqrt(dh)
        valid = (jnp.arange(lx)[None, None, :] < xlens[:, None, None])
        s = jnp.where(valid, s, -1e30)
        a = jax.nn.softmax(s, axis=-1)
        ctx_c = jnp.einsum("bhp,bphd->bhd", a,
                           cross["v"][li].reshape(b, lx, cfg.n_heads, dh)).reshape(b, hd)
        hcur = hcur + ctx_c @ lp["ca"]["o"]["w"][li]

        h2 = rms(hcur, lp["mlp_norm"], li)
        m1 = h2 @ lp["mlp"]["w"]["w"][li]
        gelu = 0.5 * m1 * (1.0 + jnp.tanh(np.sqrt(2 / np.pi) * (m1 + 0.044715 * m1 ** 3)))
        hcur = hcur + (gelu * (h2 @ lp["mlp"]["v"]["w"][li])) @ lp["mlp"]["wo"]["w"][li]

    ref = np.asarray(hcur, np.float32)
    got = np.asarray(x_out, np.float32)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 3e-4, np.abs(got - ref).max() / scale


def test_fused_step_a8_plus_int8_kv_compose():
    """Every int8 feature at once — w8a8 weight streaming + int8 self-KV +
    the a8 greedy head — must compose (ref/scratch/semaphore pop order) and
    produce finite, in-vocab tokens."""
    from pytorch_models_tpu.models.text._decoder_lm import quantize_kv_caches
    from pytorch_models_tpu.ops.decode_step import pack_greedy_head
    from pytorch_models_tpu.utils.params import quantize_tree_int8

    r = rng(341)
    b, d, n_layers, l_max, pos = 8, 128, 2, 256, 100
    cfg, params = _setup(b=b, d=d, n_layers=n_layers, l_max=l_max)
    qparams = {"layers": quantize_tree_int8(params["layers"])}
    hd = cfg.n_heads * cfg.head_dim

    x = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    caches = quantize_kv_caches({
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)), jnp.float32),
    })
    packed = pack_decode_weights(qparams["layers"], jnp.float32)
    assert packed["wqkv"].dtype == jnp.int8
    emb = jnp.asarray(r.standard_normal((64, d)), jnp.float32)
    head, head_v = pack_greedy_head(emb, {"scale": jnp.ones((d,), jnp.float32)},
                                    jnp.float32, a8=True)
    with pltpu.force_tpu_interpret_mode():
        x_out, k_new, v_new, tok = fused_decode_step(
            x, packed, caches["k"], caches["v"], pos, None,
            n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps,
            head=head, head_v=head_v, a8=True,
            kv_scales={"ks": caches["ks"], "vs": caches["vs"]})
    assert np.isfinite(np.asarray(x_out, np.float32)).all()
    assert ((np.asarray(tok) >= 0) & (np.asarray(tok) < head_v)).all()
    assert k_new.shape == (n_layers, b, hd)

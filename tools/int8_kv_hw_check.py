"""int8 KV-cache attention on REAL hardware: Mosaic compile check, parity vs
the exact quantized-math oracle, and a timing bracket vs the bf16 decode
kernel at the GPT-2 bench shape.

Hardware-specific risks interpret mode can't validate (ops/int8_kv.py):
- int8 x int8 -> int32 MXU dots over DMA-streamed int8 KV blocks;
- the dim-0-contracting PV dot (``p_i8 (g*bk, gh) -0- V (g*bk, hd)``);
- the per-block f32 -> int8 prob quantization (a T(8,128) -> T(32,128)
  relayout — the known cost center, measured here);
- int8 cache DMA slices at 128-key granularity.

Run: python tools/int8_kv_hw_check.py [quick]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    from pytorch_models_tpu.ops.decode_attention import decode_attention
    from pytorch_models_tpu.ops.int8_kv import (
        int8_attention_oracle, int8_decode_attention, make_int8_kv_cache,
        prefill_int8_kv)

    print(jax.devices(), flush=True)
    # GPT-2 bench shape: b=32, 12 heads x 64, cache 1024, pos 544
    b, n_heads, d, l_max, pos = 32, 12, 64, 1024, 544
    hd = n_heads * d
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((b, 1, hd)) * 0.5, jnp.float32)
    k = jnp.asarray(r.standard_normal((b, l_max, hd)) * 0.3, jnp.float32)
    v = jnp.asarray(r.standard_normal((b, l_max, hd)) * 0.3, jnp.float32)
    cur_k = jnp.asarray(r.standard_normal((b, hd)) * 0.3, jnp.float32)
    cur_v = jnp.asarray(r.standard_normal((b, hd)) * 0.3, jnp.float32)
    caches = make_int8_kv_cache(b, l_max, hd)
    caches = prefill_int8_kv(*caches, k, v)
    ends = jnp.full((b,), pos, jnp.int32)

    # ---- compile + parity vs the exact quantized oracle -------------------
    t0 = time.time()
    got = int8_decode_attention(q, *caches, ends, n_heads,
                                cur_k=cur_k, cur_v=cur_v)
    got.block_until_ready()
    print(f"int8-kv compile+run OK in {time.time()-t0:.0f}s", flush=True)
    want = int8_attention_oracle(q, *caches, ends, n_heads,
                                 cur_k=cur_k, cur_v=cur_v)
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32)).max()
    scale = max(np.abs(np.asarray(want, np.float32)).max(), 1e-6)
    print(f"vs exact quantized oracle: max abs diff {diff:.2e} "
          f"(rel {diff/scale:.2e}; expect f32-rounding scale)", flush=True)
    assert diff / scale < 1e-3, "kernel diverged from the quantized-math oracle"

    # ---- cur_ks leg (the TP per-op path's supplied current-K scale) -------
    # passing the cache-write scale must be bit-equivalent to the in-kernel
    # absmax (same rule), and the operand plumbing must compile on hardware
    from pytorch_models_tpu.ops.int8_kv import quantize_rows
    _, ks_cur = quantize_rows(cur_k)
    got_s = int8_decode_attention(q, *caches, ends, n_heads,
                                  cur_k=cur_k, cur_v=cur_v, cur_ks=ks_cur)
    dd = np.abs(np.asarray(got_s, np.float32) - np.asarray(got, np.float32)).max()
    print(f"cur_ks leg (TP per-op path): max abs diff vs in-kernel absmax {dd:.2e}",
          flush=True)
    assert dd / scale < 1e-5, "cur_ks plumbing diverged"
    if quick:
        return

    # ---- timing bracket vs the bf16 decode kernel at the same shape -------
    # bf16 kernel semantics: current position already written into the cache
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    qb = jnp.asarray(q, jnp.bfloat16)

    def timed(fn, reps=200):
        fn().block_until_ready()
        out = None
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(out)
        return (time.perf_counter() - t0) / reps

    t_bf16 = timed(lambda: decode_attention(qb, kb, vb, pos + 1, n_heads))
    t_int8 = timed(lambda: int8_decode_attention(
        jnp.asarray(q, jnp.bfloat16), *caches, ends, n_heads,
        cur_k=jnp.asarray(cur_k, jnp.bfloat16), cur_v=jnp.asarray(cur_v, jnp.bfloat16)))
    # HBM floor ratio: int8 halves K/V bytes but adds 2 f32 scale planes/key
    kv_bytes_bf16 = 2 * b * pos * hd * 2
    kv_bytes_int8 = 2 * b * pos * hd * 1 + 2 * b * pos * 4
    print(f"attention @ (b=32, pos=544): bf16 {t_bf16*1e6:.0f} us, "
          f"int8 {t_int8*1e6:.0f} us ({t_bf16/t_int8:.2f}x; traffic ratio "
          f"{kv_bytes_bf16/kv_bytes_int8:.2f}x)", flush=True)

    # ---- the decisive A/B: the full GPT-2 megakernel step -----------------
    from pytorch_models_tpu.models.text import GPT2
    from pytorch_models_tpu.models.text._decoder_lm import (
        decoder_lm_pack, quantize_kv_caches)
    from pytorch_models_tpu.ops.decode_step import fused_decode_step

    model = GPT2(12, 768).to_bf16()
    cfg = model.cfg
    params = model.params
    packed, head, head_v = decoder_lm_pack(params, cfg)
    lc = cfg.layer
    x = jnp.asarray(r.standard_normal((b, 768)) * 0.5, jnp.bfloat16)
    kc = jnp.asarray(r.standard_normal((cfg.n_layers, b, l_max, hd)) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(r.standard_normal((cfg.n_layers, b, l_max, hd)) * 0.3, jnp.bfloat16)
    qc = quantize_kv_caches({"k": kc, "v": vc})

    def step_bf16():
        return fused_decode_step(x, packed, kc, vc, pos, None, n_heads=lc.n_heads,
                                 act=lc.act, eps=cfg.norm_eps, head=head, head_v=head_v)

    def step_int8():
        return fused_decode_step(x, packed, qc["k"], qc["v"], pos, None,
                                 n_heads=lc.n_heads, act=lc.act, eps=cfg.norm_eps,
                                 head=head, head_v=head_v,
                                 kv_scales={"ks": qc["ks"], "vs": qc["vs"]})

    t0 = time.time()
    step_int8()[0].block_until_ready()
    print(f"int8-kv megakernel compile+run OK in {time.time()-t0:.0f}s", flush=True)

    def timed_step(fn, reps=100):
        fn()[0].block_until_ready()
        out = None
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(out[0])
        return (time.perf_counter() - t0) / reps

    tb = timed_step(step_bf16)
    ti = timed_step(step_int8)
    print(f"megakernel step @ (b=32, pos=544): bf16-kv {tb*1e3:.3f} ms, "
          f"int8-kv {ti*1e3:.3f} ms ({tb/ti:.2f}x; KV is 640 of 885 MB -> "
          f"floor ratio ~1.48x)", flush=True)
    # sanity: greedy tokens from both paths on the same state
    tok_b = np.asarray(step_bf16()[3])
    tok_i = np.asarray(step_int8()[3])
    print(f"greedy token agreement bf16 vs int8-kv: {(tok_b == tok_i).mean():.3f} "
          f"(random-weight logits are near-uniform; expect high but not 1.0)",
          flush=True)

    # ---- int8 CROSS-KV at the whisper-base batch-16 shape -----------------
    # cross caches are THE dominant stream there: 6 layers x 16 rows x 1536
    # keys x 512 width x 2 (K,V) = ~295 MB/step bf16 -> ~150 MB int8
    from pytorch_models_tpu.models.audio2text.whisper import (
        Whisper, _fused_whisper_step)
    from pytorch_models_tpu.models.text._decoder_lm import quantize_kv_caches
    from pytorch_models_tpu.ops.decode_step import pack_greedy_head

    wm = Whisper(vocab_size=51865, n_layers=6, d_model=512, n_mels=80).to_bf16()
    wp = wm.params["decoder"]
    wcfg = wm.cfg
    wlc = wcfg.dec_layer
    bw, lxw, lw, posw = 16, 1536, 448, 200
    whd = wlc.n_heads * wlc.head_dim
    from pytorch_models_tpu.ops.decode_step import pack_decode_weights
    wpacked = pack_decode_weights(wp["layers"], jnp.bfloat16, cross=True)
    whead, whead_v = pack_greedy_head(wp["token_embs"], wp["norm"], jnp.bfloat16)
    sc = {
        "k": jnp.asarray(r.standard_normal((6, bw, lw, whd)) * 0.3, jnp.bfloat16),
        "v": jnp.asarray(r.standard_normal((6, bw, lw, whd)) * 0.3, jnp.bfloat16),
    }
    cross = {
        "k": jnp.asarray(r.standard_normal((6, bw, lxw, whd)) * 0.3, jnp.bfloat16),
        "v": jnp.asarray(r.standard_normal((6, bw, lxw, whd)) * 0.3, jnp.bfloat16),
        "len": jnp.full((6, bw), 1500, jnp.int32),
    }
    qcross = quantize_kv_caches(cross)
    tokw = jnp.ones((bw, 1), jnp.int32)

    def wstep(cr):
        return _fused_whisper_step(wp, wpacked, whead, whead_v, wcfg, tokw,
                                   dict(sc), cr, posw)

    t0 = time.time()
    wstep(qcross)[0].block_until_ready()
    print(f"int8 cross-kv megakernel compile+run OK in {time.time()-t0:.0f}s",
          flush=True)
    tb = timed_step(lambda: wstep(cross))
    ti = timed_step(lambda: wstep(qcross))
    print(f"whisper-base step @ (b=16, xlen=1500): bf16-cross {tb*1e3:.3f} ms, "
          f"int8-cross {ti*1e3:.3f} ms ({tb/ti:.2f}x; cross is ~295 of ~360 "
          f"MB/step -> floor ratio ~1.7x)", flush=True)

    # ---- T5 variant: int8 self (group-tiled rel-pos bias) + int8 cross ----
    # compile/run check only (the rms/GEGLU/bias kernel variant is the last
    # untested int8 lowering combination); bench via BENCH_MODEL=t5 INT8_KV=1
    from pytorch_models_tpu.models.text import T5Model
    from pytorch_models_tpu.ops import attention as attn_mod

    attn_mod.USE_FUSED_STEP = True
    attn_mod.USE_INT8_KV = True
    attn_mod.USE_INT8_KV_CROSS = True
    try:
        t5 = T5Model.from_t5x("t5_1_1-base").to_bf16()
        from pytorch_models_tpu.models.text.t5 import _t5_generate_batch

        prompts = jnp.ones((8, 64), jnp.int32)
        n_enc = jnp.full((8,), 60, jnp.int32)
        t0 = time.time()
        out = _t5_generate_batch(t5.params, t5.cfg, prompts, n_enc, 64, 0, 1)
        np.asarray(out[0])
        print(f"t5 full-int8 (self+bias+cross) compile+run OK in "
              f"{time.time()-t0:.0f}s", flush=True)
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_INT8_KV = False
        attn_mod.USE_INT8_KV_CROSS = False


if __name__ == "__main__":
    main()

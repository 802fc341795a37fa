"""Decompose the fused decode step (ops/decode_step.py) with slope timing.

Times each piece of the production decode-loop body in an on-device
fori_loop at two iteration counts (the tunnel's fixed ~30 ms host pull makes
naive totals lie; see tools/profile_decode2.py):

  kernel      — fused_decode_step WITH the in-kernel greedy head phase
  kernel_noh  — fused step without the head phase (layer stack only)
  embeds      — the two embed_rows gathers + add feeding the kernel
  dus         — the two (L, B, 1, HD) cache writes
  full        — production body: embeds + kernel(+head) + cache DUS + buf ops
  tiny        — loop-overhead floor

Run:  python tools/profile_fused.py [gpt2|whisper] [pos ...]
whisper mode is B=1 with cross-attention (the single-segment serving shape).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

# share bench.py's persistent compilation cache: the fused-step Mosaic
# compiles run 170-312 s per variant; the bench runs have already paid them
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

N1, N2 = 16, 80


def slope(name, mk):
    times = {}
    for n in (N1, N2):
        fn, args = mk(n)
        float(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        float(fn(*args))
        times[n] = time.perf_counter() - t0
    ms = (times[N2] - times[N1]) / (N2 - N1) * 1e3
    print(f"{name:11s} {ms:7.3f} ms/step   (totals {times[N1]*1e3:6.1f} / {times[N2]*1e3:6.1f} ms)",
          flush=True)
    return ms


def run_gpt2(pos_fix: int):
    from pytorch_models_tpu.models.text import GPT2
    from pytorch_models_tpu.models.text._decoder_lm import (
        decoder_lm_fused_tok_batch, decoder_lm_make_cache, decoder_lm_pack)
    from pytorch_models_tpu.ops.decode_step import fused_decode_step
    from pytorch_models_tpu.ops.gather import embed_rows

    b = 32
    model = GPT2(12, 768).to_bf16()
    params, cfg = model.params, model.cfg
    lc = cfg.layer
    packed, head, head_v = decoder_lm_pack(params, cfg)
    packed, head = jax.device_put(packed), jax.device_put(head)
    caches0 = decoder_lm_make_cache(cfg, (b,), dtype=jnp.bfloat16, stacked=True)
    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.standard_normal((b, 768)), jnp.bfloat16)
    tok0 = jnp.asarray(r.integers(0, 50000, (b,)), jnp.int32)
    pad = jnp.zeros((b,), jnp.int32)
    print(f"gpt2 fused-step decomposition, B={b}, pos={pos_fix}")

    def mk_kernel(head_on):
        def mk(n):
            @jax.jit
            def loop(x0, caches):
                def body(i, carry):
                    acc, caches = carry
                    x = x0 + i.astype(x0.dtype) * x0.dtype.type(1e-6)
                    out = fused_decode_step(x, packed, caches["k"], caches["v"],
                                            pos_fix, pad, n_heads=lc.n_heads, act=lc.act,
                                            eps=cfg.norm_eps,
                                            head=head if head_on else None,
                                            head_v=head_v if head_on else None)
                    xo, k_new, v_new = out[0], out[1], out[2]
                    caches = {
                        "k": lax.dynamic_update_slice(
                            caches["k"], k_new[:, :, None, :], (0, 0, pos_fix, 0)),
                        "v": lax.dynamic_update_slice(
                            caches["v"], v_new[:, :, None, :], (0, 0, pos_fix, 0)),
                    }
                    extra = out[3].sum() if head_on else 0
                    return acc + xo.astype(jnp.float32).sum() + extra, caches
                acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0), caches))
                return acc
            return loop, (x0, caches0)
        return mk

    def mk_embeds(n):
        @jax.jit
        def loop(tok0):
            def body(i, acc):
                tok = (tok0 + i) % 50000
                x = embed_rows(params["token_embs"], tok)
                x = x + embed_rows(params["pos_embs"], tok % 1024).astype(x.dtype)
                return acc + x.astype(jnp.float32).sum()
            return lax.fori_loop(0, n, body, jnp.float32(0))
        return loop, (tok0,)

    def mk_dus(n):
        k_new = jnp.asarray(r.standard_normal((12, b, 768)), jnp.bfloat16)

        @jax.jit
        def loop(k_new, caches):
            def body(i, carry):
                acc, caches = carry
                kn = k_new + i.astype(k_new.dtype) * k_new.dtype.type(1e-6)
                caches = {
                    "k": lax.dynamic_update_slice(caches["k"], kn[:, :, None, :], (0, 0, pos_fix, 0)),
                    "v": lax.dynamic_update_slice(caches["v"], kn[:, :, None, :], (0, 0, pos_fix, 0)),
                }
                return acc + caches["k"][0, 0, pos_fix, 0].astype(jnp.float32), caches
            acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0), caches))
            return acc
        return loop, (k_new, caches0)

    def mk_full(n):
        buf0 = jnp.zeros((b, cfg.max_seq_len), jnp.int32)

        @jax.jit
        def loop(buf, caches):
            def body(i, carry):
                acc, buf, caches, done = carry
                tok = lax.dynamic_slice(buf, (0, pos_fix - 1), (b, 1))
                p_ids = jnp.broadcast_to(jnp.int32(pos_fix - 1), (b,))[:, None]
                nxt, caches = decoder_lm_fused_tok_batch(
                    params, packed, head, head_v, cfg, tok, p_ids, caches, pos_fix, pad)
                nxt = jnp.where(done, jnp.int32(-1), nxt)
                buf = lax.dynamic_update_slice(buf, nxt[:, None], (0, pos_fix))
                return acc + nxt.sum(), buf, caches, jnp.logical_or(done, nxt == -1)
            acc, _, _, _ = lax.fori_loop(
                0, n, body, (jnp.int32(0), buf, caches, jnp.zeros((b,), bool)))
            return acc
        return loop, (buf0, caches0)

    def mk_tiny(n):
        @jax.jit
        def loop(x0):
            def body(i, acc):
                return acc + (x0[0, 0] * i.astype(jnp.bfloat16)).astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0))
        return loop, (x0,)

    slope("tiny", mk_tiny)
    slope("embeds", mk_embeds)
    slope("dus", mk_dus)
    slope("kernel_noh", mk_kernel(False))
    slope("kernel", mk_kernel(True))
    slope("full", mk_full)


def run_whisper(pos_fix: int):
    from pytorch_models_tpu import transformer as tfm
    from pytorch_models_tpu.models.audio2text.whisper import (
        Whisper, _fused_whisper_step)
    from pytorch_models_tpu.ops.decode_step import (
        fused_cross_decode_step, pack_decode_weights, pack_greedy_head)

    b = 1
    model = Whisper.from_openai("base").to_bf16()
    cfg = model.cfg
    p = model.params["decoder"]
    lc = cfg.dec_layer
    max_tokens = 448
    packed = pack_decode_weights(p["layers"], jnp.bfloat16, cross=True)
    head, head_v = pack_greedy_head(p["token_embs"], p["norm"], jnp.bfloat16)
    caches0 = tfm.make_kv_cache(cfg.n_layers, (b,), lc.n_heads, max_tokens,
                                lc.head_dim, dtype=jnp.bfloat16, stacked=True)
    r = np.random.default_rng(0)
    memory = jnp.asarray(r.standard_normal((b, 1500, cfg.d_model)), jnp.bfloat16)
    cross0 = tfm.precompute_cross_caches(p, lc, memory)
    tok0 = jnp.asarray(r.integers(0, 50000, (b, 1)), jnp.int32)
    print(f"whisper fused-step decomposition, B={b}, pos={pos_fix}")

    def mk_kernel(head_on):
        def mk(n):
            @jax.jit
            def loop(tok0, caches):
                def body(i, carry):
                    acc, caches = carry
                    tok = (tok0 + i) % 50000
                    if head_on:
                        nxt, caches = _fused_whisper_step(
                            p, packed, head, head_v, cfg, tok, caches, cross0, pos_fix)
                        return acc + nxt.sum(), caches
                    from pytorch_models_tpu.ops.gather import embed_rows
                    x = embed_rows(p["token_embs"], tok[:, 0])
                    x = x + lax.dynamic_slice(
                        p["pos_embs"], (pos_fix, 0), (1, cfg.d_model)).astype(x.dtype)
                    xo, k_new, v_new = fused_cross_decode_step(
                        x, packed, caches["k"], caches["v"],
                        cross0["k"].astype(x.dtype), cross0["v"].astype(x.dtype),
                        cross0["len"][0], pos_fix, None, n_heads=lc.n_heads,
                        act=lc.act, eps=lc.norm_eps, norm="ln")
                    caches = {
                        "k": lax.dynamic_update_slice(
                            caches["k"], k_new[:, :, None, :], (0, 0, pos_fix, 0)),
                        "v": lax.dynamic_update_slice(
                            caches["v"], v_new[:, :, None, :], (0, 0, pos_fix, 0)),
                    }
                    return acc + xo.astype(jnp.float32).sum(), caches
                acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0), caches))
                return acc
            return loop, (tok0, caches0)
        return mk

    def mk_tiny(n):
        @jax.jit
        def loop(tok0):
            def body(i, acc):
                return acc + (tok0[0, 0] + i)
            return lax.fori_loop(0, n, body, jnp.int32(0))
        return loop, (tok0,)

    slope("tiny", mk_tiny)
    slope("kernel_noh", mk_kernel(False))
    slope("full", mk_kernel(True))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    poss = [int(a) for a in sys.argv[2:]] or ([320] if which == "gpt2" else [32])
    for pos in poss:
        (run_gpt2 if which == "gpt2" else run_whisper)(pos)


if __name__ == "__main__":
    main()

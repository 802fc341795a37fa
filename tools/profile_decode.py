"""Decompose batched GPT-2 decode-step cost on the real TPU.

Times each suspect in isolation with on-device fori_loop iteration (one host
sync per measurement — block_until_ready does not fence through the remote
tunnel, CLAUDE.md). Run: python tools/profile_decode.py [n_steps]

Pieces measured per decode step (batch 32, GPT-2-small):
  full      — the real cached forward (12 layers, unrolled caches) + head
  nohead    — cached forward without the vocab logits matmul
  head      — logits matmul alone
  attn1024  — per-layer attention read at cache len 1024 (x12)
  carry     — while-style loop that only writes 1-pos slices into the caches
              (checks XLA aliases the carried caches in place)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from pytorch_models_tpu.models.text import GPT2
from pytorch_models_tpu.models.text._decoder_lm import (
    decoder_lm_forward_cached_batch,
    decoder_lm_make_cache,
)

B, N_STEPS = 32, int(sys.argv[1]) if len(sys.argv) > 1 else 64


def timeit(name, fn, *args):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))  # warm
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name:10s} {dt / N_STEPS * 1e3:7.3f} ms/step   ({dt * 1e3:8.1f} ms total)")
    return dt / N_STEPS


def main():
    model = GPT2(12, 768).to_bf16()
    params, cfg = model.params, model.cfg
    lc = cfg.layer
    pad_lens = jnp.zeros((B,), jnp.int32)

    def loop_full(params, caches, with_head=True):
        def body(i, s):
            tok, caches = s
            pos = 32 + i
            p_ids = pos[None, None].repeat(B, 0) if hasattr(pos, "shape") else jnp.full((B, 1), pos)
            if with_head:
                logits, caches = decoder_lm_forward_cached_batch(
                    params, cfg, tok, p_ids, caches, pos, pad_lens)
                tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)[:, None]
            else:
                from pytorch_models_tpu import transformer as tfm
                x = jnp.take(params["token_embs"], tok, axis=0)
                x, caches = tfm.decoder_apply(params["decoder"], lc, x, self_caches=caches,
                                              pos=pos, pad_lens=pad_lens)
                tok = (tok + x.mean().astype(jnp.int32)) % cfg.vocab_size
            return tok, caches
        tok = jnp.ones((B, 1), jnp.int32)
        tok, caches = lax.fori_loop(0, N_STEPS, body, (tok, caches))
        return tok.sum() + sum(c["k"].astype(jnp.float32).sum() for c in caches)

    def head_only(params, x):
        def body(i, acc):
            xi = x + i.astype(x.dtype) * x.dtype.type(1e-6)
            lg = jnp.matmul(xi, params["token_embs"].T)
            return acc + lg.astype(jnp.float32).mean()
        return lax.fori_loop(0, N_STEPS, body, jnp.float32(0))

    def attn_only(q, cache_k, cache_v):
        def body(i, s):
            acc, k, v = s
            kh = lax.dynamic_update_slice(k, q.astype(k.dtype), (0, 0, 0, 0))
            vh = lax.dynamic_update_slice(v, q.astype(v.dtype), (0, 0, 0, 0))
            qi = q + i.astype(q.dtype) * q.dtype.type(1e-6)
            s_ = jnp.einsum("bhqd,bhkd->bhqk", qi, kh)
            o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s_, -1), vh)
            return acc + o.astype(jnp.float32).mean() * 12.0, kh, vh
        acc, _, _ = lax.fori_loop(0, N_STEPS, body, (jnp.float32(0), cache_k, cache_v))
        return acc

    def carry_only(caches):
        upd = jnp.ones((B, lc.n_heads, 1, lc.head_dim), caches[0]["k"].dtype)
        def body(i, caches):
            out = []
            for c in caches:
                out.append({
                    "k": lax.dynamic_update_slice(c["k"], upd, (0, 0, 32 + i, 0)),
                    "v": lax.dynamic_update_slice(c["v"], upd, (0, 0, 32 + i, 0)),
                })
            return out
        caches = lax.fori_loop(0, N_STEPS, body, caches)
        return sum(c["k"].astype(jnp.float32).sum() for c in caches)

    x = jnp.ones((B, 1, 768), jnp.bfloat16)
    q = jnp.ones((B, lc.n_heads, 1, lc.head_dim), jnp.bfloat16)

    print(f"device: {jax.devices()[0].device_kind}; batch {B}, {N_STEPS} steps")
    for cache_len in (1024, 256):
        caches = [
            {"k": jnp.zeros((B, lc.n_heads, cache_len, lc.head_dim), jnp.bfloat16),
             "v": jnp.zeros((B, lc.n_heads, cache_len, lc.head_dim), jnp.bfloat16)}
            for _ in range(12)
        ]
        print(f"--- cache_len={cache_len}")
        timeit("full", jax.jit(lambda p, c: loop_full(p, c, True)), params, caches)
        timeit("nohead", jax.jit(lambda p, c: loop_full(p, c, False)), params, caches)
        timeit("carry", jax.jit(carry_only), caches)
        timeit("attn(x12)", jax.jit(attn_only), q, caches[0]["k"], caches[0]["v"])
    timeit("head", jax.jit(head_only), params, x)


if __name__ == "__main__":
    main()

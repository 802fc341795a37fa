"""Ablate the GPT-2 batched GENERATOR loop (not just the layer body) on TPU.

profile_decode2.py showed the 12-layer forward costs ~1.25 ms/step in
isolation while the production generator runs at ~1.83 ms/step. This script
slope-times fori_loop variants of the full generator body to locate the
~0.6 ms of bookkeeping: embedding gather, head matmul, argmax, buffer
updates, EOS logic.

Variants (batch 32, bf16, cache 1024, decode kernel on):
  full      — production-equivalent step: buf slice -> embed gather -> 12
              layers -> head matmul (50257) -> argmax -> EOS where -> buf DUS
  no_embed  — token embedding gather replaced by a broadcast (keeps the
              data dependence on the sampled token)
  no_head   — head matmul + argmax replaced by a cheap reduction
  no_sample — head matmul kept, argmax replaced by pos-derived token
  fwd_only  — layers only, fixed input, carried hidden state (floor)

Run: python tools/profile_genloop.py
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

from pytorch_models_tpu.models.text import GPT2
from pytorch_models_tpu.models.text._decoder_lm import (
    decoder_lm_forward_cached_batch,
    decoder_lm_make_cache,
)

B, PROMPT, STEPS1, STEPS2 = 32, 32, 24, 72


def _timed(fn, args, n):
    """Time one call with a HOST PULL as the fence (block_until_ready does not
    reliably fence through the tunnel)."""
    t0 = time.perf_counter()
    r = fn(*args, n)
    _ = float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0].astype(jnp.float32))
    return time.perf_counter() - t0


def slope(fn, *args):
    for n in (STEPS1, STEPS2):  # compile both counts + warm
        _timed(fn, args, n)
    ts = {n: min(_timed(fn, args, n) for _ in range(3)) for n in (STEPS1, STEPS2)}
    return (ts[STEPS2] - ts[STEPS1]) / (STEPS2 - STEPS1)


def main():
    model = GPT2(12, 768).to_bf16()
    params, cfg = model.params, model.cfg
    d = cfg.d_model

    pad_lens = jnp.zeros((B,), jnp.int32)
    buf0 = jnp.ones((B, cfg.max_seq_len), jnp.int32)
    caches0 = decoder_lm_make_cache(cfg, (B,), dtype=jnp.bfloat16, stacked=False)
    # prefill so the loop starts at a realistic position
    pos_ids = jnp.broadcast_to(jnp.arange(PROMPT)[None], (B, PROMPT))
    _, caches0 = decoder_lm_forward_cached_batch(
        params, cfg, buf0[:, :PROMPT], pos_ids, caches0, 0, pad_lens)

    def make_loop(variant):
        @jax.jit
        def run(params, buf, caches, n):
            def body(i, carry):
                buf, caches = carry
                pos = PROMPT + i
                tok = lax.dynamic_slice(buf, (0, 0), (B, 1)) + i * 0
                if variant == "no_embed":
                    x = jnp.zeros((B, 1, d), jnp.bfloat16) + tok[..., None].astype(jnp.bfloat16) * 1e-6
                    p_ids = pos * jnp.ones((B, 1), jnp.int32)
                    x = x + jnp.take(params["pos_embs"], p_ids, axis=0).astype(x.dtype)
                    from pytorch_models_tpu import transformer as tfm
                    x, caches = tfm.decoder_apply(params["decoder"], cfg.layer, x,
                                                  self_caches=caches, pos=pos, pad_lens=pad_lens)
                    logits = jnp.matmul(x, params["token_embs"].astype(x.dtype).T)
                else:
                    p_ids = pos * jnp.ones((B, 1), jnp.int32)
                    logits, caches = decoder_lm_forward_cached_batch(
                        params, cfg, tok, p_ids, caches, pos, pad_lens)
                if variant == "fwd_only":
                    nxt = tok[:, 0] + 1
                elif variant == "no_head":
                    nxt = (pos % 50) * jnp.ones((B,), jnp.int32)
                    logits = None
                elif variant == "no_sample":
                    nxt = (logits[:, 0, :8].sum(-1) * 0).astype(jnp.int32) + pos % 50
                else:  # full / no_embed
                    nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                    nxt = jnp.where(nxt == 50256, jnp.int32(1), nxt)
                buf = lax.dynamic_update_slice(buf, nxt[:, None], (0, PROMPT + i))
                return buf, caches

            return lax.fori_loop(0, n, body, (buf, caches))[0]

        return run

    # variant that skips the head matmul entirely needs logits never computed:
    def make_no_head():
        from pytorch_models_tpu import transformer as tfm

        @jax.jit
        def run(params, buf, caches, n):
            def body(i, carry):
                buf, caches = carry
                pos = PROMPT + i
                tok = lax.dynamic_slice(buf, (0, 0), (B, 1)) + i * 0
                x = jnp.take(params["token_embs"], tok, axis=0)
                p_ids = pos * jnp.ones((B, 1), jnp.int32)
                x = x + jnp.take(params["pos_embs"], p_ids, axis=0).astype(x.dtype)
                x, caches = tfm.decoder_apply(params["decoder"], cfg.layer, x,
                                              self_caches=caches, pos=pos, pad_lens=pad_lens)
                nxt = (x[:, 0, :8].sum(-1) * 0).astype(jnp.int32) + pos % 50
                buf = lax.dynamic_update_slice(buf, nxt[:, None], (0, PROMPT + i))
                return buf, caches

            return lax.fori_loop(0, n, body, (buf, caches))[0]

        return run

    for name in ("full", "no_embed", "no_sample", "fwd_only"):
        ms = slope(make_loop(name), params, buf0, caches0) * 1e3
        print(f"{name:10s} {ms:7.3f} ms/step", flush=True)
    ms = slope(make_no_head(), params, buf0, caches0) * 1e3
    print(f"{'no_head':10s} {ms:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()

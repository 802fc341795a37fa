"""Ablate the real GPT-2 batched decode step on TPU with slope timing.

The remote tunnel adds a fixed ~30-40 ms round-trip per host pull, so naive
(total / N) lies for cheap bodies. Here every loop is timed at two iteration
counts and the per-step cost is the slope: (t(N2) - t(N1)) / (N2 - N1).

Variants of the per-layer body (12 layers, batch 32):
  full       — production-equivalent decode step (proj + DUS + masked attn + MLP + head)
  no_mask    — attention without the iota/where mask bias
  no_write   — attention over the existing cache, no DUS writes
  no_attn    — cache writes + projections, attention replaced by qh
  matmuls    — only projections + MLP + LNs + head (no cache, no attention)
  head       — logits matmul alone
  tiny       — trivial body (loop-overhead floor)

Run: python tools/profile_decode2.py [cache_len ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

from pytorch_models_tpu import transformer as tfm
from pytorch_models_tpu.models.text import GPT2
from pytorch_models_tpu.ops import layer_norm, linear

B = 32
N1, N2 = 32, 160


def slope(name, mk):
    """mk(n) -> (jitted fn, args). Returns per-step ms as the two-point slope."""
    times = {}
    for n in (N1, N2):
        fn, args = mk(n)
        float(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        float(fn(*args))
        times[n] = time.perf_counter() - t0
    ms = (times[N2] - times[N1]) / (N2 - N1) * 1e3
    print(f"{name:10s} {ms:7.3f} ms/step   (totals {times[N1]*1e3:6.1f} / {times[N2]*1e3:6.1f} ms)")
    return ms


def main():
    model = GPT2(12, 768).to_bf16()
    params, cfg = model.params, model.cfg
    lc = cfg.layer

    def layer_body(lp, x, cache, pos, mode, cache_len):
        eps = lc.norm_eps
        h = layer_norm(lp["sa_norm"], x, eps)
        p = lp["sa"]
        qh = tfm.split_heads(linear(p["q"], h), lc.n_heads, lc.head_dim)
        kh_new = tfm.split_heads(linear(p["k"], h), lc.n_heads, lc.head_dim)
        vh_new = tfm.split_heads(linear(p["v"], h), lc.n_heads, lc.head_dim)
        if mode == "no_write":
            kh, vh = cache["k"], cache["v"]
            new_cache = cache
            qh = qh + kh_new * jnp.bfloat16(1e-6) + vh_new * jnp.bfloat16(1e-6)
        else:
            start = (0, 0, pos, 0)
            new_cache = {
                "k": lax.dynamic_update_slice(cache["k"], kh_new, start),
                "v": lax.dynamic_update_slice(cache["v"], vh_new, start),
            }
            kh, vh = new_cache["k"], new_cache["v"]
        if mode in ("no_attn", "matmuls"):
            out = qh
        else:
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
            if mode != "no_mask":
                col = lax.broadcasted_iota(jnp.int32, (1, cache_len), 1)
                bias = jnp.where(col <= pos, 0.0, -jnp.inf).astype(jnp.float32)
                s = s.astype(jnp.float32) + bias
            w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(qh.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        x = x + linear(p["o"], tfm.merge_heads(out))
        h = layer_norm(lp["mlp_norm"], x, eps)
        x = x + tfm.mlp_apply(lp["mlp"], h, lc.act)
        return x, new_cache

    def make(mode, cache_len):
        def mk(n_steps):
            caches = [
                {"k": jnp.zeros((B, lc.n_heads, cache_len, lc.head_dim), jnp.bfloat16),
                 "v": jnp.zeros((B, lc.n_heads, cache_len, lc.head_dim), jnp.bfloat16)}
                for _ in range(12)
            ]

            def run(params, caches):
                def body(i, s):
                    tok, caches = s
                    pos = jnp.minimum(32 + i, cache_len - 1)
                    x = jnp.take(params["token_embs"], tok, axis=0)
                    x = x + lax.dynamic_slice(params["pos_embs"], (pos, 0), (1, 768)).astype(x.dtype)
                    new_caches = []
                    for li in range(12):
                        lp = jax.tree.map(lambda a: a[li], params["decoder"]["layers"])
                        x, nc = layer_body(lp, x, caches[li], pos, mode, cache_len)
                        new_caches.append(nc)
                    x = layer_norm(params["norm"], x, lc.norm_eps)
                    logits = jnp.matmul(x, params["token_embs"].T)
                    tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)[:, None]
                    return tok, new_caches
                tok = jnp.ones((B, 1), jnp.int32)
                tok, caches = lax.fori_loop(0, n_steps, body, (tok, caches))
                return tok.sum() + sum(c["k"].astype(jnp.float32).sum() for c in caches)
            return jax.jit(run), (params, caches)
        return mk

    def mk_head(n_steps):
        x = jnp.ones((B, 1, 768), jnp.bfloat16)

        def run(params, x):
            def body(i, acc):
                xi = x + i.astype(x.dtype) * x.dtype.type(1e-6)
                return acc + jnp.matmul(xi, params["token_embs"].T).astype(jnp.float32).mean()
            return lax.fori_loop(0, n_steps, body, jnp.float32(0))
        return jax.jit(run), (params, x)

    def mk_tiny(n_steps):
        x = jnp.ones((32, 768), jnp.bfloat16)

        def run(x):
            def body(i, x):
                return jnp.tanh(x * jnp.bfloat16(1.00001))
            return lax.fori_loop(0, n_steps, body, x).astype(jnp.float32).sum()
        return jax.jit(run), (x,)

    print(f"device: {jax.devices()[0].device_kind}; batch {B}, slope timing N={N1}->{N2}")
    slope("tiny", mk_tiny)
    slope("head", mk_head)
    for cache_len in [int(a) for a in sys.argv[1:]] or (1024, 256):
        print(f"--- cache_len={cache_len}")
        for mode in ("full", "no_mask", "no_write", "no_attn", "matmuls"):
            slope(mode, make(mode, cache_len))


if __name__ == "__main__":
    main()

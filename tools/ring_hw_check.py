"""Deep DMA-ring checks on REAL hardware (VERDICT r3 item 8).

Interpret mode executes ``make_async_copy`` eagerly at ``start()``, so any
double-buffered stream deeper than 2 tiles reads clobbered slots in tests
while being correct on hardware (CLAUDE.md trap #14). The CI suite therefore
caps every interpret test at <=2 tiles per stream; the deep rings get their
coverage HERE, on the chip, where the FIFO DMA queues serialize same-engine
copies:

- long-KV ring, batched:  b=32, cache 1024, pos 960 -> ~8 KV blocks of 128
  keys double-buffered through the megakernel's self-attention stream;
- long-KV ring, B=1:      cache 4096, pos 3968 -> deep ring at the grown
  B=1 block size (``_pick_kv_block``);
- embed-window path:      the in-kernel embed phase (``emb=``/``tok_ids=``,
  PERF.md #31a) vs the outside gather+add, expected bit-identical.

(The 50-tile vocab-head ring is already chip-covered: the bf16 head runs in
every BENCH_MODEL=gpt2 bench and tools/a8_hw_check.py brackets the w8a16 /
a8 / int8-head variants.)

All checks run fp32 (every in-kernel dot pins Precision.HIGHEST for fp32 via
ops.layers.dot_precision) against the einsum decode path on the same chip,
so bounds are roundoff-tight. Run: python tools/ring_hw_check.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def _oracle(params, cfg, x, caches, pos, pads):
    """Einsum decode path (no pallas) on the same device, fp32 HIGHEST.

    Jitted: eager op-by-op dispatch through the axon tunnel takes tens of
    minutes for a 2-layer stack (first version of this tool hung here)."""
    import pytorch_models_tpu.transformer as tfm
    from pytorch_models_tpu.ops import attention as attn_mod

    @jax.jit
    def run(params, x, caches, pads):
        return tfm.decoder_apply(params, cfg, x[:, None, :],
                                 self_caches=dict(caches), pos=pos,
                                 pad_lens=pads)

    attn_mod.USE_DECODE_KERNEL = False
    try:
        ref, new_caches = run(params, x, caches, pads)
    finally:
        attn_mod.USE_DECODE_KERNEL = None
    return ref[:, 0, :], new_caches


def _check(name, got, want, bound):
    diff = float(np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64)).max())
    status = "PASS" if diff <= bound else "FAIL"
    print(f"{name}: max abs diff {diff:.2e} (bound {bound:.0e})  [{status}]", flush=True)
    return status == "PASS"


def long_kv_ring(b, l_max, pos, with_pads):
    import pytorch_models_tpu.transformer as tfm
    from pytorch_models_tpu.ops.decode_step import (fused_decode_step,
                                                    pack_decode_weights)

    d, n_layers = 768, 2
    cfg = tfm.LayerConfig.make(d, n_heads=12, act="approximate_gelu")
    params = tfm.decoder_init(jax.random.PRNGKey(0), n_layers, cfg)
    hd = cfg.n_heads * cfg.head_dim
    r = np.random.default_rng(7)
    x = jnp.asarray(r.standard_normal((b, d)) * 0.5, jnp.float32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)) * 0.3, jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)) * 0.3, jnp.float32),
    }
    pads = jnp.asarray(r.integers(0, 7, (b,)), jnp.int32) if with_pads else None

    packed = pack_decode_weights(params["layers"], jnp.float32)
    t0 = time.time()
    x_out, k_new, v_new = fused_decode_step(
        x, packed, caches["k"], caches["v"], pos, pads,
        n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps)
    x_out.block_until_ready()
    print(f"  (compile+run {time.time()-t0:.0f}s)", flush=True)

    ref, new_caches = _oracle(params, cfg, x, caches, pos, pads)
    ok = _check(f"long_kv_ring b={b} pos={pos}/{l_max} x_out", x_out, ref, 1e-4)
    ok &= _check(f"long_kv_ring b={b} k_new", k_new,
                 new_caches["k"][:, :, pos, :], 1e-5)
    return ok


def embed_window():
    import pytorch_models_tpu.transformer as tfm
    from pytorch_models_tpu.ops.decode_step import (fused_decode_step,
                                                    pack_decode_weights,
                                                    pack_embed_tables)

    b, d, n_layers, l_max, pos, v = 2, 768, 2, 256, 100, 1000
    cfg = tfm.LayerConfig.make(d, n_heads=12, act="approximate_gelu")
    params = tfm.decoder_init(jax.random.PRNGKey(1), n_layers, cfg)
    hd = cfg.n_heads * cfg.head_dim
    r = np.random.default_rng(11)
    tok_table = jnp.asarray(r.standard_normal((v, d)) * 0.3, jnp.float32)
    pos_table = jnp.asarray(r.standard_normal((l_max, d)) * 0.1, jnp.float32)
    tok_ids = jnp.asarray([3, v - 1], jnp.int32)
    pos_rows = jnp.full((b,), pos, jnp.int32)
    caches = {
        "k": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)) * 0.3, jnp.float32),
        "v": jnp.asarray(r.standard_normal((n_layers, b, l_max, hd)) * 0.3, jnp.float32),
    }
    packed = pack_decode_weights(params["layers"], jnp.float32)
    emb = pack_embed_tables(tok_table, pos_table, jnp.float32)

    t0 = time.time()
    x_in, _, _ = fused_decode_step(
        None, packed, caches["k"], caches["v"], pos, None,
        n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps,
        emb=emb, tok_ids=tok_ids, pos_rows=pos_rows)
    x_in.block_until_ready()
    print(f"  (compile+run {time.time()-t0:.0f}s)", flush=True)

    x = tok_table[tok_ids] + pos_table[pos_rows]
    x_out, _, _ = fused_decode_step(
        x, packed, caches["k"], caches["v"], pos, None,
        n_heads=cfg.n_heads, act=cfg.act, eps=cfg.norm_eps)
    return _check("embed_window vs outside gather (expect bit-identical)",
                  x_in, x_out, 0.0)


def main():
    print(jax.devices(), flush=True)
    assert jax.devices()[0].platform != "cpu", "needs the real TPU"
    ok = long_kv_ring(b=32, l_max=1024, pos=960, with_pads=True)
    ok &= long_kv_ring(b=1, l_max=4096, pos=3968, with_pads=False)
    ok &= embed_window()
    print("ALL PASS" if ok else "FAILURES PRESENT", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

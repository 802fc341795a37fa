"""A/B the int8-KV compact-diagonal fix on REAL hardware (PERF.md #33 tax).

The wide path runs every post-dot VPU op (dequant, mask, exp, sum, V-scale
fold, prob quantization) on the (g*bk, g*H) block-diagonal grid — g-fold
redundant work that made the standalone int8 attention 4.8x SLOWER than bf16
(4,078 vs 851 us, PERF.md #33). The compact path folds scores to (bk, g*H)
right after the int8 score dot and re-expands only the int8 PV operand; it
is bit-identical (tests/ops/test_int8_kv.py pins it).

Measures, at the GPT-2 bench shape (b=32, 12x64 heads, cache 1024, pos 544):
  1. standalone attention: bf16 vs int8-wide vs int8-compact (+ bit-parity);
  2. the full GPT-2 megakernel step: int8-KV wide vs compact vs bf16-KV.

Run: python tools/int8_compact_ab.py [quick]   # quick = standalone only
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


def timed(fn, reps=200):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    from pytorch_models_tpu.ops.decode_attention import decode_attention
    from pytorch_models_tpu.ops.int8_kv import (
        int8_decode_attention, make_int8_kv_cache, prefill_int8_kv)

    print(jax.devices(), flush=True)
    b, n_heads, d, l_max, pos = 32, 12, 64, 1024, 544
    hd = n_heads * d
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((b, 1, hd)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(r.standard_normal((b, l_max, hd)) * 0.3, jnp.float32)
    v = jnp.asarray(r.standard_normal((b, l_max, hd)) * 0.3, jnp.float32)
    cur_k = jnp.asarray(r.standard_normal((b, hd)) * 0.3, jnp.bfloat16)
    cur_v = jnp.asarray(r.standard_normal((b, hd)) * 0.3, jnp.bfloat16)
    caches = make_int8_kv_cache(b, l_max, hd)
    caches = prefill_int8_kv(*caches, k, v)
    ends = jnp.full((b,), pos, jnp.int32)

    wide = lambda: int8_decode_attention(q, *caches, ends, n_heads, cur_k=cur_k,
                                         cur_v=cur_v, compact=False)
    comp = lambda: int8_decode_attention(q, *caches, ends, n_heads, cur_k=cur_k,
                                         cur_v=cur_v, compact=True)
    t0 = time.time()
    a = np.asarray(wide(), np.float32)
    print(f"wide compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    c = np.asarray(comp(), np.float32)
    print(f"compact compile+run {time.time()-t0:.0f}s", flush=True)
    dd = np.abs(a - c).max()
    print(f"wide vs compact on-chip: max abs diff {dd:.2e} (expect 0)", flush=True)

    kb, vb = jnp.asarray(k, jnp.bfloat16), jnp.asarray(v, jnp.bfloat16)
    t_bf16 = timed(lambda: decode_attention(q, kb, vb, pos + 1, n_heads))
    t_wide = timed(wide)
    t_comp = timed(comp)
    print(f"standalone attention @ (b=32, pos=544): bf16 {t_bf16*1e6:.0f} us, "
          f"int8-wide {t_wide*1e6:.0f} us, int8-compact {t_comp*1e6:.0f} us "
          f"(compact/wide {t_wide/t_comp:.2f}x, vs bf16 {t_bf16/t_comp:.2f}x)",
          flush=True)
    if quick:
        return

    # ---- megakernel step A/B (INT8_COMPACT flag, retrace between) ---------
    from pytorch_models_tpu.models.text import GPT2
    from pytorch_models_tpu.models.text._decoder_lm import (
        decoder_lm_pack, quantize_kv_caches)
    from pytorch_models_tpu.ops import decode_step as ds

    model = GPT2(12, 768).to_bf16()
    cfg = model.cfg
    packed, head, head_v = decoder_lm_pack(model.params, cfg)
    lc = cfg.layer
    x = jnp.asarray(r.standard_normal((b, 768)) * 0.5, jnp.bfloat16)
    kc = jnp.asarray(r.standard_normal((cfg.n_layers, b, l_max, hd)) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(r.standard_normal((cfg.n_layers, b, l_max, hd)) * 0.3, jnp.bfloat16)
    qc = quantize_kv_caches({"k": kc, "v": vc})

    def step_bf16():
        return ds.fused_decode_step(x, packed, kc, vc, pos, None, n_heads=lc.n_heads,
                                    act=lc.act, eps=cfg.norm_eps, head=head,
                                    head_v=head_v)

    def step_int8():
        return ds.fused_decode_step(x, packed, qc["k"], qc["v"], pos, None,
                                    n_heads=lc.n_heads, act=lc.act,
                                    eps=cfg.norm_eps, head=head, head_v=head_v,
                                    kv_scales={"ks": qc["ks"], "vs": qc["vs"]})

    results = {}
    toks = {}
    for flag in (False, True):
        ds.INT8_COMPACT = flag
        jax.clear_caches()
        name = "compact" if flag else "wide"
        t0 = time.time()
        out = step_int8()
        np.asarray(out[0])
        print(f"megakernel int8-{name} compile+run {time.time()-t0:.0f}s", flush=True)
        results[name] = timed(step_int8, reps=100)
        toks[name] = np.asarray(step_int8()[3])
    t_b = timed(step_bf16, reps=100)
    agree = (toks["wide"] == toks["compact"]).mean()
    print(f"megakernel step @ (b=32, pos=544): bf16-kv {t_b*1e3:.3f} ms, "
          f"int8-wide {results['wide']*1e3:.3f} ms, "
          f"int8-compact {results['compact']*1e3:.3f} ms "
          f"(compact/wide {results['wide']/results['compact']:.2f}x); "
          f"greedy-token agreement wide vs compact {agree:.3f} (expect 1.0)",
          flush=True)


if __name__ == "__main__":
    main()

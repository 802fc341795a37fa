"""w8a8 decode on REAL hardware: Mosaic compile check, parity vs the w8a16
path, and a timing bracket vs bf16/int8 at the GPT-2 bench shape.

The a8 path's only hardware-specific risk is the int8 x int8 -> int32 MXU
dot inside the megakernel (interpret mode can't validate Mosaic lowering).
Also checks the a8 GREEDY HEAD (pack_greedy_head(a8=True)): int8 head-table
streaming with per-vocab-row rescale — its 50-tile vocab stream exercises
the double-buffer ring depth interpret mode can't (interpret executes
``start()`` copies immediately, so >=3-tile streams clobber slots there).

Run: python tools/a8_hw_check.py [quick]
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
    from pytorch_models_tpu.models.text import GPT2
    from pytorch_models_tpu.models.text._decoder_lm import (
        decoder_lm_fused_ok, decoder_lm_pack)
    from pytorch_models_tpu.ops.decode_step import fused_decode_step

    print(jax.devices(), flush=True)
    model = GPT2(2 if quick else 12, 768).to_bf16().quantize_int8()
    cfg = model.cfg
    params = model.params
    assert decoder_lm_fused_ok(params, cfg)
    packed, head, head_v = decoder_lm_pack(params, cfg)
    lc = cfg.layer
    hd = lc.n_heads * lc.head_dim
    b, l_max, pos = 32, 1024, 544
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((b, 768)) * 0.5, jnp.bfloat16)
    kc = jnp.asarray(r.standard_normal((cfg.n_layers, b, l_max, hd)) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(r.standard_normal((cfg.n_layers, b, l_max, hd)) * 0.3, jnp.bfloat16)

    # ---- compile + parity: a8 vs w8a16 on the same int8 weights ----------
    t0 = time.time()
    xa, ka, va = fused_decode_step(x, packed, kc, vc, pos, None, n_heads=lc.n_heads,
                                   act=lc.act, eps=cfg.norm_eps, a8=True)
    xa.block_until_ready()
    print(f"a8 compile+run OK in {time.time()-t0:.0f}s", flush=True)
    xw, kw, vw = fused_decode_step(x, packed, kc, vc, pos, None, n_heads=lc.n_heads,
                                   act=lc.act, eps=cfg.norm_eps)
    a, w = np.asarray(xa, np.float32), np.asarray(xw, np.float32)
    scale = max(np.abs(w).max(), 1.0)
    rel = np.abs(a - w).max() / scale
    print(f"a8 vs w8a16 hidden max rel diff: {rel:.4f} (activation-quant noise; "
          f"expect ~1e-2 scale)", flush=True)
    assert rel < 0.2, "a8 diverged beyond quantization noise"
    # k/v projections: same comparison
    relk = np.abs(np.asarray(ka, np.float32) - np.asarray(kw, np.float32)).max() / \
        max(np.abs(np.asarray(kw, np.float32)).max(), 1.0)
    print(f"k_new max rel diff: {relk:.4f}", flush=True)

    # ---- a8 head: int8 vocab stream + per-row rescale vs exact int oracle --
    from pytorch_models_tpu.ops.decode_step import _norm, pack_greedy_head

    head8, head8_v = pack_greedy_head(params["token_embs"], params["norm"],
                                      jnp.bfloat16, a8=True)
    t0 = time.time()
    _, _, _, tok8 = fused_decode_step(x, packed, kc, vc, pos, None,
                                      n_heads=lc.n_heads, act=lc.act,
                                      eps=cfg.norm_eps, head=head8,
                                      head_v=head8_v, a8=True)
    tok8.block_until_ready()
    print(f"a8 head compile+run OK in {time.time()-t0:.0f}s "
          f"({head8['emb'].shape[0] // head8['emb_s'].shape[1]} vocab tiles)",
          flush=True)
    xn = _norm(xa, params["norm"]["scale"][None].astype(jnp.float32),
               params["norm"]["bias"][None].astype(jnp.float32),
               cfg.norm_eps, "ln").astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xn), axis=1, keepdims=True)
    r_s = jnp.where(absmax == 0.0, 1.0, absmax) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xn / r_s), -127, 127).astype(jnp.int8)
    s_i = jax.lax.dot_general(xq, head8["emb"], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    lg = np.asarray(s_i, np.float32) * np.asarray(head8["emb_s"]).reshape(-1)[None]
    lg = np.where(np.arange(lg.shape[1])[None] < head8_v, lg, -np.inf)
    match = (np.asarray(tok8) == np.argmax(lg, axis=-1)).mean()
    print(f"a8 head token match vs int oracle: {match:.3f}", flush=True)
    assert match == 1.0, "a8 head diverged from the exact int oracle"
    if quick:
        return

    # ---- timing bracket at the bench shape --------------------------------
    def timed(a8_flag, h, hv, reps=50):
        def step():
            return fused_decode_step(x, packed, kc, vc, pos, None, n_heads=lc.n_heads,
                                     act=lc.act, eps=cfg.norm_eps, head=h,
                                     head_v=hv, a8=a8_flag)
        step()[0].block_until_ready()
        outs = None
        t0 = time.perf_counter()
        for _ in range(reps):
            outs = step()
        np.asarray(outs[0])
        return (time.perf_counter() - t0) / reps

    t_w8a16 = timed(False, head, head_v)
    t_a8 = timed(True, head, head_v)
    t_a8h = timed(True, head8, head8_v)
    print(f"megakernel step @ (b=32, pos=544): w8a16 {t_w8a16*1e3:.3f} ms, "
          f"a8+bf16 head {t_a8*1e3:.3f} ms ({t_w8a16/t_a8:.2f}x), "
          f"a8+int8 head {t_a8h*1e3:.3f} ms ({t_w8a16/t_a8h:.2f}x)", flush=True)


if __name__ == "__main__":
    main()

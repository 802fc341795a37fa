"""Decompose the whisper-base B=1 decode step on the real chip.

Times the fused megakernel at a fixed position in four variants — full step
(layers + head), headless (layers only), eager vs chained warmups — plus the
outside-kernel glue (embed + cache DUS + loop carry) by differencing against
the generator's measured per-step cost. Informs PERF.md ledger #28 (stack at
~55% of its HBM floor; slack = per-phase fixed cost at tiny shapes).

Run: python tools/profile_b1_whisper.py [pos]
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


def timed(fn, reps=100):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    pos = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    from pytorch_models_tpu.models.audio2text.whisper import Whisper
    from pytorch_models_tpu.ops.decode_step import (
        fused_cross_decode_step, pack_decode_weights, pack_greedy_head)
    import pytorch_models_tpu.transformer as tfm

    print(jax.devices(), flush=True)
    m = Whisper.from_openai("base").to_bf16()
    cfg = m.cfg
    p = m.params["decoder"]
    lc = cfg.dec_layer
    hd = lc.n_heads * lc.head_dim
    l_buf = tfm.padded_cache_len(448)
    packed = pack_decode_weights(p["layers"], jnp.bfloat16, cross=True)
    head, head_v = pack_greedy_head(p["token_embs"], p["norm"], jnp.bfloat16)
    r = np.random.default_rng(0)
    b, lx = 1, 1536
    x = jnp.asarray(r.standard_normal((b, cfg.d_model)) * 0.3, jnp.bfloat16)
    kc = jnp.asarray(r.standard_normal((cfg.n_layers, b, l_buf, hd)) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(r.standard_normal((cfg.n_layers, b, l_buf, hd)) * 0.3, jnp.bfloat16)
    xk = jnp.asarray(r.standard_normal((cfg.n_layers, b, lx, hd)) * 0.3, jnp.bfloat16)
    xv = jnp.asarray(r.standard_normal((cfg.n_layers, b, lx, hd)) * 0.3, jnp.bfloat16)
    xlen = jnp.asarray([lx], jnp.int32)

    def step(with_head, head_kw=None):
        return fused_cross_decode_step(
            x, packed, kc, vc, xk, xv, xlen, pos, None, n_heads=lc.n_heads,
            act=lc.act, eps=lc.norm_eps, norm="ln",
            **({"head": head, "head_v": head_v} if with_head else {}))

    for name, fn in (("full (layers+head)", lambda: step(True)),
                     ("headless (layers)", lambda: step(False))):
        dt = timed(fn)
        print(f"{name:22s} {dt*1e6:7.1f} us/step  (eager={os.environ.get('DECODE_EAGER', 'auto')})",
              flush=True)

    # floors at this position (819 GB/s v5e)
    d, dff, L = cfg.d_model, 4 * cfg.d_model, cfg.n_layers
    w_bytes = 2 * L * (4 * d * d + 2 * d * d + 2 * d * dff)
    kv_bytes = 2 * L * 2 * (pos * hd + lx * hd) * b
    head_bytes = 2 * head["emb"].shape[0] * d
    print(f"floors: stack {(w_bytes + kv_bytes) / 819e9 * 1e6:.1f} us "
          f"(weights {w_bytes / 819e9 * 1e6:.1f} + kv {kv_bytes / 819e9 * 1e6:.1f}), "
          f"head {head_bytes / 819e9 * 1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()

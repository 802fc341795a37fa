"""Bisect the long_kv_ring FAIL from tools/ring_hw_check.py (round 4).

Sweeps pos depth / batch / pads on the fused decode step vs the jitted
einsum oracle, printing per-leg max diffs for x_out, k_new, v_new and the
structure of the k_new diff (which rows/lane groups) to separate
(a) precision downgrade on one side from (b) a DMA-ring slot bug.
Run: python tools/ring_bisect.py
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


def oracle(params, cfg, x, caches, pos, pads):
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


def leg(b, l_max, pos, with_pads):
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
    dt = time.time() - t0

    ref, new_caches = oracle(params, cfg, x, caches, pos, pads)
    dx = np.abs(np.asarray(x_out, np.float64) - np.asarray(ref, np.float64))
    dk = np.abs(np.asarray(k_new, np.float64)
                - np.asarray(new_caches["k"][:, :, pos, :], np.float64))
    dv = np.abs(np.asarray(v_new, np.float64)
                - np.asarray(new_caches["v"][:, :, pos, :], np.float64))
    print(f"b={b:3d} l_max={l_max:5d} pos={pos:5d} pads={with_pads!s:5s} "
          f"({dt:3.0f}s): x_out {dx.max():.2e}  k_new {dk.max():.2e}  "
          f"v_new {dv.max():.2e}", flush=True)
    if dk.max() > 1e-5:
        # structure: per layer, per batch row, per 128-lane group
        layer_max = dk.max(axis=(1, 2))
        row_max = dk.max(axis=(0, 2))
        lane = dk.reshape(dk.shape[0], dk.shape[1], -1, 128).max(axis=(0, 1, 3))
        print(f"    k_new per-layer max: {np.array2string(layer_max, precision=1)}")
        print(f"    k_new per-row max  : {np.array2string(row_max, precision=1, threshold=40)}")
        print(f"    k_new per-lane-group max: {np.array2string(lane, precision=1)}",
              flush=True)


def main():
    print(jax.devices(), flush=True)
    assert jax.devices()[0].platform != "cpu", "needs the real TPU"
    leg(b=32, l_max=1024, pos=64, with_pads=True)    # shallow ring, same b
    leg(b=32, l_max=1024, pos=960, with_pads=False)  # deep ring, no pads
    leg(b=32, l_max=1024, pos=960, with_pads=True)   # the failing config
    leg(b=8, l_max=1024, pos=960, with_pads=True)    # smaller batch, deep
    leg(b=1, l_max=4096, pos=128, with_pads=False)   # B=1 shallow
    leg(b=1, l_max=4096, pos=3968, with_pads=False)  # B=1 deep (failing)


if __name__ == "__main__":
    main()

"""Measure a PRACTICAL floor for the whisper-base B=1 decode step (VERDICT
r4 item 1iii: make the >=90%-of-floor north star falsifiable, the way the
148/197 TFLOP/s probe did for ViT).

The analytic floor (bench.py whisper_base_floor) assumes zero per-phase
cost: every byte of weights/KV/head streams at the full 819 GB/s and the
kernel is otherwise free. At whisper-base B=1 the step moves ~0.1 MB of KV
and ~50 MB of weights+head in ~100 us-scale phases, where fixed per-phase
costs are material. This probe measures each component on the chip:

  1. GRID-ENTRY cost: a trivial pallas_call at grid (1,) vs (7,) — the
     slope is the per-phase floor any 7-phase megakernel pays.
  2. DEPTH SLOPE: the headless layer stack at L = 2/4/6 layers — the slope
     is the real marginal per-layer cost, the intercept the kernel's fixed
     entry+carry cost; the slope compares against the per-layer HBM floor.
  3. HEAD MARGINAL: full minus headless — vs the head-table HBM floor.
  4. STREAM RATE: the measured bf16 big-tile copy bandwidth (the a8 check
     established the megakernel streams at ~90% of 819 GB/s at batch 32;
     here we take the measured per-layer slope's implied rate directly).

Composition printed at the end:
  floor_practical/step = 6*slope_layer_floor + head_floor + grid-entry*7
where *_floor uses the measured stream rate, so the remaining gap between
the measured step and floor_practical is genuinely unexplained (or zero,
proving the step is at its practical floor).

Run: python tools/whisper_floor_probe.py [pos]
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BW = 819e9  # v5e HBM


def timed(fn, reps=200):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def _noop_kernel(w_hbm, o_ref):
    def body(scr, sem):
        cp = pltpu.make_async_copy(w_hbm.at[pl.ds(0, 8), :], scr, sem)
        cp.start()
        cp.wait()
        o_ref[...] = scr[...]

    pl.run_scoped(body, scr=pltpu.VMEM((8, 128), jnp.bfloat16),
                  sem=pltpu.SemaphoreType.DMA)


@functools.partial(jax.jit, static_argnames=("grid",))
def noop_call(w, grid: int):
    return pl.pallas_call(
        _noop_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
    )(w)


def main():
    pos = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    from pytorch_models_tpu.models.audio2text.whisper import Whisper
    from pytorch_models_tpu.ops.decode_step import (
        fused_cross_decode_step, pack_decode_weights, pack_greedy_head)
    import pytorch_models_tpu.transformer as tfm

    print(jax.devices(), flush=True)

    # ---- 1. grid-entry cost ------------------------------------------------
    w_small = jnp.ones((8, 128), jnp.bfloat16)
    t1 = timed(lambda: noop_call(w_small, 1))
    t7 = timed(lambda: noop_call(w_small, 7))
    grid_entry = (t7 - t1) / 6
    print(f"grid-entry: trivial kernel grid(1) {t1*1e6:.1f} us, grid(7) "
          f"{t7*1e6:.1f} us -> {grid_entry*1e6:.2f} us/phase "
          f"(+ {t1*1e6:.1f} us call fixed)", flush=True)

    # ---- 2/3. depth sweep + head marginal ---------------------------------
    m = Whisper.from_openai("base").to_bf16()
    cfg = m.cfg
    p = m.params["decoder"]
    lc = cfg.dec_layer
    hd = lc.n_heads * lc.head_dim
    l_buf = tfm.padded_cache_len(448)
    head, head_v = pack_greedy_head(p["token_embs"], p["norm"], jnp.bfloat16)
    r = np.random.default_rng(0)
    b, lx = 1, 1536
    x = jnp.asarray(r.standard_normal((b, cfg.d_model)) * 0.3, jnp.bfloat16)

    def stack_time(n_layers, with_head):
        layers = jax.tree.map(lambda a: a[:n_layers], p["layers"])
        packed = pack_decode_weights(layers, jnp.bfloat16, cross=True)
        kc = jnp.asarray(r.standard_normal((n_layers, b, l_buf, hd)) * 0.3, jnp.bfloat16)
        vc = jnp.asarray(r.standard_normal((n_layers, b, l_buf, hd)) * 0.3, jnp.bfloat16)
        xk = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)) * 0.3, jnp.bfloat16)
        xv = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)) * 0.3, jnp.bfloat16)
        xlen = jnp.asarray([lx], jnp.int32)
        kw = {"head": head, "head_v": head_v} if with_head else {}
        fn = lambda: fused_cross_decode_step(
            x, packed, kc, vc, xk, xv, xlen, pos, None, n_heads=lc.n_heads,
            act=lc.act, eps=lc.norm_eps, norm="ln", **kw)
        return timed(fn, reps=100)

    ts = {L: stack_time(L, False) for L in (2, 4, 6)}
    for L, t in ts.items():
        print(f"headless stack L={L}: {t*1e6:7.1f} us", flush=True)
    # least-squares slope/intercept over the three points
    Ls = np.array(sorted(ts))
    ys = np.array([ts[L] for L in Ls])
    slope, intercept = np.polyfit(Ls, ys, 1)
    t_full = stack_time(6, True)
    head_marg = t_full - ts[6]
    print(f"depth fit: {slope*1e6:.1f} us/layer + {intercept*1e6:.1f} us fixed; "
          f"full {t_full*1e6:.1f} us -> head marginal {head_marg*1e6:.1f} us",
          flush=True)

    # ---- 4. floors & composition -------------------------------------------
    d, dff = cfg.d_model, 4 * cfg.d_model
    # per-layer reads: self qkv+o (4dd) + cross q/o (2dd) + mlp (2*d*dff)
    # weights, plus K AND V of the self (pos) and cross (lx) caches
    layer_bytes = 2 * (4 * d * d + 2 * d * d + 2 * d * dff) \
        + 2 * 2 * b * (pos * hd + lx * hd)
    head_bytes = 2 * head["emb"].shape[0] * d
    layer_floor = layer_bytes / BW
    head_floor = head_bytes / BW
    implied_rate = layer_bytes / slope
    print(f"per-layer: measured {slope*1e6:.1f} us vs HBM floor "
          f"{layer_floor*1e6:.1f} us ({layer_floor/slope:.0%} of floor rate; "
          f"implied stream rate {implied_rate/1e9:.0f} GB/s)", flush=True)
    print(f"head: measured {head_marg*1e6:.1f} us vs floor {head_floor*1e6:.1f} us",
          flush=True)

    floor_practical = 6 * (layer_floor + grid_entry) + (head_floor + grid_entry) + t1
    print(f"PRACTICAL floor/step = 6*(layer {layer_floor*1e6:.1f} + entry "
          f"{grid_entry*1e6:.2f}) + head {head_floor*1e6:.1f} + entry + call "
          f"{t1*1e6:.1f} = {floor_practical*1e6:.1f} us; measured full step "
          f"{t_full*1e6:.1f} us = {floor_practical/t_full:.0%} of practical",
          flush=True)


if __name__ == "__main__":
    main()

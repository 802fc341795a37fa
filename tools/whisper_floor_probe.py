"""Measure a PRACTICAL floor for the whisper-base B=1 decode step (VERDICT
r4 item 1iii: make the >=90%-of-floor north star falsifiable, the way the
148/197 TFLOP/s probe did for ViT).

The analytic floor (bench.py whisper_base_floor) assumes zero per-phase
cost: every byte of weights/KV/head streams at the full 819 GB/s and the
kernel is otherwise free. At whisper-base B=1 the step moves ~0.1 MB of KV
and ~50 MB of weights+head in ~100 us-scale phases, where fixed per-phase
costs are material. This probe measures each component ON THE CHIP:

  1. GRID-ENTRY cost: a trivial pallas_call at grid (1,) vs (7,) — the
     slope is the per-phase floor any 7-phase megakernel pays.
  2. DEPTH SLOPE: the headless layer stack at L = 2/4/6 layers — the slope
     is the real marginal per-layer cost, the intercept the kernel's fixed
     entry+carry cost; the slope compares against the per-layer HBM floor.
  3. HEAD MARGINAL: full minus headless at L=6 — vs the head-table floor.

METHOD (v2): every timing runs the step inside an on-device
``lax.fori_loop`` whose carry feeds the step's output back into its input
(plus live-keeping folds of every other output so nothing dead-codes), and
the per-step cost is the SLOPE between two iteration counts. The v1 probe
timed one step per jit call and was swamped by the tunnel's ~240 us
per-dispatch cost (the depth sweep measured a NEGATIVE slope); see
CLAUDE.md — through this tunnel, anything cheaper than ~1 ms must be timed
on-device with slope timing. A co-located host does not pay that dispatch.

Composition printed at the end:
  floor_practical/step = 6*(layer_floor + grid_entry) + head_floor + entry
where *_floor is the HBM-rate byte cost, so the remaining gap between the
measured step slope and floor_practical is genuinely unexplained (or zero,
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BW = 819e9  # v5e HBM


def slope_time(run, n1, n2, reps=3):
    """Per-iteration cost of jitted ``run(n)`` from the (n1, n2) slope.

    ``run`` must keep all work inside one jit (on-device loop) and the
    return is host-pulled to fence. The per-call dispatch constant cancels
    in the slope; we take the median of ``reps`` slopes.
    """
    np.asarray(jax.tree.leaves(run(jnp.int32(n1)))[0])  # compile + warm
    np.asarray(jax.tree.leaves(run(jnp.int32(n2)))[0])
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(run(jnp.int32(n1)))[0])
        t1 = time.perf_counter()
        np.asarray(jax.tree.leaves(run(jnp.int32(n2)))[0])
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return float(np.median(slopes))


def _noop_kernel(w_hbm, o_ref):
    def body(scr, sem):
        cp = pltpu.make_async_copy(w_hbm.at[pl.ds(0, 8), :], scr, sem)
        cp.start()
        cp.wait()
        o_ref[...] = scr[...]

    pl.run_scoped(body, scr=pltpu.VMEM((8, 128), jnp.bfloat16),
                  sem=pltpu.SemaphoreType.DMA)


def _noop_call(w, grid: int):
    return pl.pallas_call(
        _noop_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
    )(w)


@functools.partial(jax.jit, static_argnames=("grid",))
def noop_loop(w0, n, grid: int):
    def body(i, w):
        # feed the output back (+i-dependent bump) so nothing hoists
        return _noop_call(w, grid) + jnp.bfloat16(1.0) * (i % 2)

    return lax.fori_loop(0, n, body, w0)


def main():
    pos = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    from pytorch_models_tpu.models.audio2text.whisper import Whisper
    from pytorch_models_tpu.ops.decode_step import (
        fused_cross_decode_step, pack_decode_weights, pack_greedy_head)
    import pytorch_models_tpu.transformer as tfm

    print(jax.devices(), flush=True)

    # ---- 1. grid-entry cost ------------------------------------------------
    w_small = jnp.ones((8, 128), jnp.bfloat16)
    t1 = slope_time(lambda n: noop_loop(w_small, n, grid=1), 256, 8192)
    t7 = slope_time(lambda n: noop_loop(w_small, n, grid=7), 256, 8192)
    grid_entry = (t7 - t1) / 6
    print(f"grid-entry: trivial kernel grid(1) {t1*1e6:.2f} us/iter, grid(7) "
          f"{t7*1e6:.2f} us/iter -> {grid_entry*1e6:.2f} us/phase "
          f"(+ {t1*1e6:.2f} us kernel fixed)", flush=True)

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
    x0 = jnp.asarray(r.standard_normal((b, cfg.d_model)) * 0.3, jnp.bfloat16)

    def stack_slope(n_layers, with_head):
        layers = jax.tree.map(lambda a: a[:n_layers], p["layers"])
        packed = pack_decode_weights(layers, jnp.bfloat16, cross=True)
        kc = jnp.asarray(r.standard_normal((n_layers, b, l_buf, hd)) * 0.3, jnp.bfloat16)
        vc = jnp.asarray(r.standard_normal((n_layers, b, l_buf, hd)) * 0.3, jnp.bfloat16)
        xk = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)) * 0.3, jnp.bfloat16)
        xv = jnp.asarray(r.standard_normal((n_layers, b, lx, hd)) * 0.3, jnp.bfloat16)
        xlen = jnp.asarray([lx], jnp.int32)
        kw = {"head": head, "head_v": head_v} if with_head else {}

        @jax.jit
        def run(n):
            def body(i, x):
                out = fused_cross_decode_step(
                    x, packed, kc, vc, xk, xv, xlen, pos + (i % 8), None,
                    n_heads=lc.n_heads, act=lc.act, eps=lc.norm_eps,
                    norm="ln", **kw)
                x_out, k_new, v_new = out[0], out[1], out[2]
                # keep every output live; renormalize so the carried
                # activation can't blow up over hundreds of iterations
                keep = (k_new.astype(jnp.float32).sum()
                        + v_new.astype(jnp.float32).sum())
                if with_head:
                    keep = keep + out[3].astype(jnp.float32).sum()
                xf = x_out.astype(jnp.float32)
                xf = 0.3 * xf / jnp.maximum(1e-3, jnp.max(jnp.abs(xf)))
                return (xf + 1e-9 * keep).astype(jnp.bfloat16)

            return lax.fori_loop(0, n, body, x0)

        return slope_time(run, 64, 512)

    ts = {L: stack_slope(L, False) for L in (2, 4, 6)}
    for L, t in ts.items():
        print(f"headless stack L={L}: {t*1e6:7.1f} us/step", flush=True)
    Ls = np.array(sorted(ts))
    ys = np.array([ts[L] for L in Ls])
    slope, intercept = np.polyfit(Ls, ys, 1)
    t_full = stack_slope(6, True)
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

    floor_practical = 6 * (layer_floor + grid_entry) + head_floor + grid_entry + t1
    print(f"PRACTICAL floor/step = 6*(layer {layer_floor*1e6:.1f} + entry "
          f"{grid_entry*1e6:.2f}) + head {head_floor*1e6:.1f} + entry + kernel "
          f"fixed {t1*1e6:.2f} = {floor_practical*1e6:.1f} us; measured full "
          f"step {t_full*1e6:.1f} us = {floor_practical/t_full:.0%} of practical",
          flush=True)


if __name__ == "__main__":
    main()

"""Fused decode step: the entire per-token layer stack in ONE Pallas call.

Replaces the capability of the reference's per-token decode (reference
text/generator.py:23-24 re-forwards the whole prefix through eager torch
layers) with a single-kernel step designed around what bounds batched decode
on TPU: HBM bandwidth for the layer weights and the KV cache.

Why one kernel (and why the round-2 two-kernel fusion lost, PERF.md #14):
- A decode step at (B, d) = (32, 768) moves ~14.2 MB of weights per layer but
  computes < 0.5 GFLOP — pure bandwidth. Any fusion that copies a layer's
  weights to VMEM *before* computing serializes that copy; XLA's op-per-op
  matmuls at least stream weights through the MXU.
- This kernel therefore streams every weight matrix in **double-buffered row
  tiles** (``make_async_copy`` ring, like the KV streaming in
  ops/decode_attention.py): while the MXU consumes tile ``t``, tile ``t+1``
  is in flight, and the first tiles of the *next* matmul phase (and the next
  layer's first phase) are issued before the current phase drains — the DMA
  engines never idle across LN/attention/MLP phase boundaries.
- Grid is ``(n_layers,)``: per-layer LN/bias params ride in as auto-pipelined
  ``(1, 1, ·)`` VMEM blocks; the residual stream lives in a VMEM scratch
  carried across the sequential grid steps, so the whole layer stack runs
  with ONE kernel launch per token instead of ~150 XLA ops.
- Attention is inlined with the same merged-head online-softmax streaming as
  ops/decode_attention.py (batched ``(B·bk, ·)`` dots), reading only the
  valid prefix ``[pad_b, pos)`` plus the current position's K/V directly from
  VMEM (the cache write happens outside — one ``dynamic_update_slice`` of the
  returned per-layer K/V against the layer-stacked cache).

One parameterized kernel serves three decoder families:
- GPT/GPT-2 (``fused_decode_step``): pre-norm LN, biased projections, GELU.
- Whisper (``fused_cross_decode_step`` with ``norm="ln"``): adds a
  cross-attention phase streaming the precomputed (L, B, Lx, H*D) encoder
  caches with per-row valid lengths (capability replaced: reference
  audio2text/whisper.py decoder + text/generator.py decode loop).
- T5 (``norm="rms"``, ``gated_mlp=True``, ``self_bias=...``): RMSNorm,
  bias-free projections, GEGLU, and the shared rel-pos decode bias streamed
  as a key-major (Lmax, 128) VMEM table (capability: reference text/t5.py).

Layout contracts (see CLAUDE.md "Mosaic DMA alignment"): all weight tiles are
full-width row tiles (minor dim untouched -> lane aligned), row counts are
multiples of 8, and KV caches are merged-head ``(L, B, Lmax, H*D)`` with
``H*D % 128 == 0``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layers import ACT_FNS, KERNEL_ACT_FNS

NEG_INF = -1e30
KV_BLOCK = 32  # keys streamed per cache block (multiple of 8)
# target weight-tile size per ring slot; env override DECODE_TILE_MB for
# A/B sweeps (bigger tiles = fewer DMA issues/waits serialized with compute,
# more VMEM per stream)
TILE_BYTES = int(float(__import__("os").environ.get("DECODE_TILE_MB", "2")) * 1024 * 1024)
# minimum KV-block size the DMA engine amortizes; env override
# DECODE_KV_TARGET_KB for A/B sweeps (bigger = fewer DMA issues at B=1)
KV_TARGET_BYTES = int(__import__("os").environ.get("DECODE_KV_TARGET_KB", "256")) * 1024
# int8-KV attention: run the post-dot VPU chain on the compact (blk, g*H)
# diagonal instead of the wide (g*blk, g*H) grid (bit-identical; g-fold less
# VPU work — the PERF.md #33 compute-tax fix). 0 = the original wide path.
INT8_COMPACT = __import__("os").environ.get("INT8_COMPACT", "1") != "0"


def _pick_kv_block(cache_len: int, b: int, hd: int, itemsize: int) -> int:
    """KV keys per streamed block: grow past KV_BLOCK while the block stays
    under KV_TARGET_BYTES. At large batch a 32-key block is already ~1.5 MB
    (bandwidth-bound — read only the valid prefix); at B=1 a 32-key block is
    ~32 KB and the stream goes DMA-latency/VPU-loop-bound (measured 0.25 ms
    vs an 0.08 ms floor for the whisper B=1 layer stack, PERF.md) — bigger
    blocks amortize the issue cost and widen the per-block VPU ops."""
    bkv = KV_BLOCK
    while (bkv * 2 <= 512 and cache_len % (bkv * 2) == 0
           and b * bkv * hd * itemsize < KV_TARGET_BYTES):
        bkv *= 2
    return bkv


def _pick_rows(n_rows: int, n_cols: int, itemsize: int) -> int:
    """Largest row count (multiple of the dtype's sublane tile, dividing
    n_rows) with tile bytes <= TILE_BYTES; falls back to the smallest valid
    divisor. int8 tiles need 32-row alignment (T(32,128) tiling)."""
    align = 32 if itemsize == 1 else 8
    best = None
    for rows in range(align, n_rows + 1, align):
        if n_rows % rows:
            continue
        if best is None:
            best = rows
        if rows * n_cols * itemsize <= TILE_BYTES:
            best = rows
        else:
            break
    return best


def _norm(x, scale, bias, eps, kind):
    """LN or T5-style RMSNorm (no mean subtraction), fp32 statistics."""
    x32 = x.astype(jnp.float32)
    if kind == "rms":
        y = x32 * lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    else:
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _kernel(*refs, n_layers: int, n_heads: int, d: int, hd: int, dff: int,
            rows: dict, bkv: int, bkv_x: int, act: str, eps: float, scale: float,
            prec, cross: bool, norm_kind: str, gated: bool, has_sbias: bool,
            b: int, head_v: int | None = None, wt_int8: bool = False,
            a8: bool = False, eager: bool = False, embed: bool = False,
            embed_pos: bool = False, head_a8: bool = False,
            kv_int8: bool = False, kvx_int8: bool = False, kv_g: int = 0,
            b8: int = 0):
    refs = list(refs)
    with_head = head_v is not None

    def pop(n):
        out, refs[:n] = refs[:n], []
        return out

    # prefetch scalars: pos and the PRE-REDUCED range bounds (min pad / max
    # cross len computed outside — b-unrolled scalar chains in-kernel cost
    # compile time); per-row pads/lens ride as (b, 1) VMEM columns
    pos_ref, lims_ref = pop(2)
    eidx_ref = pop(1)[0] if embed else None  # (2, b): [tok ids; pos-emb ids]
    if embed:
        # in-kernel embed phase (fold of the gather.py launches): x is built
        # at layer-0 entry from the embedding tables, no x operand
        x_in, (pad_col,) = None, pop(1)
    else:
        (x_in, pad_col) = pop(2)
    (xlen_col,) = pop(1) if cross else (None,)
    (ln1_s, ln1_b, bqkv_r, bo_r, ln2_s, ln2_b, b1_r, b2_r) = pop(8)
    lnc_s = lnc_b = bqc_r = boc_r = sbias_r = None
    if cross:
        lnc_s, lnc_b, bqc_r, boc_r = pop(4)
    s_qkv = s_o = s_1 = s_2 = s_qc = s_oc = None
    if wt_int8:  # per-output-channel dequant scales (commute with the dot)
        s_qkv, s_o, s_1, s_2 = pop(4)
        if cross:
            s_qc, s_oc = pop(2)
    if has_sbias:
        (sbias_r,) = pop(1)
    fn_s = fn_b = emb_hbm = tok_out = emb_scr = emb_sem = embs_ref = None
    if with_head:
        fn_s, fn_b = pop(2)
        if head_a8:
            (embs_ref,) = pop(1)
    wqkv_hbm, wo_hbm, w1_hbm, w2_hbm = pop(4)
    wqc_hbm = woc_hbm = kxc_hbm = vxc_hbm = None
    if cross:
        wqc_hbm, woc_hbm = pop(2)
    kc_hbm, vc_hbm = pop(2)
    ks_hbm = vs_hbm = None
    if kv_int8:  # (L, B8, Lmax) f32 per-key scale planes for the int8 caches
        ks_hbm, vs_hbm = pop(2)
    kxs_hbm = vxs_hbm = None
    if cross:
        kxc_hbm, vxc_hbm = pop(2)
        if kvx_int8:  # (L, B8, Lx) f32 per-key scales of the int8 cross caches
            kxs_hbm, vxs_hbm = pop(2)
    if with_head:
        (emb_hbm,) = pop(1)
    temb_hbm = pemb_hbm = None
    if embed:
        (temb_hbm,) = pop(1)
        if embed_pos:
            (pemb_hbm,) = pop(1)
    x_out, knew_ref, vnew_ref = pop(3)
    if with_head:
        (tok_out,) = pop(1)
    x_scr, qkv_scr, wo_scr, w1_scr, w2_scr = pop(5)
    qc_scr = oc_scr = None
    if cross:
        qc_scr, oc_scr = pop(2)
    k_scr, v_scr = pop(2)
    ks_scr = vs_scr = kvs_sem = None
    if kv_int8:
        ks_scr, vs_scr = pop(2)
    kx_scr = vx_scr = kvx_sem = None
    kxs_scr = vxs_scr = kvxs_sem = None
    if cross:
        kx_scr, vx_scr = pop(2)
        if kvx_int8:
            kxs_scr, vxs_scr = pop(2)
    if with_head:
        (emb_scr,) = pop(1)
    gw_scr = None
    if embed:  # (n_tab*b, 8, d) gather windows for the embed phase
        (gw_scr,) = pop(1)
    qkv_sem, wo_sem, w1_sem, w2_sem = pop(4)
    qc_sem = oc_sem = None
    if cross:
        qc_sem, oc_sem = pop(2)
    (kv_sem,) = pop(1)
    if kv_int8:
        (kvs_sem,) = pop(1)
    if cross:
        (kvx_sem,) = pop(1)
        if kvx_int8:
            (kvxs_sem,) = pop(1)
    if with_head:
        (emb_sem,) = pop(1)
    g_sem = None
    if embed:
        (g_sem,) = pop(1)
    assert not refs, f"{len(refs)} unconsumed refs"

    l = pl.program_id(0)
    head_dim = hd // n_heads
    cdt = x_scr.dtype if embed else x_in.dtype
    f32 = jnp.float32
    n_qkv, n_o = d // rows["qkv"], hd // rows["o"]
    n_1, n_2 = d // rows["w1"], dff // rows["w2"]
    if cross:
        n_qc, n_oc = d // rows["qc"], hd // rows["oc"]

    def wdma(hbm, scr, sem, layer, t, r, slot):
        return pltpu.make_async_copy(
            hbm.at[layer, pl.ds(t * r, r), :], scr.at[slot], sem.at[slot])

    def kv_dma(khbm, vhbm, i, slot, scr2, sem2, blk):
        ks, vs = scr2
        return [
            pltpu.make_async_copy(khbm.at[l, :, pl.ds(i * blk, blk), :],
                                  ks.at[slot], sem2.at[slot, 0]),
            pltpu.make_async_copy(vhbm.at[l, :, pl.ds(i * blk, blk), :],
                                  vs.at[slot], sem2.at[slot, 1]),
        ]

    def skv_dma(i, slot):
        """Self-KV block copies; int8 caches bring their (B8, bkv) f32
        per-key scale windows along (bkv=128 keeps the lane offset aligned)."""
        cps = kv_dma(kc_hbm, vc_hbm, i, slot, (k_scr, v_scr), kv_sem, bkv)
        if kv_int8:
            cps += [
                pltpu.make_async_copy(ks_hbm.at[l, :, pl.ds(i * bkv, bkv)],
                                      ks_scr.at[slot], kvs_sem.at[slot, 0]),
                pltpu.make_async_copy(vs_hbm.at[l, :, pl.ds(i * bkv, bkv)],
                                      vs_scr.at[slot], kvs_sem.at[slot, 1]),
            ]
        return cps

    def xkv_dma(i, slot):
        """Cross-KV block copies (+ scale windows for int8 cross caches)."""
        cps = kv_dma(kxc_hbm, vxc_hbm, i, slot, (kx_scr, vx_scr), kvx_sem, bkv_x)
        if kvx_int8:
            cps += [
                pltpu.make_async_copy(kxs_hbm.at[l, :, pl.ds(i * bkv_x, bkv_x)],
                                      kxs_scr.at[slot], kvxs_sem.at[slot, 0]),
                pltpu.make_async_copy(vxs_hbm.at[l, :, pl.ds(i * bkv_x, bkv_x)],
                                      vxs_scr.at[slot], kvxs_sem.at[slot, 1]),
            ]
        return cps

    pos = pos_ref[0]
    first_kv = lims_ref[0] // bkv  # lims[0] = min over rows of pad_lens
    n_kv = (pos + bkv - 1) // bkv  # cache keys [0, pos); current pos is in VMEM
    if cross:
        n_xkv = (lims_ref[1] + bkv_x - 1) // bkv_x  # lims[1] = max cross len
        n_xkv_max = kxc_hbm.shape[-2] // bkv_x  # static bound for warmup slices

    def _emb_dma(tab, row, r):
        # aligned 8-row window (ids pre-clamped to the row-padded table, so
        # the window is in bounds and the start provably 8-divisible)
        start = (eidx_ref[row, r] // 8) * 8
        slot = r + row * b
        return pltpu.make_async_copy(tab.at[pl.ds(start, 8), :],
                                     gw_scr.at[slot], g_sem.at[slot])

    def layer_warmups():
        # ---- layer 0's first QKV tiles (later layers get theirs from the
        # previous layer's MLP phase), this layer's first self-KV blocks
        @pl.when(l == 0)
        def _():
            if embed:
                # ---- in-kernel embed phase: issue the per-row 8-row-aligned
                # window copies FIRST (x is needed before the first qkv tile
                # is consumed), collect them after all warmups are queued
                for r in range(b):
                    _emb_dma(temb_hbm, 0, r).start()
                    if embed_pos:
                        _emb_dma(pemb_hbm, 1, r).start()
            else:
                x_scr[...] = x_in[...]
            for t in range(min(2, n_qkv)):
                wdma(wqkv_hbm, qkv_scr, qkv_sem, 0, t, rows["qkv"], t % 2).start()

        for w in range(2):
            @pl.when(first_kv + w < n_kv)
            def _(w=w):
                for cp in skv_dma(first_kv + w, lax.rem(first_kv + w, 2)):
                    cp.start()

        if eager:
            # ---- small-batch mode: every weight phase here is 1-2 tiles, so
            # the chained one-phase-ahead warmups leave the DMA queue nearly
            # empty and each phase pays its wait latency serially (measured
            # ~55% of the HBM floor at whisper B=1, PERF.md #28). Each phase
            # owns its scratch + semaphore, so issue the whole layer's
            # first-2 tiles at entry, in consumption order; in-phase
            # ``start(t+2)`` keeps handling deeper tiles. Gated to b <= 4:
            # at large batch the KV streams dominate and must not queue
            # behind eagerly-issued MLP weights.
            for t in range(min(2, n_o)):
                wdma(wo_hbm, wo_scr, wo_sem, l, t, rows["o"], t % 2).start()
            if cross:
                for t in range(min(2, n_qc)):
                    wdma(wqc_hbm, qc_scr, qc_sem, l, t, rows["qc"], t % 2).start()
                for w in range(min(2, n_xkv_max)):
                    @pl.when(w < n_xkv)
                    def _(w=w):
                        for cp in xkv_dma(w, w % 2):
                            cp.start()
                for t in range(min(2, n_oc)):
                    wdma(woc_hbm, oc_scr, oc_sem, l, t, rows["oc"], t % 2).start()
            for t in range(min(2, n_1)):
                wdma(w1_hbm, w1_scr, w1_sem, l, t, rows["w1"], t % 2).start()
            for t in range(min(2, n_2)):
                wdma(w2_hbm, w2_scr, w2_sem, l, t, rows["w2"], t % 2).start()

        if embed:
            # collect the embed windows AFTER every warmup above is queued —
            # the row waits overlap the weight/KV issue latency. Mask-select
            # each row's sublane in VMEM (gather.py's trick); tok + pos sum
            # in fp32 then one cast = the same single-rounding as a cdt add.
            @pl.when(l == 0)
            def _():
                sub_iota = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                xr = []
                for r in range(b):
                    _emb_dma(temb_hbm, 0, r).wait()
                    pick = sub_iota == (eidx_ref[0, r] - (eidx_ref[0, r] // 8) * 8)
                    row = jnp.sum(jnp.where(pick, gw_scr[r].astype(jnp.float32), 0.0),
                                  axis=0)
                    if embed_pos:
                        _emb_dma(pemb_hbm, 1, r).wait()
                        pickp = sub_iota == (eidx_ref[1, r] - (eidx_ref[1, r] // 8) * 8)
                        row = row + jnp.sum(
                            jnp.where(pickp, gw_scr[b + r].astype(jnp.float32), 0.0),
                            axis=0)
                    xr.append(row)
                x_scr[...] = jnp.stack(xr).astype(cdt)

    def stream(x_act, hbm, scr, sem, r, n_tiles, n_cols, next_warmup):
        """acc = x_act @ W with W double-buffer-streamed in full-width row
        tiles; ``next_warmup()`` is issued once this phase's own starts are
        all queued (keeps the DMA queues ordered by consumption).

        ``a8`` (w8a8 serving mode): the activation is symmetric-quantized
        per ROW once per phase and every tile dot runs int8 x int8 -> int32
        on the MXU — no per-tile int8->bf16 cast (the sublane relayout that
        made cast-only w8a16 streaming SLOWER than bf16, PERF.md #17b). The
        int32 accumulation is exact, so dequant is one (row_scale x
        col_scale) rescale after the loop (col scale applied by the caller)."""
        if wt_int8 and a8:
            x32 = x_act.astype(f32)
            absmax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
            r_scale = jnp.where(absmax == 0.0, 1.0, absmax) * (1.0 / 127.0)
            x_q = jnp.clip(jnp.round(x32 / r_scale), -127, 127).astype(jnp.int8)
            acc_i = jnp.zeros((b, n_cols), jnp.int32)
            for t in range(n_tiles):
                wdma(hbm, scr, sem, l, t, r, t % 2).wait()
                if t == max(0, n_tiles - 2) and next_warmup is not None:
                    next_warmup()
                acc_i = acc_i + lax.dot_general(
                    x_q[:, t * r:(t + 1) * r], scr[t % 2],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
                # t+2 overwrites the slot the dot above just read: start it
                # only AFTER that read — a pre-dot start races the MXU when
                # compute runs slower than the copies (PERF.md #35)
                if t + 2 < n_tiles:
                    wdma(hbm, scr, sem, l, t + 2, r, t % 2).start()
            return acc_i.astype(f32) * r_scale
        acc = jnp.zeros((b, n_cols), f32)
        for t in range(n_tiles):
            wdma(hbm, scr, sem, l, t, r, t % 2).wait()
            if t == max(0, n_tiles - 2) and next_warmup is not None:
                next_warmup()
            w_tile = scr[t % 2]
            if w_tile.dtype != x_act.dtype:
                # int8 tiles: cast-only dequant — the per-output-channel scale
                # is applied ONCE to the accumulated result (it commutes)
                w_tile = w_tile.astype(x_act.dtype)
            acc = acc + lax.dot_general(
                x_act[:, t * r:(t + 1) * r], w_tile,
                (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
            # post-read prefetch: t+2 reuses slot t%2 (see comment above)
            if t + 2 < n_tiles:
                wdma(hbm, scr, sem, l, t + 2, r, t % 2).start()
        return acc

    # head-expander: E[lane, h] = 1 iff lane belongs to head h
    col_head = lax.broadcasted_iota(jnp.int32, (hd, n_heads), 0) // head_dim
    head_id = lax.broadcasted_iota(jnp.int32, (hd, n_heads), 1)
    e_mat = (col_head == head_id).astype(cdt)
    e_mat32 = e_mat.astype(f32)

    def expand(x, mat=None):
        return lax.dot_general(x, e_mat32 if mat is None else mat, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32, precision=prec)

    def attn_stream(q, khbm, vhbm, first, n_blk, ends_v, pad_v, cur_kv, bias_tab,
                    scr2=None, sem2=None, blk=None):
        """Online-softmax over streamed KV blocks [first, n_blk), optionally
        folding a current-position K/V from VMEM and a key-major additive
        bias table. All rows in one batched (B*bk, ·) dot per block."""
        scr2 = (k_scr, v_scr) if scr2 is None else scr2
        sem2 = kv_sem if sem2 is None else sem2
        blk = bkv if blk is None else blk
        q_s = (q.astype(f32) * scale).astype(cdt)

        def step(i, carry):
            ms, ls, accs = carry
            slot = lax.rem(i, 2)

            for cp in kv_dma(khbm, vhbm, i, slot, scr2, sem2, blk):
                cp.wait()

            kq = (scr2[0][slot].astype(cdt) * q_s[:, None, :]).reshape(b * blk, hd)
            s = lax.dot_general(kq, e_mat, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32, precision=prec
                                ).reshape(b, blk, n_heads)
            if bias_tab is not None:
                s = s + bias_tab[pl.ds(i * blk, blk), :n_heads].astype(f32)[None]
            k_idx = i * blk + lax.broadcasted_iota(jnp.int32, (1, blk, 1), 1)
            valid = jnp.logical_and(k_idx < ends_v, k_idx >= pad_v)
            s = jnp.where(valid, s, NEG_INF)

            m_new = jnp.maximum(ms, jnp.max(s, axis=1))
            # safe max: a row whose [pad, end) misses this block must underflow
            m_safe = jnp.maximum(m_new, jnp.float32(NEG_INF / 2))
            p = jnp.exp(s - m_safe[:, None, :])
            alpha = jnp.exp(ms - m_safe)
            l_new = alpha * ls + jnp.sum(p, axis=1)
            p_full = lax.dot_general(p.astype(cdt).reshape(b * blk, n_heads), e_mat,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32, precision=prec
                                     ).reshape(b, blk, hd)
            pv = jnp.sum(p_full * scr2[1][slot].astype(f32), axis=1)

            # block i+2 reuses this slot: its copy must start only AFTER the
            # kq/pv reads above — a pre-read start races the DMA engine
            # against the VPU/MXU when compute is slower than the copies
            # (caught on-chip at fp32 HIGHEST, PERF.md #35)
            @pl.when(i + 2 < n_blk)
            def _():
                for cp in kv_dma(khbm, vhbm, i + 2, lax.rem(i + 2, 2), scr2, sem2, blk):
                    cp.start()

            return m_new, l_new, accs * expand(alpha) + pv

        init = (jnp.full((b, n_heads), NEG_INF, f32),
                jnp.zeros((b, n_heads), f32),
                jnp.zeros((b, hd), f32))
        ms, ls, accs = lax.fori_loop(first, n_blk, step, init)

        if cur_kv is not None:  # current position: always valid, K/V in VMEM
            k_cur, v_cur = cur_kv
            s_cur = lax.dot_general((k_cur * q_s), e_mat, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32, precision=prec)
            if bias_tab is not None:
                s_cur = s_cur + bias_tab[pl.ds(pos, 1), :n_heads].astype(f32)
            m_new = jnp.maximum(ms, s_cur)
            p_cur = jnp.exp(s_cur - m_new)
            alpha = jnp.exp(ms - m_new)
            ls = alpha * ls + p_cur
            accs = accs * expand(alpha) + expand(p_cur) * v_cur.astype(f32)
        else:
            ls = jnp.where(ls == 0.0, 1.0, ls)
        return (accs / expand(ls)).astype(cdt)

    def attn_stream_int8(q, cur_kv, dma, scr4, first, n_blk, blk, ends_col):
        """Attention over an int8 KV cache (ops/int8_kv.py design, oracle-
        pinned there): per-group block-diagonal int8 q-expander scores,
        prob-folded V scales, dim-0-contracting int8 PV dots — all attention
        math rides the MXU as int8 x int8 -> int32 with NO int8->bf16 tile
        casts. ``dma``/``scr4`` select the stream (self via skv_dma or cross
        via xkv_dma; blocks are 128 keys so the scale windows stay
        lane-aligned). ``ends_col=None`` is self-attention (valid keys
        ``[pad_col[r], pos)`` + the in-VMEM current position ``cur_kv``);
        a (b, 1) length column is cross-attention (valid keys ``[0, len_r)``,
        no current position; all-empty rows return zeros)."""
        g = kv_g
        ng = b // g
        gh = g * n_heads
        f32 = jnp.float32
        # f32 selector/expander/context dots are exact-math glue around the
        # int8 MXU dots: DEFAULT lowers them to bf16 passes on hardware and
        # the path drifts ~5e-3 off the quantized oracle (int8_kv.py). Their
        # FLOPs are negligible -> force HIGHEST, shadowing the serving prec.
        prec = lax.Precision.HIGHEST
        k_scr_, v_scr_, sk_scr_, sv_scr_ = scr4
        sel = (lax.broadcasted_iota(jnp.int32, (g, gh), 1) // n_heads
               == lax.broadcasted_iota(jnp.int32, (g, gh), 0)).astype(f32)
        head_ok = (lax.broadcasted_iota(jnp.int32, (hd, gh), 0) // head_dim
                   == lax.broadcasted_iota(jnp.int32, (hd, gh), 1) % n_heads).astype(f32)
        hm = (lax.broadcasted_iota(jnp.int32, (gh, hd), 0) % n_heads
              == lax.broadcasted_iota(jnp.int32, (gh, hd), 1) // head_dim).astype(f32)

        def expand_g(v_gh):  # (1, gh) per-(row, head) -> (g, hd) per lane
            return lax.dot_general(sel * v_gh, hm, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32, precision=prec)

        compact = INT8_COMPACT
        if compact:
            m_i32 = sel.astype(jnp.int32)  # (g, gh) group-diagonal selector
            j_col = lax.broadcasted_iota(jnp.int32, (blk, gh), 0)
            # 3D bool diagonal mask for the PV re-expansion, built from 3D
            # iotas (a 2D->3D unit-dim reshape of an int8 vector is an
            # unsupported Mosaic shape cast on hardware, and int8 elementwise
            # multiplies don't legalize — select does; interpret hides both)
            mask3 = (lax.broadcasted_iota(jnp.int32, (g, blk, gh), 0)
                     == lax.broadcasted_iota(jnp.int32, (g, blk, gh), 2)
                     // n_heads)
        else:
            row_i = lax.broadcasted_iota(jnp.int32, (g * blk, gh), 0)
            col_i = lax.broadcasted_iota(jnp.int32, (g * blk, gh), 1)
            diag = row_i // blk == col_i // n_heads
            j_in_blk = row_i - (row_i // blk) * blk

        q_s = q.astype(f32) * scale  # (b, hd)
        if ends_col is None:
            pad_all = pad_col[...]  # (b, 1); ends = pos for every row
        else:
            ends_all = ends_col[...]  # (b, 1); pads = 0

        # per-group quantized q-expander + (self only) current-position K
        # quantized with the cache-write rule: a key scores identically now
        # and when later streamed
        qs, qi, kci, kcs, bound_c = [], [], [], [], []
        for gi in range(ng):
            q_g = q_s[gi * g:(gi + 1) * g]
            q_e = lax.dot_general(q_g, sel, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32, precision=prec) * head_ok
            absmax = jnp.max(jnp.abs(q_e), axis=0, keepdims=True)
            sq = jnp.where(absmax == 0.0, 1.0, absmax) * (1.0 / 127.0)
            qi.append(jnp.clip(jnp.round(q_e / sq), -127, 127).astype(jnp.int8))
            qs.append(sq)
            if compact:
                # per-COLUMN valid bound (1, gh): column block r carries row
                # r's pad (self) / length (cross); exact single-term dot
                b_g = (pad_all if ends_col is None else ends_all)
                bf = lax.dot_general(b_g[gi * g:(gi + 1) * g].astype(f32), sel,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32, precision=prec)
                bound_c.append(bf.astype(jnp.int32))
            if cur_kv is not None:
                kc = cur_kv[0][gi * g:(gi + 1) * g].astype(f32)
                am = jnp.max(jnp.abs(kc), axis=1, keepdims=True)
                ks_ = jnp.where(am == 0.0, 1.0, am) * (1.0 / 127.0)
                kci.append(jnp.clip(jnp.round(kc / ks_), -127, 127).astype(jnp.int8))
                kcs.append(ks_)

        def step(i, carry):
            mss, lss, accss = carry
            slot = lax.rem(i, 2)

            for cp in dma(i, slot):
                cp.wait()

            out_m, out_l, out_a = [], [], []
            for gi in range(ng):
                ms, ls, accs = mss[gi], lss[gi], accss[gi]
                k_flat = k_scr_[slot][gi * g:(gi + 1) * g].reshape(g * blk, hd)
                s_i32 = lax.dot_general(k_flat, qi[gi], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                if compact:
                    # compact-diagonal path (PERF.md #33 compute-tax fix):
                    # fold the block-diagonal (g, blk, gh) into (blk, gh) —
                    # column block r keeps plane r — so every VPU op below
                    # runs at 1/g width. Bit-identical to the wide path.
                    s3i = s_i32.reshape(g, blk, gh)
                    s_c = s3i[0] * m_i32[0:1]
                    for r in range(1, g):
                        s_c = s_c + s3i[r] * m_i32[r:r + 1]
                    # per-column key scales sk_c[j, c] = sk[c//H, j] (exact
                    # single-term selector dot; same for V scales below)
                    sk_c = lax.dot_general(sk_scr_[slot][gi * g:(gi + 1) * g],
                                           sel, (((0,), (0,)), ((), ())),
                                           preferred_element_type=f32,
                                           precision=prec)
                    s = s_c.astype(f32) * sk_c * qs[gi]
                    if has_sbias and ends_col is None:
                        s = s + sbias_r[pl.ds(i * blk, blk), :gh].astype(f32)
                    k_idx = i * blk + j_col
                    if ends_col is None:
                        valid = jnp.logical_and(k_idx < pos, k_idx >= bound_c[gi])
                    else:
                        valid = k_idx < bound_c[gi]
                    s = jnp.where(valid, s, NEG_INF)
                else:
                    sk_blk = sk_scr_[slot][gi * g:(gi + 1) * g]  # (g, blk)
                    s = (s_i32.astype(f32).reshape(g, blk, gh)
                         * sk_blk[:, :, None]).reshape(g * blk, gh) * qs[gi]
                    if has_sbias and ends_col is None:
                        # GROUP-TILED key-major decode bias: first g*H lanes
                        # hold bias[k, h] repeated per group; rows broadcast
                        sb = sbias_r[pl.ds(i * blk, blk), :gh].astype(f32)
                        s = s + jnp.broadcast_to(sb[None], (g, blk, gh)).reshape(g * blk, gh)
                    k_idx = i * blk + j_in_blk
                    # NB: slice WITHOUT a None in the index tuple — mixed
                    # slice+newaxis indexing lowers via lax.gather, which
                    # Mosaic rejects inside the loop (hardware-only;
                    # interpret hides it)
                    if ends_col is None:
                        pad_g = jnp.broadcast_to(
                            pad_all[gi * g:(gi + 1) * g].reshape(g, 1, 1),
                            (g, blk, 1)).reshape(g * blk, 1)
                        valid = jnp.logical_and(k_idx < pos, k_idx >= pad_g)
                    else:
                        ends_g = jnp.broadcast_to(
                            ends_all[gi * g:(gi + 1) * g].reshape(g, 1, 1),
                            (g, blk, 1)).reshape(g * blk, 1)
                        valid = k_idx < ends_g
                    s = jnp.where(jnp.logical_and(valid, diag), s, NEG_INF)
                m_new = jnp.maximum(ms, jnp.max(s, axis=0, keepdims=True))
                m_safe = jnp.maximum(m_new, jnp.float32(NEG_INF / 2))
                p = jnp.exp(s - m_safe)
                alpha = jnp.exp(ms - m_safe)
                l_new = alpha * ls + jnp.sum(p, axis=0, keepdims=True)
                if compact:
                    sv_c = lax.dot_general(sv_scr_[slot][gi * g:(gi + 1) * g],
                                           sel, (((0,), (0,)), ((), ())),
                                           preferred_element_type=f32,
                                           precision=prec)
                    p_eff = p * sv_c
                    pm = jnp.max(jnp.abs(p_eff), axis=0, keepdims=True)
                    ps = jnp.where(pm == 0.0, 1.0, pm) * (1.0 / 127.0)
                    p_i8c = jnp.clip(jnp.round(p_eff / ps), -127, 127).astype(jnp.int8)
                    # re-expand to block-diagonal ONLY for the int8 PV
                    # operand (a quarter-width int8 broadcast+mask pass)
                    p_i8 = jnp.where(mask3, jnp.broadcast_to(p_i8c[None], (g, blk, gh)),
                                     jnp.int8(0)).reshape(g * blk, gh)
                else:
                    sv_blk = sv_scr_[slot][gi * g:(gi + 1) * g]
                    p_eff = (p.reshape(g, blk, gh)
                             * sv_blk[:, :, None]).reshape(g * blk, gh)
                    pm = jnp.max(jnp.abs(p_eff), axis=0, keepdims=True)
                    ps = jnp.where(pm == 0.0, 1.0, pm) * (1.0 / 127.0)
                    p_i8 = jnp.clip(jnp.round(p_eff / ps), -127, 127).astype(jnp.int8)
                v_flat = v_scr_[slot][gi * g:(gi + 1) * g].reshape(g * blk, hd)
                pv = lax.dot_general(p_i8, v_flat, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                ctx = lax.dot_general(sel * ps, pv.astype(f32) * hm,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32, precision=prec)
                out_m.append(m_new)
                out_l.append(l_new)
                out_a.append(accs * expand_g(alpha) + ctx)

            # post-read prefetch: block i+2 reuses this slot, so its copy
            # starts only after the k/sk/sv/v reads above (PERF.md #35)
            @pl.when(i + 2 < n_blk)
            def _():
                for cp in dma(i + 2, lax.rem(i + 2, 2)):
                    cp.start()

            return out_m, out_l, out_a

        init = ([jnp.full((1, gh), NEG_INF, f32)] * ng,
                [jnp.zeros((1, gh), f32)] * ng,
                [jnp.zeros((g, hd), f32)] * ng)
        mss, lss, accss = lax.fori_loop(first, n_blk, step, init)

        cdiag = (lax.broadcasted_iota(jnp.int32, (g, gh), 0)
                 == lax.broadcasted_iota(jnp.int32, (g, gh), 1) // n_heads)
        outs = []
        for gi in range(ng):
            ms, ls, accs = mss[gi], lss[gi], accss[gi]
            if cur_kv is not None:
                sc_i32 = lax.dot_general(kci[gi], qi[gi], (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.int32)
                s_cur = sc_i32.astype(f32) * kcs[gi] * qs[gi]
                if has_sbias and ends_col is None:
                    s_cur = s_cur + sbias_r[pl.ds(pos, 1), :gh].astype(f32)
                s_cur = jnp.where(cdiag, s_cur, NEG_INF)
                m_new = jnp.maximum(ms, jnp.max(s_cur, axis=0, keepdims=True))
                p_cur = jnp.exp(s_cur - m_new)  # current pos always valid: l > 0
                alpha = jnp.exp(ms - m_new)
                ls = alpha * ls + jnp.sum(p_cur, axis=0, keepdims=True)
                v_cur = cur_kv[1][gi * g:(gi + 1) * g].astype(f32)
                pv_cur = lax.dot_general(p_cur, v_cur, (((0,), (0,)), ((), ())),
                                         preferred_element_type=f32, precision=prec)
                ctx_cur = lax.dot_general(sel, pv_cur * hm, (((1,), (0,)), ((), ())),
                                          preferred_element_type=f32, precision=prec)
                accs = accs * expand_g(alpha) + ctx_cur
            else:
                ls = jnp.where(ls == 0.0, 1.0, ls)  # all-empty cross rows -> 0
            outs.append((accs / expand_g(ls)).astype(cdt))
        return jnp.concatenate(outs, 0) if ng > 1 else outs[0]

    def layer_body():
        layer_warmups()
        xv = x_scr[...]  # (B, d) residual stream

        # ---- self-attention block ----------------------------------------
        h1 = _norm(xv, ln1_s[0], ln1_b[0], eps, norm_kind)

        def wo_warmup():
            for to in range(min(2, n_o)):
                wdma(wo_hbm, wo_scr, wo_sem, l, to, rows["o"], to % 2).start()

        qkv_acc = stream(h1, wqkv_hbm, qkv_scr, qkv_sem, rows["qkv"], n_qkv, 3 * hd,
                         None if eager else wo_warmup)
        if wt_int8:
            qkv_acc = qkv_acc * s_qkv[0].astype(f32)
        qkv = (qkv_acc + bqkv_r[0].astype(f32)).astype(cdt)
        q, k_new, v_new = qkv[:, :hd], qkv[:, hd:2 * hd], qkv[:, 2 * hd:]
        knew_ref[0] = k_new
        vnew_ref[0] = v_new

        if kv_int8:
            ctx = attn_stream_int8(q, (k_new, v_new), skv_dma,
                                   (k_scr, v_scr, ks_scr, vs_scr),
                                   first_kv, n_kv, bkv, None)
        else:
            ends_v = pos * jnp.ones((b, 1, 1), jnp.int32)
            pad_v = pad_col[...].reshape(b, 1, 1)
            ctx = attn_stream(q, kc_hbm, vc_hbm, first_kv, n_kv, ends_v, pad_v,
                              (k_new, v_new), sbias_r if has_sbias else None)

        if cross:
            def after_o():  # queue cross-q weights + the first cross-KV blocks
                for tq in range(min(2, n_qc)):
                    wdma(wqc_hbm, qc_scr, qc_sem, l, tq, rows["qc"], tq % 2).start()
                for w in range(min(2, n_xkv_max)):
                    @pl.when(w < n_xkv)
                    def _(w=w):
                        for cp in xkv_dma(w, w % 2):
                            cp.start()
        else:
            def after_o():
                for t1 in range(min(2, n_1)):
                    wdma(w1_hbm, w1_scr, w1_sem, l, t1, rows["w1"], t1 % 2).start()

        o_acc = stream(ctx, wo_hbm, wo_scr, wo_sem, rows["o"], n_o, d,
                       None if eager else after_o)
        if wt_int8:
            o_acc = o_acc * s_o[0].astype(f32)
        xv = xv + (o_acc + bo_r[0].astype(f32)).astype(cdt)

        # ---- cross-attention block (Whisper/T5 decode) ------------------------
        if cross:
            hc = _norm(xv, lnc_s[0], lnc_b[0], eps, norm_kind)

            def oc_warmup():
                for to in range(min(2, n_oc)):
                    wdma(woc_hbm, oc_scr, oc_sem, l, to, rows["oc"], to % 2).start()

            qc_acc = stream(hc, wqc_hbm, qc_scr, qc_sem, rows["qc"], n_qc, hd,
                            None if eager else oc_warmup)
            if wt_int8:
                qc_acc = qc_acc * s_qc[0].astype(f32)
            q_c = (qc_acc + bqc_r[0].astype(f32)).astype(cdt)

            if kvx_int8:
                ctx_c = attn_stream_int8(q_c, None, xkv_dma,
                                         (kx_scr, vx_scr, kxs_scr, vxs_scr),
                                         0, n_xkv, bkv_x, xlen_col)
            else:
                xlen_v = xlen_col[...].reshape(b, 1, 1)
                zero_v = jnp.zeros((b, 1, 1), jnp.int32)
                ctx_c = attn_stream(q_c, kxc_hbm, vxc_hbm, 0, n_xkv, xlen_v, zero_v,
                                    None, None, scr2=(kx_scr, vx_scr), sem2=kvx_sem,
                                    blk=bkv_x)

            def w1_warmup():
                for t1 in range(min(2, n_1)):
                    wdma(w1_hbm, w1_scr, w1_sem, l, t1, rows["w1"], t1 % 2).start()

            oc_acc = stream(ctx_c, woc_hbm, oc_scr, oc_sem, rows["oc"], n_oc, d,
                            None if eager else w1_warmup)
            if wt_int8:
                oc_acc = oc_acc * s_oc[0].astype(f32)
            xv = xv + (oc_acc + boc_r[0].astype(f32)).astype(cdt)

        # ---- MLP block ---------------------------------------------------------
        h2 = _norm(xv, ln2_s[0], ln2_b[0], eps, norm_kind)
        w1_cols = 2 * dff if gated else dff

        def w2_warmup():
            for t2 in range(min(2, n_2)):
                wdma(w2_hbm, w2_scr, w2_sem, l, t2, rows["w2"], t2 % 2).start()

        m_acc = stream(h2, w1_hbm, w1_scr, w1_sem, rows["w1"], n_1, w1_cols,
                       None if eager else w2_warmup)
        if wt_int8:
            m_acc = m_acc * s_1[0].astype(f32)
        if gated:  # GEGLU: act(x@wi) * (x@v) — T5 gated MLP (ref t5.py:29-37)
            h3 = KERNEL_ACT_FNS[act]((m_acc[:, :dff] + b1_r[0].astype(f32)).astype(cdt)) \
                * m_acc[:, dff:].astype(cdt)
        else:
            h3 = KERNEL_ACT_FNS[act]((m_acc + b1_r[0].astype(f32)).astype(cdt))

        def next_layer_warmup():
            @pl.when(l + 1 < n_layers)
            def _():
                for tq in range(min(2, n_qkv)):
                    wdma(wqkv_hbm, qkv_scr, qkv_sem, l + 1, tq, rows["qkv"], tq % 2).start()

            if with_head:  # last layer queues the head's first embedding tiles
                @pl.when(l + 1 == n_layers)
                def _():
                    tv = rows["emb"]
                    n_v = emb_hbm.shape[0] // tv
                    for t in range(min(2, n_v)):
                        pltpu.make_async_copy(emb_hbm.at[pl.ds(t * tv, tv), :],
                                              emb_scr.at[t % 2], emb_sem.at[t % 2]).start()

        o2_acc = stream(h3, w2_hbm, w2_scr, w2_sem, rows["w2"], n_2, d, next_layer_warmup)
        if wt_int8:
            o2_acc = o2_acc * s_2[0].astype(f32)
        xv = xv + (o2_acc + b2_r[0].astype(f32)).astype(cdt)

        x_scr[...] = xv
        x_out[...] = xv

    def head_body():
        """Final norm + argmax(x @ emb.T) over streamed vocab tiles — the
        (B, V) logits never leave the chip (mirrors ops/greedy_head.py:
        bf16 score rounding matches XLA's bf16-logits winner; ties resolve
        to the lowest index like jnp.argmax)."""
        tv = rows["emb"]
        n_v = emb_hbm.shape[0] // tv
        xn = _norm(x_scr[...], fn_s[...], fn_b[...], eps, norm_kind)
        if head_a8:
            # w8a8 head: per-row symmetric quant of the hidden state. Its
            # per-row scale is positive and constant within a row, so it is
            # argmax-invariant and never applied; the per-vocab-row table
            # scales (embs_ref) are applied per tile below.
            xn32 = xn.astype(f32)
            xn_absmax = jnp.max(jnp.abs(xn32), axis=1, keepdims=True)
            xn_scale = jnp.where(xn_absmax == 0.0, 1.0, xn_absmax) * (1.0 / 127.0)
            xn_q = jnp.clip(jnp.round(xn32 / xn_scale), -127, 127).astype(jnp.int8)
        int_max = jnp.int32(jnp.iinfo(jnp.int32).max)

        def emb_dma(t, slot):
            return pltpu.make_async_copy(emb_hbm.at[pl.ds(t * tv, tv), :],
                                         emb_scr.at[slot], emb_sem.at[slot])

        def tile_step(t, carry):
            bv, bi = carry  # (B, 1) running best value / index
            slot = lax.rem(t, 2)

            emb_dma(t, slot).wait()
            if head_a8:
                s_i = lax.dot_general(xn_q, emb_scr[slot], (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)  # (B, tv)
                s = s_i.astype(f32) * embs_ref[pl.ds(t, 1), :]
            else:
                s = lax.dot_general(xn, emb_scr[slot], (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32, precision=prec)  # (B, tv)
                if cdt == jnp.bfloat16:
                    # round like XLA's bf16 head matmul: identical argmax winner
                    s = s.astype(jnp.bfloat16).astype(f32)
            # post-read prefetch: tile t+2 reuses this slot — start only
            # after the dot above has consumed it (PERF.md #35)
            @pl.when(t + 2 < n_v)
            def _():
                emb_dma(t + 2, slot).start()

            row = t * tv + lax.broadcasted_iota(jnp.int32, (b, tv), 1)
            s = jnp.where(row < head_v, s, -jnp.inf)  # vocab-pad rows
            lm = jnp.max(s, axis=1, keepdims=True)
            li = jnp.min(jnp.where(s == lm, row, int_max), axis=1, keepdims=True)
            upd = lm > bv  # strict: earlier tiles win ties
            return jnp.where(upd, lm, bv), jnp.where(upd, li, bi)

        bv0 = jnp.full((b, 1), -jnp.inf, f32)
        bi0 = jnp.zeros((b, 1), jnp.int32)
        _, bi = lax.fori_loop(0, n_v, tile_step, (bv0, bi0))
        tok_out[...] = jnp.broadcast_to(bi, (b, 128))

    if with_head:
        pl.when(l < n_layers)(layer_body)
        pl.when(l == n_layers)(head_body)
    else:
        layer_body()


def _is_int8(leaf: dict) -> bool:
    return isinstance(leaf.get("w"), dict) and "w_q" in leaf["w"]


def _w(leaf: dict):
    """Raw weight array of a param leaf (int8-quantized leaves hold w_q)."""
    w = leaf["w"]
    return w["w_q"] if isinstance(w, dict) else w


def _w_scale(leaf: dict):
    """(L, out) per-output-channel scale of an int8 leaf."""
    s = leaf["w"]["w_s"]  # (L, 1, out) from quantize_tree_int8's keepdims
    return s.reshape(s.shape[0], s.shape[-1]).astype(jnp.float32)


def _zeros_bias(p: dict, key: str, n: int):
    if "b" in p[key]:
        return p[key]["b"]
    shape = _w(p[key]).shape[:1] + (n,)
    return jnp.zeros(shape, jnp.float32)


def pack_decode_weights(layers_p: dict, dtype=jnp.bfloat16, gated: bool = False,
                        cross: bool = False, norm: str = "ln") -> dict:
    """Stacked layer params -> the kernel's packed pytree.

    ``layers_p`` is a layer-stacked param tree (leaves have a leading
    ``n_layers`` axis). GPT-2-style trees use ``sa.{q,k,v,o}``,
    ``mlp.{fc1,fc2}``, ``sa_norm``/``mlp_norm`` (``transformer.layer_init``);
    with ``cross=True``, ``ca``/``ca_norm`` are packed too (Whisper); T5
    passes ``gated=True`` with its ``mlp.{w,v,wo}`` GEGLU tree and
    ``norm="rms"`` (scale-only norms get zero bias rows). Missing projection
    biases (Whisper's k) pack as zeros. Weights are cast to ``dtype``; biases
    and norm params stay fp32.
    """
    sa, mlp = layers_p["sa"], layers_p["mlp"]
    f32 = jnp.float32
    int8 = _is_int8(sa["q"])
    hd = _w(sa["q"]).shape[-1]
    d = _w(sa["q"]).shape[-2]

    def norm_p(name):
        np_ = layers_p[name]
        scale = np_["scale"].astype(f32)
        bias = np_["bias"].astype(f32) if "bias" in np_ else jnp.zeros_like(scale)
        return scale, bias

    ln1_s, ln1_b = norm_p("sa_norm")
    ln2_s, ln2_b = norm_p("mlp_norm")
    wdt = jnp.int8 if int8 else dtype
    if gated:
        w1 = jnp.concatenate([_w(mlp["w"]), _w(mlp["v"])], axis=-1).astype(wdt)
        dff = _w(mlp["w"]).shape[-1]
        b1 = jnp.zeros((w1.shape[0], dff), f32)
        w2 = _w(mlp["wo"]).astype(wdt)
        b2 = jnp.zeros((w2.shape[0], d), f32)
    else:
        w1 = _w(mlp["fc1"]).astype(wdt)
        b1 = _zeros_bias(mlp, "fc1", w1.shape[-1]).astype(f32)
        w2 = _w(mlp["fc2"]).astype(wdt)
        b2 = _zeros_bias(mlp, "fc2", d).astype(f32)
    out = {
        "wqkv": jnp.concatenate([_w(sa["q"]), _w(sa["k"]), _w(sa["v"])], axis=-1).astype(wdt),
        "bqkv": jnp.concatenate([_zeros_bias(sa, "q", hd), _zeros_bias(sa, "k", hd),
                                 _zeros_bias(sa, "v", hd)], axis=-1).astype(f32),
        "wo": _w(sa["o"]).astype(wdt),
        "bo": _zeros_bias(sa, "o", d).astype(f32),
        "w1": w1, "b1": b1, "w2": w2, "b2": b2,
        "ln1_s": ln1_s, "ln1_b": ln1_b, "ln2_s": ln2_s, "ln2_b": ln2_b,
    }
    if int8:  # per-output-channel dequant scales, applied post-accumulation
        out["s_qkv"] = jnp.concatenate(
            [_w_scale(sa["q"]), _w_scale(sa["k"]), _w_scale(sa["v"])], axis=-1)
        out["s_o"] = _w_scale(sa["o"])
        out["s_1"] = (jnp.concatenate([_w_scale(mlp["w"]), _w_scale(mlp["v"])], axis=-1)
                      if gated else _w_scale(mlp["fc1"]))
        out["s_2"] = _w_scale(mlp["wo"] if gated else mlp["fc2"])
    if cross:
        ca = layers_p["ca"]
        lnc_s, lnc_b = norm_p("ca_norm")
        out.update({
            "wqc": _w(ca["q"]).astype(wdt),
            "bqc": _zeros_bias(ca, "q", hd).astype(f32),
            "woc": _w(ca["o"]).astype(wdt),
            "boc": _zeros_bias(ca, "o", d).astype(f32),
            "lnc_s": lnc_s, "lnc_b": lnc_b,
        })
        if int8:
            out["s_qc"] = _w_scale(ca["q"])
            out["s_oc"] = _w_scale(ca["o"])
    return out


def fused_step_eligible(layers_p: dict, cfg, cache_len: int,
                        cross: bool = False, gated: bool = False) -> bool:
    """Static gate: pre-norm decoder layers with shapes the kernel's tiling
    and DMA alignment rules can serve."""
    if not cfg.pre_norm or cfg.tp_axis is not None:
        return False
    # cross-attention presence is judged by the PARAM structure ("ca" below),
    # not cfg.cross_attn — T5's LayerConfig leaves it unset (its block applies
    # cross-attention itself, models/text/t5.py:t5_block_apply)
    if cfg.act not in ACT_FNS:
        return False
    sa = layers_p.get("sa", {})
    mlp = layers_p.get("mlp", {})
    def ok_w(leaf):
        w = leaf.get("w") if isinstance(leaf, dict) else None
        if isinstance(w, dict):  # weight-only int8: streamed as int8 tiles
            return isinstance(w.get("w_q"), jnp.ndarray) and "w_s" in w
        return isinstance(w, jnp.ndarray)

    # all projections must share the quantization state (one kernel dtype)
    int8s = set()
    keys = ("q", "k", "v", "o")
    for k in keys:
        if not ok_w(sa.get(k, {})):
            return False
        int8s.add(_is_int8(sa[k]))
        if cross:
            if not ok_w(layers_p.get("ca", {}).get(k, {})):
                return False
            int8s.add(_is_int8(layers_p["ca"][k]))
    mlp_keys = ("w", "v", "wo") if gated else ("fc1", "fc2")
    for k in mlp_keys:
        if not ok_w(mlp.get(k, {})):
            return False
        int8s.add(_is_int8(mlp[k]))
    if len(int8s) != 1:
        return False
    d = _w(sa["q"]).shape[1]
    hd = _w(sa["q"]).shape[2]
    dff = _w(mlp["w"] if gated else mlp["fc1"]).shape[2]
    if d % 128 or hd % 128 or dff % 128:
        return False
    if cache_len % KV_BLOCK:
        return False
    return True


def head_tile_rows(d: int, dtype) -> int:
    """Embedding-tile row count for the fused greedy head phase; the head
    table must be row-padded to a multiple of this (see pack_greedy_head).
    int8 tiles align to 32 rows (T(32,128) tiling)."""
    itemsize = jnp.dtype(dtype).itemsize
    align = 32 if itemsize == 1 else 8
    return min(1024, max(align, (TILE_BYTES // (d * itemsize)) // align * align))


def pack_greedy_head(w, norm_p: dict, dtype=jnp.bfloat16, tied: bool = True,
                     a8: bool = False):
    """Head weights + final-norm params for the in-kernel greedy head phase.

    ``w``: (V, d) tied embedding or (d, V) classifier (``tied=False``).
    Returns ``(head_dict, v)`` — pass as ``head=head_dict, head_v=v``.

    ``a8`` (w8a8 serving): the head table streams as per-vocab-row symmetric
    int8 (halving the largest single stream of a decode step — GPT-2's head
    is 77 MB bf16) and the head phase runs int8 x int8 -> int32 MXU dots on
    a per-row-quantized hidden state; the per-vocab-row dequant scales ride
    whole in VMEM as ``emb_s`` (n_tiles, tile_rows). Changes winners only
    within int8 rounding (the hidden state's per-row scale is
    argmax-invariant and is never applied).
    """
    if isinstance(w, dict):  # int8-quantized head: dequantize first (per-
        # output-channel scales don't match the head's per-vocab-row axis;
        # the a8 path re-quantizes per row below, the bf16 path must keep
        # matching the XLA bf16-logits winner)
        w = w["w_q"].astype(jnp.float32) * w["w_s"].astype(jnp.float32)
    emb = w if tied else w.T
    v, d = emb.shape
    tv = head_tile_rows(d, jnp.int8 if a8 else dtype)
    pad = -v % tv
    if a8:
        w32 = emb.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)
        r_scale = jnp.where(absmax == 0.0, 1.0, absmax) * (1.0 / 127.0)
        emb = jnp.clip(jnp.round(w32 / r_scale), -127, 127).astype(jnp.int8)
        emb_s = r_scale[:, 0]
        if pad:  # pad rows: zero weights, unit scale (masked by head_v anyway)
            emb = jnp.pad(emb, ((0, pad), (0, 0)))
            emb_s = jnp.pad(emb_s, ((0, pad),), constant_values=1.0)
    else:
        emb = emb.astype(dtype)
        if pad:
            emb = jnp.pad(emb, ((0, pad), (0, 0)))
    scale = norm_p["scale"].astype(jnp.float32)[None]
    bias = (norm_p["bias"].astype(jnp.float32) if "bias" in norm_p
            else jnp.zeros_like(norm_p["scale"], jnp.float32))[None]
    out = {"emb": emb, "fn_s": scale, "fn_b": bias}
    if a8:
        out["emb_s"] = emb_s.reshape(-1, tv)
    return out, v


def pack_embed_tables(token_embs, pos_embs=None, dtype=jnp.bfloat16) -> dict:
    """Embedding tables for the in-kernel embed phase (``emb=`` kwarg of the
    fused steps): rows padded to the 8-sublane DMA alignment, cast to the
    serving dtype. Cheap enough to build inside a decode-loop body (XLA's
    while-loop LICM hoists the loop-invariant pad/cast, like ops/gather.py's
    table pad)."""
    def prep(t):
        t = t.astype(dtype)
        if t.shape[0] % 8:
            t = jnp.pad(t, ((0, -t.shape[0] % 8), (0, 0)))
        return t

    out = {"tok": prep(token_embs)}
    if pos_embs is not None:
        out["pos"] = prep(pos_embs)
    return out


def _call_fused(x, packed, k_caches, v_caches, pos, pad_lens, n_heads, act, eps,
                norm, gated, sbias, cross_k, cross_v, cross_lens,
                head=None, head_v=None, a8=False, emb=None, tok_ids=None,
                pos_rows=None, kv_scales=None, kv_scales_x=None):
    embed = emb is not None
    embed_pos = embed and "pos" in emb
    if embed:  # in-kernel embed phase replaces the x operand
        assert x is None and tok_ids is not None
        # the id clamp below assumes row-padded tables: an 8-row window from
        # an unpadded table's last rows would DMA out of bounds
        assert emb["tok"].shape[0] % 8 == 0, "pad tables via pack_embed_tables"
        assert not embed_pos or emb["pos"].shape[0] % 8 == 0, \
            "pad tables via pack_embed_tables"
        b, d = tok_ids.shape[0], emb["tok"].shape[-1]
        xdt = emb["tok"].dtype
    else:
        b, d = x.shape
        xdt = x.dtype
    n_layers, _, l_max, hd = k_caches.shape
    cross = cross_k is not None
    with_head = head_v is not None
    assert not a8 or packed["wqkv"].dtype == jnp.int8, "a8 needs int8-packed weights"
    if gated:
        dff = packed["w2"].shape[-2]
    else:
        dff = packed["w1"].shape[-1]
    head_dim = hd // n_heads
    wt_dtype = packed["wqkv"].dtype
    wt_int8 = wt_dtype == jnp.int8
    itemsize = jnp.dtype(wt_dtype).itemsize
    assert l_max % KV_BLOCK == 0
    kv_item = jnp.dtype(k_caches.dtype).itemsize
    kv_int8 = kv_scales is not None
    kvx_int8 = kv_scales_x is not None
    if kv_int8 or kvx_int8:
        # int8 KV (ops/int8_kv.py design): 128-key blocks keep the
        # scale-plane DMA lane offsets aligned; groups of <= 8 rows bound
        # the block-diagonal q-expander's MXU waste
        assert b <= 8 or b % 8 == 0, f"batch {b}: int8 KV needs b <= 8 or b % 8 == 0"
        kv_g = b if b <= 8 else 8
        b8 = max(8, -(-b // 8) * 8)
    else:
        kv_g = b8 = 0
    if kv_int8:
        assert k_caches.dtype == jnp.int8 and v_caches.dtype == jnp.int8
        # sbias IS supported: the caller must pass the GROUP-TILED key-major
        # table (models/text/t5.py _t5_key_major_bias(group=kv_g)) — the
        # grouped kernel reads its first g*H lanes directly
        assert l_max % 128 == 0
        assert kv_scales["ks"].shape == (n_layers, b8, l_max), kv_scales["ks"].shape
        bkv = 128
    else:
        bkv = _pick_kv_block(l_max, b, hd, kv_item)
    if kvx_int8:
        assert cross and cross_k.dtype == jnp.int8 and cross_v.dtype == jnp.int8
        assert cross_k.shape[-2] % 128 == 0
        assert kv_scales_x["ks"].shape == (n_layers, b8, cross_k.shape[-2]), \
            kv_scales_x["ks"].shape
        bkv_x = 128
    else:
        bkv_x = _pick_kv_block(cross_k.shape[-2], b, hd,
                               jnp.dtype(cross_k.dtype).itemsize) if cross else KV_BLOCK

    rows = {
        "qkv": _pick_rows(d, 3 * hd, itemsize),
        "o": _pick_rows(hd, d, itemsize),
        "w1": _pick_rows(d, 2 * dff if gated else dff, itemsize),
        "w2": _pick_rows(dff, d, itemsize),
    }
    if cross:
        rows["qc"] = _pick_rows(d, hd, itemsize)
        rows["oc"] = _pick_rows(hd, d, itemsize)
        assert cross_k.shape[-2] % KV_BLOCK == 0
    prec = lax.Precision.HIGHEST if xdt == jnp.float32 else lax.Precision.DEFAULT
    # small-batch eager warmup (see _kernel): issue every phase's first tiles
    # at layer entry. Gated to b <= 4 — at large batch the KV streams dominate
    # and must stay ahead of the MLP weights in the DMA queues. Env override
    # DECODE_EAGER=0/1 for A/B sweeps.
    _eager_env = __import__("os").environ.get("DECODE_EAGER")
    eager = (b <= 4) if _eager_env is None else _eager_env == "1"

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    pad_arr = (jnp.zeros((b,), jnp.int32) if pad_lens is None
               else jnp.broadcast_to(jnp.asarray(pad_lens, jnp.int32).reshape(-1), (b,)))
    xlen_arr = (jnp.broadcast_to(jnp.asarray(cross_lens, jnp.int32).reshape(-1), (b,))
                if cross else None)
    # pre-reduced range bounds (cheap XLA; b-unrolled scalar chains in the
    # kernel cost Mosaic compile time): [min pad, max cross len]
    lims = jnp.stack([jnp.min(pad_arr),
                      jnp.max(xlen_arr) if cross else jnp.int32(0)]).astype(jnp.int32)
    scalars = [pos_arr, lims]
    if embed:
        # ids clamp to the row-padded tables (DMA safety: an out-of-range id
        # must not issue an out-of-bounds window copy; decode ids are always
        # in range, so the clamp never changes a real lookup)
        tok_c = jnp.clip(jnp.asarray(tok_ids, jnp.int32).reshape(-1),
                         0, emb["tok"].shape[0] - 1)
        if embed_pos:
            pos_c = jnp.clip(
                jnp.broadcast_to(jnp.asarray(pos_rows, jnp.int32).reshape(-1), (b,)),
                0, emb["pos"].shape[0] - 1)
        else:
            pos_c = jnp.zeros((b,), jnp.int32)
        scalars.append(jnp.stack([tok_c, pos_c]))

    whole = lambda i, *refs: (0, 0)
    # clamp: the head grid step (i == n_layers) revisits the last layer's
    # blocks without reading them
    perl3 = lambda i, *refs: (jnp.minimum(i, n_layers - 1), 0, 0)
    small3 = lambda n: pl.BlockSpec((1, 1, n), perl3)
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)

    in_specs = [] if embed else [pl.BlockSpec((b, d), whole)]
    in_specs += [pl.BlockSpec((b, 1), whole)]  # per-row pad column
    if cross:
        in_specs += [pl.BlockSpec((b, 1), whole)]  # per-row cross-len column
    in_specs += [small3(d), small3(d), small3(3 * hd), small3(d),
                 small3(d), small3(d), small3(dff), small3(d)]  # b1 is dff-wide even for GEGLU (act half only)
    small_keys = ["ln1_s", "ln1_b", "bqkv", "bo", "ln2_s", "ln2_b", "b1", "b2"]
    if cross:
        in_specs += [small3(d), small3(d), small3(hd), small3(d)]
        small_keys += ["lnc_s", "lnc_b", "bqc", "boc"]
    if wt_int8:
        in_specs += [small3(3 * hd), small3(d),
                     small3(2 * dff if gated else dff), small3(d)]
        small_keys += ["s_qkv", "s_o", "s_1", "s_2"]
        if cross:
            in_specs += [small3(hd), small3(d)]
            small_keys += ["s_qc", "s_oc"]
    operands = [] if embed else [x]
    operands += [pad_arr[:, None]]
    if cross:
        operands += [xlen_arr[:, None]]
    operands += [packed[k][:, None, :] for k in small_keys]
    if sbias is not None:
        in_specs.append(pl.BlockSpec((sbias.shape[0], sbias.shape[1]), whole))
        operands.append(sbias)
    head_a8 = with_head and "emb_s" in head
    if with_head:
        rows["emb"] = head_tile_rows(d, head["emb"].dtype)
        assert head["emb"].shape[0] % rows["emb"] == 0, "pad head via pack_greedy_head"
        in_specs += [pl.BlockSpec((1, d), whole), pl.BlockSpec((1, d), whole)]
        operands += [head["fn_s"], head["fn_b"]]
        if head_a8:  # per-vocab-row dequant scales, whole in VMEM (~V*4 bytes)
            assert head["emb"].dtype == jnp.int8 and head["emb_s"].shape[1] == rows["emb"]
            in_specs += [pl.BlockSpec(head["emb_s"].shape, whole)]
            operands += [head["emb_s"]]
    in_specs += [any_spec] * 4
    operands += [packed["wqkv"], packed["wo"], packed["w1"], packed["w2"]]
    if cross:
        in_specs += [any_spec] * 2
        operands += [packed["wqc"], packed["woc"]]
    in_specs += [any_spec] * 2
    operands += [k_caches, v_caches]
    if kv_int8:
        in_specs += [any_spec] * 2
        operands += [kv_scales["ks"], kv_scales["vs"]]
    if cross:
        in_specs += [any_spec] * 2
        operands += [cross_k, cross_v]
        if kvx_int8:
            in_specs += [any_spec] * 2
            operands += [kv_scales_x["ks"], kv_scales_x["vs"]]
    if with_head:
        in_specs += [any_spec]
        operands += [head["emb"]]
    if embed:
        in_specs += [any_spec] * (2 if embed_pos else 1)
        operands += [emb["tok"]] + ([emb["pos"]] if embed_pos else [])

    scratch = [
        pltpu.VMEM((b, d), xdt),
        pltpu.VMEM((2, rows["qkv"], 3 * hd), wt_dtype),
        pltpu.VMEM((2, rows["o"], d), wt_dtype),
        pltpu.VMEM((2, rows["w1"], 2 * dff if gated else dff), wt_dtype),
        pltpu.VMEM((2, rows["w2"], d), wt_dtype),
    ]
    if cross:
        scratch += [pltpu.VMEM((2, rows["qc"], hd), wt_dtype),
                    pltpu.VMEM((2, rows["oc"], d), wt_dtype)]
    scratch += [pltpu.VMEM((2, b, bkv, hd), k_caches.dtype),
                pltpu.VMEM((2, b, bkv, hd), v_caches.dtype)]
    if kv_int8:
        scratch += [pltpu.VMEM((2, b8, bkv), jnp.float32),
                    pltpu.VMEM((2, b8, bkv), jnp.float32)]
    if cross:
        scratch += [pltpu.VMEM((2, b, bkv_x, hd), cross_k.dtype),
                    pltpu.VMEM((2, b, bkv_x, hd), cross_v.dtype)]
        if kvx_int8:
            scratch += [pltpu.VMEM((2, b8, bkv_x), jnp.float32),
                        pltpu.VMEM((2, b8, bkv_x), jnp.float32)]
    if with_head:
        scratch += [pltpu.VMEM((2, rows["emb"], d), head["emb"].dtype)]
    if embed:
        scratch += [pltpu.VMEM(((2 if embed_pos else 1) * b, 8, d), xdt)]
    scratch += [pltpu.SemaphoreType.DMA((2,))] * (6 if cross else 4)
    scratch += [pltpu.SemaphoreType.DMA((2, 2))]
    if kv_int8:
        scratch += [pltpu.SemaphoreType.DMA((2, 2))]
    if cross:
        scratch += [pltpu.SemaphoreType.DMA((2, 2))]
        if kvx_int8:
            scratch += [pltpu.SemaphoreType.DMA((2, 2))]
    if with_head:
        scratch += [pltpu.SemaphoreType.DMA((2,))]
    if embed:
        scratch += [pltpu.SemaphoreType.DMA(((2 if embed_pos else 1) * b,))]

    out_specs = [
        pl.BlockSpec((b, d), whole),
        pl.BlockSpec((1, b, hd), perl3),
        pl.BlockSpec((1, b, hd), perl3),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, d), xdt),
        jax.ShapeDtypeStruct((n_layers, b, hd), xdt),
        jax.ShapeDtypeStruct((n_layers, b, hd), xdt),
    ]
    if with_head:
        out_specs.append(pl.BlockSpec((b, 128), whole))
        out_shape.append(jax.ShapeDtypeStruct((b, 128), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(n_layers + 1,) if with_head else (n_layers,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel, n_layers=n_layers, n_heads=n_heads, d=d, hd=hd, dff=dff,
        rows=rows, bkv=bkv, bkv_x=bkv_x, act=act, eps=eps,
        scale=1.0 / (head_dim ** 0.5), prec=prec, cross=cross,
        norm_kind=norm, gated=gated, has_sbias=sbias is not None, b=b,
        head_v=head_v, wt_int8=wt_int8, a8=a8, eager=eager, embed=embed,
        embed_pos=embed_pos, head_a8=head_a8, kv_int8=kv_int8,
        kvx_int8=kvx_int8, kv_g=kv_g, b8=b8)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),  # grid is 1-D (layers [+ head])
        ),
    )(*scalars, *operands)
    if with_head:
        x_out, k_new, v_new, tok = out
        return x_out, k_new, v_new, tok[:, 0]
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("n_heads", "act", "eps", "head_v", "a8"))
def fused_decode_step(x, packed, k_caches, v_caches, pos, pad_lens,
                      n_heads: int, act: str = "gelu", eps: float = 1e-5,
                      head=None, head_v: int | None = None, a8: bool = False,
                      emb=None, tok_ids=None, pos_rows=None, kv_scales=None):
    """One full decode step over a self-attention-only layer stack (GPT-2).

    ``x``: (B, d) hidden states (embeddings already applied);
    ``packed``: :func:`pack_decode_weights` output;
    ``k_caches``/``v_caches``: (L, B, Lmax, H*D) merged-head caches holding
    positions ``[0, pos)`` (the current position is NOT expected in the
    cache); ``pos``: scalar int32; ``pad_lens``: (B,) left-pad lengths.

    Returns ``(x_out (B, d), k_new (L, B, H*D), v_new (L, B, H*D))`` — the
    caller writes k_new/v_new into the caches at ``pos`` (one
    dynamic_update_slice per cache for ALL layers). With
    ``head``/``head_v`` (:func:`pack_greedy_head`), an extra grid step runs
    final-norm + the streamed greedy argmax and a fourth output ``tok (B,)``
    int32 is returned — the (B, V) logits never leave the chip.

    ``a8=True`` (requires int8-packed weights): w8a8 serving mode — per-row
    dynamic activation quantization + int8 MXU dots in every weight-stream
    phase (see ``stream``). Changes numerics (~8-bit per-phase rounding);
    attention, norms, the residual stream, and the greedy head stay
    bf16/fp32.
    With ``emb`` (:func:`pack_embed_tables`) + ``tok_ids`` (B,) [+
    ``pos_rows`` (B,) when the pack has a position table], the embedding
    lookup itself moves INTO the kernel (layer-0 entry DMAs the 8-row-aligned
    table windows and mask-selects in VMEM) and ``x`` must be None — two
    fewer kernel launches per decode step (the B=1 glue lever, PERF.md #28).
    """
    return _call_fused(x, packed, k_caches, v_caches, pos, pad_lens, n_heads,
                       act, eps, "ln", False, None, None, None, None,
                       head=head, head_v=head_v, a8=a8, emb=emb,
                       tok_ids=tok_ids, pos_rows=pos_rows, kv_scales=kv_scales)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "act", "eps", "norm", "gated", "head_v", "a8"))
def fused_cross_decode_step(x, packed, k_caches, v_caches, cross_k, cross_v,
                            cross_lens, pos, pad_lens, n_heads: int,
                            act: str = "gelu", eps: float = 1e-5,
                            norm: str = "ln", gated: bool = False, sbias=None,
                            head=None, head_v: int | None = None,
                            a8: bool = False, emb=None, tok_ids=None,
                            pos_rows=None, kv_scales=None, kv_scales_x=None):
    """Decode step for cross-attention decoders (Whisper ``norm="ln"``;
    T5 ``norm="rms", gated=True`` with ``sbias`` the key-major rel-pos
    decode-bias table ``(Lmax, 128)`` fp32, shared across layers/batch).

    ``cross_k``/``cross_v``: (L, B, Lx, H*D) precomputed encoder caches;
    ``cross_lens``: (B,) per-row valid memory lengths. ``head``/``head_v``,
    ``a8`` (w8a8 serving mode) and ``emb``/``tok_ids``/``pos_rows`` (in-kernel
    embed phase) as in :func:`fused_decode_step`.
    """
    return _call_fused(x, packed, k_caches, v_caches, pos, pad_lens, n_heads,
                       act, eps, norm, gated, sbias, cross_k, cross_v, cross_lens,
                       head=head, head_v=head_v, a8=a8, emb=emb,
                       tok_ids=tok_ids, pos_rows=pos_rows, kv_scales=kv_scales,
                       kv_scales_x=kv_scales_x)

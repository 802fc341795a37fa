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
  ``(1, ·)`` VMEM blocks; the residual stream lives in a VMEM scratch carried
  across the sequential grid steps, so the whole 12-layer stack runs with ONE
  kernel launch per token instead of ~150 XLA ops.
- Attention is inlined between the QKV and out-proj phases with the same
  merged-head online-softmax streaming as ops/decode_attention.py (batched
  ``(B·bk, ·)`` dots), reading only the valid prefix ``[pad_b, pos)`` plus
  the current position's K/V directly from VMEM (the cache write itself
  happens outside — one ``dynamic_update_slice`` of the returned per-layer
  K/V against the layer-stacked cache).

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

from .layers import ACT_FNS

NEG_INF = -1e30
KV_BLOCK = 32  # keys streamed per cache block (multiple of 8)
TILE_BYTES = 2 * 1024 * 1024  # target weight-tile size per ring slot


def _pick_rows(n_rows: int, n_cols: int, itemsize: int) -> int:
    """Largest row count (multiple of 8, dividing n_rows) with tile bytes <=
    TILE_BYTES; falls back to the smallest valid divisor."""
    best = None
    for rows in range(8, n_rows + 1, 8):
        if n_rows % rows:
            continue
        if best is None:
            best = rows
        if rows * n_cols * itemsize <= TILE_BYTES:
            best = rows
        else:
            break
    return best


def _ln(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _kernel(pos_ref, pad_ref,
            x_in, ln1_s, ln1_b, bqkv_r, bo_r, ln2_s, ln2_b, b1_r, b2_r,
            wqkv_hbm, wo_hbm, w1_hbm, w2_hbm, kc_hbm, vc_hbm,
            x_out, knew_ref, vnew_ref,
            x_scr, qkv_scr, wo_scr, w1_scr, w2_scr, k_scr, v_scr,
            qkv_sem, wo_sem, w1_sem, w2_sem, kv_sem,
            *, n_layers: int, n_heads: int, d: int, hd: int, dff: int,
            rows_qkv: int, rows_o: int, rows_1: int, rows_2: int,
            bkv: int, act: str, eps: float, scale: float, prec):
    l = pl.program_id(0)
    b = x_in.shape[0]
    head_dim = hd // n_heads
    cdt = x_in.dtype
    f32 = jnp.float32

    n_qkv, n_o, n_1, n_2 = d // rows_qkv, hd // rows_o, d // rows_1, dff // rows_2

    def wdma(hbm, scr, sem, layer, t, rows, slot):
        return pltpu.make_async_copy(
            hbm.at[layer, pl.ds(t * rows, rows), :], scr.at[slot], sem.at[slot])

    def kv_dma(i, slot):
        return [
            pltpu.make_async_copy(kc_hbm.at[l, :, pl.ds(i * bkv, bkv), :],
                                  k_scr.at[slot], kv_sem.at[slot, 0]),
            pltpu.make_async_copy(vc_hbm.at[l, :, pl.ds(i * bkv, bkv), :],
                                  v_scr.at[slot], kv_sem.at[slot, 1]),
        ]

    pos = pos_ref[0]
    pad_min = pad_ref[0]
    for r in range(1, b):
        pad_min = jnp.minimum(pad_min, pad_ref[r])
    first_kv = pad_min // bkv
    n_kv = (pos + bkv - 1) // bkv  # cache keys [0, pos); current pos is in VMEM

    # ---- warmups: layer 0's first QKV tiles (later layers get theirs from
    # the previous layer's MLP phase), this layer's first KV cache blocks
    @pl.when(l == 0)
    def _():
        x_scr[...] = x_in[...]
        for t in range(min(2, n_qkv)):
            wdma(wqkv_hbm, qkv_scr, qkv_sem, 0, t, rows_qkv, t % 2).start()

    @pl.when(first_kv < n_kv)
    def _():
        for cp in kv_dma(first_kv, lax.rem(first_kv, 2)):
            cp.start()

    @pl.when(first_kv + 1 < n_kv)
    def _():
        for cp in kv_dma(first_kv + 1, lax.rem(first_kv + 1, 2)):
            cp.start()

    xv = x_scr[...]  # (B, d) residual stream
    h1 = _ln(xv, ln1_s[0], ln1_b[0], eps)

    # ---- phase 1: QKV = h1 @ Wqkv (d, 3hd), row-tiled contraction ----------
    qkv_acc = jnp.zeros((b, 3 * hd), f32)
    for t in range(n_qkv):
        wdma(wqkv_hbm, qkv_scr, qkv_sem, l, t, rows_qkv, t % 2).wait()
        if t + 2 < n_qkv:
            wdma(wqkv_hbm, qkv_scr, qkv_sem, l, t + 2, rows_qkv, t % 2).start()
        if t == max(0, n_qkv - 2):  # own starts done -> queue out-proj warmup
            for to in range(min(2, n_o)):
                wdma(wo_hbm, wo_scr, wo_sem, l, to, rows_o, to % 2).start()
        qkv_acc = qkv_acc + lax.dot_general(
            h1[:, t * rows_qkv:(t + 1) * rows_qkv], qkv_scr[t % 2],
            (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    qkv = (qkv_acc + bqkv_r[0].astype(f32)).astype(cdt)  # (B, 3hd)
    q = qkv[:, :hd]
    k_new = qkv[:, hd:2 * hd]
    v_new = qkv[:, 2 * hd:]
    knew_ref[0] = k_new
    vnew_ref[0] = v_new

    # ---- phase 2: attention over cache [pad_b, pos) + current K/V ----------
    col_head = lax.broadcasted_iota(jnp.int32, (hd, n_heads), 0) // head_dim
    head_id = lax.broadcasted_iota(jnp.int32, (hd, n_heads), 1)
    e_mat = (col_head == head_id).astype(cdt)
    e_mat32 = e_mat.astype(f32)
    q_s = (q.astype(f32) * scale).astype(cdt)

    ends_v = pos * jnp.ones((b, 1, 1), jnp.int32)
    pad_v = jnp.concatenate(
        [jnp.full((1, 1, 1), pad_ref[r], jnp.int32) for r in range(b)], 0)

    def kv_step(i, carry):
        ms, ls, accs = carry
        slot = lax.rem(i, 2)

        @pl.when(i + 2 < n_kv)
        def _():
            for cp in kv_dma(i + 2, lax.rem(i + 2, 2)):
                cp.start()

        for cp in kv_dma(i, slot):
            cp.wait()

        kq = (k_scr[slot].astype(cdt) * q_s[:, None, :]).reshape(b * bkv, hd)
        s = lax.dot_general(kq, e_mat, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec
                            ).reshape(b, bkv, n_heads)
        k_idx = i * bkv + lax.broadcasted_iota(jnp.int32, (1, bkv, 1), 1)
        valid = jnp.logical_and(k_idx < ends_v, k_idx >= pad_v)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(ms, jnp.max(s, axis=1))
        m_safe = jnp.maximum(m_new, jnp.float32(NEG_INF / 2))
        p = jnp.exp(s - m_safe[:, None, :])
        alpha = jnp.exp(ms - m_safe)
        l_new = alpha * ls + jnp.sum(p, axis=1)
        p_full = lax.dot_general(p.astype(cdt).reshape(b * bkv, n_heads), e_mat,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32, precision=prec
                                 ).reshape(b, bkv, hd)
        alpha_full = lax.dot_general(alpha, e_mat32, (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32, precision=prec)
        pv = jnp.sum(p_full * v_scr[slot].astype(f32), axis=1)
        return m_new, l_new, accs * alpha_full + pv

    init = (jnp.full((b, n_heads), NEG_INF, f32),
            jnp.zeros((b, n_heads), f32),
            jnp.zeros((b, hd), f32))
    ms, ls, accs = lax.fori_loop(first_kv, n_kv, kv_step, init)

    # fold the current position (always valid, K/V straight from VMEM)
    s_cur = lax.dot_general((k_new * q_s), e_mat, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)  # (B, H)
    m_new = jnp.maximum(ms, s_cur)
    p_cur = jnp.exp(s_cur - m_new)
    alpha = jnp.exp(ms - m_new)
    ls = alpha * ls + p_cur
    alpha_full = lax.dot_general(alpha, e_mat32, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32, precision=prec)
    p_cur_full = lax.dot_general(p_cur, e_mat32, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32, precision=prec)
    accs = accs * alpha_full + p_cur_full * v_new.astype(f32)
    l_full = lax.dot_general(ls, e_mat32, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32, precision=prec)
    ctx = (accs / l_full).astype(cdt)  # (B, hd)

    # ---- phase 3: out-proj + residual ---------------------------------------
    o_acc = jnp.zeros((b, d), f32)
    for t in range(n_o):
        wdma(wo_hbm, wo_scr, wo_sem, l, t, rows_o, t % 2).wait()
        if t + 2 < n_o:
            wdma(wo_hbm, wo_scr, wo_sem, l, t + 2, rows_o, t % 2).start()
        if t == max(0, n_o - 2):
            for t1 in range(min(2, n_1)):
                wdma(w1_hbm, w1_scr, w1_sem, l, t1, rows_1, t1 % 2).start()
        o_acc = o_acc + lax.dot_general(
            ctx[:, t * rows_o:(t + 1) * rows_o], wo_scr[t % 2],
            (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    xv = xv + (o_acc + bo_r[0].astype(f32)).astype(cdt)

    # ---- phase 4: MLP fc1 + act ---------------------------------------------
    h2 = _ln(xv, ln2_s[0], ln2_b[0], eps)
    m_acc = jnp.zeros((b, dff), f32)
    for t in range(n_1):
        wdma(w1_hbm, w1_scr, w1_sem, l, t, rows_1, t % 2).wait()
        if t + 2 < n_1:
            wdma(w1_hbm, w1_scr, w1_sem, l, t + 2, rows_1, t % 2).start()
        if t == max(0, n_1 - 2):
            for t2 in range(min(2, n_2)):
                wdma(w2_hbm, w2_scr, w2_sem, l, t2, rows_2, t2 % 2).start()
        m_acc = m_acc + lax.dot_general(
            h2[:, t * rows_1:(t + 1) * rows_1], w1_scr[t % 2],
            (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    h3 = ACT_FNS[act]((m_acc + b1_r[0].astype(f32)).astype(cdt))  # (B, dff)

    # ---- phase 5: MLP fc2 + residual; queue next layer's QKV ----------------
    o2_acc = jnp.zeros((b, d), f32)
    for t in range(n_2):
        wdma(w2_hbm, w2_scr, w2_sem, l, t, rows_2, t % 2).wait()
        if t + 2 < n_2:
            wdma(w2_hbm, w2_scr, w2_sem, l, t + 2, rows_2, t % 2).start()
        if t == max(0, n_2 - 2):
            @pl.when(l + 1 < n_layers)
            def _():
                for tq in range(min(2, n_qkv)):
                    wdma(wqkv_hbm, qkv_scr, qkv_sem, l + 1, tq, rows_qkv, tq % 2).start()
        o2_acc = o2_acc + lax.dot_general(
            h3[:, t * rows_2:(t + 1) * rows_2], w2_scr[t % 2],
            (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
    xv = xv + (o2_acc + b2_r[0].astype(f32)).astype(cdt)

    x_scr[...] = xv
    x_out[...] = xv


def pack_decode_weights(layers_p: dict, dtype=jnp.bfloat16) -> dict:
    """Stacked layer params -> the kernel's packed pytree.

    ``layers_p`` is a layer-stacked param tree (leaves have a leading
    ``n_layers`` axis) with ``sa.{q,k,v,o}``, ``mlp.{fc1,fc2}``,
    ``sa_norm``/``mlp_norm`` — exactly what ``transformer.decoder_init``
    builds. Weights are cast to ``dtype`` (bf16 serving); biases and LN
    params stay fp32.
    """
    sa, mlp = layers_p["sa"], layers_p["mlp"]
    f32 = jnp.float32
    return {
        "wqkv": jnp.concatenate([sa["q"]["w"], sa["k"]["w"], sa["v"]["w"]], axis=-1).astype(dtype),
        "bqkv": jnp.concatenate([sa["q"]["b"], sa["k"]["b"], sa["v"]["b"]], axis=-1).astype(f32),
        "wo": sa["o"]["w"].astype(dtype),
        "bo": sa["o"]["b"].astype(f32),
        "w1": mlp["fc1"]["w"].astype(dtype),
        "b1": mlp["fc1"]["b"].astype(f32),
        "w2": mlp["fc2"]["w"].astype(dtype),
        "b2": mlp["fc2"]["b"].astype(f32),
        "ln1_s": layers_p["sa_norm"]["scale"].astype(f32),
        "ln1_b": layers_p["sa_norm"]["bias"].astype(f32),
        "ln2_s": layers_p["mlp_norm"]["scale"].astype(f32),
        "ln2_b": layers_p["mlp_norm"]["bias"].astype(f32),
    }


def fused_step_eligible(layers_p: dict, cfg, cache_len: int) -> bool:
    """Static gate: pre-norm biased self-attention decoder layers with shapes
    the kernel's tiling and DMA alignment rules can serve."""
    if not cfg.pre_norm or cfg.cross_attn or cfg.tp_axis is not None:
        return False
    if cfg.act not in ACT_FNS:
        return False
    sa = layers_p.get("sa", {})
    mlp = layers_p.get("mlp", {})
    for k in ("q", "k", "v", "o"):
        leaf = sa.get(k, {})
        if not isinstance(leaf.get("w"), jnp.ndarray) or "b" not in leaf:
            return False
    for k in ("fc1", "fc2"):
        leaf = mlp.get(k, {})
        if not isinstance(leaf.get("w"), jnp.ndarray) or "b" not in leaf:
            return False
    d = sa["q"]["w"].shape[1]
    hd = sa["q"]["w"].shape[2]
    dff = mlp["fc1"]["w"].shape[2]
    if d % 128 or hd % 128 or dff % 128:
        return False
    if cache_len % KV_BLOCK:
        return False
    return True


@functools.partial(jax.jit, static_argnames=("n_heads", "act", "eps"))
def fused_decode_step(x, packed, k_caches, v_caches, pos, pad_lens,
                      n_heads: int, act: str = "gelu", eps: float = 1e-5):
    """One full decode step over the layer stack.

    ``x``: (B, d) hidden states (embeddings already applied);
    ``packed``: :func:`pack_decode_weights` output;
    ``k_caches``/``v_caches``: (L, B, Lmax, H*D) merged-head caches holding
    positions ``[0, pos)`` (the current position is NOT expected in the
    cache); ``pos``: scalar int32; ``pad_lens``: (B,) left-pad lengths.

    Returns ``(x_out (B, d), k_new (L, B, H*D), v_new (L, B, H*D))`` — the
    caller writes k_new/v_new into the caches at ``pos`` (one
    dynamic_update_slice per cache for ALL layers).
    """
    b, d = x.shape
    n_layers, _, l_max, hd = k_caches.shape
    dff = packed["w1"].shape[-1]
    head_dim = hd // n_heads
    wt_dtype = packed["wqkv"].dtype
    itemsize = jnp.dtype(wt_dtype).itemsize
    assert l_max % KV_BLOCK == 0

    rows_qkv = _pick_rows(d, 3 * hd, itemsize)
    rows_o = _pick_rows(hd, d, itemsize)
    rows_1 = _pick_rows(d, dff, itemsize)
    rows_2 = _pick_rows(dff, d, itemsize)
    prec = lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    pad_arr = (jnp.zeros((b,), jnp.int32) if pad_lens is None
               else jnp.broadcast_to(jnp.asarray(pad_lens, jnp.int32).reshape(-1), (b,)))

    whole = lambda i, *refs: (0, 0)
    perl3 = lambda i, *refs: (i, 0, 0)
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_layers,),
        in_specs=[
            pl.BlockSpec((b, d), whole),            # x
            pl.BlockSpec((1, 1, d), perl3),         # ln1_s
            pl.BlockSpec((1, 1, d), perl3),         # ln1_b
            pl.BlockSpec((1, 1, 3 * hd), perl3),    # bqkv
            pl.BlockSpec((1, 1, d), perl3),         # bo
            pl.BlockSpec((1, 1, d), perl3),         # ln2_s
            pl.BlockSpec((1, 1, d), perl3),         # ln2_b
            pl.BlockSpec((1, 1, dff), perl3),       # b1
            pl.BlockSpec((1, 1, d), perl3),         # b2
            any_spec, any_spec, any_spec, any_spec,  # wqkv, wo, w1, w2
            any_spec, any_spec,                      # k_caches, v_caches
        ],
        out_specs=[
            pl.BlockSpec((b, d), whole),
            pl.BlockSpec((1, b, hd), lambda i, *refs: (i, 0, 0)),
            pl.BlockSpec((1, b, hd), lambda i, *refs: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), x.dtype),                      # x_scr
            pltpu.VMEM((2, rows_qkv, 3 * hd), wt_dtype),      # qkv ring
            pltpu.VMEM((2, rows_o, d), wt_dtype),             # wo ring
            pltpu.VMEM((2, rows_1, dff), wt_dtype),           # w1 ring
            pltpu.VMEM((2, rows_2, d), wt_dtype),             # w2 ring
            pltpu.VMEM((2, b, KV_BLOCK, hd), k_caches.dtype),  # k blocks
            pltpu.VMEM((2, b, KV_BLOCK, hd), v_caches.dtype),  # v blocks
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel, n_layers=n_layers, n_heads=n_heads, d=d, hd=hd, dff=dff,
        rows_qkv=rows_qkv, rows_o=rows_o, rows_1=rows_1, rows_2=rows_2,
        bkv=KV_BLOCK, act=act, eps=eps, scale=1.0 / (head_dim ** 0.5), prec=prec)
    pallas = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), x.dtype),
            jax.ShapeDtypeStruct((n_layers, b, hd), x.dtype),
            jax.ShapeDtypeStruct((n_layers, b, hd), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
    )
    small = {k: packed[k][:, None, :] for k in
             ("ln1_s", "ln1_b", "bqkv", "bo", "ln2_s", "ln2_b", "b1", "b2")}
    x_out, k_new, v_new = pallas(
        pos_arr, pad_arr, x,
        small["ln1_s"], small["ln1_b"], small["bqkv"], small["bo"],
        small["ln2_s"], small["ln2_b"], small["b1"], small["b2"],
        packed["wqkv"], packed["wo"], packed["w1"], packed["w2"],
        k_caches, v_caches)
    return x_out, k_new, v_new

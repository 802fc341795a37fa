"""Pallas TPU flash attention — blockwise streaming SDPA with online softmax.

The single hot kernel replacing ``F.scaled_dot_product_attention``
(reference transformer.py:52) for encoder-sized problems, parameterized by
(causal, additive-bias, cross) so one kernel serves every model family
(SURVEY.md §2.7 N1). Decode-with-KV-cache stays on the XLA path (S=1 matmuls
are bandwidth-bound; a fused kernel buys nothing there).

Layout: inputs are flattened to (BH, L, D); D is zero-padded to a lane
multiple (padding contributes 0 to q·k and 0 columns to p·v); L is padded to
block multiples and masked. Grid is (BH, q_blocks, k_blocks) — the TPU grid
is sequential in the minor dimension, so the online-softmax state (m, l, acc)
lives in VMEM scratch across the k_blocks sweep. All accumulation is fp32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_s, l_s, acc_s, *,
                  scale: float, causal: bool, lq: int, lk: int, bq: int, bk: int, bb: int):
    """One grid step processes ``bb`` batch·head slices (statically unrolled) —
    amortizes per-step scheduling/DMA overhead at short sequence lengths."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    # fp32 inputs get full-precision MXU passes (parity); bf16 is the fast path
    prec = jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    q_idx = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    k_idx = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = k_idx < lk
    if causal:
        mask = jnp.logical_and(mask, k_idx <= q_idx)

    def compute():
        for b in range(bb):
            # keep bf16 inputs bf16: the MXU does bf16 x bf16 -> fp32 natively
            # in one pass, while an fp32 x fp32 product costs ~3 passes on v5e.
            # fp32 inputs stay fp32 for the parity path (precision=HIGHEST).
            q = q_ref[b]  # (bq, Dp)
            k = k_ref[b]  # (bk, Dp)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32, precision=prec) * scale  # (bq, bk)
            if bias_ref is not None:
                s = s + bias_ref[b if bias_ref.shape[0] > 1 else 0].astype(jnp.float32)
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_s[b, :, :1]  # (bq, 1)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            m_safe = jnp.where(m_new <= NEG_INF, 0.0, m_new)

            p = jnp.exp(s - m_safe)  # masked entries: exp(NEG_INF - finite) == 0
            alpha = jnp.exp(jnp.where(m_prev <= NEG_INF, NEG_INF, m_prev) - m_safe)

            l_new = alpha * l_s[b, :, :1] + jnp.sum(p, axis=-1, keepdims=True)
            acc_s[b] = acc_s[b] * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            m_s[b] = jnp.broadcast_to(m_new, m_s.shape[1:])
            l_s[b] = jnp.broadcast_to(l_new, l_s.shape[1:])

    if causal:
        # skip k blocks entirely above the causal diagonal (~2x on prefill)
        @pl.when(ki * bk <= qi * bq + (bq - 1))
        def _():
            compute()
    else:
        compute()

    @pl.when(ki == nk - 1)
    def _():
        l = l_s[:, :, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[:] = (acc_s[:] / l).astype(o_ref.dtype)


def _attn_kernel_short(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                       scale: float, causal: bool, lk: int, bq: int, bb: int):
    """Single-k-block attention for short sequences (encoder shapes like
    ViT's 197): the whole K/V fits in one block, so a plain softmax replaces
    the online-softmax state machine — no scratch, no cross-step carries, one
    grid step per ``bb`` batch·head slices."""
    qi = pl.program_id(1)
    lkp = k_ref.shape[1]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, lkp), 1)
    mask = k_idx < lk
    if causal:
        q_idx = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, lkp), 0)
        mask = jnp.logical_and(mask, k_idx <= q_idx)

    prec = jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    for b in range(bb):
        s = jax.lax.dot_general(q_ref[b], k_ref[b], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=prec) * scale
        if bias_ref is not None:
            s = s + bias_ref[b if bias_ref.shape[0] > 1 else 0].astype(jnp.float32)
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - jnp.where(m <= NEG_INF, 0.0, m))
        l = jnp.sum(p, axis=-1, keepdims=True)
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padded) rows stay finite
        out = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[b], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32, precision=prec)
        o_ref[b] = (out / l).astype(o_ref.dtype)


def _attn_kernel_short_nobias(q_ref, k_ref, v_ref, o_ref, **kw):
    _attn_kernel_short(q_ref, k_ref, v_ref, None, o_ref, **kw)


def flash_eligible(q, k, v) -> bool:
    """Engage the kernel only where blockwise streaming wins: long sequences,
    where XLA would materialize large (Lq, Lk) score tensors in HBM. At short
    encoder lengths (ViT's 197, MaxViT's 49) XLA's fused attention is faster —
    measured on v5e: ViT-B/16 42% MFU (XLA) vs 29% (kernel, from pad waste)."""
    return (
        q.ndim >= 3
        and q.dtype in (jnp.float32, jnp.bfloat16)
        and q.shape[-2] >= 1024
        and k.shape[-2] >= 1024
        and q.shape[-1] <= 256
    )


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k"))
def flash_sdpa(q, k, v, attn_bias=None, causal: bool = False, block_q: int = 256, block_k: int = 512):
    """Drop-in SDPA over (..., H, Lq, D) / (..., H, Lk, D) with optional bias.

    ``attn_bias`` must broadcast to (..., H, Lq, Lk); it is materialized only
    per (1, bq, bk) block via index mapping, never as a full (BH, Lq, Lk)
    array when its batch/head dims are 1.
    """
    orig_dtype = q.dtype
    *batch, lq, d = q.shape
    lk = k.shape[-2]
    bh = math.prod(batch) if batch else 1
    scale = 1.0 / math.sqrt(d)

    bq = min(block_q, _pad_to(lq, LANE))
    bk = min(block_k, _pad_to(lk, LANE))
    lq_p, lk_p, d_p = _pad_to(lq, bq), _pad_to(lk, bk), _pad_to(d, LANE)

    # classify the bias's broadcast structure once (structural, not by product:
    # a (B,1,·,·) pad mask must not be mistaken for a per-head (H,·,·) table
    # when B happens to equal H)
    bias_lead = attn_bias.shape[:-2] if attn_bias is not None else None
    bias_shared = attn_bias is None or all(x == 1 for x in bias_lead)
    bias_full = attn_bias is not None and bias_lead == tuple(batch)
    bias_per_head = (
        attn_bias is not None
        and not bias_full
        and bool(batch)
        and len(bias_lead) <= len(batch)
        and bias_lead[-1:] == (batch[-1],)
        and all(x == 1 for x in bias_lead[:-1])
    )

    # batch several batch·head slices per grid step at short sequences
    bb = 1
    if bias_shared or bias_full or (attn_bias is not None and not bias_per_head):
        budget = max(1, (1 << 20) // (bq * d_p * 4))  # keep blocks+scratch within ~6MB VMEM
        for cand in (8, 4, 2):
            if bh % cand == 0 and cand <= budget:
                bb = cand
                break

    def prep(x, length, length_p):
        x = x.reshape(bh, length, d)
        return jnp.pad(x, ((0, 0), (0, length_p - length), (0, d_p - d)))

    qp, kp, vp = prep(q, lq, lq_p), prep(k, lk, lk_p), prep(v, lk, lk_p)

    # short-sequence fast path: K/V fit in one block — no online softmax
    short = lk_p <= bk
    if short:
        grid = (bh // bb, lq_p // bq)
        in_specs = [
            pl.BlockSpec((bb, bq, d_p), lambda b, i: (b, i, 0)),
            pl.BlockSpec((bb, lk_p, d_p), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((bb, lk_p, d_p), lambda b, i: (b, 0, 0)),
        ]
    else:
        grid = (bh // bb, lq_p // bq, lk_p // bk)
        in_specs = [
            pl.BlockSpec((bb, bq, d_p), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((bb, bk, d_p), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((bb, bk, d_p), lambda b, i, j: (b, j, 0)),
        ]
    args = [qp, kp, vp]

    if attn_bias is not None:
        # broadcast over batch/head at the index-map level where possible —
        # never materialize a full (BH, Lq, Lk) bias for shared tables
        lead_prod = math.prod(bias_lead) if bias_lead else 1
        if bias_shared:
            bias_block, bias_idx = 1, (lambda b: 0)
        elif bias_full:
            bias_block, bias_idx = bb, (lambda b: b)
        elif bias_per_head:  # per-head table shared across batch
            assert bb == 1
            h = batch[-1]
            bias_block, bias_idx = 1, (lambda b: b % h)
        else:
            attn_bias = jnp.broadcast_to(attn_bias, (*batch, lq, lk))
            lead_prod = bh
            bias_block, bias_idx = bb, (lambda b: b)
        bias = attn_bias.reshape(lead_prod, *attn_bias.shape[-2:])
        bias = jnp.pad(bias, ((0, 0), (0, lq_p - lq), (0, lk_p - lk)))
        if short:
            in_specs.append(pl.BlockSpec((bias_block, bq, lk_p), lambda b, i: (bias_idx(b), i, 0)))
        else:
            in_specs.append(pl.BlockSpec((bias_block, bq, bk), lambda b, i, j: (bias_idx(b), i, j)))
        args.append(bias)

    if short:
        kernel = functools.partial(
            _attn_kernel_short if attn_bias is not None else _attn_kernel_short_nobias,
            scale=scale, causal=causal, lk=lk, bq=bq, bb=bb,
        )
        out_spec = pl.BlockSpec((bb, bq, d_p), lambda b, i: (b, i, 0))
        scratch = []
    else:
        kernel = functools.partial(
            _flash_kernel if attn_bias is not None else _flash_kernel_nobias_wrapper,
            scale=scale, causal=causal, lq=lq, lk=lk, bq=bq, bk=bk, bb=bb,
        )
        out_spec = pl.BlockSpec((bb, bq, d_p), lambda b, i, j: (b, i, 0))
        scratch = [
            pltpu.VMEM((bb, bq, LANE), jnp.float32),
            pltpu.VMEM((bb, bq, LANE), jnp.float32),
            pltpu.VMEM((bb, bq, d_p), jnp.float32),
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bh, lq_p, d_p), orig_dtype),
        scratch_shapes=scratch,
    )(*args)

    return out[:, :lq, :d].reshape(*batch, lq, d)


def _flash_kernel_nobias_wrapper(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_s, l_s, acc_s, **kw)

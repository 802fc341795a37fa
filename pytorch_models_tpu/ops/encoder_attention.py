"""Pallas merged-head encoder attention (flash v3).

Purpose-built for the encoder shapes where the head-split flash kernel and
the XLA path both lose (measured on v5e, ViT-B/16 batch 128: attention core
2.6 ms/layer vs 0.65 ms for all four projections):

- Q/K/V stay **merged-head** ``(B, L, H*D)`` — the projections' output
  layout — so the (B, L, HD) <-> (B, H, L, D) relayout copies XLA inserts
  around split/merge (326k est. cycles each, per layer) disappear, and the
  minor dim is a 128 multiple (no T(8,128) lane padding for D=64 heads).
- Scores never touch HBM: grid (B, q_blocks, k_blocks) with the K sweep as
  the minor (sequential) grid dim; per-head MXU dots on lane-sliced values;
  fp32 online-softmax state (m, l, acc) lives in VMEM scratch across the
  sweep. Pallas pipelines the block fetches and masks edge blocks, so
  L = 197 or 1500 needs no padded HBM copies.

Supports causal masking (GPT prefill). Additive biases (T5/MaxViT/DETR) stay
on the existing paths. Replaces ``F.scaled_dot_product_attention``
(reference transformer.py:52) for dense/causal encoder shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

Q_BLOCK = 256
K_BLOCK = 512
BB_MAX = 8  # max batch rows per grid step (nk == 1 path)
# VMEM budget for one grid step's pipelined q/k/v/o blocks (nk == 1 path).
# Same-session A/B at ViT-B/16 batch 128: 2 MB (bb=1) 3,635 img/s vs 12 MB
# (bb=4) 3,566 — bigger blocks reduce fetch/compute overlap, so the ~2 us
# per-program saving loses. Env override ENC_BB_BUDGET_MB for A/B sweeps.
BB_BUDGET_BYTES = int(__import__("os").environ.get("ENC_BB_BUDGET_MB", "2")) * 1024 * 1024
VMEM_LIMIT_BYTES = 10 * 1024 * 1024


def _kernel_single(q_ref, k_ref, v_ref, o_ref, *, lq: int, lk: int, bq: int, bk: int,
                   n_heads: int, d: int, scale: float, causal: bool, prec, bb: int):
    """nk == 1 fast path (ViT/BERT-sized L): the whole K/V row fits one block,
    so the softmax needs no online state — everything stays in registers and
    no VMEM scratch is read-modify-written per head. ``bb`` batch rows are
    processed per grid step (statically unrolled) to amortize the ~2 µs
    per-program cost at encoder batch sizes."""
    qi = pl.program_id(1)
    k_idx = lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = k_idx < lk
    if causal:
        q_row = qi * bq + lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        mask = jnp.logical_and(mask, k_idx <= q_row)
    v_row_ok = lax.broadcasted_iota(jnp.int32, (bk, 1), 0) < lk

    for b in range(bb):
        # fold the softmax scale into q ONCE per row: (bq, HD) elements
        # instead of a (bq, bk) fp32 multiply per head
        q = (q_ref[b].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k_blk = k_ref[b]  # (bk, HD)
        # zero padded rows: masked score cols give p == 0, but 0 * garbage-V
        # (NaN in interpret mode, arbitrary on hw) would still poison p @ V
        v_blk = jnp.where(v_row_ok, v_ref[b], 0)
        outs = []
        for h in range(n_heads):
            q_h = q[:, h * d:(h + 1) * d]
            k_h = k_blk[:, h * d:(h + 1) * d]
            s = lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=prec)
            s = jnp.where(mask, s, NEG_INF)
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), jnp.float32(NEG_INF / 2))
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            l = jnp.where(l == 0.0, 1.0, l)
            acc = lax.dot_general(p.astype(v_blk.dtype), v_blk[:, h * d:(h + 1) * d],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32, precision=prec)
            outs.append((acc / l).astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(outs, axis=-1)


def _kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *, lq: int, lk: int, bq: int, bk: int,
            n_heads: int, d: int, scale: float, causal: bool, prec):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0]      # (bq, HD); edge-block garbage rows are masked by k_idx/lq
    k_blk = k_ref[0]  # (bk, HD)
    # zero padded rows: masked score cols give p == 0, but 0 * garbage-V
    # (NaN in interpret mode, arbitrary on hw) would still poison p @ V
    v_row_ok = ki * bk + lax.broadcasted_iota(jnp.int32, (bk, 1), 0) < lk
    v_blk = jnp.where(v_row_ok, v_ref[0], 0)

    k_idx = ki * bk + lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = k_idx < lk
    if causal:
        q_row = qi * bq + lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        mask = jnp.logical_and(mask, k_idx <= q_row)

    # read the full online-softmax state ONCE per grid step (m/l as (bq, H)
    # values, acc as (bq, H*D)) and write back once — per-head lane-sliced
    # VMEM read-modify-writes cost a relayout each
    m_all, l_all, acc_all = m_s[:], l_s[:], acc_s[:]
    m_out, l_out, acc_out = [], [], []
    for h in range(n_heads):
        q_h = q[:, h * d:(h + 1) * d]
        k_h = k_blk[:, h * d:(h + 1) * d]
        s = lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec) * scale  # (bq, bk)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_all[:, h:h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        m_safe = jnp.maximum(m_new, jnp.float32(NEG_INF / 2))  # fully-masked rows stay finite
        p = jnp.exp(s - m_safe)
        alpha = jnp.exp(m_prev - m_safe)
        l_out.append(alpha * l_all[:, h:h + 1] + jnp.sum(p, axis=-1, keepdims=True))
        acc_out.append(acc_all[:, h * d:(h + 1) * d] * alpha + lax.dot_general(
            p.astype(v_blk.dtype), v_blk[:, h * d:(h + 1) * d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec))
        m_out.append(m_new)
    m_s[:] = jnp.concatenate(m_out, axis=-1)
    l_s[:] = jnp.concatenate(l_out, axis=-1)
    acc_s[:] = jnp.concatenate(acc_out, axis=-1)

    @pl.when(ki == nk - 1)
    def _():
        l = l_s[:]
        l = jnp.where(l == 0.0, 1.0, l)
        # broadcast per-head normalizers back to H*D lanes via the one-hot
        # head expander (one MXU pass; avoids unsupported (bq,H,D) reshapes)
        col_head = lax.broadcasted_iota(jnp.int32, (n_heads, n_heads * d), 1) // d
        head_id = lax.broadcasted_iota(jnp.int32, (n_heads, n_heads * d), 0)
        e_mat = (col_head == head_id).astype(jnp.float32)  # (H, H*D)
        l_full = lax.dot_general(l, e_mat, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32, precision=prec)
        o_ref[0] = (acc_s[:] / l_full).astype(o_ref.dtype)


def encoder_attention_eligible(q, k, n_heads: int, attn_bias) -> bool:
    """Shape gate: merged-head inputs this kernel can serve."""
    if attn_bias is not None or q.ndim not in (2, 3):
        return False
    hd = q.shape[-1]
    if hd % n_heads or hd % 128:
        return False
    bk = min(K_BLOCK, -(-k.shape[-2] // 8) * 8)
    itemsize = jnp.dtype(q.dtype).itemsize
    vmem = (2 * 2 * bk * hd + 2 * Q_BLOCK * hd) * itemsize + Q_BLOCK * (hd + 2 * n_heads) * 4
    return vmem <= VMEM_LIMIT_BYTES


@functools.partial(jax.jit, static_argnames=("n_heads", "causal"))
def encoder_attention(q, k, v, n_heads: int, causal: bool = False):
    """q: (B, Lq, H*D), k/v: (B, Lk, H*D) -> (B, Lq, H*D) merged-head SDPA.

    Unbatched (L, H*D) inputs are promoted. fp32 inputs use full-precision
    MXU passes (parity); bf16 is the fast path.
    """
    unbatched = q.ndim == 2
    if unbatched:
        q, k, v = q[None], k[None], v[None]
    b, lq, hd = q.shape
    lk = k.shape[-2]
    d = hd // n_heads
    bq = min(Q_BLOCK, -(-lq // 8) * 8)
    bk = min(K_BLOCK, -(-lk // 8) * 8)
    nq = -(-lq // bq)
    nk = -(-lk // bk)
    prec = lax.Precision.HIGHEST if q.dtype == jnp.float32 else lax.Precision.DEFAULT

    kw = dict(lq=lq, lk=lk, bq=bq, bk=bk, n_heads=n_heads, d=d,
              scale=1.0 / math.sqrt(d), causal=causal, prec=prec)
    if nk == 1:
        itemsize = jnp.dtype(q.dtype).itemsize
        bytes_per_row = (3 * bk + 2 * bq) * hd * itemsize
        bb = max(1, min(BB_MAX, BB_BUDGET_BYTES // bytes_per_row))
        while b % bb:
            bb -= 1
        out = pl.pallas_call(
            functools.partial(_kernel_single, bb=bb, **kw),
            grid=(b // bb, nq),
            in_specs=[
                pl.BlockSpec((bb, bq, hd), lambda i, j: (i, j, 0)),
                pl.BlockSpec((bb, bk, hd), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((bb, bk, hd), lambda i, j: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bb, bq, hd), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q, k, v)
        return out[0] if unbatched else out

    out = pl.pallas_call(
        functools.partial(_kernel, **kw),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, j, g: (i, j, 0)),
            pl.BlockSpec((1, bk, hd), lambda i, j, g: (i, g, 0)),
            pl.BlockSpec((1, bk, hd), lambda i, j, g: (i, g, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, j, g: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, n_heads), jnp.float32),
            pltpu.VMEM((bq, n_heads), jnp.float32),
            pltpu.VMEM((bq, hd), jnp.float32),
        ],
    )(q, k, v)
    return out[0] if unbatched else out

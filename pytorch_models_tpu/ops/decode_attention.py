"""Pallas decode attention: single-position queries against a KV cache,
reading ONLY the valid prefix of the cache.

XLA decode attention must read the full (L_max) cache every step because
shapes are static; this kernel DMAs just ``ceil((pos+1)/block)`` K/V blocks
from HBM per step — the decode-step memory floor scales with the actual
sequence length instead of the preallocated maximum (SURVEY §2.7 N1 decode
variant). ``pos`` rides in scalar-prefetch so the block loop bound is known
before the kernel body runs.
"""

from __future__ import annotations

import functools
import math

import jax
from jax import lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _decode_kernel(pos_ref, pad_ref, q_ref, k_hbm, v_hbm, o_ref, *, bk: int, scale: float, d_p: int,
                   n_heads: int):
    """One program handles one batch·head slice: q (1, D), cache (L_max, D).

    ``k_hbm``/``v_hbm`` are the FULL (BH, L_p, D_p) arrays (ANY memory space
    refs are not block-sliced) — index by program id. ``pad_ref`` holds the
    per-batch-row left-pad length (batched generation): blocks entirely inside
    the pad are skipped, partially-padded blocks are masked."""
    pos = pos_ref[0]
    bh = pl.program_id(0)
    pad = pad_ref[bh // n_heads]
    start_block = pad // bk  # skip fully left-padded blocks
    n_blocks = (pos + 1 + bk - 1) // bk  # only the valid prefix

    def body(k_scratch, v_scratch, sem):
        # double-buffered: start block i+1's DMA while computing block i
        q = q_ref[0].astype(jnp.float32)  # (1, d_p) block

        def copies(i, slot):
            return (
                pltpu.make_async_copy(k_hbm.at[bh, pl.ds(i * bk, bk)], k_scratch.at[slot], sem.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[bh, pl.ds(i * bk, bk)], v_scratch.at[slot], sem.at[slot, 1]),
            )

        for cp in copies(start_block, lax.rem(start_block, 2)):
            cp.start()

        def step(i, carry):
            m_prev, l_prev, acc = carry
            slot = lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                for cp in copies(i + 1, lax.rem(i + 1, 2)):
                    cp.start()

            for cp in copies(i, slot):
                cp.wait()

            k = k_scratch[slot].astype(jnp.float32)  # (bk, d_p)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale  # (1, bk)
            k_idx = i * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
            s = jnp.where(jnp.logical_and(k_idx <= pos, k_idx >= pad), s, NEG_INF)

            m_new = jnp.maximum(m_prev, jnp.max(s))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_prev + jnp.sum(p)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_scratch.dtype), v_scratch[slot], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        init = (jnp.float32(NEG_INF), jnp.float32(0.0), jnp.zeros((1, d_p), jnp.float32))
        m, l, acc = jax.lax.fori_loop(start_block, n_blocks, step, init)
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        k_scratch=pltpu.VMEM((2, bk, d_p), k_hbm.dtype),
        v_scratch=pltpu.VMEM((2, bk, d_p), v_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2, 2)),
    )


@functools.partial(jax.jit, static_argnames=("block_k",))
def decode_attention(q, k_cache, v_cache, pos, pad_lens=None, block_k: int = 512):
    """q: (..., H, 1, D); k_cache/v_cache: (..., H, L_max, D); pos: scalar int.

    Returns (..., H, 1, D) — attention over cache positions [pad, pos] where
    ``pad`` is 0 or the per-batch-row left-pad length from ``pad_lens`` (B,)
    (batched left-aligned generation). The slot at ``pos`` must already
    contain this step's K/V.
    """
    *batch, lq, d = q.shape
    assert lq == 1, "decode kernel is single-position"
    l_max = k_cache.shape[-2]
    bh = math.prod(batch) if batch else 1
    n_heads = batch[-1] if batch else 1
    d_p = _pad_to(d, LANE)
    bk = min(block_k, _pad_to(l_max, LANE))
    l_p = _pad_to(l_max, bk)

    def prep(x, length):
        x = x.reshape(bh, length, d)
        return jnp.pad(x, ((0, 0), (0, l_p - length if length == l_max else 0), (0, d_p - d)))

    qp = jnp.pad(q.reshape(bh, 1, d), ((0, 0), (0, 0), (0, d_p - d)))
    kp, vp = prep(k_cache, l_max), prep(v_cache, l_max)
    pos_arr = jnp.full((1,), pos, jnp.int32)
    if pad_lens is None:
        pad_arr = jnp.zeros((max(bh // n_heads, 1),), jnp.int32)
    else:
        pad_arr = jnp.asarray(pad_lens, jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, 1, d_p), lambda b, pos_ref, pad_ref: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # full cache; indexed by program id
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, d_p), lambda b, pos_ref, pad_ref: (b, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, bk=bk, scale=1.0 / math.sqrt(d), d_p=d_p, n_heads=n_heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, 1, d_p), q.dtype),
    )(pos_arr, pad_arr, qp, kp, vp)
    return out[:, :, :d].reshape(*batch, 1, d)

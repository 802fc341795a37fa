"""Fused greedy head: argmax(x @ emb.T) without materializing the logits.

The decode loop's head matmul + argmax costs ~0.19 ms/step at GPT-2 batch 32
(weight-read floor 0.094): XLA writes the (B, 50257) logits to HBM and reads
them back for the argmax. This kernel streams the tied embedding in row
chunks (pallas-pipelined), keeps a running (best value, best index) per row,
and emits only the (B,) argmax ids.

Scores are cast to bf16 before comparison when the matmul runs in bf16 so
the winner matches XLA's bf16-logits argmax bit-for-bit (same fp32-accum →
bf16 rounding); ties resolve to the first (lowest) index like jnp.argmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_BYTES = 3 * 1024 * 1024  # per vocab block; x2 when pallas double-buffers
INT_MAX = jnp.iinfo(jnp.int32).max


def _kernel(x_ref, emb_ref, o_ref, best_val, best_idx, *, v: int, cv: int, prec,
            tied: bool = True):
    i = pl.program_id(0)
    nv = pl.num_programs(0)

    dims = (((1,), (1,)), ((), ())) if tied else (((1,), (0,)), ((), ()))
    s = lax.dot_general(x_ref[...], emb_ref[...], dims,
                        preferred_element_type=jnp.float32, precision=prec)  # (B, cv)
    if x_ref.dtype == jnp.bfloat16:
        # round like XLA's bf16 head matmul so the argmax winner is identical
        s = s.astype(jnp.bfloat16).astype(jnp.float32)
    row = i * cv + lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(row < v, s, -jnp.inf)  # edge-block padding rows

    local_max = jnp.max(s, axis=1, keepdims=True)  # (B, 1)
    local_idx = jnp.min(jnp.where(s == local_max, row, INT_MAX), axis=1, keepdims=True)

    @pl.when(i == 0)
    def _():
        best_val[...] = local_max
        best_idx[...] = local_idx

    @pl.when(i > 0)
    def _():
        upd = local_max > best_val[...]  # strict: earlier chunks win ties
        best_val[...] = jnp.where(upd, local_max, best_val[...])
        best_idx[...] = jnp.where(upd, local_idx, best_idx[...])

    @pl.when(i == nv - 1)
    def _():
        o_ref[...] = best_idx[...]


def _greedy_argmax(x, w, tied: bool):
    b, d = x.shape
    v = w.shape[0] if tied else w.shape[1]
    # chunk sized to the dtype (a fp32 (4096, d) block double-buffered blows
    # the 16 MB scoped-vmem limit); lane chunks for (d, V) weights use 128s
    align = 8 if tied else 128
    chunk = max((CHUNK_BYTES // (d * jnp.dtype(w.dtype).itemsize)) // align * align, align)
    cv = min(chunk, -(-v // align) * align)
    nv = -(-v // cv)
    prec = lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    w_spec = (pl.BlockSpec((cv, d), lambda i: (i, 0)) if tied
              else pl.BlockSpec((d, cv), lambda i: (0, i)))
    out = pl.pallas_call(
        functools.partial(_kernel, v=v, cv=cv, prec=prec, tied=tied),
        grid=(nv,),
        in_specs=[pl.BlockSpec((b, d), lambda i: (0, 0)), w_spec],
        out_specs=pl.BlockSpec((b, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.int32)],
    )(x, w)
    return out[:, 0]


@jax.jit
def greedy_argmax_tied(x, emb):
    """``x`` (B, d), ``emb`` (V, d) -> (B,) int32 = argmax(x @ emb.T, axis=-1)."""
    return _greedy_argmax(x, emb, tied=True)


@jax.jit
def greedy_argmax(x, w):
    """``x`` (B, d), ``w`` (d, V) -> (B,) int32 = argmax(x @ w, axis=-1)
    (separate classifier head, e.g. T5)."""
    return _greedy_argmax(x, w, tied=False)

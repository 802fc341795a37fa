"""Pallas row gather: embedding lookups for small index sets.

XLA lowers ``jnp.take(table, idx, axis=0)`` on TPU to a gather that costs
~0.17 ms for 32 rows of GPT-2's (50257, 768) embedding inside the decode loop
— ~20x its data movement. This kernel issues one async copy per row
(scalar-prefetched indices, all copies in flight together), which is just the
~1.5 KB/row of real traffic.

Used by the decode loops for token/position embeddings (``embed_rows``); the
reference has no equivalent problem (torch gathers are fine on GPU).
"""

from __future__ import annotations

from contextlib import contextmanager

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# above this many rows, XLA's gather amortizes fine and the unrolled per-row
# copies would bloat the kernel
MAX_KERNEL_ROWS = 256

# None = auto (kernel on TPU). False forces jnp.take — set at TRACE time by
# code that runs embed_rows under vmap (batched speculative), where the
# pallas_call's scalar-prefetch batching rule is not supported.
USE_GATHER_KERNEL: bool | None = None


@contextmanager
def xla_gather_for_trace():
    """Force ``jnp.take`` while TRACING code that runs :func:`embed_rows`
    under vmap (batched speculative): the pallas gather's scalar-prefetch
    batching rule is unsupported. The flag is read at trace time, so the
    toggle only needs to wrap the traced call."""
    global USE_GATHER_KERNEL
    prev = USE_GATHER_KERNEL
    USE_GATHER_KERNEL = False
    try:
        yield
    finally:
        USE_GATHER_KERNEL = prev


def _kernel(idx_ref, table_hbm, o_ref, *, n: int, v: int):
    """Mosaic DMA slices must be 8-sublane aligned, so single rows can't be
    copied directly: fetch each row's aligned 8-row window, mask-select the
    row in VMEM, and flush all rows with one full-buffer copy."""
    d = o_ref.shape[-1]

    def body(win, out, sem, out_sem):
        starts = []
        for r in range(n):
            # provably 8-divisible (a min() with the table end defeats
            # Mosaic's divisibility prover); the wrapper padded v to 8k
            start = (idx_ref[r] // 8) * 8
            starts.append(start)
            pltpu.make_async_copy(table_hbm.at[pl.ds(start, 8), :], win.at[r],
                                  sem.at[r]).start()
        sub_iota = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        for r in range(n):
            pltpu.make_async_copy(table_hbm.at[pl.ds(starts[r], 8), :], win.at[r],
                                  sem.at[r]).wait()
            pick = sub_iota == (idx_ref[r] - starts[r])
            row = jnp.sum(jnp.where(pick, win[r].astype(jnp.float32), 0.0),
                          axis=0, keepdims=True)
            out[r] = row.astype(out.dtype)[0]
        cp = pltpu.make_async_copy(out, o_ref, out_sem)
        cp.start()
        cp.wait()

    pl.run_scoped(
        body,
        win=pltpu.VMEM((n, 8, d), table_hbm.dtype),
        out=pltpu.VMEM((n, d), table_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((n,)),
        out_sem=pltpu.SemaphoreType.DMA(()),
    )


@jax.jit
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table`` (V, D), ``idx`` (N,) int -> (N, D) rows via per-row DMA."""
    n = idx.shape[0]
    d = table.shape[-1]
    # jnp.take clamps out-of-range ids; match it — an unclamped id would issue
    # an out-of-bounds HBM DMA (garbage read on hardware)
    idx = jnp.clip(idx, 0, table.shape[0] - 1)
    # pad N to a sublane multiple: the kernel's final (N, D) VMEM->HBM flush
    # FAULTS the TPU worker at runtime when N % 8 != 0 (hardware-only —
    # compiles fine, interpret fine; isolated on-chip round 4: n=8 passes at
    # every table shape, n∈{1,2,3,5} crashes). Extra rows gather row 0 and
    # are sliced off below.
    n_pad = -n % 8
    if n_pad:
        idx = jnp.concatenate([idx, jnp.zeros((n_pad,), idx.dtype)])
    # pad V to a sublane multiple so every 8-row window is in bounds; the pad
    # is loop-invariant and hoisted out of decode loops by XLA's while LICM
    if table.shape[0] % 8:
        table = jnp.pad(table, ((0, -table.shape[0] % 8), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        # output stays in ANY space: rows are DMA'd table->out directly,
        # never staged through a pipelined VMEM block
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n=n + n_pad, v=table.shape[0]),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n + n_pad, d), table.dtype),
    )(idx.astype(jnp.int32), table)
    return out[:n] if n_pad else out


def embed_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ``jnp.take(table, idx, axis=0)`` (any idx shape), using the
    row-gather kernel when it wins and falling back to XLA otherwise."""
    from .attention import _on_tpu

    n = 1
    for s in idx.shape:
        n *= s
    if (USE_GATHER_KERNEL is False or not _on_tpu()
            or not 0 < n <= MAX_KERNEL_ROWS or table.shape[0] < 8):
        return jnp.take(table, idx, axis=0)
    flat = gather_rows(table, idx.reshape(-1))
    return flat.reshape(*idx.shape, table.shape[-1])

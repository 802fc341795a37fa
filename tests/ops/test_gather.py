"""Row-gather kernel parity (interpret) + embed_rows fallback behavior."""

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pytorch_models_tpu.ops.gather import MAX_KERNEL_ROWS, embed_rows, gather_rows
from tests.oracle import rng


def test_gather_rows_parity():
    r = rng(181)
    table = jnp.asarray(r.standard_normal((500, 256)), jnp.float32)
    idx = jnp.asarray([0, 499, 7, 7, 123, 31], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[np.asarray(idx)])


def test_gather_rows_bf16():
    r = rng(182)
    table = jnp.asarray(r.standard_normal((100, 128)), jnp.bfloat16)
    idx = jnp.asarray([3, 0, 99], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)),
                                  np.asarray(table[idx].astype(jnp.float32)))


def test_embed_rows_matches_take():
    r = rng(183)
    table = jnp.asarray(r.standard_normal((64, 128)), jnp.float32)
    for shape in ((5,), (2, 3), (MAX_KERNEL_ROWS + 1,)):
        idx = jnp.asarray(r.integers(0, 64, shape), jnp.int32)
        out = embed_rows(table, idx)  # CPU: falls back to take; same contract
        np.testing.assert_array_equal(np.asarray(out), np.asarray(jnp.take(table, idx, axis=0)))

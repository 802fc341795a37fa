"""Flash-attention kernel parity vs the einsum reference (interpret mode on CPU).

Covers the mode matrix from SURVEY §2.7 N1: dense bidirectional, causal,
additive per-head bias, cross-attention with Lq != Lk, odd head dims and
non-multiple-of-128 sequence lengths (ViT's 197 tokens).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pytorch_models_tpu.ops.attention import _sdpa_xla
from pytorch_models_tpu.ops.flash_attention import flash_sdpa

CASES = [
    # (batch, heads, lq, lk, d, causal, bias_kind)
    ("vit_197", (2, 3, 197, 197, 64, False, None)),
    ("causal", (1, 4, 256, 256, 64, True, None)),
    ("head_bias", (2, 3, 197, 197, 64, False, "head")),
    ("full_bias", (1, 2, 128, 128, 64, False, "full")),
    ("cross_odd", (2, 2, 100, 300, 48, False, None)),
    ("long", (1, 2, 777, 777, 64, False, None)),
    ("maxvit_win", (8, 2, 49, 49, 32, False, "head")),
    ("causal_long", (1, 2, 700, 700, 64, True, None)),
]


def test_short_path_matches_streaming():
    """The single-k-block short kernel and the online-softmax streaming kernel
    must agree on the same inputs (force streaming via a small block_k)."""
    r = np.random.default_rng(7)
    q = jnp.asarray(r.standard_normal((2, 3, 197, 64)), jnp.float32)
    k = jnp.asarray(r.standard_normal((2, 3, 197, 64)), jnp.float32)
    v = jnp.asarray(r.standard_normal((2, 3, 197, 64)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        short = flash_sdpa(q, k, v)  # lk_p=256 <= 512 -> short kernel
        streaming = flash_sdpa(q, k, v, block_k=128)  # 2 k-blocks -> online softmax
    np.testing.assert_allclose(np.asarray(short), np.asarray(streaming), rtol=2e-5, atol=2e-5)


def test_flash_bf16_parity():
    """bf16 inputs stay bf16 on the MXU; parity within bf16 tolerance."""
    r = np.random.default_rng(8)
    q = jnp.asarray(r.standard_normal((2, 2, 197, 64)), jnp.bfloat16)
    k = jnp.asarray(r.standard_normal((2, 2, 197, 64)), jnp.bfloat16)
    v = jnp.asarray(r.standard_normal((2, 2, 197, 64)), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = flash_sdpa(q, k, v)
    ref = _sdpa_xla(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), None, False)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("name,case", CASES)
def test_flash_parity(name, case):
    b, h, lq, lk, d, causal, bias_kind = case
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, h, lk, d)), jnp.float32)
    bias = None
    if bias_kind == "head":
        bias = jnp.asarray(r.standard_normal((h, lq, lk)), jnp.float32)
    elif bias_kind == "full":
        bias = jnp.asarray(r.standard_normal((b, h, lq, lk)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        out_f = flash_sdpa(q, k, v, bias, causal)
    out_x = _sdpa_xla(q, k, v, bias, causal)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=2e-5, atol=2e-5)


def test_flash_fully_masked_rows():
    """Causal + bias can fully mask a row; output must be finite (zeros)."""
    b, h, l, d = 1, 2, 128, 64
    r = np.random.default_rng(1)
    q = jnp.asarray(r.standard_normal((b, h, l, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, h, l, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, h, l, d)), jnp.float32)
    bias = jnp.full((1, 1, l, l), -1e30, jnp.float32)  # mask everything
    with pltpu.force_tpu_interpret_mode():
        out = flash_sdpa(q, k, v, bias, False)
    assert bool(jnp.all(jnp.isfinite(out)))

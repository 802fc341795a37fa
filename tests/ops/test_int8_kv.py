"""int8 KV-cache decode attention (ops/int8_kv.py): the kernel's quantized
math must match the exact jnp oracle, and the whole quantize->attend chain
must stay close to full-precision attention.

Interpret-mode constraint (CLAUDE.md #14): streams here are <= 2 blocks
(Lmax = 256 = 2 x 128), so the eager interpret DMA copies never clobber a
double-buffered slot that hardware would still be protecting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_models_tpu.ops.int8_kv import (
    KV_BLOCK_INT8,
    int8_attention_oracle,
    int8_decode_attention,
    make_int8_kv_cache,
    prefill_int8_kv,
    quantize_rows,
    write_int8_kv,
)

L_MAX = 2 * KV_BLOCK_INT8  # 2 streamed blocks: the interpret-safe maximum
H, D = 4, 32
HD = H * D


def _setup(b, seed=0, pads=None, ends=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, 1, HD)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, L_MAX, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, L_MAX, HD)), jnp.float32)
    cur_k = jnp.asarray(rng.standard_normal((b, HD)), jnp.float32)
    cur_v = jnp.asarray(rng.standard_normal((b, HD)), jnp.float32)
    k_q, v_q, k_s, v_s = make_int8_kv_cache(b, L_MAX, HD)
    k_q, v_q, k_s, v_s = prefill_int8_kv(k_q, v_q, k_s, v_s, k, v)
    pads = jnp.asarray(pads if pads is not None else [0] * b, jnp.int32)
    ends = jnp.asarray(ends if ends is not None else [L_MAX] * b, jnp.int32)
    return q, k, v, cur_k, cur_v, k_q, v_q, k_s, v_s, pads, ends


def _f32_reference(q, k, v, pads, ends, cur_k=None, cur_v=None):
    """Plain full-precision masked attention (per-row valid range + optional
    current position), merged-head layout."""
    b, _, hd = q.shape
    d = hd // H
    outs = []
    for r in range(b):
        kk = k[r].reshape(L_MAX, H, d)
        vv = v[r].reshape(L_MAX, H, d)
        if cur_k is not None:
            kk = jnp.concatenate([kk, cur_k[r].reshape(1, H, d)], 0)
            vv = jnp.concatenate([vv, cur_v[r].reshape(1, H, d)], 0)
        qq = q[r, 0].reshape(H, d)
        s = jnp.einsum("hd,lhd->hl", qq, kk) / np.sqrt(d)
        idx = jnp.arange(kk.shape[0])
        valid = (idx >= pads[r]) & (idx < ends[r])
        if cur_k is not None:
            valid = valid.at[-1].set(True)
        s = jnp.where(valid[None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.einsum("hl,lhd->hd", p, vv).reshape(1, 1, hd))
    return jnp.concatenate(outs, 0)


@pytest.mark.parametrize("b,pads,ends,cur", [
    (1, [0], [L_MAX], False),
    (1, [7], [200], True),
    (3, [0, 5, 130], [L_MAX, 190, 256], True),
    (8, None, [100] * 8, True),
    (16, [0] * 8 + [3] * 8, [L_MAX] * 8 + [140] * 8, True),
])
def test_kernel_matches_quantized_oracle(b, pads, ends, cur):
    """The Pallas kernel reproduces the exact quantized-math oracle (int
    dots are exact; the f32 chain mirrors op-for-op)."""
    q, k, v, cur_k, cur_v, k_q, v_q, k_s, v_s, pads, ends = _setup(b, seed=b)
    kw = dict(cur_k=cur_k, cur_v=cur_v) if cur else {}
    got = int8_decode_attention(q, k_q, v_q, k_s, v_s, ends, H,
                                pad_lens=pads, interpret=True, **kw)
    want = int8_attention_oracle(q, k_q, v_q, k_s, v_s, ends, H,
                                 pad_lens=pads, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_close_to_full_precision():
    """End-to-end quantization noise: prefill-quantized cache + int8 dots
    stay within a few percent of full-precision attention (observed ~2.7%
    of the output range on random normal inputs — per-key K/V rounding plus
    the per-column prob rounding)."""
    b = 8
    q, k, v, cur_k, cur_v, k_q, v_q, k_s, v_s, pads, ends = _setup(b, seed=3)
    got = int8_decode_attention(q, k_q, v_q, k_s, v_s, ends, H, pad_lens=pads,
                                cur_k=cur_k, cur_v=cur_v, interpret=True)
    want = _f32_reference(q, k, v, pads, ends, cur_k, cur_v)
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() / scale < 0.04, err.max() / scale


def test_write_matches_prefill():
    """write_int8_kv at position p produces the same cache state as a
    prefill covering p (per-key quantization is position-local)."""
    b = 4
    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.standard_normal((b, 8, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, 8, HD)), jnp.float32)
    a = make_int8_kv_cache(b, L_MAX, HD)
    a = prefill_int8_kv(*a, k, v)
    bstate = make_int8_kv_cache(b, L_MAX, HD)
    for p in range(8):
        bstate = write_int8_kv(*bstate, k[:, p:p + 1], v[:, p:p + 1], p)
    for x, y in zip(a, bstate):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_quantize_rows_zero_rows():
    """All-zero rows quantize to 0 with a harmless finite positive scale."""
    x = jnp.zeros((2, 3, HD))
    x_q, s = quantize_rows(x)
    assert x_q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(x_q), 0)
    assert (np.asarray(s) > 0).all() and np.isfinite(np.asarray(s)).all()


def test_empty_range_rows_no_cur():
    """A row whose [pad, end) is empty with no current position must return
    zeros (l==0 guard), not NaN."""
    b = 2
    q, k, v, _, _, k_q, v_q, k_s, v_s, _, _ = _setup(b, seed=5)
    pads = jnp.asarray([0, 10], jnp.int32)
    ends = jnp.asarray([64, 10], jnp.int32)  # row 1: empty
    got = int8_decode_attention(q, k_q, v_q, k_s, v_s, ends, H,
                                pad_lens=pads, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_array_equal(np.asarray(got[1]), 0.0)


@pytest.mark.parametrize("b,pads,ends,cur", [
    (3, [0, 5, 130], [L_MAX, 190, 256], True),
    (16, [0] * 8 + [3] * 8, [L_MAX] * 8 + [140] * 8, False),
])
def test_compact_path_bit_identical_to_wide(b, pads, ends, cur):
    """The compact-diagonal formulation (all post-dot VPU work on (bk, g*H))
    must be BIT-identical to the original wide path: same per-element operand
    order everywhere, off-diagonal entries exactly the masked/zero ones."""
    q, k, v, cur_k, cur_v, k_q, v_q, k_s, v_s, pads, ends = _setup(
        b, seed=3, pads=pads, ends=ends)
    kw = dict(cur_k=cur_k, cur_v=cur_v) if cur else {}
    wide = int8_decode_attention(q, k_q, v_q, k_s, v_s, ends, H, pad_lens=pads,
                                 interpret=True, compact=False, **kw)
    comp = int8_decode_attention(q, k_q, v_q, k_s, v_s, ends, H, pad_lens=pads,
                                 interpret=True, compact=True, **kw)
    np.testing.assert_array_equal(np.asarray(wide), np.asarray(comp))

"""Fused decode-layer kernels: the matmul/LN/GELU sandwich around attention.

A single decode step of a 12-layer decoder LM otherwise issues ~13 XLA ops
per layer (two LN fusions, six matmul launches, residual adds) whose launch
and fusion-boundary overhead dominates at (B, d) = (32, 768) sizes —
profile_genloop measured ~53 µs/layer against a ~25 µs weight+cache
bandwidth floor. These two kernels collapse the non-attention work of a
pre-norm layer into two Pallas programs:

- ``decode_qkv``:  x -> LN1 -> q, k_new, v_new   (feeds the cache write +
  ops/decode_attention.py between the two kernels)
- ``decode_ffn``:  x, attn_ctx -> + ctx@Wo -> LN2 -> gelu(fc1) -> fc2 -> +

Weights ride in as plain VMEM inputs (one layer's sandwich is ~10.6 MB bf16
— fits; the copy IS the bandwidth floor, nothing to overlap at grid (1,)).
LN statistics are computed in fp32 like ops/layers.layer_norm. fp32 inputs
use full-precision MXU passes (parity); bf16 is the serving fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layers import ACT_FNS


def _prec(dtype):
    return lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT


def _ln(x, scale, bias, eps):
    """``scale``/``bias`` are (1, d) rows — broadcast over the (B, d) batch."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _dot(a, b, prec):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32, precision=prec)


def _qkv_kernel(x_ref, ln_s, ln_b, wq, bq, wk, bk_, wv, bv, q_o, k_o, v_o, *, eps):
    prec = _prec(x_ref.dtype)
    h = _ln(x_ref[...], ln_s[...], ln_b[...], eps)
    for w, b, o in ((wq, bq, q_o), (wk, bk_, k_o), (wv, bv, v_o)):
        o[...] = (_dot(h, w[...], prec) + b[...].astype(jnp.float32)).astype(o.dtype)


def _ffn_kernel(x_ref, ctx_ref, wo, bo, ln_s, ln_b, w1, b1, w2, b2, o_ref, *, eps, act):
    prec = _prec(x_ref.dtype)
    x = x_ref[...]
    x = x + (_dot(ctx_ref[...], wo[...], prec) + bo[...].astype(jnp.float32)).astype(x.dtype)
    h = _ln(x, ln_s[...], ln_b[...], eps)
    h = ACT_FNS[act]((_dot(h, w1[...], prec) + b1[...].astype(jnp.float32)).astype(x.dtype))
    o_ref[...] = x + (_dot(h, w2[...], prec) + b2[...].astype(jnp.float32)).astype(x.dtype)


def _row(p, key, dtype):
    """Param leaf as a (1, n) VMEM-friendly row (Mosaic wants >= 2D)."""
    return p[key].astype(dtype)[None]


@functools.partial(jax.jit, static_argnames=("eps",))
def decode_qkv(x, ln_p, sa_p, eps: float = 1e-5):
    """x (B, d) -> (q, k_new, v_new) each (B, H*D): LN1 + the three projections."""
    b, d = x.shape
    hd = sa_p["q"]["w"].shape[-1]
    out = jax.ShapeDtypeStruct((b, hd), x.dtype)
    vmem = pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)
    return pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps),
        in_specs=[vmem] * 9,
        out_specs=[vmem] * 3,
        out_shape=[out, out, out],
    )(x, _row(ln_p, "scale", jnp.float32), _row(ln_p, "bias", jnp.float32),
      sa_p["q"]["w"].astype(x.dtype), _row(sa_p["q"], "b", jnp.float32),
      sa_p["k"]["w"].astype(x.dtype), _row(sa_p["k"], "b", jnp.float32),
      sa_p["v"]["w"].astype(x.dtype), _row(sa_p["v"], "b", jnp.float32))


@functools.partial(jax.jit, static_argnames=("eps", "act"))
def decode_ffn(x, ctx, o_p, ln_p, mlp_p, act: str = "gelu", eps: float = 1e-5):
    """x, attn ctx (B, d/H*D) -> layer output (B, d): o-proj + residual + MLP."""
    b, d = x.shape
    vmem = pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps, act=act),
        in_specs=[vmem] * 10,
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, ctx,
      o_p["w"].astype(x.dtype), _row(o_p, "b", jnp.float32),
      _row(ln_p, "scale", jnp.float32), _row(ln_p, "bias", jnp.float32),
      mlp_p["fc1"]["w"].astype(x.dtype), _row(mlp_p["fc1"], "b", jnp.float32),
      mlp_p["fc2"]["w"].astype(x.dtype), _row(mlp_p["fc2"], "b", jnp.float32))


def fused_layer_eligible(cfg, p, x, attn_bias, pad_lens) -> bool:
    """Shape/config gate for the fused decode-layer path (pre-norm, biased
    projections, no cross-attn input here, single position, no TP)."""
    if not cfg.pre_norm or cfg.tp_axis is not None or attn_bias is not None:
        return False
    if x.shape[-2] != 1 or x.ndim not in (2, 3):
        return False
    hd = cfg.n_heads * cfg.head_dim
    if hd % 128 or cfg.d_model % 128:
        return False
    return all("b" in p["sa"][k] for k in ("q", "k", "v", "o")) and "mlp" in p

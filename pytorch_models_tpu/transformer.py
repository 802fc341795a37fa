"""Shared transformer core: MHA, MLP, encoder/decoder layers and stacks.

Functional re-design of the reference's shared blocks (reference
transformer.py:9-176): params are pytrees, layer stacks are ``lax.scan`` over
stacked per-layer params (one compiled layer body instead of n_layers inlined
copies), and attention goes through :func:`pytorch_models_tpu.ops.sdpa`.

Beyond the reference, decoder layers support a preallocated KV cache,
eliminating the reference's O(L²)-per-token full re-forward decode loops
(reference text/generator.py:23-24, text/t5.py:220-223). Caches are stored
**merged-head** — ``(B, L_max, H*D)`` per layer, the exact shape the K/V
projections produce — so the per-step write is one ``dynamic_update_slice``
with no head split, and the minor dim (H*D, always a multiple of 128) avoids
the 2x HBM lane-padding a (B, H, L, 64) layout incurs under TPU T(8,128)
tiling. Single-position decode reads go through the Pallas prefix-streaming
kernel (ops/decode_attention.py); the einsum path splits heads on read.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
from jax import lax

from .ops import ACT_FNS, layer_norm, linear, linear_init, ln_init, sdpa
from .utils import stack_layers


def resolve_heads(d_model: int, n_heads: int | None = None, head_dim: int | None = None) -> tuple[int, int]:
    """Head-count/dim inference exactly as the reference (transformer.py:20-26)."""
    if head_dim is None and n_heads is None:
        head_dim = 64
        n_heads = d_model // head_dim
    elif head_dim is None:
        head_dim = d_model // n_heads
    elif n_heads is None:
        n_heads = d_model // head_dim
    return n_heads, head_dim


@dataclass(frozen=True)
class LayerConfig:
    """Static hyperparameters of one encoder/decoder layer (ref transformer.py:70-121)."""

    d_model: int
    n_heads: int
    head_dim: int
    cross_attn: bool = False
    bias: bool = True
    mlp_ratio: float = 4.0
    act: str = "gelu"
    pre_norm: bool = True
    norm_eps: float = 1e-5
    attn_impl: str = "auto"
    # Set under shard_map for Megatron tensor parallelism: n_heads/head_dim
    # then describe the LOCAL shard, and the attention out-projection and MLP
    # fc2 all-reduce their row-sharded partial sums over this mesh axis.
    tp_axis: str | None = None

    @staticmethod
    def make(d_model, n_heads=None, head_dim=None, **kw) -> "LayerConfig":
        n_heads, head_dim = resolve_heads(d_model, n_heads, head_dim)
        return LayerConfig(d_model, n_heads, head_dim, **kw)

    def with_(self, **kw) -> "LayerConfig":
        return replace(self, **kw)


# ---------------------------------------------------------------------------
# Multi-head attention (ref transformer.py:9-53)
# ---------------------------------------------------------------------------


def mha_init(key, cfg: LayerConfig) -> dict:
    kq, kk, kv, ko = jax.random.split(key, 4)
    inner = cfg.n_heads * cfg.head_dim
    return {
        "q": linear_init(kq, cfg.d_model, inner, cfg.bias),
        "k": linear_init(kk, cfg.d_model, inner, cfg.bias),
        "v": linear_init(kv, cfg.d_model, inner, cfg.bias),
        "o": linear_init(ko, inner, cfg.d_model, cfg.bias),
    }


def split_heads(x: jnp.ndarray, n_heads: int, head_dim: int) -> jnp.ndarray:
    """(..., L, H*D) -> (..., H, L, D)"""
    x = x.reshape(*x.shape[:-1], n_heads, head_dim)
    return jnp.swapaxes(x, -2, -3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, L, D) -> (..., L, H*D)"""
    x = jnp.swapaxes(x, -2, -3)
    return x.reshape(*x.shape[:-2], -1)


def reduce_linear(p: dict, x: jnp.ndarray, tp_axis: str | None) -> jnp.ndarray:
    """Row-parallel linear: x (.., k/tp) @ w (k/tp, n) -> psum over ``tp_axis``
    -> + bias. The bias is replicated and must be added AFTER the all-reduce
    (each rank adds it to the already-complete sum, consistently). With
    ``tp_axis=None`` this is exactly :func:`linear`."""
    if tp_axis is None:
        return linear(p, x)
    from .ops.layers import dot_precision

    out = jnp.matmul(x, p["w"].astype(x.dtype), precision=dot_precision(x))
    out = lax.psum(out, tp_axis)
    return out + p["b"].astype(x.dtype) if "b" in p else out


def mha_project_kv(p: dict, cfg: LayerConfig, kv: jnp.ndarray, valid_lens=None) -> dict:
    """Project ``kv`` (..., L, d) into a cross-attention cache.

    Returns ``{"k", "v", "len"}`` with merged-head (..., Lp, H*D) tensors,
    zero-padded to a ``KV_BLOCK`` multiple so the Pallas decode kernel can
    stream them, and ``len`` (..., ) the per-row count of valid memory
    positions (``valid_lens`` or the full L). Padded/invalid slots are masked
    by every read path.
    """
    length = kv.shape[-2]
    pad = padded_cache_len(length) - length
    if pad:
        widths = [(0, 0)] * (kv.ndim - 2) + [(0, pad), (0, 0)]
        kv_p = jnp.pad(kv, widths)
    else:
        kv_p = kv
    lens = jnp.full(kv.shape[:-2], length, jnp.int32) if valid_lens is None else (
        jnp.asarray(valid_lens, jnp.int32))
    return {"k": linear(p["k"], kv_p), "v": linear(p["v"], kv_p), "len": lens}


def _decode_kernel_bias(attn_bias, l_max: int, n_heads: int):
    """Convert a single-position additive bias to the decode kernel's key-major
    layout: (H, 1, L) / (B, H, 1, L) -> (1 | B, L, H). Returns
    ``(kernel_bias, convertible)``; shapes the kernel can't serve (e.g. a
    multi-query bias) report ``convertible=False`` and stay on the einsum path.
    """
    if attn_bias is None:
        return None, True
    if attn_bias.ndim == 3 and attn_bias.shape == (n_heads, 1, l_max):
        return jnp.moveaxis(attn_bias, 0, -1), True
    if attn_bias.ndim == 4 and attn_bias.shape[1:] == (n_heads, 1, l_max):
        return jnp.moveaxis(attn_bias, 1, -1)[:, 0], True
    return None, False


def _int8_self_decode_apply(p, cfg, k, v, q, cache, cache_pos, cache_layer,
                            pad_lens):
    """Single-position self-attention over an int8 KV cache — the per-op
    (non-megakernel) decode path used by tensor-parallel serving.

    Megakernel semantics (ops/decode_step.py ``kv_scales=``): the cache holds
    quantized positions ``[0, pos)``; this step's K/V ride into the attention
    kernel unquantized (K scored with the cache-write rule so a key scores
    identically now and when later streamed) and are written back quantized
    AFTER attention. Under tensor parallelism each rank holds a width shard:
    quantization scales pmax over ``cfg.tp_axis`` so every rank uses the
    FULL-width scale and stays bit-identical to a single device
    (ops/int8_kv.py ``quantize_rows``/``cur_ks``).
    """
    from .ops.int8_kv import _b8, int8_decode_attention, quantize_rows

    assert q.shape[-2] == 1, "int8 KV caches serve single-position decode only"
    b = q.shape[0]
    k_new = linear(p["k"], k)  # (B, 1, H*D) merged, matches the cache
    v_new = linear(p["v"], v)
    q_m = linear(p["q"], q)
    kq, ks = quantize_rows(k_new, tp_axis=cfg.tp_axis)  # int8 + (B, 1, 1) f32
    vq, vs = quantize_rows(v_new, tp_axis=cfg.tp_axis)
    if cache_layer is not None:  # leaves are layer-stacked (L, B, Lmax|B8, ·)
        ck = lax.dynamic_index_in_dim(cache["k"], cache_layer, 0, keepdims=False)
        cv = lax.dynamic_index_in_dim(cache["v"], cache_layer, 0, keepdims=False)
        cks = lax.dynamic_index_in_dim(cache["ks"], cache_layer, 0, keepdims=False)
        cvs = lax.dynamic_index_in_dim(cache["vs"], cache_layer, 0, keepdims=False)
    else:
        ck, cv, cks, cvs = cache["k"], cache["v"], cache["ks"], cache["vs"]
    out = int8_decode_attention(q_m, ck, cv, cks, cvs, cache_pos, cfg.n_heads,
                                pad_lens=pad_lens, cur_k=k_new[:, 0, :],
                                cur_v=v_new[:, 0, :], cur_ks=ks[:, 0, :])

    pad = _b8(b) - b

    def col(s):  # (B, 1, 1) scale -> (B8, 1) plane column
        c = s.reshape(b, 1)
        return jnp.pad(c, ((0, pad), (0, 0)), constant_values=1.0) if pad else c

    if cache_layer is not None:
        new_cache = dict(cache) | {
            "k": lax.dynamic_update_slice(cache["k"], kq[None],
                                          (cache_layer, 0, cache_pos, 0)),
            "v": lax.dynamic_update_slice(cache["v"], vq[None],
                                          (cache_layer, 0, cache_pos, 0)),
            "ks": lax.dynamic_update_slice(cache["ks"], col(ks)[None],
                                           (cache_layer, 0, cache_pos)),
            "vs": lax.dynamic_update_slice(cache["vs"], col(vs)[None],
                                           (cache_layer, 0, cache_pos)),
        }
    else:
        new_cache = dict(cache) | {
            "k": lax.dynamic_update_slice(cache["k"], kq, (0, cache_pos, 0)),
            "v": lax.dynamic_update_slice(cache["v"], vq, (0, cache_pos, 0)),
            "ks": lax.dynamic_update_slice(cache["ks"], col(ks), (0, cache_pos)),
            "vs": lax.dynamic_update_slice(cache["vs"], col(vs), (0, cache_pos)),
        }
    return reduce_linear(p["o"], out, cfg.tp_axis), new_cache


def _int8_cross_decode_apply(p, cfg, q, cache):
    """Single-position cross-attention over write-once int8 encoder caches
    (quantized at admission/encode time); ``len`` masks per-row valid memory
    (all-empty rows return zeros — unadmitted pool slots)."""
    from .ops.int8_kv import int8_decode_attention

    assert q.shape[-2] == 1, "int8 KV caches serve single-position decode only"
    q_m = linear(p["q"], q)
    out = int8_decode_attention(q_m, cache["k"], cache["v"], cache["ks"],
                                cache["vs"], cache["len"], cfg.n_heads)
    return reduce_linear(p["o"], out, cfg.tp_axis)


def mha_apply(
    p: dict,
    cfg: LayerConfig,
    q: jnp.ndarray,
    k: jnp.ndarray | None = None,
    v: jnp.ndarray | None = None,
    attn_bias: jnp.ndarray | None = None,
    causal: bool = False,
    cache: dict | None = None,
    cache_pos=None,
    cache_layer=None,
    pad_lens: jnp.ndarray | None = None,
):
    """Self- or cross-attention with optional additive bias / causal mask / KV cache.

    Defaulting mirrors the reference (k defaults to q, v to k;
    transformer.py:44-45). With ``cache`` and ``cache_pos`` given, new K/V for
    the query chunk are written at positions ``[pos, pos+S)`` and attention is
    masked to ``key_pos <= pos + i``; returns ``(out, new_cache)``. With
    ``cache`` but no ``cache_pos`` (cross-attention), the cache is used as-is;
    its ``len`` entry masks padded memory slots.

    Caches are merged-head (..., L, H*D) — see the module docstring. Any
    single-position read (self decode AND cross decode) dispatches to the
    Pallas prefix-streaming kernel when eligible; the einsum fallback splits
    heads on read.

    ``pad_lens`` (B,) marks each batch row's left-pad length (batched
    left-aligned decode): cache positions ``< pad_lens[b]`` are masked. Kept
    separate from ``attn_bias`` so the single-position decode kernel — which
    takes pad lengths natively — stays engaged for batched serving.
    """
    from .ops import attention as _attn

    k = q if k is None else k
    v = k if v is None else v

    if cache is not None and "ks" in cache:  # int8 KV cache (per-op path)
        assert attn_bias is None, "int8 per-op attention has no bias support"
        if cache_pos is not None:
            return _int8_self_decode_apply(p, cfg, k, v, q, cache, cache_pos,
                                           cache_layer, pad_lens)
        return _int8_cross_decode_apply(p, cfg, q, cache)

    if cache is not None and cache_pos is not None:  # self-attention, KV-cached
        k_new = linear(p["k"], k)  # (..., S, H*D) — merged, matches the cache
        v_new = linear(p["v"], v)
        # cache-layer variant: leaves are the FULL layer-stacked array
        # (L, ..., Smax, H*D) — write only the new block at (layer, ..., pos);
        # a full per-layer slice write-back would move the whole cache per step
        new_cache, ck, cv = _write_cache(cache, k_new, v_new, cache_pos, cache_layer)
        s, l_max = q.shape[-2], ck.shape[-2]

        if s == 1 and cfg.attn_impl != "xla" and _attn.use_decode_kernel(l_max, ck.shape[-1]):
            kernel_bias, convertible = _decode_kernel_bias(attn_bias, l_max, cfg.n_heads)
            if convertible:
                from .ops.decode_attention import decode_attention

                q_m = linear(p["q"], q)  # (..., 1, H*D) — kernel takes merged heads
                out = decode_attention(q_m, ck.astype(q_m.dtype), cv.astype(q_m.dtype),
                                       cache_pos + 1, cfg.n_heads, pad_lens, kernel_bias)
                return reduce_linear(p["o"], out, cfg.tp_axis), new_cache

        qh = split_heads(linear(p["q"], q), cfg.n_heads, cfg.head_dim)
        kh = split_heads(ck.astype(qh.dtype), cfg.n_heads, cfg.head_dim)
        vh = split_heads(cv.astype(qh.dtype), cfg.n_heads, cfg.head_dim)
        row = lax.broadcasted_iota(jnp.int32, (s, l_max), 0)
        col = lax.broadcasted_iota(jnp.int32, (s, l_max), 1)
        mask_bias = jnp.where(col <= cache_pos + row, 0.0, -jnp.inf).astype(jnp.float32)
        if pad_lens is not None:
            # finite -1e30 (not -inf): a left-padded row's pad-region queries
            # see no valid keys; -inf would make their (discarded) softmax NaN
            pad_bias = jnp.where(jnp.arange(l_max)[None, :] >= pad_lens[:, None], 0.0, -1e30)
            mask_bias = mask_bias + pad_bias.astype(jnp.float32)[:, None, None, :]
        bias = mask_bias if attn_bias is None else attn_bias + mask_bias
        out = sdpa(qh, kh, vh, bias, False, cfg.attn_impl)
        return reduce_linear(p["o"], merge_heads(out), cfg.tp_axis), new_cache

    if cache is not None:  # precomputed cross-attention K/V (merged + "len")
        s, l_max = q.shape[-2], cache["k"].shape[-2]
        if (s == 1 and cfg.attn_impl != "xla" and attn_bias is None
                and _attn.use_decode_kernel(l_max, cache["k"].shape[-1])):
            from .ops.decode_attention import decode_attention

            q_m = linear(p["q"], q)
            out = decode_attention(q_m, cache["k"].astype(q_m.dtype), cache["v"].astype(q_m.dtype),
                                   cache["len"], cfg.n_heads)
            return reduce_linear(p["o"], out, cfg.tp_axis)
        qh = split_heads(linear(p["q"], q), cfg.n_heads, cfg.head_dim)
        kh = split_heads(cache["k"].astype(qh.dtype), cfg.n_heads, cfg.head_dim)
        vh = split_heads(cache["v"].astype(qh.dtype), cfg.n_heads, cfg.head_dim)
        # mask memory slots >= len (cache padding and/or per-row valid lengths)
        lens = cache["len"][..., None, None, None] if cache["len"].ndim else cache["len"]
        len_bias = jnp.where(jnp.arange(l_max) < lens, 0.0, -1e30).astype(jnp.float32)
        bias = len_bias if attn_bias is None else attn_bias + len_bias
        out = sdpa(qh, kh, vh, bias, causal, cfg.attn_impl)
        return reduce_linear(p["o"], merge_heads(out), cfg.tp_axis)

    q_m = linear(p["q"], q)
    k_m = linear(p["k"], k)
    v_m = linear(p["v"], v)
    if cfg.attn_impl != "xla" and _attn.use_encoder_kernel(q_m, k_m, cfg.n_heads, attn_bias):
        from .ops.encoder_attention import encoder_attention

        return reduce_linear(p["o"], encoder_attention(q_m, k_m, v_m, cfg.n_heads, causal), cfg.tp_axis)
    qh = split_heads(q_m, cfg.n_heads, cfg.head_dim)
    kh = split_heads(k_m, cfg.n_heads, cfg.head_dim)
    vh = split_heads(v_m, cfg.n_heads, cfg.head_dim)
    out = sdpa(qh, kh, vh, attn_bias, causal, cfg.attn_impl)
    return reduce_linear(p["o"], merge_heads(out), cfg.tp_axis)


# ---------------------------------------------------------------------------
# MLP (ref transformer.py:56-67)
# ---------------------------------------------------------------------------


def mlp_init(key, in_dim: int, hidden_dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, in_dim, hidden_dim), "fc2": linear_init(k2, hidden_dim, in_dim)}


def mlp_apply(p: dict, x: jnp.ndarray, act: str = "gelu", tp_axis: str | None = None) -> jnp.ndarray:
    return reduce_linear(p["fc2"], ACT_FNS[act](linear(p["fc1"], x)), tp_axis)


# ---------------------------------------------------------------------------
# Encoder / decoder layers (ref transformer.py:70-130)
# ---------------------------------------------------------------------------


def layer_init(key, cfg: LayerConfig) -> dict:
    ks = jax.random.split(key, 3)
    p = {
        "sa_norm": ln_init(cfg.d_model),
        "sa": mha_init(ks[0], cfg),
        "mlp_norm": ln_init(cfg.d_model),
        "mlp": mlp_init(ks[1], cfg.d_model, int(cfg.d_model * cfg.mlp_ratio)),
    }
    if cfg.cross_attn:
        p["ca_norm"] = ln_init(cfg.d_model)
        p["ca"] = mha_init(ks[2], cfg)
    return p


def encoder_layer_apply(p: dict, cfg: LayerConfig, x: jnp.ndarray, attn_bias=None) -> jnp.ndarray:
    """Bidirectional layer, pre- or post-norm (ref transformer.py:123-130)."""
    eps = cfg.norm_eps
    if cfg.pre_norm:
        x = x + mha_apply(p["sa"], cfg, layer_norm(p["sa_norm"], x, eps), attn_bias=attn_bias)
        x = x + mlp_apply(p["mlp"], layer_norm(p["mlp_norm"], x, eps), cfg.act, cfg.tp_axis)
    else:
        x = layer_norm(p["sa_norm"], x + mha_apply(p["sa"], cfg, x, attn_bias=attn_bias), eps)
        x = layer_norm(p["mlp_norm"], x + mlp_apply(p["mlp"], x, cfg.act, cfg.tp_axis), eps)
    return x


def _write_cache(cache, k_new, v_new, pos, cache_layer):
    """The merged-head cache update shared by mha_apply and the fused path."""
    if cache_layer is not None:
        start = (cache_layer,) + (0,) * (cache["k"].ndim - 3) + (pos, 0)
        new_cache = {
            "k": lax.dynamic_update_slice(cache["k"], k_new.astype(cache["k"].dtype)[None], start),
            "v": lax.dynamic_update_slice(cache["v"], v_new.astype(cache["v"].dtype)[None], start),
        }
        ck = lax.dynamic_index_in_dim(new_cache["k"], cache_layer, 0, keepdims=False)
        cv = lax.dynamic_index_in_dim(new_cache["v"], cache_layer, 0, keepdims=False)
        return new_cache, ck, cv
    start = (0,) * (cache["k"].ndim - 2) + (pos, 0)
    new_cache = {
        "k": lax.dynamic_update_slice(cache["k"], k_new.astype(cache["k"].dtype), start),
        "v": lax.dynamic_update_slice(cache["v"], v_new.astype(cache["v"].dtype), start),
    }
    return new_cache, new_cache["k"], new_cache["v"]


def decoder_layer_apply(
    p: dict,
    cfg: LayerConfig,
    x: jnp.ndarray,
    memory: jnp.ndarray | None = None,
    self_cache: dict | None = None,
    cross_cache: dict | None = None,
    pos=None,
    attn_bias: jnp.ndarray | None = None,
    cache_layer=None,
    pad_lens: jnp.ndarray | None = None,
):
    """Causal self-attn [+ cross-attn] + MLP (ref transformer.py:96-105).

    ``attn_bias`` is an extra additive self-attention bias; ``pad_lens`` (B,)
    masks left-padded cache slots for batched decode (see mha_apply). Returns
    ``x`` (and the updated self-cache when one is given). With
    ``cache_layer``, ``self_cache`` holds the full layer-stacked cache and
    only this layer's block is touched.
    """
    eps = cfg.norm_eps
    cached = self_cache is not None

    def sa(h):
        if cached:
            return mha_apply(p["sa"], cfg, h, attn_bias=attn_bias, cache=self_cache, cache_pos=pos,
                             cache_layer=cache_layer, pad_lens=pad_lens)
        return mha_apply(p["sa"], cfg, h, attn_bias=attn_bias, causal=True), None

    def ca(h):
        if cross_cache is not None:
            return mha_apply(p["ca"], cfg, h, cache=cross_cache)
        return mha_apply(p["ca"], cfg, h, memory)

    if cfg.pre_norm:
        out, new_cache = sa(layer_norm(p["sa_norm"], x, eps))
        x = x + out
        if cfg.cross_attn:
            x = x + ca(layer_norm(p["ca_norm"], x, eps))
        x = x + mlp_apply(p["mlp"], layer_norm(p["mlp_norm"], x, eps), cfg.act, cfg.tp_axis)
    else:
        out, new_cache = sa(x)
        x = layer_norm(p["sa_norm"], x + out, eps)
        if cfg.cross_attn:
            x = layer_norm(p["ca_norm"], x + ca(x), eps)
        x = layer_norm(p["mlp_norm"], x + mlp_apply(p["mlp"], x, cfg.act, cfg.tp_axis), eps)
    return (x, new_cache) if cached else x


# ---------------------------------------------------------------------------
# Stacks (ref transformer.py:133-176) — lax.scan over stacked layer params
# ---------------------------------------------------------------------------


def encoder_init(key, n_layers: int, cfg: LayerConfig) -> dict:
    keys = jax.random.split(key, n_layers)
    return {"layers": stack_layers([layer_init(k, cfg) for k in keys])}


def encoder_apply(p: dict, cfg: LayerConfig, x: jnp.ndarray, attn_bias=None) -> jnp.ndarray:
    def body(h, lp):
        return encoder_layer_apply(lp, cfg, h, attn_bias), None

    x, _ = lax.scan(body, x, p["layers"])
    return x


def decoder_init(key, n_layers: int, cfg: LayerConfig) -> dict:
    keys = jax.random.split(key, n_layers)
    return {"layers": stack_layers([layer_init(k, cfg) for k in keys])}


def decoder_apply(
    p: dict,
    cfg: LayerConfig,
    x: jnp.ndarray,
    memory: jnp.ndarray | None = None,
    self_caches: dict | None = None,
    cross_caches: dict | None = None,
    pos=None,
    attn_bias: jnp.ndarray | None = None,
    pad_lens: jnp.ndarray | None = None,
):
    """Threaded decoder stack (ref transformer.py:173-176), optionally KV-cached.

    ``self_caches``/``cross_caches`` hold per-layer caches stacked along a
    leading layer axis; returns ``(x, new_self_caches)`` when caching.
    """
    if self_caches is None:
        def body(h, lp):
            return decoder_layer_apply(lp, cfg, h, memory, attn_bias=attn_bias), None

        x, _ = lax.scan(body, x, p["layers"])
        return x

    # A LIST of per-layer caches selects the unrolled decode path: each layer's
    # cache is updated in place and read directly by attention — no
    # dynamic_index copy of the layer slice (the stacked/scan path below pays
    # one extra cache read+write per step).
    if isinstance(self_caches, (list, tuple)):
        n_layers = len(self_caches)
        new_caches = []
        for i in range(n_layers):
            lp = jax.tree.map(lambda a: a[i], p["layers"])
            cc = None if cross_caches is None else jax.tree.map(lambda a: a[i], cross_caches)
            x, new_c = decoder_layer_apply(lp, cfg, x, memory, self_cache=self_caches[i], cross_cache=cc,
                                           pos=pos, attn_bias=attn_bias, pad_lens=pad_lens)
            new_caches.append(new_c)
        return x, new_caches

    # Stacked caches ride in the scan CARRY and are updated with a small
    # dynamic_update_slice: XLA aliases loop carries in place, whereas
    # emitting them as scan ys would copy the ENTIRE cache every decode step
    # (measured 5x decode slowdown at GPT-2's 1024 context).
    n_layers = jax.tree_util.tree_leaves(p["layers"])[0].shape[0]
    xs = (p["layers"], jnp.arange(n_layers)) if cross_caches is None else (
        p["layers"], jnp.arange(n_layers), cross_caches)

    def body(carry, inp):
        h, caches = carry
        if cross_caches is None:
            lp, idx = inp
            cc = None
        else:
            lp, idx, cc = inp
        h, caches = decoder_layer_apply(lp, cfg, h, memory, self_cache=caches, cross_cache=cc, pos=pos,
                                        attn_bias=attn_bias, cache_layer=idx, pad_lens=pad_lens)
        return (h, caches), None

    (x, new_caches), _ = lax.scan(body, (x, self_caches), xs)
    return x, new_caches


def padded_cache_len(max_len: int) -> int:
    """KV-cache lengths are rounded up to a 128 multiple (>= the decode
    kernels' 32-key block, and divisible by the larger block sizes the fused
    step picks at small batch — ops/decode_step.py:_pick_kv_block).

    Slots beyond the true maximum are never attended (every read path masks
    by position), they just make the cache streamable by the Pallas kernels.
    """
    return -(-max_len // 128) * 128


def make_kv_cache(n_layers: int, batch_shape: tuple, n_heads: int, max_len: int, head_dim: int, dtype=jnp.float32,
                  stacked: bool = True):
    """Preallocate a zeroed merged-head KV cache ``(*batch, Lp, H*D)`` per layer:
    stacked along the layer axis (scan path) or as a list of per-layer caches
    (unrolled decode path)."""
    shape = (*batch_shape, padded_cache_len(max_len), n_heads * head_dim)
    if stacked:
        full = (n_layers, *shape)
        return {"k": jnp.zeros(full, dtype), "v": jnp.zeros(full, dtype)}
    return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)} for _ in range(n_layers)]


def precompute_cross_caches(p: dict, cfg: LayerConfig, memory: jnp.ndarray, valid_lens=None) -> dict:
    """Project encoder ``memory`` into every decoder layer's cross-attn K/V once.

    ``valid_lens`` (optional, (*batch,)) marks each row's count of valid
    memory positions (right-padded batches); defaults to the full length.
    """
    def body(carry, lp):
        return carry, mha_project_kv(lp["ca"], cfg, memory, valid_lens)

    _, caches = lax.scan(body, 0, p["layers"])
    return caches

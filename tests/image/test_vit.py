"""ViT parity tests (mirrors reference tests/image/test_vit.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_models_tpu.models.image import ViT
from tests.oracle import max_abs_diff, randn, require_reference, rng, t

TINY = dict(n_layers=2, d_model=64, n_heads=2, patch_size=16, img_size=64)


def test_forward():
    m = ViT(**TINY)
    out = m(randn(rng(), 2, 3, 64, 64))
    assert out.shape == (2, 64)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pool_types():
    x = randn(rng(1), 2, 3, 64, 64)
    for pool, cls in [("cls_token", True), ("gap", True), ("mha", False)]:
        m = ViT(**{**TINY, "pool_type": pool, "cls_token": cls})
        assert m(x).shape == (2, 64)


def test_resize_pe():
    m = ViT(**TINY)
    m.resize_pe(96)
    out = m(randn(rng(2), 1, 3, 96, 96))
    assert out.shape == (1, 64)


def test_jit_no_retrace():
    m = ViT(**TINY)
    x = jnp.asarray(randn(rng(3), 2, 3, 64, 64))
    from pytorch_models_tpu.models.image.vit import vit_apply

    m(x)
    n1 = vit_apply._cache_size()
    m(x)
    assert vit_apply._cache_size() == n1


def _make_timm_state_dict(r, n_layers, d, p, n_patches, layer_scale=True):
    """Synthetic deit3/timm-format checkpoint (keys per reference vit.py:257-304)."""
    s = 0.02
    sd = {
        "patch_embed.proj.weight": randn(r, d, 3, p, p, scale=s),
        "patch_embed.proj.bias": randn(r, d, scale=s),
        "pos_embed": randn(r, 1, n_patches + 1, d, scale=s),  # extra cls slot
        "cls_token": randn(r, 1, 1, d, scale=s),
        "norm.weight": 1 + randn(r, d, scale=s),
        "norm.bias": randn(r, d, scale=s),
    }
    for i in range(n_layers):
        pfx = f"blocks.{i}"
        sd.update(
            {
                f"{pfx}.norm1.weight": 1 + randn(r, d, scale=s),
                f"{pfx}.norm1.bias": randn(r, d, scale=s),
                f"{pfx}.norm2.weight": 1 + randn(r, d, scale=s),
                f"{pfx}.norm2.bias": randn(r, d, scale=s),
                f"{pfx}.attn.qkv.weight": randn(r, 3 * d, d, scale=s),
                f"{pfx}.attn.qkv.bias": randn(r, 3 * d, scale=s),
                f"{pfx}.attn.proj.weight": randn(r, d, d, scale=s),
                f"{pfx}.attn.proj.bias": randn(r, d, scale=s),
                f"{pfx}.mlp.fc1.weight": randn(r, 4 * d, d, scale=s),
                f"{pfx}.mlp.fc1.bias": randn(r, 4 * d, scale=s),
                f"{pfx}.mlp.fc2.weight": randn(r, d, 4 * d, scale=s),
                f"{pfx}.mlp.fc2.bias": randn(r, d, scale=s),
            }
        )
        if layer_scale:
            sd[f"{pfx}.gamma_1"] = 1 + randn(r, d, scale=s)
            sd[f"{pfx}.gamma_2"] = 1 + randn(r, d, scale=s)
    return sd


def test_facebook_parity():
    """Ours and the torch reference consume the same synthetic timm checkpoint."""
    pm = require_reference()
    import torch

    r = rng(42)
    n_layers, d, p, img = 2, 64, 16, 64
    n_patches = (img // p) ** 2
    sd = _make_timm_state_dict(r, n_layers, d, p, n_patches)

    ref = pm.image.ViT(n_layers, d, 2, p, img_size=img)
    ref.load_facebook_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()

    ours = ViT(n_layers, d, 2, p, img_size=img)
    ours.load_facebook_state_dict(sd)

    x = randn(r, 1, 3, img, img)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    actual = np.asarray(ours(x))
    assert max_abs_diff(expected, actual) < 2e-5


def _make_flax_augreg_dict(r, n_layers, d, n_heads, p, n_patches):
    """Synthetic AugReg .npz layout (keys per reference vit.py:161-197)."""
    s, hd = 0.02, d // n_heads
    w = {
        "cls": randn(r, 1, 1, d, scale=s),
        "Transformer/posembed_input/pos_embedding": randn(r, 1, n_patches + 1, d, scale=s),
        "embedding/kernel": randn(r, p, p, 3, d, scale=s),
        "embedding/bias": randn(r, d, scale=s),
        "Transformer/encoder_norm/scale": 1 + randn(r, d, scale=s),
        "Transformer/encoder_norm/bias": randn(r, d, scale=s),
    }
    for i in range(n_layers):
        blk = f"Transformer/encoderblock_{i}"
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            w[f"{blk}/{ln}/scale"] = 1 + randn(r, d, scale=s)
            w[f"{blk}/{ln}/bias"] = randn(r, d, scale=s)
        mha = f"{blk}/MultiHeadDotProductAttention_1"
        for proj in ("query", "key", "value"):
            w[f"{mha}/{proj}/kernel"] = randn(r, d, n_heads, hd, scale=s)
            w[f"{mha}/{proj}/bias"] = randn(r, n_heads, hd, scale=s)
        w[f"{mha}/out/kernel"] = randn(r, n_heads, hd, d, scale=s)
        w[f"{mha}/out/bias"] = randn(r, d, scale=s)
        w[f"{blk}/MlpBlock_3/Dense_0/kernel"] = randn(r, d, 4 * d, scale=s)
        w[f"{blk}/MlpBlock_3/Dense_0/bias"] = randn(r, 4 * d, scale=s)
        w[f"{blk}/MlpBlock_3/Dense_1/kernel"] = randn(r, 4 * d, d, scale=s)
        w[f"{blk}/MlpBlock_3/Dense_1/bias"] = randn(r, d, scale=s)
    return w


def test_flax_parity():
    """Flax .npz converter parity: reference's load_flax_* helpers vs ours."""
    pm = require_reference()
    import torch

    from pytorch_models.image.vit import load_flax_conv2d, load_flax_ln, load_flax_linear, load_flax_mha

    r = rng(7)
    n_layers, d, n_heads, p, img = 2, 64, 2, 16, 64
    n_patches = (img // p) ** 2
    w = _make_flax_augreg_dict(r, n_layers, d, n_heads, p, n_patches)

    ref = pm.image.ViT(n_layers, d, n_heads, p, img_size=img)
    tw = {k: t(v) for k, v in w.items()}
    with torch.no_grad():
        ref.cls_token.copy_(tw.pop("cls"))
        pe = tw.pop("Transformer/posembed_input/pos_embedding")
        ref.cls_token.add_(pe[:, 0])
        ref.pe.copy_(pe[:, 1:])
        load_flax_conv2d(ref.patch_embed, tw, "embedding")
        load_flax_ln(ref.norm, tw, "Transformer/encoder_norm")
        for i, layer in enumerate(ref.layers):
            blk = f"Transformer/encoderblock_{i}"
            load_flax_ln(layer.sa_norm, tw, f"{blk}/LayerNorm_0")
            load_flax_mha(layer.sa, tw, f"{blk}/MultiHeadDotProductAttention_1")
            load_flax_ln(layer.mlp_norm, tw, f"{blk}/LayerNorm_2")
            load_flax_linear(layer.mlp.linear1, tw, f"{blk}/MlpBlock_3/Dense_0")
            load_flax_linear(layer.mlp.linear2, tw, f"{blk}/MlpBlock_3/Dense_1")
    assert not tw
    ref.eval()

    ours = ViT(n_layers, d, n_heads, p, img_size=img)
    ours.load_flax_ckpt(w)

    x = randn(r, 1, 3, img, img)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    actual = np.asarray(ours(x))
    assert max_abs_diff(expected, actual) < 2e-5


def _make_flax_bigvision_dict(r, n_layers, d, n_heads, p, n_patches):
    """Synthetic big_vision/SigLIP .npz layout (ref vit.py:152-159,174,192-197)."""
    s, hd = 0.02, d // n_heads
    w = {
        "pos_embedding": randn(r, 1, n_patches, d, scale=s),
        "embedding/kernel": randn(r, p, p, 3, d, scale=s),
        "embedding/bias": randn(r, d, scale=s),
        "Transformer/encoder_norm/scale": 1 + randn(r, d, scale=s),
        "Transformer/encoder_norm/bias": randn(r, d, scale=s),
        "MAPHead_0/probe": randn(r, 1, 1, d, scale=s),
        "MAPHead_0/LayerNorm_0/scale": 1 + randn(r, d, scale=s),
        "MAPHead_0/LayerNorm_0/bias": randn(r, d, scale=s),
    }

    def mha(pfx):
        for proj in ("query", "key", "value"):
            w[f"{pfx}/{proj}/kernel"] = randn(r, d, n_heads, hd, scale=s)
            w[f"{pfx}/{proj}/bias"] = randn(r, n_heads, hd, scale=s)
        w[f"{pfx}/out/kernel"] = randn(r, n_heads, hd, d, scale=s)
        w[f"{pfx}/out/bias"] = randn(r, d, scale=s)

    mha("MAPHead_0/MultiHeadDotProductAttention_0")
    w["MAPHead_0/MlpBlock_0/Dense_0/kernel"] = randn(r, d, 4 * d, scale=s)
    w["MAPHead_0/MlpBlock_0/Dense_0/bias"] = randn(r, 4 * d, scale=s)
    w["MAPHead_0/MlpBlock_0/Dense_1/kernel"] = randn(r, 4 * d, d, scale=s)
    w["MAPHead_0/MlpBlock_0/Dense_1/bias"] = randn(r, d, scale=s)
    for i in range(n_layers):
        blk = f"Transformer/encoderblock_{i}"
        for ln in ("LayerNorm_0", "LayerNorm_1"):
            w[f"{blk}/{ln}/scale"] = 1 + randn(r, d, scale=s)
            w[f"{blk}/{ln}/bias"] = randn(r, d, scale=s)
        mha(f"{blk}/MultiHeadDotProductAttention_0")
        w[f"{blk}/MlpBlock_0/Dense_0/kernel"] = randn(r, d, 4 * d, scale=s)
        w[f"{blk}/MlpBlock_0/Dense_0/bias"] = randn(r, 4 * d, scale=s)
        w[f"{blk}/MlpBlock_0/Dense_1/kernel"] = randn(r, 4 * d, d, scale=s)
        w[f"{blk}/MlpBlock_0/Dense_1/bias"] = randn(r, d, scale=s)
    return w


def test_siglip_bigvision_parity():
    """big_vision layout + MHAPooling head (SigLIP) vs the torch reference."""
    pm = require_reference()
    import torch

    from pytorch_models.image.vit import MHAPooling, load_flax_conv2d, load_flax_ln, load_flax_linear, load_flax_mha

    r = rng(9)
    n_layers, d, n_heads, p, img = 2, 64, 2, 16, 64
    n_patches = (img // p) ** 2
    w = _make_flax_bigvision_dict(r, n_layers, d, n_heads, p, n_patches)

    ref = pm.image.ViT(n_layers, d, n_heads, p, img_size=img, cls_token=False, pool_type="mha")
    tw = {k: t(v) for k, v in w.items()}
    with torch.no_grad():
        ref.pe.copy_(tw.pop("pos_embedding"))
        load_flax_conv2d(ref.patch_embed, tw, "embedding")
        load_flax_ln(ref.norm, tw, "Transformer/encoder_norm")
        for i, layer in enumerate(ref.layers):
            blk = f"Transformer/encoderblock_{i}"
            load_flax_ln(layer.sa_norm, tw, f"{blk}/LayerNorm_0")
            load_flax_mha(layer.sa, tw, f"{blk}/MultiHeadDotProductAttention_0")
            load_flax_ln(layer.mlp_norm, tw, f"{blk}/LayerNorm_1")
            load_flax_linear(layer.mlp.linear1, tw, f"{blk}/MlpBlock_0/Dense_0")
            load_flax_linear(layer.mlp.linear2, tw, f"{blk}/MlpBlock_0/Dense_1")
        assert isinstance(ref.pooler, MHAPooling)
        ref.pooler.probe.copy_(tw.pop("MAPHead_0/probe"))
        load_flax_mha(ref.pooler.attn, tw, "MAPHead_0/MultiHeadDotProductAttention_0")
        load_flax_ln(ref.pooler.norm, tw, "MAPHead_0/LayerNorm_0")
        load_flax_linear(ref.pooler.mlp.linear1, tw, "MAPHead_0/MlpBlock_0/Dense_0")
        load_flax_linear(ref.pooler.mlp.linear2, tw, "MAPHead_0/MlpBlock_0/Dense_1")
    assert not tw
    ref.eval()

    ours = ViT(n_layers, d, n_heads, p, img_size=img, cls_token=False, pool_type="mha")
    ours.load_flax_ckpt(w, big_vision=True)

    x = randn(r, 1, 3, img, img)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    assert max_abs_diff(expected, np.asarray(ours(x))) < 2e-5


def test_strict_consumption():
    r = rng(5)
    sd = _make_timm_state_dict(r, 2, 64, 16, 16)
    sd["unexpected.key"] = randn(r, 3)
    m = ViT(2, 64, 2, 16, img_size=64)
    with pytest.raises(ValueError, match="unconsumed"):
        m.load_facebook_state_dict(sd)


def test_bf16_serving_mode():
    m = ViT(**TINY).to_bf16()
    out = m(randn(rng(6), 1, 3, 64, 64).astype(np.float32))
    assert bool(jnp.all(jnp.isfinite(out)))
    m.to_fp32()
    assert m.params["pe"].dtype == jnp.float32


def test_int8_quantization_conv_model():
    """int8 mode on a conv-bearing model: projections quantize, convs stay plain."""
    m = ViT(**TINY)
    x = randn(rng(8), 1, 3, 64, 64)
    ref_out = np.asarray(m(x))
    m.quantize_int8()
    assert isinstance(m.params["patch_embed"]["w"], jnp.ndarray)  # conv untouched
    assert isinstance(m.params["encoder"]["layers"]["sa"]["q"]["w"], dict)  # quantized
    q_out = np.asarray(m(x))
    assert np.abs(q_out - ref_out).max() < 0.1

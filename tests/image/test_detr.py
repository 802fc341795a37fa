"""DETR parity (mirrors reference tests/image/test_detr.py)."""

import numpy as np

from pytorch_models_tpu.models.image.detr import DETR, DETRPipeline
from tests.oracle import max_abs_diff, randn, require_reference, rng, t

TINY = dict(backbone_layers=[1, 1], d_model=64, n_classes=5, n_queries=10)


def _make_fb_detr_sd(r, backbone_layers, d_model, n_classes, n_queries):
    s = 0.05
    sd = {}

    def conv(pfx, cout, cin, k, bias=False):
        sd[f"{pfx}.weight"] = randn(r, cout, cin, k, k, scale=s)
        if bias:
            sd[f"{pfx}.bias"] = randn(r, cout, scale=s)

    def bn(pfx, c):
        sd[f"{pfx}.weight"] = 1 + randn(r, c, scale=s)
        sd[f"{pfx}.bias"] = randn(r, c, scale=s)
        sd[f"{pfx}.running_mean"] = randn(r, c, scale=s)
        sd[f"{pfx}.running_var"] = np.abs(randn(r, c, scale=s)) + 0.5

    def lin(pfx, cout, cin):
        sd[f"{pfx}.weight"] = randn(r, cout, cin, scale=s)
        sd[f"{pfx}.bias"] = randn(r, cout, scale=s)

    conv("backbone.0.body.conv1", 64, 3, 7)
    bn("backbone.0.body.bn1", 64)
    in_dim = 64
    for si, nl in enumerate(backbone_layers):
        out_dim = 256 * 2**si
        mid = out_dim // 4
        for bi in range(nl):
            pfx = f"backbone.0.body.layer{si + 1}.{bi}"
            conv(f"{pfx}.conv1", mid, in_dim if bi == 0 else out_dim, 1)
            bn(f"{pfx}.bn1", mid)
            conv(f"{pfx}.conv2", mid, mid, 3)
            bn(f"{pfx}.bn2", mid)
            conv(f"{pfx}.conv3", out_dim, mid, 1)
            bn(f"{pfx}.bn3", out_dim)
            if bi == 0:
                conv(f"{pfx}.downsample.0", out_dim, in_dim, 1)
                bn(f"{pfx}.downsample.1", out_dim)
        in_dim = out_dim

    conv("input_proj", d_model, in_dim, 1, bias=True)
    sd["query_embed.weight"] = randn(r, n_queries, d_model, scale=s)

    for side, n in (("encoder", 6), ("decoder", 6)):
        for i in range(n):
            pfx = f"transformer.{side}.layers.{i}"
            sd[f"{pfx}.self_attn.in_proj_weight"] = randn(r, 3 * d_model, d_model, scale=s)
            sd[f"{pfx}.self_attn.in_proj_bias"] = randn(r, 3 * d_model, scale=s)
            lin(f"{pfx}.self_attn.out_proj", d_model, d_model)
            lin(f"{pfx}.linear1", d_model * 8, d_model)
            lin(f"{pfx}.linear2", d_model, d_model * 8)
            for norm in (("norm1", "norm2") if side == "encoder" else ("norm1", "norm2", "norm3")):
                sd[f"{pfx}.{norm}.weight"] = 1 + randn(r, d_model, scale=s)
                sd[f"{pfx}.{norm}.bias"] = randn(r, d_model, scale=s)
            if side == "decoder":
                sd[f"{pfx}.multihead_attn.in_proj_weight"] = randn(r, 3 * d_model, d_model, scale=s)
                sd[f"{pfx}.multihead_attn.in_proj_bias"] = randn(r, 3 * d_model, scale=s)
                lin(f"{pfx}.multihead_attn.out_proj", d_model, d_model)

    sd["transformer.decoder.norm.weight"] = 1 + randn(r, d_model, scale=s)
    sd["transformer.decoder.norm.bias"] = randn(r, d_model, scale=s)
    lin("class_embed", n_classes + 1, d_model)
    lin("bbox_embed.layers.0", d_model, d_model)
    lin("bbox_embed.layers.1", d_model, d_model)
    lin("bbox_embed.layers.2", 4, d_model)
    return sd


def test_forward_two_sizes():
    """Shape robustness at 64 and 65 px (ref tests/image/test_detr.py:11-14)."""
    m = DETR(**TINY)
    for size in (64, 65):
        logits, boxes = m(randn(rng(), 1, 3, size, size))
        assert logits.shape == (1, 10, 6)
        assert boxes.shape == (1, 10, 4)


def _paired(r):
    pm = require_reference()
    sd = _make_fb_detr_sd(r, **TINY)
    ref = pm.image.DETR(**TINY)
    ref.load_facebook_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()
    ours = DETR(**TINY)
    ours.load_facebook_state_dict(sd)
    return pm, ref, ours


def test_facebook_parity():
    import torch

    r = rng(131)
    pm, ref, ours = _paired(r)
    x = randn(r, 1, 3, 64, 64)
    with torch.no_grad():
        exp_logits, exp_boxes = ref(t(x))
    logits, boxes = ours(x)
    assert max_abs_diff(exp_logits.numpy(), np.asarray(logits)) < 5e-5
    assert max_abs_diff(exp_boxes.numpy(), np.asarray(boxes)) < 2e-5


def test_pipeline():
    import torch

    r = rng(132)
    pm, ref, ours = _paired(r)
    imgs = [randn(r, 3, 48, 64, scale=0.25) + 0.5, randn(r, 3, 64, 48, scale=0.25) + 0.5]

    ref_pipe = pm.image.DETRPipeline(ref, threshold=0.1)
    with torch.no_grad():
        expected = ref_pipe([t(i) for i in imgs])
    actual = DETRPipeline(ours, threshold=0.1)(imgs)

    for (e_cls, e_box, e_p), (a_cls, a_box, a_p) in zip(expected, actual):
        assert list(e_cls) == list(a_cls)
        if len(e_cls):
            assert max_abs_diff(e_box.numpy(), a_box) < 2e-3  # pixel units
            assert max_abs_diff(e_p.numpy(), a_p) < 2e-5

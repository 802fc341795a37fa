"""MobileViT parity (mirrors reference tests/image/test_mobile_vit.py)."""

import numpy as np

from pytorch_models_tpu.models.image.mobile_vit import MobileViT
from tests.oracle import max_abs_diff, randn, require_reference, rng, t

TINY = dict(channels=[16, 24, 48, 64, 80], d_models=[64, 80, 96], out_dim=320, expansion=2)  # xxs


def _make_apple_sd(r, channels, d_models, out_dim, expansion):
    s = 0.05
    sd = {}

    def conv(pfx, cout, cin, k, groups=1, bias=False):
        sd[f"{pfx}.weight"] = randn(r, cout, cin // groups, k, k, scale=s)
        if bias:
            sd[f"{pfx}.bias"] = randn(r, cout, scale=s)

    def bn(pfx, c):
        sd[f"{pfx}.weight"] = 1 + randn(r, c, scale=s)
        sd[f"{pfx}.bias"] = randn(r, c, scale=s)
        sd[f"{pfx}.running_mean"] = randn(r, c, scale=s)
        sd[f"{pfx}.running_var"] = np.abs(randn(r, c, scale=s)) + 0.5
        sd[f"{pfx}.num_batches_tracked"] = np.array(1)

    def cna(pfx, cout, cin, k, groups=1):
        conv(f"{pfx}.block.conv", cout, cin, k, groups)
        bn(f"{pfx}.block.norm", cout)

    def mbconv(pfx, cin, cout, e):
        hid = cin * e
        cna(f"{pfx}.exp_1x1", hid, cin, 1)
        cna(f"{pfx}.conv_3x3", hid, hid, 3, groups=hid)
        cna(f"{pfx}.red_1x1", cout, hid, 1)

    def lin(pfx, cout, cin):
        sd[f"{pfx}.weight"] = randn(r, cout, cin, scale=s)
        sd[f"{pfx}.bias"] = randn(r, cout, scale=s)

    def ln(pfx, c):
        sd[f"{pfx}.weight"] = 1 + randn(r, c, scale=s)
        sd[f"{pfx}.bias"] = randn(r, c, scale=s)

    def vit_block(pfx, cin, d, n_layers):
        cna(f"{pfx}.local_rep.conv_3x3", cin, cin, 3)
        conv(f"{pfx}.local_rep.conv_1x1.block.conv", d, cin, 1)
        for i in range(n_layers):
            ln(f"{pfx}.global_rep.{i}.pre_norm_mha.0", d)
            lin(f"{pfx}.global_rep.{i}.pre_norm_mha.1.qkv_proj", 3 * d, d)
            lin(f"{pfx}.global_rep.{i}.pre_norm_mha.1.out_proj", d, d)
            ln(f"{pfx}.global_rep.{i}.pre_norm_ffn.0", d)
            lin(f"{pfx}.global_rep.{i}.pre_norm_ffn.1", d * 2, d)
            lin(f"{pfx}.global_rep.{i}.pre_norm_ffn.4", d, d * 2)
        ln(f"{pfx}.global_rep.{n_layers}", d)
        cna(f"{pfx}.conv_proj", cin, d, 1)
        cna(f"{pfx}.fusion", cin, cin * 2, 3)

    ch, dm, e = channels, d_models, expansion
    cna("conv_1", 16, 3, 3)
    mbconv("layer_1.0.block", 16, ch[0], e)
    mbconv("layer_2.0.block", ch[0], ch[1], e)
    mbconv("layer_2.1.block", ch[1], ch[1], e)
    mbconv("layer_2.2.block", ch[1], ch[1], e)
    mbconv("layer_3.0.block", ch[1], ch[2], e)
    vit_block("layer_3.1", ch[2], dm[0], 2)
    mbconv("layer_4.0.block", ch[2], ch[3], e)
    vit_block("layer_4.1", ch[3], dm[1], 4)
    mbconv("layer_5.0.block", ch[3], ch[4], e)
    vit_block("layer_5.1", ch[4], dm[2], 3)
    cna("conv_1x1_exp", out_dim, ch[4], 1)
    lin("classifier.fc", 10, out_dim)
    return sd


def test_forward():
    m = MobileViT(**TINY)
    assert m(randn(rng(), 2, 3, 64, 64)).shape == (2, 320)


def test_apple_parity():
    pm = require_reference()
    import torch

    r = rng(111)
    sd = _make_apple_sd(r, **TINY)

    ref = pm.image.MobileViT(**TINY)
    ref.load_apple_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()

    ours = MobileViT(**TINY)
    ours.load_apple_state_dict(sd)

    x = randn(r, 2, 3, 64, 64)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    actual = np.asarray(ours(x))
    assert max_abs_diff(expected, actual) < 2e-5

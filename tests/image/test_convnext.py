"""ConvNeXt parity tests (mirrors reference tests/image/test_convnext.py)."""

import numpy as np

from pytorch_models_tpu.models.image import ConvNeXt
from tests.oracle import max_abs_diff, randn, require_reference, rng, t

TINY = dict(d_model=16, depths=(2, 2))


def test_forward():
    m = ConvNeXt(**TINY)
    assert m(randn(rng(), 2, 3, 64, 64)).shape == (2, 32)


def _make_fb_state_dict(r, d_model, depths):
    s = 0.05
    sd = {
        "downsample_layers.0.0.weight": randn(r, d_model, 3, 4, 4, scale=s),
        "downsample_layers.0.0.bias": randn(r, d_model, scale=s),
        "downsample_layers.0.1.weight": 1 + randn(r, d_model, scale=s),
        "downsample_layers.0.1.bias": randn(r, d_model, scale=s),
    }
    d = d_model
    for i, depth in enumerate(depths):
        if i > 0:
            sd[f"downsample_layers.{i}.0.weight"] = 1 + randn(r, d, scale=s)
            sd[f"downsample_layers.{i}.0.bias"] = randn(r, d, scale=s)
            sd[f"downsample_layers.{i}.1.weight"] = randn(r, d * 2, d, 2, 2, scale=s)
            sd[f"downsample_layers.{i}.1.bias"] = randn(r, d * 2, scale=s)
            d *= 2
        for b in range(depth):
            pfx = f"stages.{i}.{b}"
            sd[f"{pfx}.dwconv.weight"] = randn(r, d, 1, 7, 7, scale=s)
            sd[f"{pfx}.dwconv.bias"] = randn(r, d, scale=s)
            sd[f"{pfx}.norm.weight"] = 1 + randn(r, d, scale=s)
            sd[f"{pfx}.norm.bias"] = randn(r, d, scale=s)
            sd[f"{pfx}.pwconv1.weight"] = randn(r, d * 4, d, scale=s)
            sd[f"{pfx}.pwconv1.bias"] = randn(r, d * 4, scale=s)
            sd[f"{pfx}.pwconv2.weight"] = randn(r, d, d * 4, scale=s)
            sd[f"{pfx}.pwconv2.bias"] = randn(r, d, scale=s)
            sd[f"{pfx}.gamma"] = randn(r, d, scale=s)
    sd["norm.weight"] = 1 + randn(r, d, scale=s)
    sd["norm.bias"] = randn(r, d, scale=s)
    return sd


def test_facebook_parity():
    pm = require_reference()
    import torch

    r = rng(21)
    sd = _make_fb_state_dict(r, **TINY)

    ref = pm.image.ConvNeXt(**TINY)
    ref.load_facebook_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()

    ours = ConvNeXt(**TINY)
    ours.load_facebook_state_dict(sd)

    x = randn(r, 2, 3, 64, 64)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    assert max_abs_diff(expected, np.asarray(ours(x))) < 2e-5

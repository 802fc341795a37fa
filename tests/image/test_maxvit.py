"""MaxViT parity (mirrors reference tests/image/test_maxvit.py)."""

import numpy as np

from pytorch_models_tpu.models.image.maxvit import MaxViT
from tests.oracle import max_abs_diff, randn, require_reference, rng, t

TINY = dict(stem_dim=32, n_blocks=[1, 1], dims=[32, 64])


class FakeTFReader:
    """Minimal stand-in for tf.train.load_checkpoint's reader API."""

    def __init__(self, variables: dict):
        self.variables = variables

    def get_variable_to_shape_map(self):
        return {k: list(v.shape) for k, v in self.variables.items()}

    def get_tensor(self, name):
        return self.variables[name]


def _make_tf_vars(r, stem_dim, n_blocks, dims, window=7, head_dim=32):
    s = 0.05
    v = {}

    def put(name, arr):
        v[f"maxvit/{name}/ExponentialMovingAverage"] = arr

    def conv(pfx, kh, kw, cin, cout, bias=True):
        put(f"{pfx}/kernel", randn(r, kh, kw, cin, cout, scale=s))
        if bias:
            put(f"{pfx}/bias", randn(r, cout, scale=s))

    def bn(pfx, c):
        put(f"{pfx}/gamma", 1 + randn(r, c, scale=s))
        put(f"{pfx}/beta", randn(r, c, scale=s))
        put(f"{pfx}/moving_mean", randn(r, c, scale=s))
        put(f"{pfx}/moving_variance", np.abs(randn(r, c, scale=s)) + 0.5)

    def ln(pfx, c):
        put(f"{pfx}/gamma", 1 + randn(r, c, scale=s))
        put(f"{pfx}/beta", randn(r, c, scale=s))

    def attn(pfx, d):
        h = d // head_dim
        put(f"{pfx}/relative_bias", randn(r, h, 2 * window - 1, 2 * window - 1, scale=s))
        for proj in ("q", "k", "v"):
            put(f"{pfx}/{proj}/weight", randn(r, d, h, head_dim, scale=s))
            put(f"{pfx}/{proj}/bias", randn(r, h, head_dim, scale=s))
        put(f"{pfx}/o/weight", randn(r, h, head_dim, d, scale=s))
        put(f"{pfx}/o/bias", randn(r, d, scale=s))

    conv("stem/conv_0", 3, 3, 3, stem_dim)
    bn("stem/norm_0", stem_dim)
    conv("stem/conv_1", 3, 3, stem_dim, stem_dim)

    in_dim = stem_dim
    for si, (nb, dim) in enumerate(zip(n_blocks, dims)):
        for bi in range(nb):
            pfx = f"block_{si:02d}_{bi:02d}"
            hid = dim * 4
            bn(f"{pfx}/mbconv/pre_norm", in_dim)
            conv(f"{pfx}/mbconv/expand_conv", 1, 1, in_dim, hid, bias=False)
            bn(f"{pfx}/mbconv/expand_norm", hid)
            put(f"{pfx}/mbconv/depthwise_conv/depthwise_kernel", randn(r, 3, 3, hid, 1, scale=s))
            bn(f"{pfx}/mbconv/depthwise_norm", hid)
            conv(f"{pfx}/mbconv/se/reduce_conv2d", 1, 1, hid, hid // 16)
            conv(f"{pfx}/mbconv/se/expand_conv2d", 1, 1, hid // 16, hid)
            conv(f"{pfx}/mbconv/shrink_conv", 1, 1, hid, dim)
            if in_dim != dim:
                conv(f"{pfx}/mbconv/shortcut_conv", 1, 1, in_dim, dim)
            for suffix in ("", "_1"):
                ln(f"{pfx}/attn_layer_norm{suffix}", dim)
                attn(f"{pfx}/attention{suffix}", dim)
                ln(f"{pfx}/ffn_layer_norm{suffix}", dim)
                put(f"{pfx}/ffn{suffix}/expand_dense/weight", randn(r, dim, dim * 4, scale=s))
                put(f"{pfx}/ffn{suffix}/expand_dense/bias", randn(r, dim * 4, scale=s))
                put(f"{pfx}/ffn{suffix}/shrink_dense/weight", randn(r, dim * 4, dim, scale=s))
                put(f"{pfx}/ffn{suffix}/shrink_dense/bias", randn(r, dim, scale=s))
            in_dim = dim
    ln("final_layer_norm", in_dim)
    return v


def test_forward():
    m = MaxViT(**TINY)
    assert m(randn(rng(), 1, 3, 56, 56)).shape == (1, 64)


def test_google_parity():
    pm = require_reference()
    import torch

    r = rng(121)
    variables = _make_tf_vars(r, **TINY)
    ours = MaxViT(**TINY)
    ours.load_google_state_dict(FakeTFReader(variables))

    ref = pm.image.MaxViT(**TINY)
    ref.load_google_state_dict(FakeTFReader(variables))  # ref calls torch.from_numpy on get_tensor
    ref.eval()

    x = randn(r, 1, 3, 56, 56)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    actual = np.asarray(ours(x))
    assert max_abs_diff(expected, actual) < 2e-5

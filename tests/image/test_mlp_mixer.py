"""MLP-Mixer parity tests (mirrors reference tests/image/test_mlp_mixer.py)."""

import numpy as np

from pytorch_models_tpu.models.image import MLPMixer
from tests.oracle import max_abs_diff, randn, require_reference, rng, t


def test_forward():
    m = MLPMixer(2, 64, 16, img_size=64)
    assert m(randn(rng(), 2, 3, 64, 64)).shape == (2, 64)


def _make_flax_mixer_dict(r, n_layers, d, n_tokens, mlp_ratio=(0.5, 4.0)):
    s = 0.02
    td, cd = int(d * mlp_ratio[0]), int(d * mlp_ratio[1])
    w = {
        "stem/kernel": randn(r, 16, 16, 3, d, scale=s),
        "stem/bias": randn(r, d, scale=s),
        "pre_head_layer_norm/scale": 1 + randn(r, d, scale=s),
        "pre_head_layer_norm/bias": randn(r, d, scale=s),
    }
    for i in range(n_layers):
        blk = f"MixerBlock_{i}"
        w[f"{blk}/LayerNorm_0/scale"] = 1 + randn(r, d, scale=s)
        w[f"{blk}/LayerNorm_0/bias"] = randn(r, d, scale=s)
        w[f"{blk}/token_mixing/Dense_0/kernel"] = randn(r, n_tokens, td, scale=s)
        w[f"{blk}/token_mixing/Dense_0/bias"] = randn(r, td, scale=s)
        w[f"{blk}/token_mixing/Dense_1/kernel"] = randn(r, td, n_tokens, scale=s)
        w[f"{blk}/token_mixing/Dense_1/bias"] = randn(r, n_tokens, scale=s)
        w[f"{blk}/LayerNorm_1/scale"] = 1 + randn(r, d, scale=s)
        w[f"{blk}/LayerNorm_1/bias"] = randn(r, d, scale=s)
        w[f"{blk}/channel_mixing/Dense_0/kernel"] = randn(r, d, cd, scale=s)
        w[f"{blk}/channel_mixing/Dense_0/bias"] = randn(r, cd, scale=s)
        w[f"{blk}/channel_mixing/Dense_1/kernel"] = randn(r, cd, d, scale=s)
        w[f"{blk}/channel_mixing/Dense_1/bias"] = randn(r, d, scale=s)
    return w


def test_google_parity(tmp_path):
    pm = require_reference()
    import torch

    r = rng(11)
    n_layers, d, p, img = 2, 64, 16, 64
    n_tokens = (img // p) ** 2
    w = _make_flax_mixer_dict(r, n_layers, d, n_tokens)

    path = tmp_path / "mixer.npz"
    np.savez(path, **w)
    ref = pm.image.MLPMixer(n_layers, d, p, img_size=img)
    ref.load_jax_weights(str(path))
    ref.eval()

    ours = MLPMixer(n_layers, d, p, img_size=img)
    ours.load_jax_weights(w)

    x = randn(r, 2, 3, img, img)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    assert max_abs_diff(expected, np.asarray(ours(x))) < 2e-5

"""Wav2Vec2-family parity (mirrors reference tests/audio/test_wav2vec2.py etc.)."""

import numpy as np
import pytest

from pytorch_models_tpu.models.audio import SEW, Data2VecAudio, Wav2Vec2
from tests.oracle import max_abs_diff, randn, require_reference, rng, t


def _conv(sd, r, pfx, out, inp, k, bias=True, s=0.05):
    sd[f"{pfx}.weight"] = randn(r, out, inp, k, scale=s)
    if bias:
        sd[f"{pfx}.bias"] = randn(r, out, scale=s)


def _lin(sd, r, pfx, out, inp, s=0.05):
    sd[f"{pfx}.weight"] = randn(r, out, inp, scale=s)
    sd[f"{pfx}.bias"] = randn(r, out, scale=s)


def _ln(sd, r, pfx, d, s=0.05):
    sd[f"{pfx}.weight"] = 1 + randn(r, d, scale=s)
    sd[f"{pfx}.bias"] = randn(r, d, scale=s)


def _encoder_keys(sd, r, n_layers, d):
    for i in range(n_layers):
        pfx = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _lin(sd, r, f"{pfx}.attention.{proj}", d, d)
        _ln(sd, r, f"{pfx}.layer_norm", d)
        _lin(sd, r, f"{pfx}.feed_forward.intermediate_dense", 4 * d, d)
        _lin(sd, r, f"{pfx}.feed_forward.output_dense", d, 4 * d)
        _ln(sd, r, f"{pfx}.final_layer_norm", d)


def _make_w2v2_sd(r, cls, n_layers, d, stem_bias=True, legacy=False, proj_key="feature_projection"):
    sd = {}
    in_dim = 1
    for i, (out, k) in enumerate(zip(cls.STEM_DIMS, cls.STEM_KERNELS)):
        pfx = f"feature_extractor.conv_layers.{i}"
        _conv(sd, r, f"{pfx}.conv", out, in_dim, k, bias=stem_bias)
        if (not legacy) or i == 0:
            _ln(sd, r, f"{pfx}.layer_norm", out)
        in_dim = out
    if proj_key == "feature_projection":
        _ln(sd, r, "feature_projection.layer_norm", in_dim)
        if in_dim != d:
            _lin(sd, r, "feature_projection.projection", d, in_dim)
    else:  # SEW naming
        _ln(sd, r, "layer_norm", in_dim)
        if in_dim != d:
            _lin(sd, r, "feature_projection", d, in_dim)
    k = cls.PE_KERNEL
    g = cls.PE_GROUPS
    if cls is Data2VecAudio:
        for i in range(5):
            _conv(sd, r, f"encoder.pos_conv_embed.layers.{i}.conv", d, d // g, k)
    else:
        sd["encoder.pos_conv_embed.conv.weight_g"] = 1 + randn(r, 1, 1, k, scale=0.05)
        sd["encoder.pos_conv_embed.conv.weight_v"] = randn(r, d, d // g, k, scale=0.05)
        sd["encoder.pos_conv_embed.conv.bias"] = randn(r, d, scale=0.05)
    _ln(sd, r, "encoder.layer_norm", d)
    _encoder_keys(sd, r, n_layers, d)
    if cls is SEW:
        _lin(sd, r, "encoder.upsample.projection", 2 * d, d)
    return sd


@pytest.mark.parametrize("legacy,pre_norm", [(False, True), (True, False)])
def test_wav2vec2_parity(legacy, pre_norm):
    pm = require_reference()
    import torch

    r = rng(81)
    n_layers, d = 2, 64
    sd = _make_w2v2_sd(r, Wav2Vec2, n_layers, d, legacy=legacy)

    ref = pm.audio.Wav2Vec2(n_layers, d, stem_legacy=legacy, pre_norm=pre_norm)
    ref.load_hf_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()

    ours = Wav2Vec2(n_layers, d, stem_legacy=legacy, pre_norm=pre_norm)
    ours.load_hf_state_dict(sd)

    x = randn(r, 2, 4000)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    actual = np.asarray(ours(x))
    assert expected.shape == actual.shape
    assert float(np.mean(np.abs(expected - actual))) < 2e-6
    assert max_abs_diff(expected, actual) < 2e-5


def test_sew_parity():
    pm = require_reference()
    import torch

    r = rng(82)
    n_layers, d = 2, 64
    sd = _make_w2v2_sd(r, SEW, n_layers, d, legacy=True, proj_key="sew")

    ref = pm.audio.SEW(n_layers, d)
    ref.load_hf_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()

    ours = SEW(n_layers, d)
    ours.load_hf_state_dict(sd)

    x = randn(r, 2, 4000)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    actual = np.asarray(ours(x))
    assert expected.shape == actual.shape
    assert max_abs_diff(expected, actual) < 2e-5


def test_data2vec_parity():
    pm = require_reference()
    import torch

    r = rng(83)
    n_layers, d = 2, 64
    sd = _make_w2v2_sd(r, Data2VecAudio, n_layers, d, stem_bias=False)

    ref = pm.audio.Data2VecAudio(n_layers, d)
    ref.load_hf_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()

    ours = Data2VecAudio(n_layers, d)
    ours.load_hf_state_dict(sd)

    x = randn(r, 2, 4000)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    actual = np.asarray(ours(x))
    assert expected.shape == actual.shape
    assert float(np.mean(np.abs(expected - actual))) < 2e-6

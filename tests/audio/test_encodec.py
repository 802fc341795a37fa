"""EnCodec parity (mirrors reference tests/audio/test_encodec.py).

The key pattern mirrors the reference's own state-dict round-trip test
(tests/audio/test_encodec.py:36-50): both models consume the same synthetic
facebook-format checkpoint, then codes and reconstructions must match.
"""

import numpy as np
import pytest

from pytorch_models_tpu.models.audio.encodec import EnCodec
from tests.oracle import max_abs_diff, randn, require_reference, rng, t


def _make_fb_encodec_sd(r, cfg_variant="24khz"):
    """Synthetic facebookresearch/encodec checkpoint (keys per ref encodec.py:238-248)."""
    audio_ch = 1 if cfg_variant == "24khz" else 2
    wn = cfg_variant == "24khz"
    nq = 32 if cfg_variant == "24khz" else 16
    s = 0.1
    sd = {}

    def conv(pfx, cout, cin, k, transpose=False):
        inner = "convtr.convtr" if transpose else "conv.conv"
        shape = (cin, cout, k) if transpose else (cout, cin, k)
        if wn:
            sd[f"{pfx}.{inner}.weight_g"] = 1 + randn(r, shape[0], 1, 1, scale=s)
            sd[f"{pfx}.{inner}.weight_v"] = randn(r, *shape, scale=s)
        else:
            sd[f"{pfx}.{inner}.weight"] = randn(r, *shape, scale=s)
            norm = "convtr.norm" if transpose else "conv.norm"
            sd[f"{pfx}.{norm}.weight"] = 1 + randn(r, cout, scale=s)
            sd[f"{pfx}.{norm}.bias"] = randn(r, cout, scale=s)
        sd[f"{pfx}.{inner}.bias"] = randn(r, cout, scale=s)

    def block(pfx, dim):
        conv(f"{pfx}.block.1", dim // 2, dim, 3)
        conv(f"{pfx}.block.3", dim, dim // 2, 1)
        conv(f"{pfx}.shortcut", dim, dim, 1)

    def lstm(pfx, dim):
        for i in range(2):
            sd[f"{pfx}.lstm.weight_ih_l{i}"] = randn(r, 4 * dim, dim, scale=s)
            sd[f"{pfx}.lstm.weight_hh_l{i}"] = randn(r, 4 * dim, dim, scale=s)
            sd[f"{pfx}.lstm.bias_ih_l{i}"] = randn(r, 4 * dim, scale=s)
            sd[f"{pfx}.lstm.bias_hh_l{i}"] = randn(r, 4 * dim, scale=s)

    strides = (2, 4, 5, 8)
    d = 32
    conv("encoder.model.0", d, audio_ch, 7)
    for i, st in enumerate(strides):
        block(f"encoder.model.{1 + 3 * i}", d)
        conv(f"encoder.model.{3 + 3 * i}", d * 2, d, st * 2)
        d *= 2
    lstm("encoder.model.13", d)
    conv("encoder.model.15", 128, d, 7)

    conv("decoder.model.0", d, 128, 7)
    lstm("decoder.model.1", d)
    for i, st in enumerate(strides[::-1]):
        conv(f"decoder.model.{3 + 3 * i}", d // 2, d, st * 2, transpose=True)
        block(f"decoder.model.{4 + 3 * i}", d // 2)
        d //= 2
    conv("decoder.model.15", audio_ch, d, 7)

    for i in range(nq):
        sd[f"quantizer.vq.layers.{i}._codebook.embed"] = randn(r, 1024, 128, scale=1.0)
    return sd


@pytest.mark.parametrize("variant", ["24khz", "48khz"])
def test_roundtrip_parity(variant):
    pm = require_reference()
    import torch

    r = rng(91)
    sd = _make_fb_encodec_sd(r, variant)

    ref = pm.audio.EnCodec.from_facebook(variant)
    ref.load_facebook_state_dict({k: t(v.copy()) for k, v in sd.items()})
    ref.eval()

    ours = EnCodec.from_facebook(variant)
    ours.load_facebook_state_dict(sd)

    ch = 1 if variant == "24khz" else 2
    x = randn(r, 2, ch, 2400, scale=0.5)

    with torch.no_grad():
        ref_codes, ref_scale = ref.encode(t(x))
        ref_out = ref.decode(ref_codes, ref_scale).numpy()

    codes, scale = ours.encode(x)
    assert codes.shape == tuple(ref_codes.shape)
    assert np.array_equal(np.asarray(codes), ref_codes.numpy()), "codes must match exactly"
    out = np.asarray(ours.decode(codes, scale))
    assert max_abs_diff(ref_out, out) < 1e-4


def test_n_quantizers_truncation():
    pm = require_reference()
    import torch

    r = rng(92)
    sd = _make_fb_encodec_sd(r, "24khz")
    ref = pm.audio.EnCodec.from_facebook("24khz")
    ref.load_facebook_state_dict({k: t(v.copy()) for k, v in sd.items()})
    ref.eval()
    ours = EnCodec.from_facebook("24khz")
    ours.load_facebook_state_dict(sd)

    x = randn(r, 1, 1, 2400, scale=0.5)
    with torch.no_grad():
        ref_codes, _ = ref.encode(t(x), n_quantizers=4)
    codes, _ = ours.encode(x, n_quantizers=4)
    assert codes.shape == tuple(ref_codes.shape) == (1, 4, ref_codes.shape[-1])
    assert np.array_equal(np.asarray(codes), ref_codes.numpy())

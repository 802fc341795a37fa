"""Spectrogram parity (mirrors reference tests/audio/test_spectrogram.py)."""

import numpy as np

from pytorch_models_tpu.models.audio import MelSpectrogram, Spectrogram
from tests.oracle import max_abs_diff, randn, require_reference, rng, t


def test_spectrogram_parity():
    pm = require_reference()
    import torch

    x = randn(rng(71), 4000)
    ref = pm.audio.spectrogram.Spectrogram(400, 160)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    actual = np.asarray(Spectrogram(400, 160)(x))
    assert expected.shape == actual.shape
    np.testing.assert_allclose(actual, expected, rtol=1e-5, atol=1e-5)


def test_melspectrogram_parity():
    pm = require_reference()
    import torch

    x = randn(rng(72), 4000)
    ref = pm.audio.spectrogram.MelSpectrogram(400, 160, 80, 16000)
    with torch.no_grad():
        expected = ref(t(x)).numpy()
    actual = np.asarray(MelSpectrogram(400, 160, 80, 16000)(x))
    assert expected.shape == actual.shape
    np.testing.assert_allclose(actual, expected, rtol=1e-5, atol=1e-5)


def test_batched():
    x = randn(rng(73), 2, 4000)
    out = MelSpectrogram(400, 160, 80, 16000)(x)
    assert out.shape[0] == 2

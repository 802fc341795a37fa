"""Fused log-mel kernel parity vs the XLA spectrogram path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pytorch_models_tpu.models.audio import MelSpectrogram
from pytorch_models_tpu.ops.mel import log_mel_spectrogram
from tests.oracle import randn, rng


def _xla_logmel(x):
    m = MelSpectrogram(400, 160, 80, 16000)(x)
    return jnp.log10(jnp.clip(m, 0, None))


def test_logmel_parity():
    x = randn(rng(141), 16000, scale=0.5)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(log_mel_spectrogram(x))
    ref = np.asarray(_xla_logmel(x))
    assert fused.shape == ref.shape
    # compare where the reference is finite (log10(0) rows are -inf in both)
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(fused))
    np.testing.assert_allclose(fused[finite], ref[finite], rtol=1e-4, atol=1e-4)


def test_logmel_batched():
    x = randn(rng(142), 2, 8000, scale=0.5)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(log_mel_spectrogram(x))
    assert fused.shape[0] == 2 and fused.shape[1] == 80

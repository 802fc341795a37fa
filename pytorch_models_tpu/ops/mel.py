"""Pallas fused log-mel frontend (SURVEY §2.7 N2).

Fuses the Whisper preprocessing hot path (reference audio/spectrogram.py:16,45
+ audio2text/whisper.py:143-148): windowing + real DFT + |·|² + mel filterbank
+ log10 run as one VMEM-resident kernel per frame block. The rFFT is computed
as two matmuls against DFT basis matrices with the Hann window folded in —
matmul is the TPU-native way to do small fixed-size FFTs (MXU work, no
scalar butterflies). The global dynamic-range clip needs an all-frame max and
stays outside (XLA fuses it with the final scale).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


from ..models.audio.spectrogram import frame_signal, get_mel_filters, hann_window

LANE = 128


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _dft_constants(n_fft: int, n_mels: int, sample_rate: int):
    """Windowed DFT bases (n_fft, n_freq_pad) and mel filters (n_freq_pad, n_mels_pad)."""
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    win = hann_window(n_fft).astype(np.float64)[:, None]
    w_re = (np.cos(ang) * win).astype(np.float32)
    w_im = (-np.sin(ang) * win).astype(np.float32)

    filters = get_mel_filters(n_mels, n_fft, sample_rate)  # (n_mels, n_freq)

    n_freq_p = _pad_to(n_freq, LANE)
    n_mels_p = _pad_to(n_mels, LANE)
    n_fft_p = _pad_to(n_fft, 8)
    w_re = np.pad(w_re, ((0, n_fft_p - n_fft), (0, n_freq_p - n_freq)))
    w_im = np.pad(w_im, ((0, n_fft_p - n_fft), (0, n_freq_p - n_freq)))
    filters_t = np.pad(filters.T, ((0, n_freq_p - n_freq), (0, n_mels_p - n_mels)))
    # cache NUMPY (not jnp): the first call may happen inside a jit trace, and
    # lru-caching traced constants leaks tracers into later calls
    return w_re, w_im, filters_t.astype(np.float32)


def _logmel_kernel(frames_ref, w_re_ref, w_im_ref, filt_ref, out_ref):
    f = frames_ref[:]  # (bf, n_fft_p)
    re = jax.lax.dot(f, w_re_ref[:], preferred_element_type=jnp.float32)
    im = jax.lax.dot(f, w_im_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jax.lax.dot(power, filt_ref[:], preferred_element_type=jnp.float32)
    # log10(clamp(x, 0)) — zeros produce -inf exactly like the reference
    out_ref[:] = jnp.log(jnp.maximum(mel, 0.0)) * jnp.float32(1.0 / math.log(10.0))


def log_mel_spectrogram(x, n_fft: int = 400, hop_length: int = 160, n_mels: int = 80,
                        sample_rate: int = 16_000, block_frames: int = 512):
    """(..., L) waveform -> (..., n_mels, n_frames) log10 mel power spectrogram.

    Matches ``MelSpectrogram(...)(x).clamp(0).log10()`` with torch.stft
    conventions (centered reflect pad, periodic Hann).
    """
    w_re, w_im, filt = _dft_constants(n_fft, n_mels, sample_rate)
    n_fft_p = w_re.shape[0]

    *batch, length = x.shape
    x = x.reshape(-1, length).astype(jnp.float32)
    frames = frame_signal(x, n_fft, hop_length)  # (B, F, n_fft)
    n_frames = frames.shape[1]

    b = frames.shape[0]
    flat = frames.reshape(b * n_frames, n_fft)
    total = flat.shape[0]
    bf = min(block_frames, _pad_to(total, 8))
    total_p = _pad_to(total, bf)
    flat = jnp.pad(flat, ((0, total_p - total), (0, n_fft_p - n_fft)))

    out = pl.pallas_call(
        _logmel_kernel,
        grid=(total_p // bf,),
        in_specs=[
            pl.BlockSpec((bf, n_fft_p), lambda i: (i, 0)),
            pl.BlockSpec(w_re.shape, lambda i: (0, 0)),
            pl.BlockSpec(w_im.shape, lambda i: (0, 0)),
            pl.BlockSpec(filt.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bf, filt.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((total_p, filt.shape[1]), jnp.float32),
    )(flat, w_re, w_im, filt)

    out = out[:total, :n_mels].reshape(b, n_frames, n_mels)
    out = jnp.swapaxes(out, -1, -2)  # (B, n_mels, F) like the reference
    return out.reshape(*batch, n_mels, n_frames)

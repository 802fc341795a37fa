"""Long-form (>30 s) transcription mechanics.

The reference has no transcription driver at all; these tests pin the
long-form windowing contract against the already-oracle-tested
single-segment paths: per-window outputs must be token-identical to
independent ``transcribe_tokens`` calls with the documented prompts
(fixed-size <|startofprev|> context in the conditioned mode).
"""

import numpy as np
import pytest

from pytorch_models_tpu.models.audio2text import Whisper, WhisperGenerator
from pytorch_models_tpu.models.audio2text.whisper import _strip_generated
from tests.oracle import randn, rng

TINY = dict(vocab_size=100, n_layers=2, d_model=64, n_mels=80)
SR = 16_000
INIT = [1, 2]
EOT = -1  # random weights: never emitted -> every window generates max_tokens
SOT_PREV = 3


@pytest.fixture(scope="module")
def gen():
    return WhisperGenerator(Whisper(**TINY))


def _windows(audio):
    n_w = max(1, -(-len(audio) // (30 * SR)))
    padded = np.zeros((n_w * 30 * SR,), np.float32)
    padded[: len(audio)] = audio
    return padded.reshape(n_w, 30 * SR)


def test_short_audio_single_window(gen):
    audio = randn(rng(1), 10 * SR, scale=0.1)
    long = gen.transcribe_long_tokens(audio, INIT, EOT, max_tokens=10)
    single = gen.transcribe_tokens(_windows(audio)[0], INIT, EOT, max_tokens=10)
    assert long == [_strip_generated(single, len(INIT), EOT)]


def test_unconditioned_matches_independent_windows(gen):
    audio = randn(rng(2), 75 * SR, scale=0.1)  # 3 windows, last padded
    long = gen.transcribe_long_tokens(audio, INIT, EOT, max_tokens=10, batch_size=2)
    assert len(long) == 3
    for out, w in zip(long, _windows(audio)):
        single = gen.transcribe_tokens(w, INIT, EOT, max_tokens=10)
        assert out == _strip_generated(single, len(INIT), EOT)


def test_conditioned_prompts_and_outputs(gen):
    """Sequential mode: window i's prompt is [sot_prev] + last ctx generated
    tokens + INIT once ctx tokens have accumulated, plain INIT before."""
    audio = randn(rng(3), 75 * SR, scale=0.1)
    ctx = 4
    long = gen.transcribe_long_tokens(audio, INIT, EOT, sot_prev_id=SOT_PREV,
                                      ctx_tokens=ctx, max_tokens=10)
    assert len(long) == 3
    accum = []
    for out, w in zip(long, _windows(audio)):
        if len(accum) >= ctx:
            prompt = [SOT_PREV] + accum[-ctx:] + INIT
        else:
            prompt = list(INIT)
        single = gen.transcribe_tokens(w, prompt, EOT, max_tokens=10)
        expect = _strip_generated(single, len(prompt), EOT)
        assert out == expect
        accum += expect
    # window 1 generates 10 - len(INIT) = 8 >= ctx tokens, so windows 2 and 3
    # must actually have been conditioned (different prompt -> the contract
    # above checked a [sot_prev]-prefixed prompt, not plain INIT)
    assert len(long[0]) >= ctx


def test_conditioning_changes_output(gen):
    """The conditioned and unconditioned transcripts must diverge on later
    windows (same audio, different prompts) — guards against the context
    being silently dropped."""
    audio = randn(rng(4), 65 * SR, scale=0.1)
    plain = gen.transcribe_long_tokens(audio, INIT, EOT, max_tokens=10)
    cond = gen.transcribe_long_tokens(audio, INIT, EOT, sot_prev_id=SOT_PREV,
                                      ctx_tokens=4, max_tokens=10)
    assert plain[0] == cond[0]  # first window has no context either way
    assert plain[1:] != cond[1:]


def test_eot_strip():
    assert _strip_generated([1, 2, 5, 6, 7], 2, 7) == [5, 6]
    assert _strip_generated([1, 2, 5, 6], 2, 7) == [5, 6]
    assert _strip_generated([1, 2], 2, 7) == []


def test_transcribe_long_requires_tokenizer(gen):
    with pytest.raises(ValueError, match="tokenizer"):
        gen.transcribe_long(np.zeros(SR, np.float32))

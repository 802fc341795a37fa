"""Whisper greedy speculative transcription must be token-identical to the
plain KV-cached greedy generator for ANY draft (accepted drafts equal the
target argmax by construction; the first mismatch is replaced by it). Pinned
with a different random draft, an identical draft, a smaller-architecture
draft (the realistic tiny-drafts-for-base shape), and an EOT-stopping run.
"""

import numpy as np
import pytest

from pytorch_models_tpu.audio2text import (
    SpeculativeWhisperGenerator,
    Whisper,
    WhisperGenerator,
)

TINY = dict(vocab_size=100, n_layers=2, d_model=64, n_mels=80)
SMALLER = dict(vocab_size=100, n_layers=1, d_model=64, n_mels=80)
INIT = [50, 51, 52]
EOT = 99


@pytest.fixture(scope="module")
def target():
    return Whisper(**TINY)


@pytest.fixture(scope="module")
def plain(target):
    return WhisperGenerator(target)


@pytest.fixture(scope="module")
def audio():
    return (np.random.default_rng(7).standard_normal(16000) * 0.1).astype(np.float32)


@pytest.mark.parametrize("k", [1, 3])
def test_matches_plain_greedy_random_draft(target, plain, audio, k):
    draft = Whisper(**TINY, rng=9)
    base = plain.transcribe_tokens(audio, INIT, EOT, max_tokens=32)
    spec = SpeculativeWhisperGenerator(target, draft, k=k).transcribe_tokens(
        audio, INIT, EOT, max_tokens=32)
    assert spec == base


def test_matches_plain_greedy_identical_draft(target, plain, audio):
    base = plain.transcribe_tokens(audio, INIT, EOT, max_tokens=24)
    spec = SpeculativeWhisperGenerator(target, target, k=4).transcribe_tokens(
        audio, INIT, EOT, max_tokens=24)
    assert spec == base


def test_smaller_draft_architecture(target, plain, audio):
    draft = Whisper(**SMALLER, rng=3)
    base = plain.transcribe_tokens(audio, INIT, EOT, max_tokens=32)
    spec = SpeculativeWhisperGenerator(target, draft, k=3).transcribe_tokens(
        audio, INIT, EOT, max_tokens=32)
    assert spec == base


def test_eot_stop_matches(target, plain, audio):
    """Use a mid-stream greedy token as EOT: both loops must stop at its
    first occurrence with identical output."""
    base_full = plain.transcribe_tokens(audio, INIT, EOT, max_tokens=32)
    eot = base_full[len(INIT) + 4]
    draft = Whisper(**TINY, rng=9)
    base = plain.transcribe_tokens(audio, INIT, eot, max_tokens=32)
    spec = SpeculativeWhisperGenerator(target, draft, k=3).transcribe_tokens(
        audio, INIT, eot, max_tokens=32)
    assert spec == base
    assert spec[-1] == eot and eot not in spec[len(INIT):-1]


def test_batch_matches_unbatched_per_segment(target, plain, audio):
    """Batched speculative transcription: every row must equal its own
    single-segment plain greedy transcription (per-row acceptance + EOT)."""
    draft = Whisper(**SMALLER, rng=3)
    gen = SpeculativeWhisperGenerator(target, draft, k=3)
    rng2 = np.random.default_rng(11)
    audios = [audio, (rng2.standard_normal(16000) * 0.1).astype(np.float32),
              (rng2.standard_normal(8000) * 0.2).astype(np.float32)]
    outs = gen.transcribe_tokens_batch(audios, INIT, EOT, max_tokens=24)
    for a, o in zip(audios, outs):
        assert o == plain.transcribe_tokens(a, INIT, EOT, max_tokens=24)


def test_truncated_draft_matches(target, plain, audio):
    """Honest draft built from the target's own first layer of both stacks
    (with_truncated_draft): still token-identical."""
    base = plain.transcribe_tokens(audio, INIT, EOT, max_tokens=32)
    gen = SpeculativeWhisperGenerator.with_truncated_draft(target, n_layers=1, k=3)
    assert gen.draft_model.cfg.n_layers == 1
    spec = gen.transcribe_tokens(audio, INIT, EOT, max_tokens=32)
    assert spec == base

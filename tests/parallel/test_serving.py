"""Tensor+data-parallel serving on the 8-device virtual CPU mesh.

The TP generator must reproduce the single-device generator token-for-token:
head sharding + two psums per layer is an exact refactoring of the math, not
an approximation.
"""

import jax
import pytest

from pytorch_models_tpu.parallel import make_mesh
from pytorch_models_tpu.parallel.serving import TPDecoderGenerator

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


class Tok:
    eos_token_id = 9


def _tiny_gpt2():
    from pytorch_models_tpu.models.text import GPT2

    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        return GPT2(2, 128)  # d_model 128 -> 2 heads
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024


PROMPTS = [[5, 6, 7], [11] * 40, [3, 4], [8, 2, 6, 1]]


def test_tp_generation_matches_single_device():
    from pytorch_models_tpu.models.text import DecoderGenerator

    m = _tiny_gpt2()
    baseline = DecoderGenerator(m, Tok()).generate_tokens_batch(PROMPTS, max_tokens=12)

    mesh = make_mesh(4, shape=(2, 2), axes=("dp", "tp"))
    tp_gen = TPDecoderGenerator(m, Tok(), mesh)
    assert tp_gen.generate_tokens_batch(PROMPTS, max_tokens=12) == baseline


def test_tp_only_mesh_matches_single_device():
    from pytorch_models_tpu.models.text import DecoderGenerator

    m = _tiny_gpt2()
    baseline = DecoderGenerator(m, Tok()).generate_tokens_batch(PROMPTS, max_tokens=6)

    mesh = make_mesh(2, shape=(1, 2), axes=("dp", "tp"))
    tp_gen = TPDecoderGenerator(m, Tok(), mesh)
    assert tp_gen.generate_tokens_batch(PROMPTS, max_tokens=6) == baseline


def test_tp_sampling_runs():
    m = _tiny_gpt2()
    mesh = make_mesh(4, shape=(2, 2), axes=("dp", "tp"))
    tp_gen = TPDecoderGenerator(m, Tok(), mesh)
    outs = tp_gen.generate_tokens_batch(PROMPTS, max_tokens=5, topk=3, seed=1)
    assert len(outs) == 4
    for p, o in zip(PROMPTS, outs):
        assert o[: len(p)] == p and len(o) <= len(p) + 5


def test_tp_t5_generation_matches_single_device():
    from pytorch_models_tpu.models.text.t5 import T5Generator, T5Model
    from pytorch_models_tpu.parallel.serving import TPT5Generator

    m = T5Model(vocab_size=100, dim=128, n_heads=2, n_layers=2, mlp_dim=256)
    prompts = [[7, 8, 9, 4], [5] * 9, [3, 2], [1, 2, 3]]
    baseline = T5Generator(model=m, tokenizer=object()).generate_tokens_batch(prompts, 10, 0, 1)

    mesh = make_mesh(4, shape=(2, 2), axes=("dp", "tp"))
    tp_gen = TPT5Generator(m, object(), mesh)
    assert tp_gen.generate_tokens_batch(prompts, 10, 0, 1) == baseline


def test_tp_whisper_transcription_matches_single_device():
    import numpy as np

    from pytorch_models_tpu.models.audio2text.whisper import Whisper, WhisperGenerator
    from pytorch_models_tpu.parallel.serving import TPWhisperGenerator

    m = Whisper(vocab_size=64, n_layers=2, d_model=128)  # 2 heads
    r = np.random.default_rng(0)
    audios = [r.standard_normal(16000 * 2).astype(np.float32) * 0.1 for _ in range(4)]
    init = [1, 2]
    baseline = WhisperGenerator(m).transcribe_tokens_batch(audios, init, eot_id=-1, max_tokens=8)

    mesh = make_mesh(4, shape=(2, 2), axes=("dp", "tp"))
    tp_gen = TPWhisperGenerator(m, mesh)
    assert tp_gen.transcribe_tokens_batch(audios, init, eot_id=-1, max_tokens=8) == baseline

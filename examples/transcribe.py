"""Whisper transcription: single segment, batched, long-form, speculative.

With --pretrained this downloads whisper-tiny + its BPE vocabulary and
prints text; otherwise random weights demonstrate the API on synthetic audio.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from examples._common import setup  # noqa: E402

args = setup(__doc__)

from pytorch_models_tpu.audio2text import (  # noqa: E402
    SpeculativeWhisperGenerator,
    Whisper,
    WhisperGenerator,
)

rng = np.random.default_rng(0)
audio = (rng.standard_normal(16000 * 45) * 0.1).astype(np.float32)  # 45 s

if args.pretrained:
    from pytorch_models_tpu.models.audio2text.tokenizer import WhisperTokenizer

    model = Whisper.from_openai("tiny", pretrained=True).to_bf16()
    gen = WhisperGenerator(model, WhisperTokenizer.from_openai("tiny"))
    print("single segment:", gen.transcribe(audio[: 16000 * 30]))
    print("long-form:     ", gen.transcribe_long(audio))
else:
    model = Whisper(vocab_size=100, n_layers=2, d_model=64, n_mels=80)
    gen = WhisperGenerator(model)
    INIT, EOT = [50, 51, 52], 99
    seg = audio[: 16000 * 30]
    print("single segment tokens:", gen.transcribe_tokens(seg, INIT, EOT, max_tokens=16))
    print("long-form windows:    ",
          [len(t) for t in gen.transcribe_long_tokens(audio, INIT, EOT, max_tokens=16)])

    # speculative: a smaller whisper drafts, the target verifies — exact
    draft = Whisper(vocab_size=100, n_layers=1, d_model=64, n_mels=80, rng=3)
    spec = SpeculativeWhisperGenerator(model, draft, k=4)
    print("speculative tokens:   ", spec.transcribe_tokens(seg, INIT, EOT, max_tokens=16))

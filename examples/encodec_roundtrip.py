"""EnCodec 24 kHz: waveform -> RVQ codes -> waveform."""

import sys

import numpy as np

sys.path.insert(0, ".")
from examples._common import setup  # noqa: E402

args = setup(__doc__)

from pytorch_models_tpu.audio import EnCodec  # noqa: E402

model = EnCodec.from_facebook("24khz", pretrained=args.pretrained)
audio = (np.random.default_rng(0).standard_normal((1, 1, 24000 * 2)) * 0.1).astype(np.float32)

codes, scale = model.encode(audio)
print("codes:", codes.shape, codes.dtype)  # (1, n_q, frames) int
out = model.decode(codes, scale)
print("reconstruction:", out.shape)

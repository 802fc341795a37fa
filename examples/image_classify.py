"""ViT image classification: from_google converter + bf16 serving cast."""

import sys

import numpy as np

sys.path.insert(0, ".")
from examples._common import setup  # noqa: E402

args = setup(__doc__)

from pytorch_models_tpu.image import ViT  # noqa: E402

# AugReg B/16: features (N, 768). Other loaders: from_google("B/16_siglip"),
# from_facebook_deit3 / _dino / _dinov2 — see models/image/vit.py.
model = ViT.from_google("B/16_augreg", pretrained=args.pretrained).to_bf16()

imgs = np.random.default_rng(0).standard_normal((8, 3, 224, 224)).astype(np.float32)
feats = model(imgs)
print("features:", feats.shape, feats.dtype)

model.resize_pe(448)  # bicubic position-embedding resize, like the reference
big = np.random.default_rng(1).standard_normal((2, 3, 448, 448)).astype(np.float32)
print("448px features:", model(big).shape)

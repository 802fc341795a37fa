from .convnext import ConvNeXt
from .mlp_mixer import MLPMixer
from .vit import ViT

__all__ = ["ConvNeXt", "MLPMixer", "ViT"]

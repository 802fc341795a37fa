from .convnext import ConvNeXt
from .detr import DETR, DETRPipeline
from .maxvit import MaxViT
from .mobile_vit import MobileViT
from .mlp_mixer import MLPMixer
from .vit import ViT

__all__ = ["ConvNeXt", "DETR", "DETRPipeline", "MaxViT", "MLPMixer", "MobileViT", "ViT"]

from .mesh import make_mesh
from .serving import TPDecoderGenerator
from .sharding import shard_decoder_lm_params

__all__ = ["make_mesh", "shard_decoder_lm_params", "TPDecoderGenerator"]

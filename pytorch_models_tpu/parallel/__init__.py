from .mesh import make_mesh
from .pp_serving import PPDecoderGenerator
from .tp_pp_serving import TPPPDecoderGenerator
from .serving import TPDecoderGenerator, TPT5Generator, TPWhisperGenerator
from .sharding import shard_decoder_lm_params

__all__ = ["make_mesh", "shard_decoder_lm_params", "PPDecoderGenerator", "TPPPDecoderGenerator", "TPDecoderGenerator", "TPT5Generator", "TPWhisperGenerator"]

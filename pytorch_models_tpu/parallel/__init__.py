from .mesh import make_mesh
from .pp_serving import PPDecoderGenerator
from .tp_pp_serving import TPPPDecoderGenerator
from .serving import TPDecoderGenerator, TPT5Generator, TPWhisperGenerator
from .cb_serving import TPContinuousBatchingGenerator
from .spec_serving import TPSpeculativeGenerator
from .sharding import shard_decoder_lm_params

__all__ = ["make_mesh", "shard_decoder_lm_params", "PPDecoderGenerator", "TPPPDecoderGenerator", "TPContinuousBatchingGenerator", "TPDecoderGenerator", "TPSpeculativeGenerator", "TPT5Generator", "TPWhisperGenerator"]

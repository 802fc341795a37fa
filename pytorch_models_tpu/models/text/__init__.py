from .bert import BERT
from .generator import DecoderGenerator
from .gpt import GPT
from .gpt2 import GPT2
from .t5 import T5Generator, T5Model

__all__ = ["BERT", "DecoderGenerator", "GPT", "GPT2", "T5Generator", "T5Model"]

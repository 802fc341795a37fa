from .tokenizer import WhisperTokenizer
from .whisper import (SpeculativeWhisperGenerator, Whisper, WhisperGenerator,
                      WhisperPreprocessor)

__all__ = ["SpeculativeWhisperGenerator", "Whisper", "WhisperGenerator",
           "WhisperPreprocessor", "WhisperTokenizer"]

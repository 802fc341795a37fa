"""The reference's public API surface must exist verbatim (BASELINE.json
north star: same from_<org> constructor API)."""

import inspect


def test_image_surface():
    from pytorch_models_tpu.image import DETR, DETRPipeline, MaxViT, MLPMixer, MobileViT, ViT

    assert callable(ViT.from_google) and callable(ViT.from_facebook)
    assert callable(ViT.resize_pe) and callable(ViT.load_flax_ckpt) and callable(ViT.load_facebook_state_dict)
    assert callable(MLPMixer.from_google) and callable(MLPMixer.load_jax_weights)
    assert callable(MobileViT.from_apple) and callable(MobileViT.load_apple_state_dict)
    assert callable(MaxViT.from_google) and callable(MaxViT.load_google_state_dict)
    assert callable(DETR.from_facebook) and callable(DETRPipeline.cxcywh_to_xyxy)
    assert len(DETRPipeline.COCO_CLASSES) == 91


def test_text_surface():
    from pytorch_models_tpu.text import BERT, GPT, GPT2, DecoderGenerator, T5Generator, T5Model

    assert callable(BERT.from_hf) and callable(BERT.load_hf_state_dict)
    assert callable(GPT.from_openai)
    assert callable(GPT2.from_hf) and callable(GPT2.load_hf_state_dict)
    assert GPT.vocab_size == 40478 and GPT.max_seq_len == 512
    assert GPT2.vocab_size == 50257 and GPT2.max_seq_len == 1024
    assert callable(T5Model.from_t5x) and callable(T5Model.get_tokenizer)
    assert {"encode", "decode"} <= set(dir(T5Model))
    assert callable(T5Generator.generate) and callable(DecoderGenerator.generate)
    sig = inspect.signature(DecoderGenerator.generate)
    assert list(sig.parameters)[:4] == ["self", "prompt", "max_tokens", "topk"]


def test_audio_surface():
    from pytorch_models_tpu.audio import SEW, Data2VecAudio, EnCodec, MelSpectrogram, Spectrogram, Wav2Vec2

    assert callable(Wav2Vec2.from_hf) and callable(Wav2Vec2.load_hf_state_dict)
    assert issubclass(SEW, Wav2Vec2) and issubclass(Data2VecAudio, Wav2Vec2)
    assert callable(EnCodec.from_facebook)
    assert {"encode", "decode"} <= set(dir(EnCodec))
    assert callable(Spectrogram) and callable(MelSpectrogram)


def test_audio2text_surface():
    from pytorch_models_tpu.audio2text import Whisper, WhisperGenerator, WhisperPreprocessor

    assert callable(Whisper.from_openai) and callable(Whisper.load_openai_state_dict)
    from pytorch_models_tpu.models.audio2text.whisper import VARIANTS

    assert set(VARIANTS) == {
        "tiny", "tiny.en", "base", "base.en", "small", "small.en",
        "medium", "medium.en", "large-v1", "large-v2", "large-v3",
    }
    assert callable(WhisperPreprocessor) and callable(WhisperGenerator.transcribe)


def test_variant_tables_match_reference():
    from pytorch_models_tpu.models.image.convnext import VARIANTS as CONVNEXT
    from pytorch_models_tpu.models.image.maxvit import VARIANTS as MAXVIT
    from pytorch_models_tpu.models.image.mobile_vit import VARIANTS as MOBILEVIT
    from pytorch_models_tpu.models.image.vit import SIZES as VIT
    from pytorch_models_tpu.models.text.gpt2 import VARIANTS as GPT2V
    from pytorch_models_tpu.models.text.t5 import SIZES as T5

    assert set(VIT) == {"Ti", "S", "M", "B", "L", "H"}
    assert set(CONVNEXT) == {"atto", "femto", "pico", "nano", "tiny", "small", "base", "large", "xlarge", "huge"}
    assert set(MAXVIT) == {"tiny", "small", "base", "large", "xlarge"}
    assert set(MOBILEVIT) == {"xxs", "xs", "s"}
    assert set(GPT2V) == {"gpt2", "gpt2-medium", "gpt2-large", "gpt2-xl"}
    assert set(T5) == {"small", "base", "large", "xl", "xxl"}

"""Backward trace-safety: ``jax.grad`` through every family's forward.

The reference's compile contract includes ``.sum().backward()`` even though
training is unsupported (reference tests/text/test_gpt2.py:21-25,
tests/audio/test_sew.py:21-24) — graphs must stay differentiable. The JAX
analogue: ``jax.grad(lambda p: apply(p, x).sum())(params)`` must trace,
compile, and produce finite gradients for every model family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle import randn, rng


def _grad_through(model, *args):
    """Differentiate sum-of-outputs w.r.t. the model's params by swapping the
    param tree (every ``__call__`` just threads ``self.params`` into a jitted
    functional apply, so a tracer tree passes straight through)."""
    orig = model.params

    def loss(p):
        model.params = p
        out = model(*args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                   if jnp.issubdtype(l.dtype, jnp.floating))

    try:
        grads = jax.grad(loss)(orig)
    finally:
        model.params = orig
    flat = [np.asarray(l) for l in jax.tree_util.tree_leaves(grads)
            if jnp.issubdtype(l.dtype, jnp.floating)]
    assert flat, "no floating gradient leaves"
    assert all(np.isfinite(a).all() for a in flat), "non-finite gradients"
    assert any(np.abs(a).sum() > 0 for a in flat), "all-zero gradients"


def _img(r, *shape):
    return randn(r, *shape)


def test_grad_vit():
    from pytorch_models_tpu.models.image.vit import ViT

    _grad_through(ViT(n_layers=2, d_model=64, n_heads=2, patch_size=16, img_size=64),
                  _img(rng(0), 2, 3, 64, 64))


def test_grad_mlp_mixer():
    from pytorch_models_tpu.models.image.mlp_mixer import MLPMixer

    _grad_through(MLPMixer(2, 64, 16, img_size=64), _img(rng(1), 2, 3, 64, 64))


def test_grad_convnext():
    from pytorch_models_tpu.models.image.convnext import ConvNeXt

    _grad_through(ConvNeXt(d_model=16, depths=(2, 2)), _img(rng(2), 2, 3, 64, 64))


def test_grad_mobile_vit():
    from pytorch_models_tpu.models.image.mobile_vit import MobileViT

    _grad_through(
        MobileViT(channels=[16, 24, 48, 64, 80], d_models=[64, 80, 96], out_dim=320, expansion=2),
        _img(rng(3), 2, 3, 64, 64))


def test_grad_maxvit():
    from pytorch_models_tpu.models.image.maxvit import MaxViT

    _grad_through(MaxViT(stem_dim=32, n_blocks=[1, 1], dims=[32, 64]),
                  _img(rng(4), 1, 3, 56, 56))


def test_grad_detr():
    from pytorch_models_tpu.models.image.detr import DETR

    _grad_through(DETR(backbone_layers=[1, 1], d_model=64, n_classes=5, n_queries=10),
                  _img(rng(5), 1, 3, 64, 64))


def test_grad_bert():
    from pytorch_models_tpu.models.text.bert import BERT

    _grad_through(BERT(2000, 2, 64), rng(6).integers(0, 2000, (2, 16)))


def test_grad_gpt():
    from pytorch_models_tpu.models.text.gpt import GPT

    GPT.vocab_size, GPT.max_seq_len = 128, 128
    try:
        m = GPT(2, 64)
    finally:
        GPT.vocab_size, GPT.max_seq_len = 40478, 512
    _grad_through(m, rng(7).integers(0, 128, (16,)))


def test_grad_gpt2():
    from pytorch_models_tpu.models.text.gpt2 import GPT2

    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        m = GPT2(2, 64)
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024
    _grad_through(m, rng(8).integers(0, 128, (16,)))


def test_grad_t5():
    from pytorch_models_tpu.models.text.t5 import T5Model

    r = rng(9)
    _grad_through(T5Model(vocab_size=100, dim=64, n_heads=2, n_layers=2, mlp_dim=128),
                  r.integers(0, 100, (2, 12)), r.integers(0, 100, (2, 7)))


@pytest.mark.parametrize("family", ["wav2vec2", "sew", "data2vec"])
def test_grad_wav2vec2_family(family):
    from pytorch_models_tpu.models.audio.data2vec_audio import Data2VecAudio
    from pytorch_models_tpu.models.audio.sew import SEW
    from pytorch_models_tpu.models.audio.wav2vec2 import Wav2Vec2

    cls = {"wav2vec2": Wav2Vec2, "sew": SEW, "data2vec": Data2VecAudio}[family]
    _grad_through(cls(2, 64), randn(rng(10), 1, 4000))


def test_grad_whisper():
    from pytorch_models_tpu.models.audio2text.whisper import Whisper

    r = rng(11)
    _grad_through(Whisper(vocab_size=100, n_layers=2, d_model=64, n_mels=80),
                  randn(r, 2, 80, 100), r.integers(0, 100, (2, 10)))


def test_grad_encodec_decoder():
    """EnCodec: the quantizer emits integer codes (no gradient path by
    construction — same in the torch reference), so the differentiability
    contract is over the decoder params given codes."""
    from pytorch_models_tpu.models.audio.encodec import EnCodec, encodec_decode

    m = EnCodec.from_facebook("24khz")
    codes, scale = m.encode(randn(rng(12), 1, 1, 2400))

    def loss(p):
        return jnp.sum(encodec_decode(p, m.cfg, codes, scale).astype(jnp.float32))

    grads = jax.grad(loss)(m.params)
    flat = [np.asarray(l) for l in jax.tree_util.tree_leaves(grads)
            if jnp.issubdtype(l.dtype, jnp.floating)]
    assert all(np.isfinite(a).all() for a in flat)
    assert any(np.abs(a).sum() > 0 for a in flat)

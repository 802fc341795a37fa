"""int8 self+cross KV in the whisper continuous-batching pool: the pool's
self caches quantize per admission (bf16 scratch prefill -> one commit) and
each segment's cross K/V quantizes once at admission — the plain generator's
quantization points — so pooled transcripts must be TOKEN-IDENTICAL to
``WhisperGenerator.transcribe_tokens`` under the same USE_INT8_KV /
USE_INT8_KV_CROSS flags (not to bf16; int8 changes numerics by design)."""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pytorch_models_tpu.audio2text import (
    Whisper,
    WhisperContinuousBatchingGenerator,
    WhisperGenerator,
)
from pytorch_models_tpu.ops import attention as attn_mod

INIT, EOT = [50, 51, 52], 99


@pytest.fixture(scope="module")
def model():
    # d_model must be a 128 multiple or fused_step_eligible rejects the
    # megakernel and the int8 pool silently degrades to bf16
    return Whisper(vocab_size=100, n_layers=2, d_model=128, n_mels=80)


@pytest.fixture(scope="module")
def audios():
    rng = np.random.default_rng(11)
    return [(rng.standard_normal(16000) * 0.1).astype(np.float32) for _ in range(4)]


def _int8(fn, self_kv=True, cross_kv=True):
    attn_mod.USE_FUSED_STEP = True
    attn_mod.USE_INT8_KV = self_kv
    attn_mod.USE_INT8_KV_CROSS = cross_kv
    try:
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            return fn()
    finally:
        attn_mod.USE_FUSED_STEP = None
        attn_mod.USE_INT8_KV = False
        attn_mod.USE_INT8_KV_CROSS = False
        jax.clear_caches()


def test_int8_pool_matches_plain_int8(model, audios):
    """Full int8 serving (self + cross) with mid-flight admissions over
    stale quantized state: every transcript matches the plain int8 loop."""
    from pytorch_models_tpu.models.audio2text.whisper import _whisper_fused_ok

    cb = WhisperContinuousBatchingGenerator(model, batch_size=2, check_every=4,
                                            pool_ctx=64)

    def run():
        # guard against vacuous coverage: the fused step must be eligible
        assert _whisper_fused_ok(model.params["decoder"], model.cfg, 64)
        return cb.transcribe_tokens_many(audios, INIT, EOT, max_tokens=14)

    outs = _int8(run)
    plain = WhisperGenerator(model)
    ref = _int8(lambda: [plain.transcribe_tokens(a, INIT, EOT, max_tokens=14)
                         for a in audios])
    assert outs == ref


def test_int8_cross_only_pool(model, audios):
    """Cross-only int8 (bf16 self pool): the independent-stream gating."""
    cb = WhisperContinuousBatchingGenerator(model, batch_size=2, check_every=5,
                                            pool_ctx=64)
    outs = _int8(lambda: cb.transcribe_tokens_many(audios[:3], INIT, EOT, max_tokens=12),
                 self_kv=False)
    plain = WhisperGenerator(model)
    ref = _int8(lambda: [plain.transcribe_tokens(a, INIT, EOT, max_tokens=12)
                         for a in audios[:3]], self_kv=False)
    assert outs == ref

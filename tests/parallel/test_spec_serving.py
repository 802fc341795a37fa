"""Tensor-parallel speculative serving on the 8-device virtual CPU mesh.

The tp-sharded target + replicated draft loop must reproduce the
single-device PLAIN greedy generator token-for-token (speculative exactness
composed with TP's two-psums-per-layer refactoring)."""

import jax
import pytest

from pytorch_models_tpu.parallel import make_mesh
from pytorch_models_tpu.parallel.spec_serving import TPSpeculativeGenerator

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


class Tok:
    eos_token_id = 9


def _tiny_gpt2(n_layers, rng=0):
    from pytorch_models_tpu.models.text import GPT2

    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        return GPT2(n_layers, 256, rng=rng)  # 4 heads
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024


@pytest.mark.parametrize("tp,k", [(2, 3), (4, 4)])
def test_tp_speculative_matches_single_device_greedy(tp, k):
    from pytorch_models_tpu.models.text import DecoderGenerator

    target, draft = _tiny_gpt2(4), _tiny_gpt2(2, rng=7)
    prompt = [5, 6, 7, 11, 2]
    ref = DecoderGenerator(target, Tok()).generate_tokens(prompt, max_tokens=16)

    mesh = make_mesh(tp, shape=(tp,), axes=("tp",))
    out = TPSpeculativeGenerator(target, draft, Tok(), mesh, k=k).generate_tokens(
        prompt, max_tokens=16)
    assert out == ref


def test_tp_speculative_identical_draft_and_eos():
    from pytorch_models_tpu.models.text import DecoderGenerator

    target = _tiny_gpt2(4)
    prompt = [5, 6, 7]
    base = DecoderGenerator(target, Tok()).generate_tokens(prompt, max_tokens=16)

    class TokEos:
        eos_token_id = base[3 + 5]

    ref = DecoderGenerator(target, TokEos()).generate_tokens(prompt, max_tokens=16)
    mesh = make_mesh(2, shape=(2,), axes=("tp",))
    out = TPSpeculativeGenerator(target, target, TokEos(), mesh, k=4).generate_tokens(
        prompt, max_tokens=16)
    assert out == ref


def test_draft_params_replicated_target_sharded():
    target, draft = _tiny_gpt2(4), _tiny_gpt2(2, rng=7)
    mesh = make_mesh(4, shape=(4,), axes=("tp",))
    gen = TPSpeculativeGenerator(target, draft, Tok(), mesh, k=4)
    qw = gen.params["decoder"]["layers"]["sa"]["q"]["w"]
    assert qw.sharding.shard_shape(qw.shape)[-1] == qw.shape[-1] // 4
    dqw = gen.draft_params["decoder"]["layers"]["sa"]["q"]["w"]
    assert dqw.sharding.shard_shape(dqw.shape) == dqw.shape  # replicated


def test_tp_speculative_mid_chunk_eos_truncates():
    """EOS landing MID-chunk (not at the bonus slot): the accepted chunk
    contains tokens past EOS on device; the host must trim to plain-loop
    parity. draft == target makes every draft accepted, so picking EOS two
    tokens into a chunk forces the overrun."""
    from pytorch_models_tpu.models.text import DecoderGenerator

    target = _tiny_gpt2(4)
    prompt = [5, 6, 7]
    base = DecoderGenerator(target, Tok()).generate_tokens(prompt, max_tokens=16)

    mesh = make_mesh(2, shape=(2,), axes=("tp",))
    for off in (1, 2, 3):  # sweep EOS positions across chunk offsets
        class TokEos:
            eos_token_id = base[3 + off]

        ref = DecoderGenerator(target, TokEos()).generate_tokens(prompt, max_tokens=16)
        out = TPSpeculativeGenerator(target, target, TokEos(), mesh, k=4).generate_tokens(
            prompt, max_tokens=16)
        assert out == ref, (off, out, ref)

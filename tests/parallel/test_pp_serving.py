"""Pipeline-parallel serving on the 8-device virtual CPU mesh.

Stage-sharded generation must reproduce the single-device generator
token-for-token: the stage loop + one-hot psum broadcast is an exact
refactoring of the layer stack, and each rank's caches only ever see the
activations of its own stage's tick.
"""

import jax
import pytest

from pytorch_models_tpu.parallel import make_mesh
from pytorch_models_tpu.parallel.pp_serving import PPDecoderGenerator

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


class Tok:
    eos_token_id = 9


def _tiny_gpt2(n_layers=4):
    from pytorch_models_tpu.models.text import GPT2

    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        return GPT2(n_layers, 128)
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_serving_matches_single_device(pp):
    from pytorch_models_tpu.models.text import DecoderGenerator

    m = _tiny_gpt2(n_layers=4)
    prompts = [[5, 6, 7], [9] * 20, [11, 12], [3] * 7]

    ref = DecoderGenerator(m, Tok()).generate_tokens_batch(prompts, max_tokens=8)

    mesh = make_mesh(pp, shape=(pp,), axes=("pp",))
    gen = PPDecoderGenerator(m, Tok(), mesh)
    out = gen.generate_tokens_batch(prompts, max_tokens=8)
    assert out == ref


def test_pp_cache_memory_is_stage_local():
    """Each rank's cache covers only n_layers/pp layers (the pp memory win)."""
    from pytorch_models_tpu.parallel.pp_serving import stage_stack

    m = _tiny_gpt2(n_layers=4)
    staged = stage_stack(m.params, 2)
    q = staged["decoder"]["layers"]["sa"]["q"]["w"]
    assert q.shape[:2] == (2, 2)  # (n_stages, layers_per_stage)

"""2D tensor x pipeline parallel serving on the 8-device virtual CPU mesh.

Stage- and head-sharded generation must reproduce the single-device
generator token-for-token: stage handoff is a one-hot psum over "pp", head
sharding adds two psums per layer over "tp", and each rank's caches hold
only its stage's layers and its shard of the heads.
"""

import jax
import numpy as np
import pytest

from pytorch_models_tpu.parallel import make_mesh
from pytorch_models_tpu.parallel.tp_pp_serving import (
    TPPPDecoderGenerator,
    tp_pp_param_pspecs,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


class Tok:
    eos_token_id = 9


def _tiny_gpt2(n_layers=4):
    from pytorch_models_tpu.models.text import GPT2

    GPT2.vocab_size, GPT2.max_seq_len = 128, 128
    try:
        return GPT2(n_layers, 256)  # 4 heads: divisible by tp in {2, 4}
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024


@pytest.mark.parametrize("pp,tp", [(2, 4), (4, 2), (2, 2)])
def test_tp_pp_serving_matches_single_device(pp, tp):
    from pytorch_models_tpu.models.text import DecoderGenerator

    m = _tiny_gpt2(n_layers=4)
    prompts = [[5, 6, 7], [9] * 20, [11, 12], [3] * 7]

    ref = DecoderGenerator(m, Tok()).generate_tokens_batch(prompts, max_tokens=8)

    mesh = make_mesh(pp * tp, shape=(pp, tp), axes=("pp", "tp"))
    gen = TPPPDecoderGenerator(m, Tok(), mesh)
    out = gen.generate_tokens_batch(prompts, max_tokens=8)
    assert out == ref


def test_tp_pp_cache_and_param_sharding():
    """Each rank holds 1/(pp*tp) of the layer weights: stage axis over pp,
    head/MLP split over tp (the 2D memory win)."""
    from pytorch_models_tpu.parallel.pp_serving import stage_stack

    m = _tiny_gpt2(n_layers=4)
    pp, tp = 2, 4
    mesh = make_mesh(pp * tp, shape=(pp, tp), axes=("pp", "tp"))
    gen = TPPPDecoderGenerator(m, Tok(), mesh)

    staged = stage_stack(m.params, pp)
    full = staged["decoder"]["layers"]["sa"]["q"]["w"]  # (pp, L/pp, d, hd)
    sharded = gen.params["decoder"]["layers"]["sa"]["q"]["w"]
    shard_shape = sharded.sharding.shard_shape(sharded.shape)
    assert shard_shape == (1, full.shape[1], full.shape[2], full.shape[3] // tp)

    # row-parallel o kernel splits the INPUT dim instead
    o = gen.params["decoder"]["layers"]["sa"]["o"]["w"]
    assert o.sharding.shard_shape(o.shape)[2] == o.shape[2] // tp

    # embeddings replicated
    emb = gen.params["token_embs"]
    assert emb.sharding.shard_shape(emb.shape) == emb.shape


def test_tp_pp_eos_stops_early():
    from pytorch_models_tpu.models.text import DecoderGenerator

    m = _tiny_gpt2(n_layers=4)
    base = DecoderGenerator(m, Tok()).generate_tokens_batch([[5, 6, 7]], max_tokens=12)[0]

    class TokEos:
        eos_token_id = base[3 + 4]  # 5th generated token

    ref = DecoderGenerator(m, TokEos()).generate_tokens_batch(
        [[5, 6, 7], [9] * 11], max_tokens=12)
    mesh = make_mesh(4, shape=(2, 2), axes=("pp", "tp"))
    out = TPPPDecoderGenerator(m, TokEos(), mesh).generate_tokens_batch(
        [[5, 6, 7], [9] * 11], max_tokens=12)
    assert out == ref


def test_dp_pp_tp_3d_mesh_matches_single_device():
    """Full 3D serving: batch rows over dp, stages over pp, heads over tp."""
    from pytorch_models_tpu.models.text import DecoderGenerator

    m = _tiny_gpt2(n_layers=4)
    prompts = [[5, 6, 7], [9] * 20, [11, 12], [3] * 7]
    ref = DecoderGenerator(m, Tok()).generate_tokens_batch(prompts, max_tokens=8)

    mesh = make_mesh(8, shape=(2, 2, 2), axes=("dp", "pp", "tp"))
    out = TPPPDecoderGenerator(m, Tok(), mesh).generate_tokens_batch(prompts, max_tokens=8)
    assert out == ref

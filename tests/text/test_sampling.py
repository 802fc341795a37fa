"""Top-p (nucleus) + temperature sampling — extensions beyond the reference
(reference text/generator.py:26-31 supports greedy/top-k only).

Correctness pins:
- the nucleus mask keeps exactly the smallest prefix of the sorted
  distribution whose mass reaches top_p (crossing token included);
- tiny top_p degenerates to greedy token-for-token (single + batch paths);
- draws land inside the nucleus/top-k support, never outside;
- low temperature concentrates sampling onto the argmax.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_models_tpu.models.text._decoder_lm import DecoderLMConfig, decoder_lm_init
from pytorch_models_tpu.models.text.generator import _nucleus_mask, _sample
from pytorch_models_tpu.text import DecoderGenerator


class _Tok:
    eos_token_id = -1

    def encode(self, s):
        return [3, 1, 4, 1, 5]

    def decode(self, ids):
        return " ".join(map(str, ids))


@pytest.fixture(scope="module")
def gen():
    cfg = DecoderLMConfig(vocab_size=512, max_seq_len=128, n_layers=2,
                          d_model=128, pre_norm=True, final_norm=True)
    params = decoder_lm_init(jax.random.PRNGKey(0), cfg)
    return DecoderGenerator(SimpleNamespace(cfg=cfg, params=params), _Tok())


def test_nucleus_mask_exact_prefix():
    # probs (desc): [0.4, 0.3, 0.2, 0.1]; top_p=0.65 keeps {0.4, 0.3}
    probs = np.array([0.4, 0.3, 0.2, 0.1])
    vals = jnp.asarray(np.log(probs))
    masked = np.asarray(_nucleus_mask(vals, 0.65))
    assert np.allclose(masked[:2], np.log(probs[:2]))
    assert (masked[2:] < -1e30).all()
    # the crossing token is kept: top_p=0.5 keeps {0.4, 0.3} too (0.4 < 0.5)
    masked = np.asarray(_nucleus_mask(vals, 0.5))
    assert np.isfinite(masked[:2]).all() and (masked[2:] < -1e30).all()
    # top_p <= smallest head prob keeps exactly the argmax
    masked = np.asarray(_nucleus_mask(vals, 0.4))
    assert np.isfinite(masked[0]) and (masked[1:] < -1e30).all()


def test_sample_draws_stay_in_nucleus():
    probs = np.array([0.35, 0.25, 0.2, 0.1, 0.06, 0.04])
    logits = jnp.asarray(np.log(probs))
    draws = {int(_sample(logits, jax.random.PRNGKey(i), 1, top_p=0.75)) for i in range(64)}
    assert draws <= {0, 1, 2}  # cum-prob prefix 0.35/0.60/0.80 → nucleus = first 3
    assert len(draws) > 1  # it's actually sampling, not argmax


def test_sample_topk_and_topp_combined():
    probs = np.array([0.35, 0.25, 0.2, 0.1, 0.06, 0.04])
    logits = jnp.asarray(np.log(probs))
    draws = {int(_sample(logits, jax.random.PRNGKey(i), 2, top_p=0.99)) for i in range(64)}
    assert draws <= {0, 1}  # top-k=2 restricts support before the nucleus


def test_low_temperature_is_argmax():
    logits = jnp.asarray(np.array([0.0, 0.5, 1.0, 0.2]))
    draws = {int(_sample(logits, jax.random.PRNGKey(i), 4, temperature=1e-3))
             for i in range(32)}
    assert draws == {2}


def test_batched_sample_shape():
    logits = jax.random.normal(jax.random.PRNGKey(0), (5, 64))
    out = _sample(logits, jax.random.PRNGKey(1), 1, top_p=0.9)
    assert out.shape == (5,) and out.dtype == jnp.int32


def test_tiny_topp_matches_greedy_single(gen):
    base = gen.generate_tokens([3, 1, 4, 1, 5], max_tokens=16)
    nuc = gen.generate_tokens([3, 1, 4, 1, 5], max_tokens=16, top_p=1e-6)
    assert nuc == base


def test_tiny_topp_matches_greedy_batch(gen):
    prompts = [[3, 1, 4], [2, 7, 1, 8, 2, 8], [5]]
    base = gen.generate_tokens_batch(prompts, max_tokens=12)
    nuc = gen.generate_tokens_batch(prompts, max_tokens=12, top_p=1e-6)
    assert nuc == base


def test_topp_generation_varies_with_seed(gen):
    # random-init tied-embedding logits are near-one-hot; T=50 flattens them
    # so the nucleus is wide and seeds actually diverge
    outs = {tuple(gen.generate_tokens([3, 1, 4, 1, 5], max_tokens=16, top_p=0.99,
                                      temperature=50.0, seed=s)) for s in range(4)}
    assert len(outs) > 1


def test_invalid_args_raise(gen):
    with pytest.raises(AssertionError):
        gen.generate_tokens([1], max_tokens=4, top_p=0.0)
    with pytest.raises(AssertionError):
        gen.generate_tokens([1], max_tokens=4, top_p=1.5)
    with pytest.raises(AssertionError):
        gen.generate_tokens([1], max_tokens=4, temperature=0.0)
    with pytest.raises(AssertionError):
        gen.generate_tokens_batch([[1]], max_tokens=4, topk=0)

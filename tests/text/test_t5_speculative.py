"""Seq2seq greedy speculative decoding must be token-identical to the plain
T5 greedy generator for ANY draft: accepted drafts equal the target argmax by
construction, the first mismatch is replaced by it. Pinned with a different
random draft (low acceptance), an identical draft (full acceptance), an
EOS-stopping run, and a differing-size draft (the realistic serving shape).
"""

import jax
import pytest

from pytorch_models_tpu.models.text.t5 import ENC_BUCKET
from pytorch_models_tpu.text import SpeculativeT5Generator, T5Generator, T5Model

TINY = dict(vocab_size=100, dim=64, n_heads=2, n_layers=2, mlp_dim=128)
SMALLER = dict(vocab_size=100, dim=32, n_heads=1, n_layers=1, mlp_dim=64)
PAD, EOS = 0, 1
PROMPT = [(i % 97) + 2 for i in range(20)]


@pytest.fixture(scope="module")
def target():
    return T5Model(**TINY)


@pytest.fixture(scope="module")
def plain(target):
    return T5Generator(model=target, tokenizer=object())


@pytest.mark.parametrize("k", [1, 3, 4])
def test_matches_plain_greedy_random_draft(target, plain, k):
    draft = T5Model(**TINY, rng=7)
    base = plain.generate_tokens(PROMPT, 24, PAD, EOS)
    spec = SpeculativeT5Generator(target, draft, object(), k=k).generate_tokens(
        PROMPT, 24, PAD, EOS)
    assert spec == base


def test_matches_plain_greedy_identical_draft(target, plain):
    base = plain.generate_tokens(PROMPT, 20, PAD, EOS)
    spec = SpeculativeT5Generator(target, target, object(), k=4).generate_tokens(
        PROMPT, 20, PAD, EOS)
    assert spec == base


def test_smaller_draft_architecture(target, plain):
    """Draft with different depth/width/head-count (the realistic shape:
    t5-small drafting for t5-large) — exactness must be architecture-blind."""
    draft = T5Model(**SMALLER, rng=3)
    base = plain.generate_tokens(PROMPT, 24, PAD, EOS)
    spec = SpeculativeT5Generator(target, draft, object(), k=3).generate_tokens(
        PROMPT, 24, PAD, EOS)
    assert spec == base


def test_eos_stop_matches(target, plain):
    """Use a mid-stream greedy token as EOS: both loops must stop at its
    first occurrence with identical output."""
    base_full = plain.generate_tokens(PROMPT, 24, PAD, EOS)
    eos = base_full[6]  # the 5th generated token (index 0 is the pad start)
    draft = T5Model(**TINY, rng=7)
    base = plain.generate_tokens(PROMPT, 24, PAD, eos)
    spec = SpeculativeT5Generator(target, draft, object(), k=3).generate_tokens(
        PROMPT, 24, PAD, eos)
    assert spec == base
    assert spec[-1] == eos and eos not in spec[1:-1]


def test_budget_cap_matches(target, plain):
    """No EOS fires (EOS outside the greedy stream): both loops must emit
    exactly max_tokens rows (pad + max_tokens-1 generated)."""
    base = plain.generate_tokens(PROMPT, 16, PAD, EOS)
    if base[-1] == EOS:  # extremely unlikely with random weights; keep honest
        pytest.skip("random model emitted EOS")
    spec = SpeculativeT5Generator(target, T5Model(**TINY, rng=7), object(), k=4)
    out = spec.generate_tokens(PROMPT, 16, PAD, EOS)
    assert out == base and len(out) == 16


@pytest.mark.parametrize("k", [2, 4])
def test_batch_matches_unbatched_per_row(target, plain, k):
    """Batched seq2seq speculative rows (differing encoder lengths, per-row
    acceptance/EOS) must each equal the plain greedy decode of that row."""
    draft = T5Model(**TINY, rng=7)
    gen = SpeculativeT5Generator(target, draft, object(), k=k)
    rows = [PROMPT, [(i % 89) + 3 for i in range(9)], [(i % 50) + 2 for i in range(33)]]
    outs = gen.generate_tokens_batch(rows, 20, PAD, EOS)
    for r, o in zip(rows, outs):
        assert o == plain.generate_tokens(r, 20, PAD, EOS)


def test_batch_identical_draft(target, plain):
    gen = SpeculativeT5Generator(target, target, object(), k=3)
    rows = [PROMPT, [(i % 11) + 2 for i in range(5)]]
    outs = gen.generate_tokens_batch(rows, 16, PAD, EOS)
    for r, o in zip(rows, outs):
        assert o == plain.generate_tokens(r, 16, PAD, EOS)


def test_truncated_draft_matches(target, plain):
    """Honest draft built from the target's own first layer of both stacks
    (with_truncated_draft): still token-identical."""
    base = plain.generate_tokens(PROMPT, 24, PAD, EOS)
    gen = SpeculativeT5Generator.with_truncated_draft(target, object(), 1, k=3)
    assert gen.draft_model.cfg.n_layers == 1
    spec = gen.generate_tokens(PROMPT, 24, PAD, EOS)
    assert spec == base

"""GPT-2 parity + greedy decode tests (mirrors reference tests/text/test_gpt2.py)."""

import numpy as np
import pytest

import pytorch_models_tpu.models.text.gpt2 as gpt2_mod
from pytorch_models_tpu.models.text import GPT2, DecoderGenerator
from tests.oracle import max_abs_diff, randn, require_reference, rng, t


@pytest.fixture()
def tiny_vocab(monkeypatch):
    """Shrink the class-level vocab/ctx so tiny tests stay fast (ref uses full size)."""
    monkeypatch.setattr(GPT2, "vocab_size", 128)
    monkeypatch.setattr(GPT2, "max_seq_len", 128)


def _make_hf_gpt2_state_dict(r, vocab, max_len, n_layers, d):
    s = 0.02
    sd = {
        "wte.weight": randn(r, vocab, d, scale=s),
        "wpe.weight": randn(r, max_len, d, scale=s),
        "ln_f.weight": 1 + randn(r, d, scale=s),
        "ln_f.bias": randn(r, d, scale=s),
    }
    for i in range(n_layers):
        pfx = f"h.{i}"
        sd[f"{pfx}.ln_1.weight"] = 1 + randn(r, d, scale=s)
        sd[f"{pfx}.ln_1.bias"] = randn(r, d, scale=s)
        sd[f"{pfx}.ln_2.weight"] = 1 + randn(r, d, scale=s)
        sd[f"{pfx}.ln_2.bias"] = randn(r, d, scale=s)
        sd[f"{pfx}.attn.c_attn.weight"] = randn(r, d, 3 * d, scale=s)  # HF Conv1D: (in, out)
        sd[f"{pfx}.attn.c_attn.bias"] = randn(r, 3 * d, scale=s)
        sd[f"{pfx}.attn.c_proj.weight"] = randn(r, d, d, scale=s)
        sd[f"{pfx}.attn.c_proj.bias"] = randn(r, d, scale=s)
        sd[f"{pfx}.mlp.c_fc.weight"] = randn(r, d, 4 * d, scale=s)
        sd[f"{pfx}.mlp.c_fc.bias"] = randn(r, 4 * d, scale=s)
        sd[f"{pfx}.mlp.c_proj.weight"] = randn(r, 4 * d, d, scale=s)
        sd[f"{pfx}.mlp.c_proj.bias"] = randn(r, d, scale=s)
    return sd


def _paired_models(r, n_layers=2, d=64, vocab=128, max_len=128):
    pm = require_reference()
    sd = _make_hf_gpt2_state_dict(r, vocab, max_len, n_layers, d)

    old = (pm.text.GPT2.vocab_size, pm.text.GPT2.max_seq_len)
    pm.text.GPT2.vocab_size, pm.text.GPT2.max_seq_len = vocab, max_len
    try:
        ref = pm.text.GPT2(n_layers, d)
    finally:
        pm.text.GPT2.vocab_size, pm.text.GPT2.max_seq_len = old
    ref.load_hf_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()

    ours = GPT2(n_layers, d)
    ours.load_hf_state_dict(sd)
    return ref, ours


def test_forward(tiny_vocab):
    m = GPT2(2, 64)
    tokens = rng().integers(0, 128, (16,))
    assert m(tokens).shape == (16, 128)
    assert m(tokens[None]).shape == (1, 16, 128)


def test_hf_parity(tiny_vocab):
    import torch

    r = rng(41)
    ref, ours = _paired_models(r)
    tokens = r.integers(0, 128, (16,))
    with torch.no_grad():
        expected = ref(t(tokens.astype(np.int64))).numpy()
    assert max_abs_diff(expected, np.asarray(ours(tokens))) < 1e-5


class FakeTokenizer:
    eos_token_id = 0

    def encode(self, prompt):
        return [int(c) + 1 for c in prompt]

    def decode(self, tokens):
        return ",".join(str(t) for t in tokens)


def test_greedy_decode_matches_reference(tiny_vocab):
    """KV-cached greedy decode == reference full-reforward greedy decode."""
    pm = require_reference()

    r = rng(43)
    ref, ours = _paired_models(r)
    tok = FakeTokenizer()

    ref_gen = pm.text.DecoderGenerator(ref, tok)
    our_gen = DecoderGenerator(ours, tok)

    prompt = "3141592653"
    expected = ref_gen.generate(prompt, max_tokens=20)
    actual = our_gen.generate(prompt, max_tokens=20)
    assert actual == expected


def test_topk_sampling_valid(tiny_vocab):
    r = rng(44)
    _, ours = _paired_models(r)
    gen = DecoderGenerator(ours, FakeTokenizer())
    out = gen.generate_tokens([5, 6, 7], max_tokens=10, topk=5, seed=1)
    assert out[:3] == [5, 6, 7]
    assert 3 < len(out) <= 13
    assert all(0 <= t < 128 for t in out)


def test_batched_generation_matches_single(tiny_vocab):
    """Batched left-padded decode == per-prompt single decode, row by row."""
    r = rng(45)
    _, ours = _paired_models(r)
    gen = DecoderGenerator(ours, FakeTokenizer())

    prompts = [[5, 6, 7], [9, 8, 7, 6, 5, 4], [3]]
    singles = [gen.generate_tokens(p, max_tokens=12) for p in prompts]
    batched = gen.generate_tokens_batch(prompts, max_tokens=12)
    assert batched == singles


def test_score_tokens_matches_reference(tiny_vocab):
    """Teacher-forced log-probs == torch log_softmax over the reference's
    logits, per position; batched rows match their single-row scores."""
    import torch

    r = rng(47)
    ref, ours = _paired_models(r)
    gen = DecoderGenerator(ours, FakeTokenizer())

    seqs = [[5, 6, 7, 8, 9, 10], [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]]
    for seq in seqs:
        with torch.no_grad():
            lg = ref(t(np.asarray(seq, np.int64)))
            exp = torch.log_softmax(lg[:-1].float(), -1)
            exp = exp[np.arange(len(seq) - 1), seq[1:]].numpy()
        got = np.asarray(gen.score_tokens(seq))
        np.testing.assert_allclose(got, exp, atol=1e-5)

    batched = gen.score_tokens_batch(seqs)
    singles = [gen.score_tokens(s) for s in seqs]
    for b_row, s_row in zip(batched, singles):
        np.testing.assert_allclose(b_row, s_row, atol=1e-6)

    ppl = gen.perplexity("3141")
    assert np.isfinite(ppl) and ppl > 0


def test_int8_weight_only_quantization(tiny_vocab):
    """Weight-only int8 decode stays close to fp32 and runs end to end."""
    r = rng(46)
    _, ours = _paired_models(r)
    tokens = r.integers(0, 128, (16,))
    ref_logits = np.asarray(ours(tokens))

    ours.quantize_int8()
    q_logits = np.asarray(ours(tokens))
    assert q_logits.shape == ref_logits.shape
    # int8 weights + bf16 compute: small logit drift, same argmax almost everywhere
    agree = (q_logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    assert agree >= 0.9, agree

    gen = DecoderGenerator(ours, FakeTokenizer())
    out = gen.generate_tokens([5, 6, 7], max_tokens=8)
    assert len(out) >= 4

"""GPT-1 parity tests (mirrors reference tests/text/test_gpt.py)."""

import numpy as np
import pytest

from pytorch_models_tpu.models.text import GPT, DecoderGenerator
from tests.oracle import max_abs_diff, randn, require_reference, rng, t


@pytest.fixture()
def tiny_vocab(monkeypatch):
    monkeypatch.setattr(GPT, "vocab_size", 128)
    monkeypatch.setattr(GPT, "max_seq_len", 128)


def _make_openai_params(r, n_layers, d, vocab=128, max_len=128):
    """Synthetic OpenAI shard param list (layout per reference gpt.py:55-84)."""
    s = 0.02
    params = [randn(r, max_len, d, scale=s), randn(r, vocab, d, scale=s)]
    for _ in range(n_layers):
        params += [
            randn(r, 1, d, 3 * d, scale=s),  # fused qkv kernel
            randn(r, 3 * d, scale=s),
            randn(r, 1, d, d, scale=s),  # out proj
            randn(r, d, scale=s),
            1 + randn(r, d, scale=s),  # sa_norm
            randn(r, d, scale=s),
            randn(r, 1, d, 4 * d, scale=s),  # fc1
            randn(r, 4 * d, scale=s),
            randn(r, 1, 4 * d, d, scale=s),  # fc2
            randn(r, d, scale=s),
            1 + randn(r, d, scale=s),  # mlp_norm
            randn(r, d, scale=s),
        ]
    return params


def _load_reference_gpt(pm, params, n_layers, d, vocab, max_len):
    """Replicates the reference's from_openai param mapping (gpt.py:55-84)."""
    import torch

    old = (pm.text.GPT.vocab_size, pm.text.GPT.max_seq_len)
    pm.text.GPT.vocab_size, pm.text.GPT.max_seq_len = vocab, max_len
    try:
        ref = pm.text.GPT(n_layers, d)
    finally:
        pm.text.GPT.vocab_size, pm.text.GPT.max_seq_len = old

    tp = [t(p) for p in params]
    n = 12
    with torch.no_grad():
        ref.pos_embs.copy_(tp[0])
        ref.token_embs.weight[: tp[1].shape[0]] = tp[1]
        for i, layer in enumerate(ref.layers):
            w_q, w_k, w_v = tp[2 + i * n].squeeze(0).chunk(3, -1)
            layer.sa.q_proj.weight.copy_(w_q.T)
            layer.sa.k_proj.weight.copy_(w_k.T)
            layer.sa.v_proj.weight.copy_(w_v.T)
            b_q, b_k, b_v = tp[3 + i * n].chunk(3, -1)
            layer.sa.q_proj.bias.copy_(b_q)
            layer.sa.k_proj.bias.copy_(b_k)
            layer.sa.v_proj.bias.copy_(b_v)
            layer.sa.out_proj.weight.copy_(tp[4 + i * n].squeeze(0).T)
            layer.sa.out_proj.bias.copy_(tp[5 + i * n])
            layer.sa_norm.weight.copy_(tp[6 + i * n])
            layer.sa_norm.bias.copy_(tp[7 + i * n])
            layer.mlp.linear1.weight.copy_(tp[8 + i * n].squeeze(0).T)
            layer.mlp.linear1.bias.copy_(tp[9 + i * n])
            layer.mlp.linear2.weight.copy_(tp[10 + i * n].squeeze(0).T)
            layer.mlp.linear2.bias.copy_(tp[11 + i * n])
            layer.mlp_norm.weight.copy_(tp[12 + i * n])
            layer.mlp_norm.bias.copy_(tp[13 + i * n])
    ref.eval()
    return ref


def test_forward(tiny_vocab):
    m = GPT(2, 64)
    tokens = rng().integers(0, 128, (16,))
    assert m(tokens).shape == (16, 128)


def test_openai_parity(tiny_vocab):
    pm = require_reference()
    import torch

    r = rng(51)
    n_layers, d = 2, 64
    params = _make_openai_params(r, n_layers, d)
    ref = _load_reference_gpt(pm, params, n_layers, d, 128, 128)

    ours = GPT(n_layers, d)
    # exercise the real shard-reassembly path: flatten + split into 10 shards
    shapes = [list(p.shape) for p in params]
    flat = np.concatenate([p.reshape(-1) for p in params])
    shards = np.array_split(flat, 10)
    ours.load_openai_params(shapes, shards)

    tokens = r.integers(0, 128, (16,))
    with torch.no_grad():
        expected = ref(t(tokens.astype(np.int64))).numpy()
    assert max_abs_diff(expected, np.asarray(ours(tokens))) < 1e-5


def test_greedy_decode_matches_reference(tiny_vocab):
    pm = require_reference()

    r = rng(53)
    n_layers, d = 2, 64
    params = _make_openai_params(r, n_layers, d)
    ref = _load_reference_gpt(pm, params, n_layers, d, 128, 128)
    ours = GPT(n_layers, d)
    shapes = [list(p.shape) for p in params]
    flat = np.concatenate([p.reshape(-1) for p in params])
    ours.load_openai_params(shapes, np.array_split(flat, 10))

    from tests.text.test_gpt2 import FakeTokenizer

    tok = FakeTokenizer()
    expected = pm.text.DecoderGenerator(ref, tok).generate("271828", max_tokens=15)
    actual = DecoderGenerator(ours, tok).generate("271828", max_tokens=15)
    assert actual == expected

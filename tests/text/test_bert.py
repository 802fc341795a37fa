"""BERT parity tests (mirrors reference tests/text/test_bert.py)."""

import numpy as np

from pytorch_models_tpu.models.text import BERT
from tests.oracle import max_abs_diff, randn, require_reference, rng, t


def test_forward():
    m = BERT(2000, 2, 64)
    tokens = rng().integers(0, 2000, (2, 16))
    assert m(tokens).shape == (2, 16, 64)
    assert m(tokens[0]).shape == (16, 64)  # unbatched


def _make_hf_bert_state_dict(r, vocab, n_layers, d, max_len, roberta=False):
    s = 0.02
    root = "roberta." if roberta else "bert."
    sd = {
        f"{root}embeddings.word_embeddings.weight": randn(r, vocab, d, scale=s),
        f"{root}embeddings.position_embeddings.weight": randn(r, max_len + (2 if roberta else 0), d, scale=s),
        f"{root}embeddings.token_type_embeddings.weight": randn(r, 2, d, scale=s),
        f"{root}embeddings.LayerNorm.weight": 1 + randn(r, d, scale=s),
        f"{root}embeddings.LayerNorm.bias": randn(r, d, scale=s),
    }
    for i in range(n_layers):
        pfx = f"{root}encoder.layer.{i}"
        for name, shape in [
            ("attention.self.query", (d, d)),
            ("attention.self.key", (d, d)),
            ("attention.self.value", (d, d)),
            ("attention.output.dense", (d, d)),
            ("intermediate.dense", (4 * d, d)),
            ("output.dense", (d, 4 * d)),
        ]:
            sd[f"{pfx}.{name}.weight"] = randn(r, *shape, scale=s)
            sd[f"{pfx}.{name}.bias"] = randn(r, shape[0], scale=s)
        for name in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[f"{pfx}.{name}.weight"] = 1 + randn(r, d, scale=s)
            sd[f"{pfx}.{name}.bias"] = randn(r, d, scale=s)
    return sd


def test_hf_parity():
    pm = require_reference()
    import torch

    r = rng(31)
    vocab, n_layers, d, max_len = 100, 2, 64, 64
    sd = _make_hf_bert_state_dict(r, vocab, n_layers, d, max_len)

    ref = pm.text.BERT(vocab, n_layers, d, max_seq_len=max_len)
    ref.load_hf_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()

    ours = BERT(vocab, n_layers, d, max_seq_len=max_len)
    ours.load_hf_state_dict(sd)

    tokens = r.integers(0, vocab, (2, 16))
    with torch.no_grad():
        expected = ref(t(tokens.astype(np.int64))).numpy()
    assert max_abs_diff(expected, np.asarray(ours(tokens))) < 1e-5


def test_roberta_pe_strip():
    """RoBERTa: first 2 PE rows stripped (ref bert.py:89-90)."""
    pm = require_reference()
    import torch

    r = rng(33)
    vocab, n_layers, d, max_len = 100, 1, 64, 32
    sd = _make_hf_bert_state_dict(r, vocab, n_layers, d, max_len, roberta=True)

    ref = pm.text.BERT(vocab, n_layers, d, max_seq_len=max_len)
    ref.load_hf_state_dict({k: t(v) for k, v in sd.items()})
    ref.eval()

    ours = BERT(vocab, n_layers, d, max_seq_len=max_len)
    ours.load_hf_state_dict(sd)

    tokens = r.integers(0, vocab, (1, 8))
    with torch.no_grad():
        expected = ref(t(tokens.astype(np.int64))).numpy()
    assert max_abs_diff(expected, np.asarray(ours(tokens))) < 1e-5

"""GPT2Tokenizer: BPE round-trip + HF vocab.json loading (synthetic ranks).

Real-table goldens (exact ids vs ``transformers``) live in
tests/pretrained/test_real_checkpoints.py (network, opt-in).
"""

import json

from pytorch_models_tpu.models.text import GPT2Tokenizer
from pytorch_models_tpu.models.text.tokenizer import _bytes_to_unicode


def synthetic_ranks():
    # all 256 single bytes, then a few merges — enough for a working BPE
    ranks = {bytes([i]): i for i in range(256)}
    for merge in (b"he", b"ll", b"hell", b"o ", b"th", b"the"):
        ranks[merge] = len(ranks)
    return ranks


def test_round_trip():
    tok = GPT2Tokenizer(synthetic_ranks())
    for text in ("hello world", "the theme", "  spaces  and\ttabs\n", "ünïcödé"):
        assert tok.decode(tok.encode(text)) == text


def test_special_token_layout():
    tok = GPT2Tokenizer(synthetic_ranks())
    n = len(synthetic_ranks())
    assert tok.eos_token_id == n
    assert tok.n_vocab == n + 1
    assert tok.encode("<|endoftext|>", allow_special=True) == [n]
    assert tok.decode([ord("h"), n]) == "h"  # specials skipped by default


def test_from_hf_files_matches_direct(tmp_path):
    ranks = synthetic_ranks()
    b2u = _bytes_to_unicode()
    vocab = {"".join(b2u[b] for b in tok): idx for tok, idx in ranks.items()}
    vocab["<|endoftext|>"] = len(ranks)
    path = tmp_path / "vocab.json"
    path.write_text(json.dumps(vocab), encoding="utf-8")

    tok = GPT2Tokenizer.from_hf_files(str(path))
    direct = GPT2Tokenizer(ranks)
    text = "hello the world"
    assert tok.encode(text) == direct.encode(text)
    assert tok.eos_token_id == direct.eos_token_id


def test_generator_protocol():
    """Duck-types into DecoderGenerator: encode -> generate -> decode."""
    import jax

    jax.clear_caches()
    from pytorch_models_tpu.models.text import GPT2, DecoderGenerator

    GPT2.vocab_size, GPT2.max_seq_len = 263, 64
    try:
        m = GPT2(1, 64)
    finally:
        GPT2.vocab_size, GPT2.max_seq_len = 50257, 1024
    gen = DecoderGenerator(m, GPT2Tokenizer(synthetic_ranks()))
    out = gen.generate("hello", max_tokens=4)
    assert isinstance(out, str)

"""GPT-2 byte-level BPE tokenizer (standalone — no ``transformers`` needed).

The reference's ``DecoderGenerator`` expects the caller to supply an HF
tokenizer (reference text/generator.py:13-20, tests/text/test_gpt2.py:38-45);
this module completes the serving story natively. The rank table is the
public ``gpt2.tiktoken`` asset (identical base vocabulary to HF's
vocab.json/merges.txt — 50256 ranks + ``<|endoftext|>`` = id 50256); the BPE
engine is ``tiktoken`` (baked into this environment). Also loads HF-format
``vocab.json``/``merges.txt`` pairs for offline checkpoints.
"""

from __future__ import annotations

import json
from functools import cached_property

from ..audio2text.tokenizer import _ASSET_URL, _PAT, load_tiktoken_ranks

EOT = "<|endoftext|>"


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's printable-unicode byte escaping (HF vocab.json key format)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class GPT2Tokenizer:
    """Encode/decode with GPT-2's byte-level BPE.

    ``ranks``: byte-sequence -> rank table (the 50256-entry base vocabulary);
    ``<|endoftext|>`` is appended as the single special token, matching GPT-2's
    id layout (50256). Satisfies the generator tokenizer protocol
    (``encode``/``decode``/``eos_token_id``).
    """

    def __init__(self, ranks: dict[bytes, int]):
        self.ranks = ranks
        self.special_tokens = {EOT: len(ranks)}
        self.n_vocab = len(ranks) + 1
        self.eot = self.special_tokens[EOT]

    @staticmethod
    def from_openai() -> "GPT2Tokenizer":
        """Download + cache the public gpt2.tiktoken rank table."""
        from ...utils import hub_download

        path = hub_download(f"{_ASSET_URL}/gpt2.tiktoken", "gpt2_tokenizer")
        return GPT2Tokenizer(load_tiktoken_ranks(path))

    @staticmethod
    def from_hf_files(vocab_path: str, merges_path: str | None = None) -> "GPT2Tokenizer":
        """Build the rank table from an HF-format ``vocab.json``.

        vocab.json maps byte-escaped token strings to ids, which are exactly
        the BPE ranks — merges.txt carries no extra information (accepted for
        API familiarity, unused).
        """
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        u2b = {c: bytes([b]) for b, c in _bytes_to_unicode().items()}
        ranks = {}
        for tok, idx in vocab.items():
            if tok == EOT:
                continue
            ranks[b"".join(u2b[c] for c in tok)] = idx
        return GPT2Tokenizer(ranks)

    @cached_property
    def _encoding(self):
        import tiktoken

        return tiktoken.Encoding(
            name=f"gpt2_{len(self.ranks)}",
            explicit_n_vocab=self.n_vocab,
            pat_str=_PAT,
            mergeable_ranks=self.ranks,
            special_tokens=self.special_tokens,
        )

    def encode(self, text: str, allow_special: bool = False) -> list[int]:
        allowed = set(self.special_tokens) if allow_special else set()
        return self._encoding.encode(text, allowed_special=allowed)

    def decode(self, tokens, skip_special: bool = True) -> str:
        tokens = [int(t) for t in tokens]
        if skip_special:
            tokens = [t for t in tokens if t < len(self.ranks)]
        return self._encoding.decode(tokens)

    @property
    def eos_token_id(self) -> int:
        return self.eot

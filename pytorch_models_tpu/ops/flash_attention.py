"""Pallas TPU flash-attention kernel (placeholder — XLA path used until implemented).

Will replace the einsum path of ops/attention.py on TPU with a blockwise
streaming kernel covering (causal, additive-bias, cross) modes — the TPU-native
analogue of the reference's ``F.scaled_dot_product_attention``
(reference transformer.py:52). See SURVEY.md §2.7 N1.
"""

from __future__ import annotations


def flash_eligible(q, k, v) -> bool:
    return False


def flash_sdpa(q, k, v, attn_bias=None, causal=False):
    raise NotImplementedError("Pallas flash attention not yet wired in")

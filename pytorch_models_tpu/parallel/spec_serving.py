"""Tensor-parallel SPECULATIVE serving: tp-sharded target + replicated draft.

The realistic low-latency deployment of speculative decoding: the big target
model's heads/MLP shard over a ``("tp",)`` mesh (two psums per layer riding
ICI, parallel/serving.py), while the small draft runs replicated on every
rank — its weights are a fraction of one target layer, so replication costs
nothing and its k single-token steps need no communication at all. The whole
draft->verify loop (models/text/speculative.py) runs inside ONE shard_map,
so there is exactly one jit dispatch per generation, and the verify chunk's
(k+1)-position forward amortizes the target's sharded weight reads exactly
like the single-device loop.

Greedy and EXACT: token-identical to the single-device plain greedy
generator (and therefore to single-device speculative) for ANY draft —
tests/parallel/test_spec_serving.py.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.text.generator import PROMPT_BUCKET
from ..models.text.speculative import _spec_greedy_loop
from .serving import decoder_lm_serving_pspecs


class TPSpeculativeGenerator:
    """Sharded drop-in for ``SpeculativeDecoderGenerator.generate_tokens``
    over a ``("tp",)`` mesh (B=1 serving — the speculative regime)."""

    def __init__(self, model, draft_model, tokenizer, mesh: Mesh, k: int = 4) -> None:
        assert model.cfg.vocab_size == draft_model.cfg.vocab_size, \
            "draft and target must share a vocabulary"
        assert k >= 1
        self.model = model
        self.draft_model = draft_model
        self.tokenizer = tokenizer
        self.k = k
        axes = dict(mesh.shape)
        assert set(axes) == {"tp"}, f'spec serving mesh needs a ("tp",) axis, got {tuple(axes)}'
        tp = axes["tp"]
        n_heads = model.cfg.layer.n_heads
        assert n_heads % tp == 0, f"{n_heads} heads not divisible by tp={tp}"
        cfg_local = replace(model.cfg, local_heads=n_heads // tp,
                            tp_axis="tp" if tp > 1 else None)
        draft_cfg = draft_model.cfg

        pspecs = decoder_lm_serving_pspecs(model.params)
        self.params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), model.params, pspecs)
        d_pspecs = jax.tree.map(lambda _: P(), draft_model.params)
        self.draft_params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            draft_model.params, d_pspecs)

        kk = k

        def sharded(params, d_params, prompt_buf, n_prompt, limit, eos_id):
            fn = jax.shard_map(
                lambda p, dp, buf, n, lim, eos: _spec_greedy_loop(
                    p, cfg_local, dp, draft_cfg, buf, n, lim, kk, eos, False),
                mesh=mesh,
                in_specs=(pspecs, d_pspecs, P(), P(), P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
            return fn(params, d_params, prompt_buf, n_prompt, limit, eos_id)

        self._generate = jax.jit(sharded)

    def generate(self, prompt: str, max_tokens: int = 100) -> str:
        return self.tokenizer.decode(
            self.generate_tokens(self.tokenizer.encode(prompt), max_tokens))

    def generate_tokens(self, tokens: list[int], max_tokens: int = 100) -> list[int]:
        cfg = self.model.cfg
        if max_tokens <= 0:
            return list(tokens)
        n = len(tokens)
        pad = min(-(-max(n, 1) // PROMPT_BUCKET) * PROMPT_BUCKET, cfg.max_seq_len)
        assert n <= pad, f"prompt too long for context {cfg.max_seq_len}"
        if pad >= cfg.max_seq_len:
            return list(tokens)
        buf = np.zeros((pad,), np.int32)
        buf[:n] = tokens

        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is None:
            eos = -1
        limit = min(n + max_tokens, cfg.max_seq_len)
        out_buf, length = self._generate(self.params, self.draft_params,
                                         jnp.asarray(buf), n, limit, eos)
        out = np.asarray(out_buf)[: int(length)]
        # truncate at the first EOS among generated tokens (plain-loop
        # parity: an accepted chunk can contain tokens past a mid-chunk EOS)
        hits = np.nonzero(out[n:] == eos)[0]
        if hits.size:
            out = out[: n + hits[0] + 1]
        return out.tolist()

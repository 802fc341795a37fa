"""Greedy speculative decoding: a small draft model proposes k tokens, the
target model verifies them in ONE chunked KV-cached forward.

Serving rationale (TPU): single-stream decode is HBM-bandwidth-bound — every
step reads all of the target's weights for one token (PERF.md). The verify
chunk reads the weights ONCE for k+1 positions, so with an acceptance rate a
the per-token weight traffic drops by ~(1 + a·k)/(1 + draft_cost). Greedy
speculative decoding is EXACT: the emitted sequence is token-identical to
the target model's own greedy decode for ANY draft model (accepted drafts
equal the target argmax by construction; the first mismatch is replaced by
the target argmax), which is what the equivalence tests pin.

This is a capability beyond the reference (reference text/generator.py
re-forwards the whole prefix per token and has no speculative mode).

Mechanics on fixed shapes (everything under one jit, no host syncs):
- ``buf`` slots >= ``pos`` are scratch: drafts are written there and simply
  not advanced over when rejected — rolled-back KV-cache slots are never
  read because attention masks by position, and are overwritten by the next
  iteration's writes at the same positions.
- The verify chunk re-feeds the last accepted token (chunk start pos-1),
  rewriting its K/V with identical values; its logits row supplies the
  verification target for draft 0.
- The loop stops when fewer than k+1 cache slots remain (generation ends up
  to k tokens before ``max_seq_len``); final length is clamped to ``limit``
  and truncated at the first EOS, matching the plain greedy loop exactly.

Sampling (``topk>1`` / ``top_p`` / ``temperature``) uses distribution-level
rejection sampling (the speculative-sampling scheme of Leviathan et al. 2023
/ Chen et al. 2023): draft token x_j ~ q_j is accepted with probability
min(1, p_j(x_j)/q_j(x_j)); on the first rejection the replacement is drawn
from the residual max(0, p_j - q_j) (renormalized), and if all k drafts are
accepted a bonus token is drawn from p_{k+1}. The emitted sequence is then
distributed EXACTLY as step-by-step sampling from the target's (filtered)
distribution, for any draft. Sampling keys are derived positionally
(``fold_in(key, position)``) so the draft==target case is token-identical to
a positional-key plain sampler — the property the tests pin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ._decoder_lm import (
    decoder_lm_forward_cached,
    decoder_lm_forward_cached_batch,
    decoder_lm_fused_tok_batch,
    decoder_lm_hidden_fused_batch,
    decoder_lm_make_cache,
    decoder_lm_pack,
)
from .generator import PROMPT_BUCKET, _check_sampling, _is_greedy, _nucleus_mask


@partial(jax.jit, static_argnums=(1, 3, 7, 9))
def _speculative_generate(params, cfg, draft_params, draft_cfg, prompt_buf,
                          n_prompt, limit, k, eos_id, fused_draft=False):
    """Prefill both models + while_loop of (k draft steps, 1 verify chunk).

    ``prompt_buf``: (P,) right-padded prompt; ``limit``: prompt + max_tokens
    budget. Returns ``(tokens_buf (max_seq_len,), length)`` like _generate.
    ``fused_draft`` routes the draft's single-token steps through the decode
    megakernel (batch-of-1, in-kernel greedy head) — the same path the plain
    generator uses on TPU; the verify chunk is a per-op S=k+1 forward.
    """
    l_max = cfg.max_seq_len
    dtype_t = params["token_embs"].dtype
    dtype_d = draft_params["token_embs"].dtype

    t_caches = decoder_lm_make_cache(cfg, dtype=dtype_t, stacked=False)
    d_caches = decoder_lm_make_cache(draft_cfg, (1,) if fused_draft else (),
                                     dtype=dtype_d, stacked=fused_draft)
    if fused_draft:
        d_packed, d_head, d_head_v = decoder_lm_pack(draft_params, draft_cfg)
        zero_pad = jnp.zeros((1,), jnp.int32)

    t_logits, t_caches = decoder_lm_forward_cached(params, cfg, prompt_buf, t_caches, 0)
    if fused_draft:
        pos_ids = jnp.arange(prompt_buf.shape[0])[None, :]
        _, d_caches = decoder_lm_forward_cached_batch(
            draft_params, draft_cfg, prompt_buf[None], pos_ids, d_caches, 0, zero_pad)
    else:
        _, d_caches = decoder_lm_forward_cached(draft_params, draft_cfg, prompt_buf,
                                                d_caches, 0)
    last = lax.dynamic_index_in_dim(t_logits, n_prompt - 1, axis=0, keepdims=False)

    buf = jnp.zeros((l_max,), jnp.int32)
    buf = lax.dynamic_update_slice(buf, prompt_buf.astype(jnp.int32), (0,))
    first = jnp.argmax(last, axis=-1).astype(jnp.int32)
    buf = lax.dynamic_update_slice(buf, first[None], (n_prompt,))
    state = (buf, n_prompt + 1, t_caches, d_caches, first == eos_id)

    def cond(s):
        _, pos, _, _, done = s
        # need slots [pos, pos+k) for drafts and chunk [pos-1, pos+k)
        return jnp.logical_and(jnp.logical_not(done),
                               jnp.logical_and(pos < limit, pos + k <= l_max))

    def body(s):
        buf, pos, t_caches, d_caches, done = s

        # ---- draft phase: k sequential single-token steps into buf[pos+j)
        for j in range(k):
            tok = lax.dynamic_slice(buf, (pos - 1 + j,), (1,))
            if fused_draft:
                nxt, d_caches = decoder_lm_fused_tok_batch(
                    draft_params, d_packed, d_head, d_head_v, draft_cfg,
                    tok[None], (pos - 1 + j) + zero_pad[:, None], d_caches,
                    pos - 1 + j, zero_pad)
                nxt = nxt[0]
            else:
                lg, d_caches = decoder_lm_forward_cached(
                    draft_params, draft_cfg, tok, d_caches, pos - 1 + j)
                nxt = jnp.argmax(lg[0], axis=-1).astype(jnp.int32)
            buf = lax.dynamic_update_slice(buf, nxt[None], (pos + j,))

        # ---- verify phase: one (k+1)-token chunk through the target
        chunk = lax.dynamic_slice(buf, (pos - 1,), (k + 1,))
        lg, t_caches = decoder_lm_forward_cached(params, cfg, chunk, t_caches, pos - 1)
        t_toks = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # (k+1,)

        drafts = lax.dynamic_slice(buf, (pos,), (k,))
        eq = (drafts == t_toks[:k]).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(eq))  # leading run of accepted drafts
        correction = t_toks[n_acc]
        buf = lax.dynamic_update_slice(buf, correction[None], (pos + n_acc,))

        # emitted this iteration = t_toks[0..n_acc] (accepted drafts == the
        # target argmaxes, plus the correction/bonus token)
        idx = jnp.arange(k + 1)
        eos_hit = jnp.any(jnp.logical_and(idx <= n_acc, t_toks == eos_id))
        return buf, pos + n_acc + 1, t_caches, d_caches, eos_hit

    buf, length, _, _, _ = lax.while_loop(cond, body, state)
    length = jnp.minimum(length, limit)  # an iteration may overshoot the budget
    return buf, length


def _filtered_probs(logits, topk: int, top_p, temperature) -> jnp.ndarray:
    """Full-vocab fp32 probs of the SAME filtered distribution that
    generator._sample draws from (top-k and/or nucleus over temperature-scaled
    logits; zero outside the kept set). ``logits``: (R, V) rows."""
    r, v = logits.shape
    kk = topk if topk > 1 else v  # topk==1 here means nucleus-only
    vals, idx = lax.top_k(logits / temperature, kk)
    if top_p is not None:
        vals = _nucleus_mask(vals, top_p)
    pk = jax.nn.softmax(vals.astype(jnp.float32), axis=-1)
    return jnp.zeros((r, v), jnp.float32).at[jnp.arange(r)[:, None], idx].set(pk)


def _sample_probs(probs, key) -> jnp.ndarray:
    """Categorical draw from (..., V) probs (zeros stay unreachable)."""
    return jax.random.categorical(key, jnp.log(probs + 1e-30), axis=-1).astype(jnp.int32)


def _accept_and_correct(q_probs, p_probs, drafts, pos, dkey, akey, rkey):
    """The rejection-sampling core: accept the leading run of drafts with
    probability min(1, p/q) each, then draw the correction token — from the
    normalized residual max(0, p_{n_acc} - q_{n_acc}) on a rejection, or from
    p_k with the positional draft key when all k are accepted (so that
    draft==target stays a plain positional-key sampler).

    ``q_probs``: (k, V) draft rows; ``p_probs``: (k+1, V) target rows;
    ``drafts``: (k,) sampled draft tokens living at buffer positions
    ``pos + j``. Returns ``(n_acc, correction_token)``. Marginally, the
    emitted tokens (accepted drafts + correction) are distributed exactly as
    sequential draws from the ``p`` rows — pinned distributionally by
    tests/text/test_speculative_sampling.py.
    """
    k, v = q_probs.shape
    qd = jnp.take_along_axis(q_probs, drafts[:, None], axis=1)[:, 0]
    pd = jnp.take_along_axis(p_probs[:k], drafts[:, None], axis=1)[:, 0]
    us = jax.vmap(lambda j: jax.random.uniform(jax.random.fold_in(akey, pos + j)))(
        jnp.arange(k))
    acc = us * qd < pd  # u < p/q without the q=0 division
    n_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))

    p_na = lax.dynamic_index_in_dim(p_probs, n_acc, axis=0, keepdims=False)
    q_ext = jnp.concatenate([q_probs, jnp.zeros((1, v), jnp.float32)])
    q_na = lax.dynamic_index_in_dim(q_ext, n_acc, axis=0, keepdims=False)
    residual = jnp.clip(p_na - q_na, 0.0, None)
    rsum = jnp.sum(residual)
    residual = jnp.where(rsum > 0, residual / rsum, p_na)  # p==q: residual is p itself
    res_tok = _sample_probs(residual, jax.random.fold_in(rkey, pos + n_acc))
    bonus_tok = _sample_probs(p_probs[k], jax.random.fold_in(dkey, pos + k))
    return n_acc, jnp.where(n_acc == k, bonus_tok, res_tok)


@partial(jax.jit, static_argnums=(1, 3, 7, 10, 11, 13))
def _speculative_sample_generate(params, cfg, draft_params, draft_cfg, prompt_buf,
                                 n_prompt, limit, k, eos_id, key, topk, top_p,
                                 temperature, fused_draft=False):
    """Speculative SAMPLING: the rejection-sampling analogue of
    :func:`_speculative_generate` (same fixed-shape skeleton; see module
    docstring for the accept/residual scheme). Keys: three independent
    streams (draft/bonus, accept, residual), each folded with the ABSOLUTE
    buffer position — static key consumption regardless of acceptance, and
    draft==target reduces to a positional-key plain sampler.
    """
    l_max = cfg.max_seq_len
    dtype_t = params["token_embs"].dtype
    dtype_d = draft_params["token_embs"].dtype
    dkey, akey, rkey = jax.random.split(key, 3)

    t_caches = decoder_lm_make_cache(cfg, dtype=dtype_t, stacked=False)
    d_caches = decoder_lm_make_cache(draft_cfg, (1,) if fused_draft else (),
                                     dtype=dtype_d, stacked=fused_draft)
    if fused_draft:
        d_packed = decoder_lm_pack(draft_params, draft_cfg)[0]
        zero_pad = jnp.zeros((1,), jnp.int32)
    from ...ops.layers import dot_precision

    t_logits, t_caches = decoder_lm_forward_cached(params, cfg, prompt_buf, t_caches, 0)
    if fused_draft:
        pos_ids = jnp.arange(prompt_buf.shape[0])[None, :]
        _, d_caches = decoder_lm_forward_cached_batch(
            draft_params, draft_cfg, prompt_buf[None], pos_ids, d_caches, 0, zero_pad)
    else:
        _, d_caches = decoder_lm_forward_cached(draft_params, draft_cfg, prompt_buf,
                                                d_caches, 0)
    last = lax.dynamic_index_in_dim(t_logits, n_prompt - 1, axis=0, keepdims=False)

    buf = jnp.zeros((l_max,), jnp.int32)
    buf = lax.dynamic_update_slice(buf, prompt_buf.astype(jnp.int32), (0,))
    p0 = _filtered_probs(last[None], topk, top_p, temperature)[0]
    first = _sample_probs(p0, jax.random.fold_in(dkey, n_prompt))
    buf = lax.dynamic_update_slice(buf, first[None], (n_prompt,))
    state = (buf, n_prompt + 1, t_caches, d_caches, first == eos_id)

    def cond(s):
        _, pos, _, _, done = s
        return jnp.logical_and(jnp.logical_not(done),
                               jnp.logical_and(pos < limit, pos + k <= l_max))

    def body(s):
        buf, pos, t_caches, d_caches, done = s

        # ---- draft phase: k sampled single-token steps; keep each q row
        qs = []
        for j in range(k):
            tok = lax.dynamic_slice(buf, (pos - 1 + j,), (1,))
            if fused_draft:
                hid, d_caches = decoder_lm_hidden_fused_batch(
                    draft_params, d_packed, draft_cfg, tok[None],
                    (pos - 1 + j) + zero_pad[:, None], d_caches, pos - 1 + j, zero_pad)
                emb = draft_params["token_embs"].astype(hid.dtype)
                lg = jnp.matmul(hid[:, 0], emb.T, precision=dot_precision(hid))[0]
            else:
                lg, d_caches = decoder_lm_forward_cached(
                    draft_params, draft_cfg, tok, d_caches, pos - 1 + j)
                lg = lg[0]
            q = _filtered_probs(lg[None], topk, top_p, temperature)[0]
            nxt = _sample_probs(q, jax.random.fold_in(dkey, pos + j))
            qs.append(q)
            buf = lax.dynamic_update_slice(buf, nxt[None], (pos + j,))
        q_probs = jnp.stack(qs)  # (k, V)

        # ---- verify phase: one (k+1)-token chunk through the target
        chunk = lax.dynamic_slice(buf, (pos - 1,), (k + 1,))
        lg_t, t_caches = decoder_lm_forward_cached(params, cfg, chunk, t_caches, pos - 1)
        p_probs = _filtered_probs(lg_t, topk, top_p, temperature)  # (k+1, V)

        drafts = lax.dynamic_slice(buf, (pos,), (k,))
        n_acc, correction = _accept_and_correct(q_probs, p_probs, drafts, pos,
                                                dkey, akey, rkey)
        buf = lax.dynamic_update_slice(buf, correction[None], (pos + n_acc,))

        window = lax.dynamic_slice(buf, (pos,), (k + 1,))
        idx = jnp.arange(k + 1)
        eos_hit = jnp.any(jnp.logical_and(idx <= n_acc, window == eos_id))
        return buf, pos + n_acc + 1, t_caches, d_caches, eos_hit

    buf, length, _, _, _ = lax.while_loop(cond, body, state)
    length = jnp.minimum(length, limit)
    return buf, length


class SpeculativeDecoderGenerator:
    """DecoderGenerator accelerated by a draft model (B=1 serving).

    Greedy (default) is token-identical to
    ``DecoderGenerator(model, tok).generate_tokens(...)`` for any draft;
    sampling (topk/top_p/temperature) is distribution-exact w.r.t. the
    target (module docstring). The draft only changes speed. Draft and
    target must share the tokenizer/vocab.
    """

    def __init__(self, model, draft_model, tokenizer, k: int = 4) -> None:
        assert model.cfg.vocab_size == draft_model.cfg.vocab_size, \
            "draft and target must share a vocabulary"
        assert k >= 1
        self.model = model
        self.draft_model = draft_model
        self.tokenizer = tokenizer
        self.k = k

    def generate(self, prompt: str, max_tokens: int = 100, topk: int = 1, seed: int = 0,
                 top_p: float | None = None, temperature: float = 1.0) -> str:
        return self.tokenizer.decode(
            self.generate_tokens(self.tokenizer.encode(prompt), max_tokens,
                                 topk=topk, seed=seed, top_p=top_p, temperature=temperature))

    def generate_tokens(self, tokens: list[int], max_tokens: int = 100, topk: int = 1,
                        seed: int = 0, top_p: float | None = None,
                        temperature: float = 1.0) -> list[int]:
        """Greedy (default) or sampled (top-k/top-p/temperature) speculative
        generation; sampling is distribution-exact w.r.t. the target (module
        docstring)."""
        _check_sampling(topk, top_p, temperature)
        cfg = self.model.cfg
        n = len(tokens)
        pad = min(-(-n // PROMPT_BUCKET) * PROMPT_BUCKET, cfg.max_seq_len)
        assert n <= pad, f"prompt too long for context {cfg.max_seq_len}"
        if max_tokens <= 0 or pad >= cfg.max_seq_len:
            return list(tokens)
        prompt_buf = np.zeros((pad,), np.int32)
        prompt_buf[:n] = tokens
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is None:
            eos = -1
        limit = min(n + max_tokens, cfg.max_seq_len)
        from ._decoder_lm import decoder_lm_fused_ok

        fused_draft = decoder_lm_fused_ok(self.draft_model.params, self.draft_model.cfg)
        if _is_greedy(topk, top_p):
            buf, length = _speculative_generate(
                self.model.params, cfg, self.draft_model.params, self.draft_model.cfg,
                jnp.asarray(prompt_buf), n, limit, self.k, eos, fused_draft)
        else:
            buf, length = _speculative_sample_generate(
                self.model.params, cfg, self.draft_model.params, self.draft_model.cfg,
                jnp.asarray(prompt_buf), n, limit, self.k, eos,
                jax.random.PRNGKey(seed), topk, top_p, temperature, fused_draft)
        out = np.asarray(buf)[:int(length)]
        # truncate at the first EOS among generated tokens (plain-loop parity)
        gen = out[n:]
        hits = np.nonzero(gen == eos)[0]
        if hits.size:
            out = out[: n + hits[0] + 1]
        return out.tolist()

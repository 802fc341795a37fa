"""Fixed-shape batched beam search (new vs the reference, whose generator is
greedy/top-k only, text/generator.py:26-31).

TPU-shaped algorithm (the t5x/flaxformer pattern): the W alive beams ARE a
batch — each step forwards all W rows through the same KV-cached decode path
the batched greedy loop uses (the fused one-kernel decode step on TPU, minus
its argmax head: beam needs full logits), expands to the top 2W candidates
over (W, V) scores, routes EOS candidates into a W-slot finished pool, keeps
the top W non-EOS as the new alive set, and reorders the KV cache by parent
beam with one gather along the batch axis. Everything is static-shape inside
one ``lax.while_loop``; early exit once no alive beam's optimistic score can
beat the worst kept finished beam.

The loop core (:func:`beam_decode_loop`) is model-agnostic — it takes the
per-step forward and a cache-gather callback — so Whisper/T5 beam decoding
reuses it (models/audio2text/whisper.py).

Scoring: sum of token log-probs; ``length_penalty`` alpha divides by
``len_generated ** alpha`` (HF convention; alpha=0 -> pure log-prob).
2W candidates guarantee >= W non-EOS continuations (each parent beam
contributes exactly one EOS candidate, so at most W of the 2W end in EOS).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ._decoder_lm import (
    decoder_lm_forward_cached_batch,
    decoder_lm_fused_ok,
    decoder_lm_hidden_fused_batch,
    decoder_lm_make_cache,
    decoder_lm_pack,
)
from .generator import PROMPT_BUCKET

# finite (-inf would NaN through masked softmax rows); a Python float, NOT a
# jnp scalar: a module-level device array becomes a hoisted closure constant
# whose presence varies across beam_width traces, and jax 0.9's dispatch
# fastpath then supplies the wrong buffer count to sibling cache entries of
# the same jit ("Execution supplied N buffers but compiled program expected M")
NEG_INF = -1e30


def _length_penalty(n_gen, alpha: float):
    return jnp.power(jnp.maximum(n_gen, 1).astype(jnp.float32), alpha)


def beam_decode_loop(forward, gather_caches, caches, last_logits, buf,
                     p_len: int, limit, w: int, eos_id, alpha):
    """Model-agnostic beam loop. ``forward(tok (W,1), caches, pos) ->
    (logits (W, V), caches)``; ``gather_caches(caches, idx (W,)) -> caches``
    reorders the per-beam state by parent. ``last_logits``: (V,) logits for
    the last prompt token (the prompt is shared: one row's suffice);
    ``buf``: (W, L) int32 pre-filled with the prompt at ``[?, :p_len)``.
    Returns ``(seqs (W, L), scores (W,), lengths (W,))`` best-first, with
    still-alive beams merged in at the limit (HF behavior).
    """
    v = last_logits.shape[-1]

    # first expansion: all rows are the same beam — take the top W distinct
    # first tokens from the shared prompt (an EOS here finishes immediately)
    logp0 = jax.nn.log_softmax(last_logits.astype(jnp.float32))
    scores, toks = lax.top_k(logp0, w)
    buf = buf.at[:, p_len].set(toks.astype(jnp.int32))
    fin_buf = jnp.zeros_like(buf)
    fin_scores = jnp.full((w,), NEG_INF)
    fin_lens = jnp.zeros((w,), jnp.int32)
    is_eos0 = toks == eos_id
    fin_buf = jnp.where(is_eos0[:, None], buf, fin_buf)
    fin_scores = jnp.where(is_eos0, scores / _length_penalty(1, alpha), fin_scores)
    fin_lens = jnp.where(is_eos0, p_len + 1, fin_lens)
    scores = jnp.where(is_eos0, NEG_INF, scores)

    state = (buf, scores, fin_buf, fin_scores, fin_lens, caches, jnp.int32(p_len + 1))

    def cond(s):
        _, scores, _, fin_scores, _, _, pos = s
        # optimistic alive bound: log-probs only decrease; the best final
        # penalty an alive beam can reach is at the max generated length
        best_alive = jnp.max(scores) / _length_penalty(limit - p_len, alpha)
        return jnp.logical_and(pos < limit, best_alive > jnp.min(fin_scores))

    def body(s):
        buf, scores, fin_buf, fin_scores, fin_lens, caches, pos = s
        tok = lax.dynamic_slice(buf, (0, pos - 1), (w, 1))
        logits, caches = forward(tok, caches, pos)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        flat = (scores[:, None] + logp).reshape(w * v)
        top_scores, top_idx = lax.top_k(flat, 2 * w)
        parents = (top_idx // v).astype(jnp.int32)
        toks = (top_idx % v).astype(jnp.int32)
        is_eos = toks == eos_id

        cand_buf = jnp.take(buf, parents, axis=0)
        cand_buf = lax.dynamic_update_slice(cand_buf, toks[:, None], (0, pos))

        # ---- finished pool: merge EOS candidates, keep best W
        n_gen = pos + 1 - p_len
        cand_fin = jnp.where(is_eos, top_scores / _length_penalty(n_gen, alpha), NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin])
        all_fin_buf = jnp.concatenate([fin_buf, cand_buf], axis=0)
        all_fin_lens = jnp.concatenate([fin_lens, jnp.full((2 * w,), pos + 1, jnp.int32)])
        fin_scores, keep = lax.top_k(all_fin_scores, w)
        fin_buf = jnp.take(all_fin_buf, keep, axis=0)
        fin_lens = jnp.take(all_fin_lens, keep, axis=0)

        # ---- alive set: best W non-EOS candidates; caches follow parents
        alive_cand = jnp.where(is_eos, NEG_INF, top_scores)
        scores, sel = lax.top_k(alive_cand, w)
        buf = jnp.take(cand_buf, sel, axis=0)
        caches = gather_caches(caches, jnp.take(parents, sel))
        return buf, scores, fin_buf, fin_scores, fin_lens, caches, pos + 1

    buf, scores, fin_buf, fin_scores, fin_lens, _, pos = lax.while_loop(cond, body, state)

    # merge still-alive beams as length-limit finishes (HF behavior)
    alive_final = scores / _length_penalty(pos - p_len, alpha)
    all_scores = jnp.concatenate([fin_scores, alive_final])
    all_buf = jnp.concatenate([fin_buf, buf], axis=0)
    all_lens = jnp.concatenate([fin_lens, jnp.full((w,), pos, jnp.int32)])
    out_scores, keep = lax.top_k(all_scores, w)
    return jnp.take(all_buf, keep, axis=0), out_scores, jnp.take(all_lens, keep)


@partial(jax.jit, static_argnums=(1, 5, 8, 9))
def _beam_search(params, cfg, prompt_buf, n_prompt, limit, beam_width, eos_id,
                 alpha, fused, p_len):
    """Decoder-LM beam search. Returns ``(seqs (W, max_seq_len), scores (W,),
    lengths (W,))`` best-first; sequences are left-padded like the batched
    greedy path (row content at ``[p_len - n_prompt, length)``).
    """
    w = beam_width
    from ...ops.layers import dot_precision

    pad = p_len - n_prompt
    pad_lens = jnp.full((w,), pad, jnp.int32)
    pos_ids = jnp.clip(jnp.arange(p_len)[None, :] - pad, 0, None)
    rows = jnp.broadcast_to(prompt_buf.astype(jnp.int32), (w, p_len))

    dtype = params["token_embs"].dtype
    caches = decoder_lm_make_cache(cfg, (w,), dtype=dtype, stacked=fused)
    packed = decoder_lm_pack(params, cfg)[0] if fused else None
    logits, caches = decoder_lm_forward_cached_batch(
        params, cfg, rows, jnp.broadcast_to(pos_ids, (w, p_len)), caches, 0, pad_lens)

    buf = jnp.zeros((w, cfg.max_seq_len), jnp.int32)
    buf = lax.dynamic_update_slice(buf, rows, (0, 0))

    def forward(tok, caches, pos):
        p_ids = (pos - 1 - pad_lens)[:, None]
        if fused:
            hidden, caches = decoder_lm_hidden_fused_batch(
                params, packed, cfg, tok, p_ids, caches, pos - 1, pad_lens)
            lg = jnp.matmul(hidden[:, 0], params["token_embs"].astype(hidden.dtype).T,
                            precision=dot_precision(hidden))
            return lg, caches
        lg, caches = decoder_lm_forward_cached_batch(
            params, cfg, tok, p_ids, caches, pos - 1, pad_lens)
        return lg[:, 0], caches

    axis = 1 if fused else 0  # stacked caches: (L, B, ...); list: (B, ...)
    gather = lambda caches, idx: jax.tree.map(lambda c: jnp.take(c, idx, axis=axis), caches)
    return beam_decode_loop(forward, gather, caches, logits[0, -1], buf,
                            p_len, limit, w, eos_id, alpha)


def beam_search_tokens(model, tokens: list[int], max_tokens: int = 100,
                       beam_width: int = 4, eos_id: int = -1,
                       length_penalty: float = 0.0,
                       return_all: bool = False):
    """Beam-search continuation of ``tokens``. Returns the best sequence as a
    token list, or ``(sequences, scores)`` for all ``beam_width`` beams when
    ``return_all`` (best first; scores are length-penalized log-probs)."""
    cfg = model.cfg
    n = len(tokens)
    assert beam_width >= 1
    assert length_penalty >= 0.0, "negative length_penalty breaks the early-stop bound"
    if max_tokens <= 0 or n >= cfg.max_seq_len:
        return ([list(tokens)], [0.0]) if return_all else list(tokens)
    p_len = min(-(-n // PROMPT_BUCKET) * PROMPT_BUCKET, cfg.max_seq_len)
    assert n <= p_len, f"prompt too long for context {cfg.max_seq_len}"
    if p_len >= cfg.max_seq_len:
        return ([list(tokens)], [0.0]) if return_all else list(tokens)
    prompt_buf = np.zeros((p_len,), np.int32)
    prompt_buf[p_len - n:] = tokens  # left-pad: beams ride the batched path
    limit = min(p_len + max_tokens, cfg.max_seq_len)

    fused = decoder_lm_fused_ok(model.params, cfg)
    seqs, scores, lens = _beam_search(
        model.params, cfg, jnp.asarray(prompt_buf), n, limit, beam_width,
        eos_id, float(length_penalty), fused, p_len)
    seqs, scores, lens = np.asarray(seqs), np.asarray(scores), np.asarray(lens)
    pad = p_len - n
    outs = [seqs[i, pad: lens[i]].tolist() for i in range(beam_width)]
    if return_all:
        return outs, scores.tolist()
    return outs[0]

"""Speculative SAMPLING exactness.

Two pins:
- **Identity**: with draft == target every draft is accepted (p/q == 1), so
  the speculative stream must be token-identical to a positional-key plain
  sampler (full re-forward, no caches, one categorical per position with
  ``fold_in(dkey, position)``) — this exercises the key schedule, the accept
  path, the bonus draw, and all the fixed-shape buffer plumbing.
- **Distributional**: the accept/residual core (``_accept_and_correct``),
  driven by 40k independent keys over synthetic q/p rows, must emit a first
  token whose empirical distribution matches the target row p_0 (total
  variation < 1%) even though drafts come from a very different q — the
  Leviathan-style rejection-sampling correctness.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_models_tpu.models.text._decoder_lm import (
    DecoderLMConfig,
    decoder_lm_apply,
    decoder_lm_init,
)
from pytorch_models_tpu.models.text.speculative import (
    _accept_and_correct,
    _filtered_probs,
    _sample_probs,
)
from pytorch_models_tpu.text import DecoderGenerator, SpeculativeDecoderGenerator


class _Tok:
    def __init__(self, eos=-1):
        self.eos_token_id = eos

    def encode(self, s):
        return [3, 1, 4, 1, 5]

    def decode(self, ids):
        return " ".join(map(str, ids))


def _small(seed, n_layers=2):
    cfg = DecoderLMConfig(vocab_size=512, max_seq_len=128, n_layers=n_layers,
                          d_model=128, pre_norm=True, final_norm=True)
    params = decoder_lm_init(jax.random.PRNGKey(seed), cfg)
    return SimpleNamespace(cfg=cfg, params=params)


@pytest.fixture(scope="module")
def models():
    return _small(0), _small(7)


def oracle_positional_sampler(model, prompt, max_tokens, seed, topk, top_p, temperature):
    """Plain step-by-step sampler with fold_in(dkey, position) keys and full
    re-forward per step — no caches, no speculation."""
    dkey = jax.random.split(jax.random.PRNGKey(seed), 3)[0]
    seq = list(prompt)
    limit = min(len(prompt) + max_tokens, model.cfg.max_seq_len)
    while len(seq) < limit:
        lg = decoder_lm_apply(model.params, model.cfg, jnp.asarray([seq]))[0, -1]
        p = _filtered_probs(lg[None], topk, top_p, temperature)[0]
        tok = int(_sample_probs(p, jax.random.fold_in(dkey, len(seq))))
        seq.append(tok)
    return seq


@pytest.mark.parametrize("topk,top_p,temperature", [
    (8, None, 1.0),
    (1, 0.9, 0.7),
    (16, 0.95, 1.3),
])
def test_identity_draft_equals_target(models, topk, top_p, temperature):
    target, _ = models
    spec = SpeculativeDecoderGenerator(target, target, _Tok(), k=4).generate_tokens(
        [3, 1, 4, 1, 5], max_tokens=20, topk=topk, seed=11, top_p=top_p,
        temperature=temperature)
    oracle = oracle_positional_sampler(target, [3, 1, 4, 1, 5], 20, 11, topk,
                                       top_p, temperature)
    assert spec == oracle


def test_greedy_args_route_to_exact_greedy(models):
    target, draft = models
    tok = _Tok()
    base = DecoderGenerator(target, tok).generate_tokens([3, 1, 4, 1, 5], max_tokens=16)
    spec = SpeculativeDecoderGenerator(target, draft, tok, k=3).generate_tokens(
        [3, 1, 4, 1, 5], max_tokens=16, topk=1, seed=5)
    assert spec == base


def test_random_draft_stays_in_filtered_support(models):
    """Every generated token must lie in the target's top-k filtered set at
    its position (a necessary condition of exactness that a buggy residual
    or acceptance path would violate)."""
    target, draft = models
    prompt = [3, 1, 4, 1, 5]
    topk = 6
    out = SpeculativeDecoderGenerator(target, draft, _Tok(), k=4).generate_tokens(
        prompt, max_tokens=24, topk=topk, seed=3)
    for t in range(len(prompt), len(out)):
        lg = decoder_lm_apply(target.params, target.cfg, jnp.asarray([out[:t]]))[0, -1]
        allowed = np.asarray(jax.lax.top_k(lg, topk)[1])
        assert out[t] in allowed, f"token at {t} outside the target's top-{topk}"


def test_accept_and_correct_is_distribution_exact():
    """Empirical first-emitted-token distribution == p_0 under a mismatched
    draft (TV < 1% at 40k trials; sampling noise alone is ~0.5%)."""
    k, v = 3, 12
    r = np.random.default_rng(0)
    q = r.dirichlet(np.ones(v) * 0.4, size=k).astype(np.float32)
    p = r.dirichlet(np.ones(v) * 0.8, size=k + 1).astype(np.float32)
    q_probs, p_probs = jnp.asarray(q), jnp.asarray(p)
    pos = jnp.int32(0)

    def one_trial(key):
        dkey, akey, rkey = jax.random.split(key, 3)
        drafts = jax.vmap(lambda j: _sample_probs(q_probs[j], jax.random.fold_in(dkey, j)))(
            jnp.arange(k))
        n_acc, corr = _accept_and_correct(q_probs, p_probs, drafts, pos, dkey, akey, rkey)
        return jnp.where(n_acc > 0, drafts[0], corr)

    n = 40_000
    toks = jax.jit(jax.vmap(one_trial))(jax.random.split(jax.random.PRNGKey(42), n))
    emp = np.bincount(np.asarray(toks), minlength=v) / n
    tv = 0.5 * np.abs(emp - p[0]).sum()
    assert tv < 0.01, f"total variation {tv:.4f}"


def test_accept_and_correct_all_accept_bonus_from_p_k():
    """With q == p rows, every draft is accepted and the correction is the
    bonus draw from p_k: empirical bonus distribution == p_k."""
    k, v = 2, 10
    r = np.random.default_rng(1)
    rows = r.dirichlet(np.ones(v), size=k + 1).astype(np.float32)
    q_probs = jnp.asarray(rows[:k])
    p_probs = jnp.asarray(rows)
    pos = jnp.int32(0)

    def one_trial(key):
        dkey, akey, rkey = jax.random.split(key, 3)
        drafts = jax.vmap(lambda j: _sample_probs(q_probs[j], jax.random.fold_in(dkey, j)))(
            jnp.arange(k))
        n_acc, corr = _accept_and_correct(q_probs, p_probs, drafts, pos, dkey, akey, rkey)
        return n_acc, corr

    n = 20_000
    n_accs, corrs = jax.jit(jax.vmap(one_trial))(jax.random.split(jax.random.PRNGKey(7), n))
    assert int(jnp.min(n_accs)) == k  # q == p: nothing can be rejected
    emp = np.bincount(np.asarray(corrs), minlength=v) / n
    tv = 0.5 * np.abs(emp - rows[k]).sum()
    assert tv < 0.015, f"total variation {tv:.4f}"


def test_batch_rows_reproduce_folded_single_rows(models):
    """Batched sampled speculative row r must be token-identical to the
    positional-key oracle driven with row key fold_in(PRNGKey(seed), r)
    (draft == target: every draft accepted, keys fully pinned)."""
    target, _ = models
    prompts = [[3, 1, 4, 1, 5], [2, 7, 1]]
    outs = SpeculativeDecoderGenerator(target, target, _Tok(), k=3).generate_tokens_batch(
        prompts, max_tokens=12, topk=8, seed=11, temperature=0.9)
    for r, (p, o) in enumerate(zip(prompts, outs)):
        dkey = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(11), r), 3)[0]
        seq = list(p)
        limit = min(len(p) + 12, target.cfg.max_seq_len)
        while len(seq) < limit:
            lg = decoder_lm_apply(target.params, target.cfg, jnp.asarray([seq]))[0, -1]
            pr = _filtered_probs(lg[None], 8, None, 0.9)[0]
            seq.append(int(_sample_probs(pr, jax.random.fold_in(dkey, len(seq)))))
        assert o == seq

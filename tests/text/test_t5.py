"""T5 parity tests (mirrors reference tests/text/test_t5.py)."""

import numpy as np
import pytest

from pytorch_models_tpu.models.text.t5 import T5Generator, T5Model
from tests.oracle import max_abs_diff, randn, require_reference, rng, t

TINY = dict(vocab_size=100, dim=64, n_heads=2, n_layers=2, mlp_dim=128)


def test_forward():
    m = T5Model(**TINY)
    r = rng()
    x = r.integers(0, 100, (2, 12))
    tgt = r.integers(0, 100, (2, 7))
    assert m(x, tgt).shape == (2, 7, 100)


def test_forward_unbatched():
    m = T5Model(**TINY)
    r = rng(1)
    x = r.integers(0, 100, (12,))
    tgt = r.integers(0, 100, (7,))
    assert m(x, tgt).shape == (7, 100)


def _make_t5x_flat(r, cfg=TINY):
    """Synthetic flattened t5x checkpoint ({dotted key: (in,out) kernels})."""
    s = 0.05
    v, d, h, nl, mlp = cfg["vocab_size"], cfg["dim"], cfg["n_heads"], cfg["n_layers"], cfg["mlp_dim"]
    inner = h * 64
    flat = {
        "token_embedder.embedding": randn(r, v, d, scale=1.0),
        "decoder.logits_dense.kernel": randn(r, d, v, scale=s),
        "encoder.relpos_bias.rel_embedding": randn(r, h, 32, scale=s),
        "decoder.relpos_bias.rel_embedding": randn(r, h, 32, scale=s),
        "encoder.encoder_norm.scale": 1 + randn(r, d, scale=s),
        "decoder.decoder_norm.scale": 1 + randn(r, d, scale=s),
    }
    for i in range(nl):
        e = f"encoder.layers_{i}"
        flat[f"{e}.pre_attention_layer_norm.scale"] = 1 + randn(r, d, scale=s)
        for proj, shape in [("query", (d, inner)), ("key", (d, inner)), ("value", (d, inner)), ("out", (inner, d))]:
            flat[f"{e}.attention.{proj}.kernel"] = randn(r, *shape, scale=s)
        flat[f"{e}.pre_mlp_layer_norm.scale"] = 1 + randn(r, d, scale=s)
        flat[f"{e}.mlp.wi_0.kernel"] = randn(r, d, mlp, scale=s)
        flat[f"{e}.mlp.wi_1.kernel"] = randn(r, d, mlp, scale=s)
        flat[f"{e}.mlp.wo.kernel"] = randn(r, mlp, d, scale=s)

        dd = f"decoder.layers_{i}"
        flat[f"{dd}.pre_self_attention_layer_norm.scale"] = 1 + randn(r, d, scale=s)
        for proj, shape in [("query", (d, inner)), ("key", (d, inner)), ("value", (d, inner)), ("out", (inner, d))]:
            flat[f"{dd}.self_attention.{proj}.kernel"] = randn(r, *shape, scale=s)
        flat[f"{dd}.pre_cross_attention_layer_norm.scale"] = 1 + randn(r, d, scale=s)
        for proj, shape in [("query", (d, inner)), ("key", (d, inner)), ("value", (d, inner)), ("out", (inner, d))]:
            flat[f"{dd}.encoder_decoder_attention.{proj}.kernel"] = randn(r, *shape, scale=s)
        flat[f"{dd}.pre_mlp_layer_norm.scale"] = 1 + randn(r, d, scale=s)
        flat[f"{dd}.mlp.wi_0.kernel"] = randn(r, d, mlp, scale=s)
        flat[f"{dd}.mlp.wi_1.kernel"] = randn(r, d, mlp, scale=s)
        flat[f"{dd}.mlp.wo.kernel"] = randn(r, mlp, d, scale=s)
    return flat


def _load_reference_t5(pm, flat, cfg=TINY):
    """Reference conversion path (t5.py:172-180): transpose kernels, scale q/k, rename."""
    from pytorch_models.text.t5 import _rename_key

    state_dict = {}
    for k, v in flat.items():
        v = t(v.copy())
        if k.endswith("kernel"):
            v = v.T
        if k.endswith(("query.kernel", "key.kernel")):
            v = v * 64**0.25
        state_dict[_rename_key(k)] = v
    ref = pm.text.T5Model(cfg["vocab_size"], cfg["dim"], cfg["n_heads"], cfg["n_layers"], cfg["mlp_dim"])
    ref.load_state_dict(state_dict)
    ref.eval()
    return ref


@pytest.fixture()
def paired():
    pm = require_reference()
    r = rng(61)
    flat = _make_t5x_flat(r)
    ref = _load_reference_t5(pm, flat)
    ours = T5Model(**TINY)
    ours.load_t5x_state_dict(flat)
    return pm, ref, ours, r


def test_t5x_parity(paired):
    import torch

    pm, ref, ours, r = paired
    x = r.integers(0, 100, (2, 12))
    tgt = r.integers(0, 100, (2, 7))
    with torch.no_grad():
        expected = ref(t(x.astype(np.int64)), t(tgt.astype(np.int64))).numpy()
    actual = np.asarray(ours(x, tgt))
    assert max_abs_diff(expected, actual) < 1e-4


def test_t5x_parity_unbatched(paired):
    import torch

    pm, ref, ours, r = paired
    x = r.integers(0, 100, (12,))
    tgt = r.integers(0, 100, (7,))
    with torch.no_grad():
        expected = ref(t(x.astype(np.int64)), t(tgt.astype(np.int64))).numpy()
    assert max_abs_diff(expected, np.asarray(ours(x, tgt))) < 1e-4


def test_generate_matches_reference(paired):
    """KV-cached greedy generation == the reference's full re-decode loop."""
    import torch

    pm, ref, ours, r = paired
    prompt_ids = r.integers(1, 100, (9,)).tolist()
    pad_id, eos_id = 0, 1
    max_tokens = 12

    # reference loop (t5.py:219-225), inlined since reference T5Generator
    # requires a pretrained download
    with torch.no_grad():
        encoded = ref.encode(torch.tensor(prompt_ids))
        output_ids = [pad_id]
        while len(output_ids) < max_tokens:
            decoded = ref.decode(torch.tensor(output_ids), encoded)
            output_ids.append(int(decoded.argmax(-1)[-1].item()))
            if output_ids[-1] == eos_id:
                break

    gen = T5Generator(model=ours, tokenizer=object())
    actual = gen.generate_tokens(prompt_ids, max_tokens, pad_id, eos_id)
    assert actual == output_ids


def test_score_tokens_matches_reference(paired):
    """Teacher-forced seq2seq log-probs == torch log_softmax over reference
    logits on unpadded rows — exercises the encoder pad mask and the
    cross-attention ca_bias (inputs are NOT bucket multiples)."""
    import torch

    pm, ref, ours, r = paired
    gen = T5Generator(model=ours, tokenizer=object())
    pad_id = 0
    inputs = [r.integers(1, 100, (12,)).tolist(), r.integers(1, 100, (7,)).tolist()]
    targets = [r.integers(1, 100, (6,)).tolist(), r.integers(1, 100, (9,)).tolist()]

    for inp, tgt in zip(inputs, targets):
        dec_in = [pad_id] + tgt
        with torch.no_grad():
            lg = ref(t(np.asarray(inp, np.int64)), t(np.asarray(dec_in, np.int64)))
            exp = torch.log_softmax(lg[:-1].float(), -1)
            exp = exp[np.arange(len(tgt)), tgt].numpy()
        got = np.asarray(gen.score_tokens(inp, tgt, pad_id))
        np.testing.assert_allclose(got, exp, atol=1e-4)

    batched = gen.score_tokens_batch(inputs, targets, pad_id)
    singles = [gen.score_tokens(i_, t_, pad_id) for i_, t_ in zip(inputs, targets)]
    for b_row, s_row in zip(batched, singles):
        np.testing.assert_allclose(b_row, s_row, atol=1e-5)


def test_batched_generation_matches_single(paired):
    pm, ref, ours, r = paired
    gen = T5Generator(model=ours, tokenizer=object())
    prompts = [r.integers(1, 100, (n,)).tolist() for n in (5, 9, 3)]
    singles = [gen.generate_tokens(p, 12, 0, 1) for p in prompts]
    batched = gen.generate_tokens_batch(prompts, 12, 0, 1)
    assert batched == singles

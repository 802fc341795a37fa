"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_models_tpu.parallel import make_mesh, shard_decoder_lm_params
from pytorch_models_tpu.parallel.train import MoELMConfig, make_train_step, moe_lm_init, param_pspecs

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_make_mesh():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "pp", "tp")


def test_train_step_compiles_and_runs():
    mesh = make_mesh(8)
    cfg = MoELMConfig()
    params = moe_lm_init(jax.random.PRNGKey(0), cfg)
    step, param_shardings = make_train_step(cfg, mesh, n_micro=2)
    params = jax.tree.map(lambda x, s: jax.device_put(x, s), params, param_shardings)

    tokens = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (8, cfg.max_seq_len)))
    params, loss0 = step(params, tokens)
    params, loss1 = step(params, tokens)
    assert jnp.isfinite(loss0) and jnp.isfinite(loss1)
    assert float(loss1) < float(loss0)  # one SGD step on the same batch reduces loss


def test_pipeline_matches_single_device():
    """GPipe over pp must equal running all stages sequentially."""
    from pytorch_models_tpu.parallel.train import _stage_fn, moe_lm_forward

    mesh = make_mesh(8)
    cfg = MoELMConfig()
    params = moe_lm_init(jax.random.PRNGKey(1), cfg)
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (4, 16)))

    fwd = jax.jit(lambda p, t: moe_lm_forward(p, cfg, t, mesh, n_micro=2))
    logits_pp = fwd(params, tokens)

    # sequential oracle: apply stages one after another, grouped per microbatch
    # exactly like the pipeline (capacity-MoE results depend on token grouping)
    x = jnp.take(params["token_embs"], tokens, axis=0) + params["pos_embs"][:16]
    fn = _stage_fn(cfg, mesh)
    mbs = x.reshape(2, 2, 16, cfg.d_model)
    outs = []
    for m in range(2):
        h = mbs[m]
        for s in range(cfg.n_stages):
            h = fn(jax.tree.map(lambda a: a[s], params["stages"]), h)
        outs.append(h)
    x = jnp.concatenate(outs, axis=0)
    from pytorch_models_tpu.ops import layer_norm

    x = layer_norm(params["norm"], x)
    logits_seq = jnp.matmul(x, params["token_embs"].T)
    np.testing.assert_allclose(np.asarray(logits_pp), np.asarray(logits_seq), rtol=2e-5, atol=2e-5)


def test_tp_sharded_gpt2_forward_matches():
    """TP-sharded decoder-LM forward == replicated forward."""
    from pytorch_models_tpu.models.text import GPT2

    mesh = make_mesh(8)
    m = GPT2(2, 128)
    tokens = np.random.default_rng(2).integers(0, 1000, (16,))
    expected = np.asarray(m(tokens))

    sharded = shard_decoder_lm_params(m.params, mesh)
    m.params = sharded
    actual = np.asarray(m(tokens))
    np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=1e-4)


def test_partition_spec_rules():
    """TP rules: qkv/fc1 split outputs, o/fc2 split inputs, rest replicated."""
    from jax.sharding import PartitionSpec as P

    from pytorch_models_tpu.models.text import GPT2
    from pytorch_models_tpu.parallel.sharding import decoder_lm_pspecs

    m = GPT2(2, 128)
    specs = decoder_lm_pspecs(m.params)
    layers = specs["decoder"]["layers"]
    assert layers["sa"]["q"]["w"] == P(None, None, "tp")
    assert layers["sa"]["o"]["w"] == P(None, "tp", None)
    assert layers["mlp"]["fc1"]["w"] == P(None, None, "tp")
    assert layers["mlp"]["fc2"]["w"] == P(None, "tp", None)
    assert layers["sa"]["q"]["b"] == P()  # stacked biases replicated
    assert specs["token_embs"] == P()
    assert layers["sa_norm"]["scale"] == P()


def test_sparse_moe_matches_dense_at_high_capacity():
    """With capacity >= tokens, GShard sparse dispatch == dense dispatch exactly."""
    from pytorch_models_tpu.parallel.train import MoELMConfig, _moe_mlp, _moe_mlp_sparse, moe_lm_init

    cfg = MoELMConfig(capacity_factor=float(MoELMConfig.n_experts))
    params = moe_lm_init(jax.random.PRNGKey(3), cfg)
    lp = jax.tree.map(lambda a: a[0, 0], params["stages"])  # one block's params
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 8, cfg.d_model)), jnp.float32)

    dense = _moe_mlp(lp, cfg, x)
    sparse = _moe_mlp_sparse(lp, cfg, x)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense), rtol=1e-5, atol=1e-5)


def test_ep_moe_matches_dense_at_high_capacity():
    """Explicit all_to_all EP dispatch == dense dispatch when nothing drops.

    This is the 'EP does not silently degrade' guard: dense computes every
    token on every expert with no token movement, so agreement means the
    all_to_all exchange routed every token to the right expert and back."""
    from pytorch_models_tpu.parallel.train import (
        MoELMConfig, _moe_mlp, _moe_mlp_sparse_ep, moe_lm_init)

    mesh = make_mesh(8)
    cfg = MoELMConfig(capacity_factor=float(MoELMConfig.n_experts))
    params = moe_lm_init(jax.random.PRNGKey(4), cfg)
    lp = jax.tree.map(lambda a: a[0, 0], params["stages"])
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 16, cfg.d_model)), jnp.float32)

    dense = _moe_mlp(lp, cfg, x)
    ep = jax.jit(lambda p, v: _moe_mlp_sparse_ep(p, cfg, v, mesh))(lp, x)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(dense), rtol=1e-5, atol=1e-5)


def test_ep_emits_all_to_all():
    """The compiled train step must contain all-to-all collectives — fails if
    expert parallelism silently degrades to weight replication (the einsum
    formulation measurably all-gathers instead)."""
    mesh = make_mesh(8)
    cfg = MoELMConfig()
    assert cfg.moe_impl == "ep"  # the default path IS the explicit-a2a one
    params = moe_lm_init(jax.random.PRNGKey(5), cfg)
    step, param_shardings = make_train_step(cfg, mesh, n_micro=2)
    params = jax.tree.map(lambda x, s: jax.device_put(x, s), params, param_shardings)
    tokens = jnp.asarray(np.random.default_rng(5).integers(0, cfg.vocab_size, (8, cfg.max_seq_len)))

    hlo = step.lower(params, tokens).compile().as_text()
    assert hlo.count("all-to-all") >= 2, "expected dispatch+combine all_to_all in the compiled step"

"""Expert-parallel serving on the 8-device virtual CPU mesh.

EP generation (experts weight-sharded over "ep", batch data-sharded, explicit
all_to_all dispatch each decode step) must reproduce the single-device
dense-dispatch oracle token-for-token: with capacity_factor >= n_experts no
token drops, and the one-hot dispatch/combine einsums are exact permutations.
"""

import jax
import jax.numpy as jnp
import pytest

from pytorch_models_tpu.parallel import make_mesh
from pytorch_models_tpu.parallel.ep_serving import (
    EPMoEGenerator, MoEDecoderConfig, MoEDecoderGenerator, moe_decoder_init)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.mark.parametrize("ep", [2, 4])
def test_ep_serving_matches_single_device(ep):
    cfg = MoEDecoderConfig(n_layers=2, n_experts=4, max_seq_len=64)
    params = moe_decoder_init(jax.random.PRNGKey(0), cfg)
    prompts = [[5, 6, 7], [9] * 20, [11, 12], [3] * 7]

    ref = MoEDecoderGenerator(params, cfg).generate_tokens_batch(prompts, max_tokens=8)
    mesh = make_mesh(ep, shape=(ep,), axes=("ep",))
    out = EPMoEGenerator(params, cfg, mesh).generate_tokens_batch(prompts, max_tokens=8)
    assert out == ref


def test_ep_serving_emits_all_to_all():
    """The EP decode step must carry a real all_to_all (not an XLA rewrite
    into all-gather): assert the collective appears in the compiled HLO."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from pytorch_models_tpu.parallel.ep_serving import _moe_mlp_ep, ep_param_pspecs

    cfg = MoEDecoderConfig(n_layers=1, n_experts=4)
    params = moe_decoder_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(4, shape=(4,), axes=("ep",))
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    moe_p = {"router": lp["router"], "w1": lp["w1"], "w2": lp["w2"]}
    specs = {"router": {"w": P(), "b": P()}, "w1": P("ep"), "w2": P("ep")}

    fn = jax.jit(jax.shard_map(partial(_moe_mlp_ep, cfg=cfg), mesh=mesh,
                               in_specs=(specs, P("ep")), out_specs=P("ep"),
                               check_vma=False))
    x = jnp.ones((8, 1, cfg.d_model))

    def _moe(p, x):
        return fn(p, x)

    hlo = jax.jit(lambda p, x: fn(p, x)).lower(moe_p, x).compile().as_text()
    assert "all-to-all" in hlo, "EP dispatch lost its all_to_all"


def test_ep_serving_eos_lockstep():
    """Rows finishing at different steps (EOS parking) must not deadlock or
    diverge: the while_loop stop condition is the global psum'd done count."""
    cfg = MoEDecoderConfig(n_layers=2, n_experts=4, max_seq_len=64)
    params = moe_decoder_init(jax.random.PRNGKey(1), cfg)
    prompts = [[i + 1, i + 2] for i in range(8)]

    ref = MoEDecoderGenerator(params, cfg).generate_tokens_batch(
        prompts, max_tokens=12, eos_id=3)
    mesh = make_mesh(4, shape=(4,), axes=("ep",))
    out = EPMoEGenerator(params, cfg, mesh).generate_tokens_batch(
        prompts, max_tokens=12, eos_id=3)
    assert out == ref

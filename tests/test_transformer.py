"""Shared-core tests: cached decode == full forward; core parity vs reference."""

import jax
import jax.numpy as jnp
import numpy as np

import pytorch_models_tpu.transformer as tfm
from tests.oracle import max_abs_diff, randn, require_reference, rng, t


def test_cached_decode_matches_full_forward():
    """Incremental KV-cached decoding == one full causal forward (SURVEY §7.7)."""
    r = rng(151)
    cfg = tfm.LayerConfig.make(64, n_heads=2)
    params = tfm.decoder_init(jax.random.PRNGKey(0), 3, cfg)
    l = 12
    x = jnp.asarray(randn(r, l, 64))

    full = tfm.decoder_apply(params, cfg, x)

    caches = tfm.make_kv_cache(3, (), cfg.n_heads, 16, cfg.head_dim)
    outs = []
    for pos in range(l):
        y, caches = tfm.decoder_apply(params, cfg, x[pos : pos + 1], self_caches=caches, pos=pos)
        outs.append(y)
    incremental = jnp.concatenate(outs, axis=0)
    assert max_abs_diff(np.asarray(full), np.asarray(incremental)) < 1e-5


def test_chunked_prefill_matches_full_forward():
    """A prompt processed as one chunk at pos=0 == plain causal forward."""
    r = rng(152)
    cfg = tfm.LayerConfig.make(64, n_heads=2)
    params = tfm.decoder_init(jax.random.PRNGKey(1), 2, cfg)
    l = 10
    x = jnp.asarray(randn(r, l, 64))
    full = tfm.decoder_apply(params, cfg, x)
    caches = tfm.make_kv_cache(2, (), cfg.n_heads, 16, cfg.head_dim)
    chunked, _ = tfm.decoder_apply(params, cfg, x, self_caches=caches, pos=0)
    assert max_abs_diff(np.asarray(full), np.asarray(chunked)) < 1e-5


def test_encoder_parity_vs_reference():
    """Shared Encoder core == reference transformer.Encoder on identical weights."""
    pm = require_reference()
    import torch

    r = rng(153)
    d, n_layers = 64, 2
    for pre_norm in (True, False):
        ref = pm.transformer.Encoder(n_layers, d, pre_norm=pre_norm)
        ref.eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        cfg = tfm.LayerConfig.make(d, pre_norm=pre_norm)
        layers = []
        for i in range(n_layers):
            layers.append(
                {
                    "sa_norm": {"scale": sd[f"{i}.sa_norm.weight"], "bias": sd[f"{i}.sa_norm.bias"]},
                    "sa": {
                        "q": {"w": sd[f"{i}.sa.q_proj.weight"].T, "b": sd[f"{i}.sa.q_proj.bias"]},
                        "k": {"w": sd[f"{i}.sa.k_proj.weight"].T, "b": sd[f"{i}.sa.k_proj.bias"]},
                        "v": {"w": sd[f"{i}.sa.v_proj.weight"].T, "b": sd[f"{i}.sa.v_proj.bias"]},
                        "o": {"w": sd[f"{i}.sa.out_proj.weight"].T, "b": sd[f"{i}.sa.out_proj.bias"]},
                    },
                    "mlp_norm": {"scale": sd[f"{i}.mlp_norm.weight"], "bias": sd[f"{i}.mlp_norm.bias"]},
                    "mlp": {
                        "fc1": {"w": sd[f"{i}.mlp.linear1.weight"].T, "b": sd[f"{i}.mlp.linear1.bias"]},
                        "fc2": {"w": sd[f"{i}.mlp.linear2.weight"].T, "b": sd[f"{i}.mlp.linear2.bias"]},
                    },
                }
            )
        from pytorch_models_tpu.utils import stack_layers

        params = {"layers": stack_layers([jax.tree.map(jnp.asarray, lp) for lp in layers])}

        x = randn(r, 2, 9, d)
        with torch.no_grad():
            expected = ref(t(x)).numpy()
        actual = np.asarray(tfm.encoder_apply(params, cfg, jnp.asarray(x)))
        assert max_abs_diff(expected, actual) < 1e-5, f"pre_norm={pre_norm}"


def test_unrolled_cache_matches_stacked():
    """List (unrolled) and stacked (scan) KV-cache layouts must agree."""
    r = rng(154)
    cfg = tfm.LayerConfig.make(64, n_heads=2)
    params = tfm.decoder_init(jax.random.PRNGKey(2), 3, cfg)
    x = jnp.asarray(randn(r, 6, 64))

    stacked = tfm.make_kv_cache(3, (), cfg.n_heads, 8, cfg.head_dim, stacked=True)
    unrolled = tfm.make_kv_cache(3, (), cfg.n_heads, 8, cfg.head_dim, stacked=False)

    out_s, _ = tfm.decoder_apply(params, cfg, x, self_caches=stacked, pos=0)
    out_u, new_u = tfm.decoder_apply(params, cfg, x, self_caches=unrolled, pos=0)
    assert isinstance(new_u, list) and len(new_u) == 3
    assert max_abs_diff(np.asarray(out_s), np.asarray(out_u)) < 1e-6


def test_bf16_gelu_policy():
    """bf16 "gelu" substitutes tanh-GELU (serving fast path); fp32 stays exact.

    The substitution error must stay an order below bf16 rounding of the
    exact value (|tanh-gelu - erf-gelu| <= ~5e-4 abs for |x| <= 6).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_models_tpu.ops import ACT_FNS

    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)
    assert jnp.abs(ACT_FNS["gelu"](x) - exact).max() == 0.0  # fp32: exact erf

    bf = ACT_FNS["gelu"](x.astype(jnp.bfloat16)).astype(jnp.float32)
    err = np.abs(np.asarray(bf) - np.asarray(exact)).max()
    assert err < 2e-2, err  # tanh substitution + bf16 rounding

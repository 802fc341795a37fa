"""Parameter partition specs for the shared transformer pytrees.

Megatron-style tensor parallelism over the "tp" mesh axis: q/k/v kernels
split the head (output) dim, the out-projection splits its input dim; MLP
fc1 splits output, fc2 splits input — so each block needs only one
all-reduce per attention/MLP (inserted automatically by XLA from the
shardings). Embeddings and norms are replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(path: str, leaf) -> P:
    # only matrix kernels are sharded; biases/norms/embeddings replicated
    if leaf.ndim < 2 or not path.endswith("['w']"):
        return P()
    # stacked layer params have a leading layer axis -> shard trailing dims
    pad = (None,) * (leaf.ndim - 2)
    if any(k in path for k in ("['q']", "['k']", "['v']", "['fc1']")):
        return P(*pad, None, "tp")  # split output/head dim
    if any(k in path for k in ("['o']", "['fc2']", "['wo']")):
        return P(*pad, "tp", None)  # split input dim
    return P()


def decoder_lm_pspecs(params) -> dict:
    """PartitionSpec pytree mirroring a decoder-LM / encoder param pytree."""

    def spec(path, leaf):
        path_str = jax.tree_util.keystr(path)
        return _leaf_spec(path_str, leaf)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_decoder_lm_params(params, mesh: Mesh):
    """Device-put a decoder-LM param pytree with TP sharding over ``mesh``."""
    specs = decoder_lm_pspecs(params)
    return jax.tree.map(lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)

"""GPipe pipeline parallelism over the "pp" mesh axis.

``shard_map`` manual over "pp" only (dp/tp stay auto, so XLA keeps inserting
tensor/data-parallel collectives inside the stage body). Each pp rank holds
one stage's parameters; microbatch activations flow rank→rank+1 via
``lax.ppermute`` in a classic GPipe schedule of ``n_micro + n_stages - 1``
ticks; outputs come back pp-stacked and the last stage's slice is taken
outside the manual region (a masked psum inside trips XLA on 3-axis meshes).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def gpipe_apply(stage_fn, stage_params, microbatches, mesh: Mesh, n_stages: int):
    """Run ``stage_fn(params_for_stage, x) -> y`` over pipeline stages.

    ``stage_params``: pytree with a leading stage axis of size ``n_stages``
    (sharded over "pp"). ``microbatches``: (M, mb, ...) activations.
    Returns (M, mb, ...) outputs, replicated over "pp".
    """
    n_micro = microbatches.shape[0]

    if n_stages == 1:  # degenerate pipeline: run the single stage per microbatch
        # (kept per-microbatch, not flattened: capacity-based MoE layers make
        # results depend on the token grouping)
        params0 = jax.tree.map(lambda x: x[0], stage_params)
        return jax.vmap(lambda mb: stage_fn(params0, mb))(microbatches)

    def per_rank(params, mbs):
        # re-anchor incoming shardings on the context (manual-pp) mesh; outer
        # shardings reference the all-Auto mesh and conflict inside this region
        am = jax.sharding.get_abstract_mesh()
        batch_spec = P(*([None] * mbs.ndim))
        mbs = lax.with_sharding_constraint(mbs, jax.NamedSharding(am, batch_spec))
        # params: stage axis is size 1 on this rank — drop it
        params = jax.tree.map(lambda x: x[0], params)
        rank = lax.axis_index("pp")

        # derive zeros arithmetically: zeros_like would pin the outer (auto-mesh)
        # sharding, which conflicts with the manual-pp context mesh
        buf_in = mbs[0] * 0
        outputs = mbs * 0
        for t in range(n_micro + n_stages - 1):
            x_in = jnp.where(rank == 0, mbs[min(t, n_micro - 1)], buf_in)
            out = stage_fn(params, x_in)
            m = t - (n_stages - 1)
            if m >= 0:  # last rank finishes microbatch m at tick t
                outputs = outputs.at[m].set(jnp.where(rank == n_stages - 1, out, outputs[m]))
            if t < n_micro + n_stages - 2:
                buf_in = lax.ppermute(out, "pp", [(i, (i + 1) % n_stages) for i in range(n_stages)])
        # every rank returns its buffer; only the last rank's slice is real.
        # Collect it OUTSIDE the manual region (slicing a pp-stacked output),
        # which avoids a masked psum that trips XLA's partitioner on 3-axis meshes.
        return outputs

    fn = jax.shard_map(
        per_rank,
        mesh=mesh,
        in_specs=(P("pp"), P()),
        out_specs=P("pp"),
        axis_names={"pp"},
        check_vma=False,
    )
    stacked = fn(stage_params, microbatches)  # (n_stages * M, mb, ...)
    return stacked[(n_stages - 1) * n_micro :]

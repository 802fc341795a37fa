"""Native param-pytree checkpointing via orbax.

The reference's only persistence is caching converted checkpoints as torch
files (reference text/t5.py:261-263, 329-331). Here converted pytrees can be
saved once and re-loaded without the source checkpoint or converter —
orbax is the TPU-native checkpoint format (sharding-aware, async-capable).
"""

from __future__ import annotations

import os


def save_params(path: str, params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, params)


def load_params(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))

"""Pure-Python torch.save zip reader vs torch.load."""

import numpy as np
import pytest

from pytorch_models_tpu.utils.torch_ckpt import load_torch_checkpoint
from tests.oracle import HAS_TORCH


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
def test_zip_checkpoint_roundtrip(tmp_path):
    import torch

    sd = {
        "a.weight": torch.randn(4, 3),
        "b.bias": torch.arange(6, dtype=torch.int64),
        "c.half": torch.randn(2, 2).half(),
        "nested": {"d": torch.randn(5)},
        "scalar": torch.tensor(3.5),
        "noncontig": torch.randn(4, 6).t(),  # non-trivial strides
    }
    path = tmp_path / "ckpt.pth"
    torch.save(sd, path)

    out = load_torch_checkpoint(str(path))
    np.testing.assert_array_equal(out["a.weight"], sd["a.weight"].numpy())
    np.testing.assert_array_equal(out["b.bias"], sd["b.bias"].numpy())
    np.testing.assert_array_equal(out["c.half"], sd["c.half"].numpy())
    np.testing.assert_array_equal(out["nested"]["d"], sd["nested"]["d"].numpy())
    assert float(out["scalar"]) == 3.5
    np.testing.assert_array_equal(out["noncontig"], sd["noncontig"].numpy())


@pytest.mark.skipif(not HAS_TORCH, reason="torch unavailable")
def test_bf16_checkpoint(tmp_path):
    import torch

    sd = {"w": torch.randn(8, 8, dtype=torch.bfloat16)}
    path = tmp_path / "bf16.pth"
    torch.save(sd, path)
    out = load_torch_checkpoint(str(path))
    np.testing.assert_array_equal(out["w"], sd["w"].float().numpy())


def test_malicious_checkpoint_rejected(tmp_path):
    """A torch-format zip whose pickle smuggles an arbitrary global (the
    classic os.system __reduce__ payload) must raise, not execute — mirrors
    the torch.load(weights_only=True) guarantee."""
    import pickle
    import pickletools
    import zipfile

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("echo pwned",))

    payload = pickle.dumps({"w": Evil()})
    path = tmp_path / "evil.pth"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
    # sanity: the payload really references posix/nt system
    assert b"system" in payload, pickletools.dis(payload)

    with pytest.raises(pickle.UnpicklingError, match="allowlist"):
        load_torch_checkpoint(str(path))


def test_benign_metadata_stubbed(tmp_path):
    """Real training checkpoints carry argparse.Namespace metadata (e.g. DETR's
    'args'); those load as inert stubs while tensors come through."""
    import argparse
    import pickle
    import zipfile

    ns = argparse.Namespace(lr=0.1, epochs=3)
    payload = pickle.dumps({"args": ns, "epoch": 7})
    path = tmp_path / "meta.pth"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
    out = load_torch_checkpoint(str(path))
    assert out["epoch"] == 7
    assert out["args"].lr == 0.1


def test_safetensors_reader(tmp_path):
    """Hand-write a .safetensors file; our dependency-free reader must parse it."""
    import json
    import struct

    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 3)).astype(np.float32)
    b = rng.integers(0, 10, (5,)).astype(np.int64)
    bufs = a.tobytes() + b.tobytes()
    header = {
        "a.weight": {"dtype": "F32", "shape": [4, 3], "data_offsets": [0, a.nbytes]},
        "b.ids": {"dtype": "I64", "shape": [5], "data_offsets": [a.nbytes, a.nbytes + b.nbytes]},
        "__metadata__": {"format": "pt"},
    }
    hdr = json.dumps(header).encode()
    path = tmp_path / "m.safetensors"
    path.write_bytes(struct.pack("<Q", len(hdr)) + hdr + bufs)

    from pytorch_models_tpu.utils.safetensors import load_safetensors

    out = load_safetensors(str(path))
    np.testing.assert_array_equal(out["a.weight"], a)
    np.testing.assert_array_equal(out["b.ids"], b)
    assert "__metadata__" not in out


def test_orbax_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp

    from pytorch_models_tpu.models.text import GPT2

    m = GPT2(1, 64)
    expected = np.asarray(m.params["token_embs"])
    m.save(str(tmp_path / "ckpt"))

    m2 = GPT2(1, 64, rng=1).load(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(np.asarray(m2.params["token_embs"]), expected)
    tokens = np.arange(8)
    np.testing.assert_allclose(np.asarray(m2(tokens)), np.asarray(m(tokens)), rtol=1e-6, atol=1e-6)


def test_orbax_sharded_restore(tmp_path):
    """load_params_sharded restores each leaf DIRECTLY onto its device
    sharding (no host-RAM full tree) and must round-trip values exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_models_tpu.parallel import make_mesh
    from pytorch_models_tpu.utils.serialization import load_params_sharded, save_params

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    r = np.random.default_rng(0)
    tree = {"w": jnp.asarray(r.standard_normal((8, 16)), jnp.float32),
            "b": jnp.asarray(r.standard_normal((16,)), jnp.float32)}
    path = str(tmp_path / "ckpt_sharded")
    save_params(path, tree)

    mesh = make_mesh(4, shape=(4,), axes=("tp",))
    shardings = {"w": NamedSharding(mesh, P(None, "tp")),
                 "b": NamedSharding(mesh, P())}
    out = load_params_sharded(path, shardings)
    assert out["w"].sharding.shard_shape(out["w"].shape) == (8, 4)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(tree["w"]))
    np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(tree["b"]))

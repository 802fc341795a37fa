"""Cross-backend parity check: fp32 model outputs on TPU vs CPU.

Validates on real hardware that the fp32 HIGHEST-precision pinning
(ops/layers.py::dot_precision) keeps TPU outputs within the ≤1e-3 north-star
budget of the CPU (reference-parity) outputs. Run on a machine with a TPU:

    python tools/tpu_parity_check.py
"""

import numpy as np


def main():
    import jax

    assert jax.devices()[0].platform != "cpu", "needs an accelerator to compare against CPU"
    cpu = jax.devices("cpu")[0]

    from pytorch_models_tpu.models.image import ViT
    from pytorch_models_tpu.models.text import GPT2

    results = {}

    vit = ViT.from_google("Ti/16_augreg")
    x = np.random.default_rng(0).standard_normal((2, 3, 224, 224)).astype(np.float32)
    tpu_out = np.asarray(vit(x))
    with jax.default_device(cpu):
        cpu_out = np.asarray(vit(x))
    results["vit_ti16_fp32"] = float(np.abs(tpu_out - cpu_out).max())

    gpt2 = GPT2(2, 128)
    tokens = np.random.default_rng(1).integers(0, 1000, (32,))
    tpu_out = np.asarray(gpt2(tokens))
    with jax.default_device(cpu):
        cpu_out = np.asarray(gpt2(tokens))
    results["gpt2_tiny_fp32"] = float(np.abs(tpu_out - cpu_out).max())

    for name, diff in results.items():
        status = "OK" if diff < 1e-3 else "FAIL"
        print(f"{name}: max abs diff {diff:.2e}  [{status}]")
    assert all(d < 1e-3 for d in results.values())


if __name__ == "__main__":
    main()

"""Attention micro-benchmark: XLA einsum vs the merged-head Pallas kernel.

Usage (real TPU): PYTHONPATH=.:$PYTHONPATH python tools/attn_bench.py [bf16|fp32]
Times a batched on-device loop (fori_loop with iteration-dependent inputs —
block_until_ready does not fence reliably through the axon tunnel) for each
(model shape, impl) pair and prints ms/call.

Round-3 retirement record (v5e, bf16) — the head-split blockwise flash
kernel measured slower than plain XLA at EVERY model shape on its native
split-head inputs, and slower than the merged-head kernel on production
layouts, so it was deleted:

    vit_b16      xla 2.15  flash 3.57  enc 2.38
    maxvit_win   xla 1.61  flash 1.68  enc 1.61
    whisper_enc  xla 3.47  flash 4.64  enc 3.95
    bert_512     xla 2.24  flash 2.65  enc 2.01
    gpt2_prefill xla 2.38  flash 2.68  enc 2.40

(The enc column pays nothing for layout in production — projections emit
merged-head — while the xla column would additionally pay merged<->split
relayouts inside a model, which is why the encoder kernel stays the
production default despite the micro numbers above.)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_models_tpu.ops.attention import _sdpa_xla

# (name, B, H, Lq, Lk, D, causal)
SHAPES = [
    ("vit_b16", 128, 12, 197, 197, 64, False),
    ("maxvit_win", 392, 2, 49, 49, 32, False),  # 8 imgs x 49 windows
    ("whisper_enc", 16, 8, 1500, 1500, 64, False),
    ("bert_512", 32, 12, 512, 512, 64, False),
    ("gpt2_prefill", 8, 12, 1024, 1024, 64, True),
]

N_ITERS = 20


def bench_one(fn, q, k, v, causal):
    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            qi = q + i.astype(q.dtype) * q.dtype.type(1e-6)
            return acc + fn(qi, k, v, None, causal).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0))

    float(loop(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    float(loop(q, k, v))
    return (time.perf_counter() - t0) / N_ITERS * 1e3


def main():
    dtype = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") else jnp.float32
    dev = jax.devices()[0]
    print(f"device {dev.device_kind}, dtype {jnp.dtype(dtype).name}")
    r = np.random.default_rng(0)
    for name, b, h, lq, lk, d, causal in SHAPES:
        q = jnp.asarray(r.standard_normal((b, h, lq, d)), dtype)
        k = jnp.asarray(r.standard_normal((b, h, lk, d)), dtype)
        v = jnp.asarray(r.standard_normal((b, h, lk, d)), dtype)
        flops = 2 * 2 * b * h * lq * lk * d / (2 if causal else 1)
        row = [f"{name:>14} (BH={b*h}, L={lq}, d={d}{', causal' if causal else ''})"]

        # production feeds the encoder kernel MERGED-HEAD (B, L, H*D) inputs
        # straight from the projections — pre-merge OUTSIDE the timed loop so
        # the enc column times the kernel, not layout conversion. (The xla
        # column gets head-split inputs, its native layout; in a full model
        # XLA additionally pays merged<->split relayouts around the sdpa.)
        def premerge(x):  # (B, H, L, D) -> (B, L, H*D)
            return jnp.swapaxes(x, 1, 2).reshape(x.shape[0], x.shape[2], -1)

        qm, km, vm = premerge(q), premerge(k), premerge(v)

        def enc_fn(qm, km, vm, bias, causal, h=h):
            from pytorch_models_tpu.ops.encoder_attention import encoder_attention

            return encoder_attention(qm, km, vm, h, causal)

        for impl, fn, args in (("xla", lambda *a: _sdpa_xla(*a), (q, k, v)),
                               ("enc", enc_fn, (qm, km, vm))):
            try:
                ms = bench_one(fn, *args, causal)
                row.append(f"{impl} {ms:7.2f} ms ({flops / (ms * 1e-3) / 1e12:5.1f} TF/s)")
            except Exception as e:
                row.append(f"{impl} FAILED: {type(e).__name__}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()

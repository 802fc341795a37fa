"""Benchmark harness: ViT-B/16 images/sec/chip on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is the fraction of the chip's analytic bf16 roofline
(peak_flops / model_flops_per_image) — the BASELINE.json north star asks for
>= 0.9. Sweep details go to stderr.

``BENCH_MODEL=whisper`` instead reports Whisper-base real-time factor
(greedy KV-cached decode, single 30 s segment); ``BENCH_MODEL=gpt2`` reports
GPT-2-small batched decode throughput in tokens/sec.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak FLOP/s per chip by device kind (first match wins)
PEAK_FLOPS = [
    ("v5 lite", 197e12),  # TPU v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v4", 275e12),
    ("v6", 918e12),  # trillium
    ("cpu", 1e12),  # arbitrary; CI smoke only
]


def vit_flops_per_image(n_layers=12, d=768, patch=16, img=224, mlp_ratio=4) -> float:
    """Analytic forward FLOPs (2 * MACs) for ViT with cls token."""
    n_tok = (img // patch) ** 2 + 1
    patch_macs = (img // patch) ** 2 * (patch * patch * 3) * d
    qkvo = 4 * n_tok * d * d
    attn = 2 * n_tok * n_tok * d
    mlp = 2 * n_tok * d * (d * mlp_ratio)
    return 2.0 * (patch_macs + n_layers * (qkvo + attn + mlp))


def bench_whisper():
    """Whisper-base RTF: 30 s of audio -> mel -> encoder -> 64 greedy tokens."""
    from pytorch_models_tpu.models.audio2text.whisper import Whisper, WhisperGenerator

    model = Whisper.from_openai("base").to_bf16()  # random weights: timing-only (zero egress)
    gen = WhisperGenerator(model)
    audio = np.random.default_rng(0).standard_normal(30 * 16_000).astype(np.float32) * 0.1
    init = [50258, 50259, 50359, 50363]
    n_tok = 64
    gen.transcribe_tokens(audio, init, eot_id=-1, max_tokens=n_tok)  # compile
    t0 = time.perf_counter()
    gen.transcribe_tokens(audio, init, eot_id=-1, max_tokens=n_tok)
    dt = time.perf_counter() - t0
    rtf = 30.0 / dt
    print(f"whisper-base: {dt*1e3:.0f} ms for 30 s audio + {n_tok} tokens -> RTF {rtf:.1f}x", file=sys.stderr)
    print(json.dumps({
        "metric": "whisper_base_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 4),  # 100x realtime as the roofline-ish target
    }))


def bench_gpt2_decode():
    """GPT-2-small batched greedy decode throughput (tokens/sec/chip)."""
    from pytorch_models_tpu.models.text import GPT2, DecoderGenerator

    model = GPT2(12, 768).to_bf16()  # random weights: timing-only (zero egress)

    class Tok:  # generate_tokens_batch only reads eos_token_id
        eos_token_id = -1  # never stop early

    gen = DecoderGenerator(model, Tok())
    batch, new_tokens = 32, 128
    prompts = [[1] * 32] * batch
    gen.generate_tokens_batch(prompts, max_tokens=new_tokens)  # compile
    t0 = time.perf_counter()
    gen.generate_tokens_batch(prompts, max_tokens=new_tokens)
    dt = time.perf_counter() - t0
    tps = batch * new_tokens / dt
    print(f"gpt2 batched decode: {tps:,.0f} tok/s (batch {batch}, {new_tokens} new)", file=sys.stderr)
    print(json.dumps({
        "metric": "gpt2_small_decode_tokens_per_sec",
        "value": round(tps, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tps / 50_000.0, 4),  # ~50k tok/s as a serving-grade target
    }))


def bench_encodec():
    """EnCodec-24khz round-trip (encode+decode) realtime factor on 10 s of audio."""
    from pytorch_models_tpu.models.audio import EnCodec

    model = EnCodec.from_facebook("24khz")  # random weights: timing-only
    seconds = 10
    audio = np.random.default_rng(0).standard_normal((1, 1, seconds * 24_000)).astype(np.float32) * 0.1

    def roundtrip():
        codes, scale = model.encode(audio)
        return np.asarray(model.decode(codes, scale))

    roundtrip()  # compile
    t0 = time.perf_counter()
    roundtrip()
    dt = time.perf_counter() - t0
    rtf = seconds / dt
    print(f"encodec-24khz round-trip: {dt*1e3:.0f} ms for {seconds}s -> RTF {rtf:.1f}x", file=sys.stderr)
    print(json.dumps({
        "metric": "encodec_24khz_roundtrip_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 4),
    }))


def main():
    # the remote-TPU tunnel sporadically hangs for long stretches (CLAUDE.md);
    # fail fast with a clear message instead of wedging the caller
    watchdog_secs = int(os.environ.get("BENCH_WATCHDOG_SECS", "1500"))
    if watchdog_secs > 0:
        import threading

        def _abort():
            print(f"bench watchdog: no result within {watchdog_secs}s (TPU tunnel likely down); aborting",
                  file=sys.stderr, flush=True)
            os._exit(3)

        t = threading.Timer(watchdog_secs, _abort)
        t.daemon = True
        t.start()

    # BENCH_PROFILE=/path captures a jax.profiler device trace around the
    # timed region (the reference has no tracing subsystem; SURVEY.md §5)
    trace_dir = os.environ.get("BENCH_PROFILE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    try:
        _main()
    finally:
        if trace_dir:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {trace_dir}", file=sys.stderr)


def _main():
    which = os.environ.get("BENCH_MODEL", "vit")
    if which == "whisper":
        bench_whisper()
        return
    if which == "gpt2":
        bench_gpt2_decode()
        return
    if which == "encodec":
        bench_encodec()
        return
    if which != "vit":
        raise SystemExit(f"unknown BENCH_MODEL={which!r}; expected vit, whisper, gpt2, or encodec")
    dev = jax.devices()[0]
    kind = dev.device_kind.lower()
    peak = next((f for k, f in PEAK_FLOPS if k in kind), 100e12)
    print(f"device: {dev.device_kind}, peak bf16 {peak/1e12:.0f} TFLOP/s", file=sys.stderr)

    from pytorch_models_tpu.models.image.vit import ViT, vit_apply
    from pytorch_models_tpu.utils.params import cast_tree

    model = ViT.from_google("B/16_augreg")
    params = cast_tree(model.params, jnp.bfloat16)
    cfg = model.cfg
    flops = vit_flops_per_image()

    n_iters = 10
    best = 0.0
    # batch 128 measured best on v5e (42% MFU); keep the bench lean — remote
    # tunnel compiles are slow and the driver runs this every round
    for batch in (128,):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((batch, 3, 224, 224)), jnp.bfloat16)

        # run the whole iteration loop on device: block_until_ready does not
        # reliably fence through the remote-TPU tunnel, and per-iter host
        # round-trips would dominate. One jit, one host pull.
        @jax.jit
        def loop(p, v):
            def body(i, acc):
                # iteration-dependent input: without it XLA hoists the whole
                # forward out of the loop and the bench times ~1 iteration
                vi = v + i.astype(v.dtype) * v.dtype.type(1e-6)
                return acc + vit_apply(p, cfg, vi).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

        float(loop(params, x))  # compile + warm
        t0 = time.perf_counter()
        float(loop(params, x))
        dt = time.perf_counter() - t0
        ips = batch * n_iters / dt
        mfu = ips * flops / peak
        print(f"batch {batch}: {ips:,.0f} img/s  (MFU {mfu:.1%})", file=sys.stderr)
        best = max(best, ips)

    roofline = peak / flops
    print(json.dumps({
        "metric": "vit_b16_images_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "images/sec",
        "vs_baseline": round(best / roofline, 4),
    }))


if __name__ == "__main__":
    main()

"""Benchmark harness: ViT-B/16 images/sec/chip on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is the fraction of the chip's analytic roofline — per-model
floors computed from bf16 peak FLOP/s and HBM bandwidth (batch-1 decode is
bandwidth-bound, so its roofline is weight+cache traffic, not FLOPs). The
BASELINE.json north star asks for >= 0.9. Sweep details go to stderr.

``BENCH_MODEL=whisper`` instead reports Whisper-base real-time factor
(greedy KV-cached decode, single 30 s segment); ``BENCH_MODEL=gpt2`` reports
GPT-2-small batched decode throughput in tokens/sec (``BENCH_DTYPE=int8``
weight-only int8 / ``int8_a8`` w8a8 megakernel / ``int8_kv`` bf16 weights +
int8 self-KV caches). ``BENCH_DTYPE=int8_a8`` with the default ViT mode
benches w8a8 serving (int8 projections/MLP on the 2x-peak int8 MXU path;
roofline switches to the mixed int8/bf16 ceiling).

Reliability (the remote-TPU tunnel sporadically hangs, CLAUDE.md): the parent
process supervises the actual measurement in a child process with a
per-attempt timeout and retries (BENCH_ATTEMPTS, default 2). On total
failure it still emits a valid JSON line with ``value: 0`` and an ``error``
field so the driver always has something to parse.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# bf16 peak FLOP/s and HBM bandwidth per chip by device kind (first match wins)
PEAK_FLOPS = [
    ("v5 lite", 197e12),  # TPU v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v4", 275e12),
    ("v6", 918e12),  # trillium
    ("cpu", 1e12),  # arbitrary; CI smoke only
]
HBM_BW = [
    ("v5 lite", 819e9),
    ("v5e", 819e9),
    ("v5p", 2765e9),
    ("v4", 1228e9),
    ("v6", 1638e9),
    ("cpu", 50e9),
]

METRICS = {
    "vit": ("vit_b16_images_per_sec_per_chip", "images/sec"),
    "whisper": ("whisper_base_rtf", "x_realtime"),
    "gpt2": ("gpt2_small_decode_tokens_per_sec", "tokens/sec"),
    "encodec": ("encodec_24khz_roundtrip_rtf", "x_realtime"),
    "t5": ("t5_base_generate_tokens_per_sec", "tokens/sec"),
    "whisper_batch": ("whisper_base_batch16_rtf", "x_realtime"),
    "gpt2_spec": ("gpt2_small_speculative_b1_floor_tokens_per_sec", "tokens/sec"),
}


def _device_caps():
    import jax

    dev = jax.devices()[0]
    kind = dev.device_kind.lower()
    peak = next((f for k, f in PEAK_FLOPS if k in kind), 100e12)
    bw = next((b for k, b in HBM_BW if k in kind), 819e9)
    print(f"device: {dev.device_kind}, peak bf16 {peak/1e12:.0f} TFLOP/s, HBM {bw/1e9:.0f} GB/s", file=sys.stderr)
    return peak, bw


def vit_flops_per_image(n_layers=12, d=768, patch=16, img=224, mlp_ratio=4) -> float:
    """Analytic forward FLOPs (2 * MACs) for ViT with cls token."""
    n_tok = (img // patch) ** 2 + 1
    patch_macs = (img // patch) ** 2 * (patch * patch * 3) * d
    qkvo = 4 * n_tok * d * d
    attn = 2 * n_tok * n_tok * d
    mlp = 2 * n_tok * d * (d * mlp_ratio)
    return 2.0 * (patch_macs + n_layers * (qkvo + attn + mlp))


def vit_a8_roofline_ips(peak, n_layers=12, d=768, patch=16, img=224, mlp_ratio=4) -> float:
    """img/s ceiling for w8a8 ViT serving: projection/MLP flops run at the
    int8 MXU peak (2x bf16 on v5e), attention einsums and the conv stem stay
    bf16 (quantize_tree_int8 leaves conv kernels alone; scores/softmax are
    not quantized)."""
    n_tok = (img // patch) ** 2 + 1
    f_int8 = 2.0 * n_layers * (4 * n_tok * d * d + 2 * n_tok * d * (d * mlp_ratio))
    f_bf16 = 2.0 * ((img // patch) ** 2 * (patch * patch * 3) * d
                    + n_layers * 2 * n_tok * n_tok * d)
    return 1.0 / (f_int8 / (2.0 * peak) + f_bf16 / peak)


def transformer_layer_macs(L, d, d_ff, ctx=None):
    """MACs for one encoder layer at seq len L (attention context ctx or L)."""
    ctx = L if ctx is None else ctx
    return 4 * L * d * d + 2 * L * ctx * d + 2 * L * d * d_ff


def whisper_base_floor(peak, bw, n_tok=64, dtype_bytes=2, kv_bytes=None):
    """Analytic time floor for 30 s audio -> encoder -> n_tok greedy tokens.

    Encoder (L=1500, batch 1) is compute-bound; batch-1 decode is
    bandwidth-bound: every step must read the decoder weights, the logits
    embedding, the cross-KV cache, and the growing self-KV cache from HBM.
    ``kv_bytes`` separates cache bytes from weight bytes (w8a8 halves only
    the weights; caches stay bf16) — defaults to ``dtype_bytes``.
    """
    kv_bytes = dtype_bytes if kv_bytes is None else kv_bytes
    d, d_ff, n_layers, L_enc, vocab, n_mels = 512, 2048, 6, 1500, 51865, 80
    stem = 3000 * 3 * n_mels * d + 1500 * 3 * d * d
    enc_macs = stem + n_layers * transformer_layer_macs(L_enc, d, d_ff)
    t_enc = 2.0 * enc_macs / peak

    # one-time cross-KV projection of the encoder memory
    t_cross = 2.0 * n_layers * 2 * L_enc * d * d / peak

    dec_param_bytes = dtype_bytes * (
        n_layers * (4 * d * d + 4 * d * d + 2 * d * d_ff)  # self + cross + mlp
        + vocab * d  # tied embedding read by the logits matmul
        + 448 * d
    )
    cross_kv_bytes = kv_bytes * n_layers * 2 * L_enc * d
    self_kv_bytes = kv_bytes * n_layers * 2 * (n_tok / 2) * d  # average position
    t_dec = n_tok * (dec_param_bytes + cross_kv_bytes + self_kv_bytes) / bw
    return t_enc + t_cross + t_dec


def gpt2_decode_roofline(peak, bw, batch, prompt_len, new_tokens, proj_bytes=2,
                         head_bytes=2, kv_bytes=2):
    """Tokens/sec floor-derived ceiling for batched greedy decode.

    Each step reads the weights once (amortized over the batch) plus each
    row's KV cache; compute is 2 * params * batch FLOPs. tokens/sec ceiling =
    batch / max(bytes / bw, flops / peak). ``proj_bytes=1`` models weight-only
    int8 (projection kernels only; embeddings/caches stay bf16).
    """
    d, d_ff, n_layers, vocab, ctx = 768, 3072, 12, 50257, 1024
    proj_params = n_layers * (4 * d * d + 2 * d * d_ff)
    other_params = vocab * d + ctx * d  # embeddings (logits matmul reads all of it)
    avg_pos = prompt_len + new_tokens / 2
    # w8a8 (head_bytes=1) streams the greedy-head table as int8 too
    # int8 KV (kv_bytes=1) adds 2 f32 scale planes per key: + 2*4 bytes/key
    kv_row = kv_bytes * 2 * d + (8 if kv_bytes == 1 else 0)
    step_bytes = proj_bytes * proj_params + head_bytes * vocab * d + 2 * ctx * d \
        + batch * n_layers * avg_pos * kv_row
    step_flops = 2.0 * batch * (proj_params + other_params + n_layers * 2 * avg_pos * d)
    t_step = max(step_bytes / bw, step_flops / peak)
    return batch / t_step


def encodec_24k_floor(peak, bw, seconds, dtype_bytes=4):
    """Encode+decode time floor: conv FLOPs at 24 kHz plus one weight read."""
    # dominant conv stacks: channels double 32->512 over strides (2,4,5,8);
    # approximate MACs per input sample for encoder+decoder round trip.
    macs = 0
    ch, rate = 32, 24_000 * seconds
    for stride in (2, 4, 5, 8):
        # residual block (k3 + k1) at ch, then strided down-conv ch->2ch (k=2*stride)
        macs += rate * (3 * ch * ch / 2 + ch * ch / 2)
        macs += (rate // stride) * (2 * stride) * ch * (2 * ch)
        ch, rate = ch * 2, rate // stride
    macs += rate * 7 * ch * ch * 2  # first/last k7 convs at full width
    macs *= 2  # decoder mirrors the encoder
    params_bytes = 15e6 * dtype_bytes
    return max(2.0 * macs / peak, params_bytes / bw) + params_bytes / bw


def _maybe_a8(model):
    """BENCH_DTYPE=int8_a8: full w8a8 serving — int8 weights + per-row
    activation quant in the decode megakernel (incl. the int8 greedy head)
    AND in every encoder/prefill linear (ops.layers.USE_A8_LINEAR)."""
    if os.environ.get("BENCH_DTYPE") != "int8_a8":
        return model, False
    from pytorch_models_tpu.ops import attention as attn_mod
    from pytorch_models_tpu.ops import layers as layers_mod

    attn_mod.USE_A8_DECODE = True
    layers_mod.USE_A8_LINEAR = True
    return model.quantize_int8(), True


def bench_whisper(peak, bw):
    """Whisper-base RTF: 30 s of audio -> mel -> encoder -> 64 greedy tokens."""
    from pytorch_models_tpu.models.audio2text.whisper import Whisper, WhisperGenerator

    import jax.numpy as jnp

    model = Whisper.from_openai("base").to_bf16()  # random weights: timing-only (zero egress)
    model, a8 = _maybe_a8(model)
    gen = WhisperGenerator(model)
    # pre-staged on device: the remote tunnel uploads ~2 MB/30 s segment at
    # ~12 MB/s, which would swamp the measurement (co-located hosts don't)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(30 * 16_000).astype(np.float32) * 0.1)
    audio.block_until_ready()
    init = [50258, 50259, 50359, 50363]
    n_tok = 64
    # time N sequential single-segment transcriptions with ONE host sync:
    # each call is the exact jit under transcribe_tokens, but pulling every
    # result through the remote tunnel adds a fixed ~30 ms host round-trip
    # per segment that a co-located serving host doesn't pay (PERF.md). The
    # segments still run strictly one-after-another on device (batch 1).
    wav = audio.astype(jnp.float32)[None]
    init_arr = jnp.asarray(init, jnp.int32)
    fn = gen._transcribe_full_batch
    reps = 8
    np.asarray(fn(model.params, wav, n_tok, init_arr, -1)[0])  # compile + warm
    t0 = time.perf_counter()
    out = [fn(model.params, wav, n_tok, init_arr, -1) for _ in range(reps)][-1]
    np.asarray(out[0])  # one sync: the device ran the calls back-to-back
    dt = (time.perf_counter() - t0) / reps
    rtf = 30.0 / dt
    # a8: weight streams halve (approx — KV/embeds stay bf16) and the encoder
    # runs on the 2x int8 MXU peak; approximate the floor with 1-byte weights
    floor = whisper_base_floor(2 * peak if a8 else peak, bw, n_tok=n_tok,
                               dtype_bytes=1 if a8 else 2, kv_bytes=2)
    rtf_roof = 30.0 / floor
    print(f"whisper-base{' w8a8' if a8 else ''}: {dt*1e3:.0f} ms for 30 s audio "
          f"+ {n_tok} tokens -> RTF {rtf:.1f}x "
          f"(analytic floor {floor*1e3:.1f} ms -> {rtf_roof:.0f}x)", file=sys.stderr)
    return rtf, rtf / rtf_roof


def bench_whisper_batch(peak, bw):
    """Whisper-base serving throughput: 16 segments transcribed in one batched
    call (amortizes the per-step decode overhead that dominates at batch 1)."""
    from pytorch_models_tpu.models.audio2text.whisper import Whisper, WhisperGenerator

    import jax.numpy as jnp

    model = Whisper.from_openai("base").to_bf16()  # random weights: timing-only
    model, a8 = _maybe_a8(model)
    gen = WhisperGenerator(model)
    b, n_tok = 16, 64
    r = np.random.default_rng(0)
    # pre-staged device batch (see bench_whisper: tunnel upload would dominate)
    audios = jnp.asarray(r.standard_normal((b, 30 * 16_000)).astype(np.float32) * 0.1)
    audios.block_until_ready()
    init = [50258, 50259, 50359, 50363]
    init_arr = jnp.asarray(init, jnp.int32)
    fn = gen._transcribe_full_batch
    reps = 4  # amortize the per-call ~30 ms tunnel round-trip (see bench_whisper)
    np.asarray(fn(model.params, audios, n_tok, init_arr, -1)[0])  # compile + warm
    t0 = time.perf_counter()
    out = [fn(model.params, audios, n_tok, init_arr, -1) for _ in range(reps)][-1]
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / reps
    rtf = b * 30.0 / dt
    # floor: batch-b encoder compute + decode weight read amortized over b rows
    d, d_ff, n_layers, L_enc, vocab, n_mels = 512, 2048, 6, 1500, 51865, 80
    wb, enc_peak = (1, 2 * peak) if a8 else (2, peak)  # w8a8: int8 weights + 2x MXU
    stem = 3000 * 3 * n_mels * d + 1500 * 3 * d * d
    t_enc = 2.0 * b * (stem + n_layers * transformer_layer_macs(L_enc, d, d_ff)) / enc_peak
    t_cross = 2.0 * b * n_layers * 2 * L_enc * d * d / enc_peak
    step_bytes = wb * (n_layers * (8 * d * d + 2 * d * d_ff) + vocab * d + 448 * d) + \
        2 * b * n_layers * 2 * (1536 + n_tok / 2) * d
    t_dec = n_tok * step_bytes / bw
    rtf_roof = b * 30.0 / (t_enc + t_cross + t_dec)
    print(f"whisper-base batch {b}{' w8a8' if a8 else ''}: {dt*1e3:.0f} ms for "
          f"{b}x30 s -> throughput RTF {rtf:.0f}x "
          f"(analytic {rtf_roof:,.0f}x)", file=sys.stderr)
    return rtf, rtf / rtf_roof


def bench_gpt2_decode(peak, bw):
    """GPT-2-small batched greedy decode throughput (tokens/sec/chip).

    ``BENCH_DTYPE=int8`` benches weight-only int8 (halves the per-step weight
    traffic that bounds batched decode; roofline scales accordingly);
    ``BENCH_DTYPE=int8_a8`` adds w8a8 — per-row activation quantization +
    int8 MXU dots in the megakernel (no per-tile dequant cast);
    ``BENCH_DTYPE=int8_kv`` keeps bf16 weights but stores the KV caches as
    per-key int8 (ops/int8_kv.py) — KV is the dominant stream at batch 32,
    so the roofline rises ~1.45x."""
    from pytorch_models_tpu.models.text import GPT2, DecoderGenerator
    from pytorch_models_tpu.ops import attention as attn_mod

    dtype_mode = os.environ.get("BENCH_DTYPE", "bf16")
    int8_kv = dtype_mode == "int8_kv"  # bf16 weights + int8 self-KV caches
    int8 = dtype_mode.startswith("int8") and not int8_kv
    if dtype_mode == "int8_a8":
        attn_mod.USE_A8_DECODE = True
    if int8_kv:
        attn_mod.USE_INT8_KV = True
    model = GPT2(12, 768).to_bf16()  # random weights: timing-only (zero egress)
    if int8:
        model = model.quantize_int8()

    class Tok:  # generate_tokens_batch only reads eos_token_id
        eos_token_id = -1  # never stop early

    gen = DecoderGenerator(model, Tok())
    # 512 new tokens: ~70 ms of fixed per-call cost (tunnel dispatch +
    # prefill) would understate steady-state decode by ~25% at 128
    batch, prompt_len, new_tokens = 32, 32, 512
    prompts = [[1] * prompt_len] * batch
    gen.generate_tokens_batch(prompts, max_tokens=new_tokens)  # compile
    # time repeated full-generation calls with ONE host sync (the jit under
    # generate_tokens_batch on pre-staged prompts): each dispatch through the
    # remote tunnel costs ~30 ms that a co-located serving host doesn't pay
    # (PERF.md ledger #22); the calls still run back-to-back on device.
    import jax
    import jax.numpy as jnp

    from pytorch_models_tpu.models.text._decoder_lm import decoder_lm_fused_ok
    from pytorch_models_tpu.models.text.generator import _generate_batch
    buf = jnp.asarray(np.full((batch, prompt_len), 1, np.int32))
    pad = jnp.zeros((batch,), jnp.int32)
    limit = prompt_len + new_tokens
    fused = decoder_lm_fused_ok(model.params, model.cfg)
    key = jax.random.PRNGKey(0)
    args = (model.params, model.cfg, buf, pad, limit, 1, -1, key, fused)
    reps = 3
    np.asarray(_generate_batch(*args)[0])  # compile + warm
    t0 = time.perf_counter()
    out = [_generate_batch(*args) for _ in range(reps)][-1]
    np.asarray(out[0])  # one sync: the device ran the calls back-to-back
    dt = (time.perf_counter() - t0) / reps
    tps = batch * new_tokens / dt
    roof = gpt2_decode_roofline(peak, bw, batch, prompt_len, new_tokens,
                                proj_bytes=1 if int8 else 2,
                                head_bytes=1 if dtype_mode == "int8_a8" else 2,
                                kv_bytes=1 if int8_kv else 2)
    print(f"gpt2 batched decode ({dtype_mode}): {tps:,.0f} tok/s "
          f"(batch {batch}, {new_tokens} new; bandwidth roofline {roof:,.0f} tok/s)", file=sys.stderr)
    return tps, tps / roof


def bench_gpt2_speculative(peak, bw):
    """Speculative-decoding WORST-CASE throughput (B=1 GPT-2-small, k=4).

    Random weights make the draft's acceptance rate ~0, so this measures the
    speculative loop's overhead floor: every iteration pays k 2-layer fused
    draft steps + one (k+1)-token verify chunk and emits ONE token. Real
    distilled drafts (acceptance a) scale it by ~(1 + a*k): the reported
    number is the guaranteed lower bound of the serving win.
    ``vs_baseline`` = floor tok/s / plain megakernel greedy tok/s measured in
    the same session (>1 means speculative can never lose at these shapes).
    Bracket details: tools/spec_bench.py, PERF.md ledger #29.
    """
    import jax
    import jax.numpy as jnp

    from pytorch_models_tpu.models.text import GPT2
    from pytorch_models_tpu.models.text._decoder_lm import decoder_lm_fused_ok
    from pytorch_models_tpu.models.text.generator import _generate_batch
    from pytorch_models_tpu.models.text.speculative import _speculative_generate

    target = GPT2(12, 768).to_bf16()  # random weights: timing-only (zero egress)
    draft = GPT2(2, 768).to_bf16()
    k, new_tokens, n, pad = 4, 128, 8, 64
    prompt_buf = np.zeros((pad,), np.int32)
    prompt_buf[:n] = 1

    def timed(fn, args, reps=4):
        np.asarray(jax.tree.leaves(fn(*args))[0])  # compile + warm
        t0 = time.perf_counter()
        out = [fn(*args) for _ in range(reps)][-1]
        np.asarray(jax.tree.leaves(out)[0])  # one sync (tunnel amortization)
        return (time.perf_counter() - t0) / reps

    bbuf = jnp.asarray(prompt_buf[None])
    pads = jnp.asarray([pad - n], jnp.int32)
    fused = decoder_lm_fused_ok(target.params, target.cfg)
    plain_args = (target.params, target.cfg, bbuf, pads, pad + new_tokens, 1, -1,
                  jax.random.PRNGKey(0), fused)
    t_plain = timed(_generate_batch, plain_args)

    fd = decoder_lm_fused_ok(draft.params, draft.cfg)
    spec_args = (target.params, target.cfg, draft.params, draft.cfg,
                 jnp.asarray(prompt_buf), n, n + new_tokens, k, -1, fd)
    t_spec = timed(_speculative_generate, spec_args)

    tps_plain, tps_spec = new_tokens / t_plain, new_tokens / t_spec
    print(f"gpt2 B=1 plain {tps_plain:,.0f} tok/s; speculative k={k} acceptance~0 "
          f"floor {tps_spec:,.0f} tok/s ({tps_spec / tps_plain:.2f}x; a=1 bound ~{(1 + k) * tps_spec:,.0f})",
          file=sys.stderr)
    return tps_spec, tps_spec / tps_plain


def t5_generate_roofline(peak, bw, batch, enc_len, new_tokens, dtype_bytes=2,
                         kv_bytes=None):
    """Tokens/sec ceiling for batched T5-base generation (encode + decode).

    The encoder and one-time cross-KV projections are compute-bound; each
    decode step reads the decoder weights once plus every row's cross- and
    self-KV caches (bandwidth-bound at batch 32). ``kv_bytes`` separates
    cache bytes from weight bytes (w8a8 halves only the weights)."""
    kv_bytes = dtype_bytes if kv_bytes is None else kv_bytes
    d, n_layers, mlp, vocab = 768, 12, 2048, 32128
    enc_macs = n_layers * (4 * enc_len * d * d + 2 * enc_len * enc_len * d + 3 * enc_len * d * mlp)
    t_enc = 2.0 * batch * enc_macs / peak
    t_cross = 2.0 * batch * n_layers * 2 * enc_len * d * d / peak

    enc_pad = -(-enc_len // 128) * 128  # caches padded to the kernel block
    dec_params = n_layers * (4 * d * d + 2 * d * d + 3 * d * mlp) + vocab * d
    cache_rows = n_layers * 2 * (enc_pad + new_tokens / 2) * d
    step_bytes = dtype_bytes * dec_params + kv_bytes * batch * cache_rows
    step_flops = 2.0 * batch * (dec_params + cache_rows)
    t_step = max(step_bytes / bw, step_flops / peak)
    return batch * new_tokens / (t_enc + t_cross + new_tokens * t_step)


def bench_t5_generate(peak, bw):
    """T5-base batched greedy generation tokens/sec (rel-pos bias through the
    Pallas decode kernel; cross-attention reads per-row valid memory)."""
    from pytorch_models_tpu.models.text.t5 import T5Generator, T5Model

    model = T5Model(32128, *_t5_dims()).to_bf16()  # random weights: timing-only
    model, a8 = _maybe_a8(model)
    gen = T5Generator(model=model, tokenizer=object())
    batch, enc_len, new_tokens = 32, 64, 64
    prompts = [[7] * enc_len] * batch
    outs = gen.generate_tokens_batch(prompts, new_tokens, pad_id=0, eos_id=-1)  # compile
    # amortize the per-call ~30 ms tunnel round-trip over sequential calls
    # with one host sync (see bench_whisper); each call is the exact jit
    # under generate_tokens_batch on pre-staged prompts
    import jax.numpy as jnp
    from pytorch_models_tpu.models.text.t5 import _t5_generate_batch
    buf = jnp.asarray(np.full((batch, enc_len), 7, np.int32))
    n_enc = jnp.asarray(np.full((batch,), enc_len, np.int32))
    reps = 4
    np.asarray(_t5_generate_batch(model.params, model.cfg, buf, n_enc, new_tokens, 0, -1)[0])
    t0 = time.perf_counter()
    out = [_t5_generate_batch(model.params, model.cfg, buf, n_enc, new_tokens, 0, -1)
           for _ in range(reps)][-1]
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / reps
    n_generated = sum(len(o) - 1 for o in outs)  # minus the pad start token
    tps = n_generated / dt
    roof = t5_generate_roofline(2 * peak if a8 else peak, bw, batch, enc_len,
                                new_tokens, dtype_bytes=1 if a8 else 2, kv_bytes=2)
    print(f"t5-base batched generate{' w8a8' if a8 else ''}: {tps:,.0f} tok/s "
          f"(batch {batch}, enc {enc_len}, "
          f"{new_tokens} new; roofline {roof:,.0f} tok/s)", file=sys.stderr)
    return tps, tps / roof


def _t5_dims():
    from pytorch_models_tpu.models.text.t5 import SIZES

    return SIZES["base"]


def bench_encodec(peak, bw):
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
    floor = encodec_24k_floor(peak, bw, seconds)
    rtf_roof = seconds / floor
    print(f"encodec-24khz round-trip: {dt*1e3:.0f} ms for {seconds}s -> RTF {rtf:.1f}x "
          f"(analytic floor {floor*1e3:.1f} ms -> {rtf_roof:.0f}x)", file=sys.stderr)
    return rtf, rtf / rtf_roof


def bench_vit(peak, bw):
    import jax
    import jax.numpy as jnp

    from pytorch_models_tpu.models.image.vit import ViT, vit_apply
    from pytorch_models_tpu.utils.params import cast_tree

    model = ViT.from_google("B/16_augreg")
    params = cast_tree(model.params, jnp.bfloat16)
    cfg = model.cfg
    flops = vit_flops_per_image()
    a8 = os.environ.get("BENCH_DTYPE") == "int8_a8"
    if a8:  # w8a8 serving: int8 projections/MLP on the 2x-peak int8 MXU path
        from pytorch_models_tpu.ops import layers as _layers
        from pytorch_models_tpu.utils.params import quantize_tree_int8

        params = quantize_tree_int8(params)
        _layers.USE_A8_LINEAR = True

    n1, n2 = 10, 40
    best = 0.0
    # batch 128 measured best on v5e (42% MFU); keep the bench lean — remote
    # tunnel compiles are slow and the driver runs this every round
    for batch in (128,):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((batch, 3, 224, 224)), jnp.bfloat16)

        # run the whole iteration loop on device: block_until_ready does not
        # reliably fence through the remote-TPU tunnel, and per-iter host
        # round-trips would dominate. SLOPE timing over two loop counts (the
        # repo's standard, PERF.md): the difference cancels the ~30 ms host
        # pull + dispatch cost that a co-located host doesn't pay.
        def make_loop(n_iters):
            @jax.jit
            def loop(p, v):
                def body(i, acc):
                    # iteration-dependent input: without it XLA hoists the
                    # whole forward out of the loop and times ~1 iteration
                    vi = v + i.astype(v.dtype) * v.dtype.type(1e-6)
                    return acc + vit_apply(p, cfg, vi).astype(jnp.float32).sum()
                return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))
            return loop

        loop1, loop2 = make_loop(n1), make_loop(n2)
        ts = {}
        for n, loop in ((n1, loop1), (n2, loop2)):
            float(loop(params, x))  # compile + warm
            t0 = time.perf_counter()
            float(loop(params, x))
            ts[n] = time.perf_counter() - t0
        ips = batch * (n2 - n1) / (ts[n2] - ts[n1])
        # a8: report utilization against the mixed int8/bf16 ceiling (same
        # basis as the returned score), not the bf16 flops/peak MFU
        mfu = ips / vit_a8_roofline_ips(peak) if a8 else ips * flops / peak
        print(f"batch {batch}: {ips:,.0f} img/s  "
              f"({'util' if a8 else 'MFU'} {mfu:.1%})", file=sys.stderr)
        best = max(best, ips)

    roofline = vit_a8_roofline_ips(peak) if a8 else peak / flops
    return best, best / roofline


# Fraction of nominal peak matmul FLOP/s actually reachable through the
# remote-TPU tunnel (measured: 148/197 TFLOP/s on an 8192^3 bf16 chain,
# PERF.md). Compute-bound metrics also report vs_practical = fraction of this
# practical ceiling so the artifact carries both MFU bases.
PRACTICAL_MATMUL_FRAC = 0.75
COMPUTE_BOUND = {"vit"}  # decode metrics are HBM-bound; the tunnel doesn't tax HBM


def emit(which, value, vs_baseline, error=None, golden=None):
    metric, unit = METRICS[which]
    line = {"metric": metric, "value": round(value, 4 if value < 1000 else 1),
            "unit": unit, "vs_baseline": round(vs_baseline, 4)}
    if which in COMPUTE_BOUND:
        line["vs_practical"] = round(min(vs_baseline / PRACTICAL_MATMUL_FRAC, 1.0), 4)
    if golden:
        line["golden"] = golden
    if error:
        line["error"] = error
    print(json.dumps(line), flush=True)


def _try_real_weight_golden(budget_secs: int):
    """Opportunistic EXECUTED real-weight parity check (BASELINE.md north
    star: <= 1e-3 max abs diff vs the PyTorch reference on real weights).

    The build environment has zero egress, so the opt-in golden suite
    (tests/pretrained) never runs there; the bench environment may have
    checkpoint-CDN access. When it does, this downloads ViT-Ti/16 AugReg
    (~23 MB), runs the same weights through our converter AND the mounted
    torch reference, and records the result in the bench JSON artifact.
    Runs in a daemon thread with a hard budget — any failure (no egress, no
    torch, no mounted reference) degrades to a 'skipped' note, never an
    error."""
    import queue
    import threading

    def work(out):
        try:
            import sys as _sys

            ref_path = os.environ.get("REFERENCE_PATH", "/root/reference")
            if ref_path not in _sys.path:
                _sys.path.insert(0, ref_path)
            import torch

            import pytorch_models  # the mounted torch reference
            from pytorch_models_tpu.models.image import ViT

            ours = ViT.from_google("Ti/16_augreg", pretrained=True)
            ref = pytorch_models.image.ViT.from_google("Ti/16_augreg", pretrained=True).eval()
            x = np.random.default_rng(1).standard_normal((2, 3, 224, 224)).astype(np.float32)
            with torch.no_grad():
                expected = ref(torch.from_numpy(x)).numpy()
            import jax

            with jax.default_matmul_precision("highest"):
                got = np.asarray(ours(x), np.float32)
            d = float(np.max(np.abs(got - expected)))
            out.put(f"vit_ti16_augreg real-weight max_abs_diff={d:.2e} "
                    f"{'PASS' if d < 1e-3 else 'FAIL'} (north star 1e-3)")
        except Exception as e:  # no egress / no torch / no reference mount
            out.put(f"skipped ({type(e).__name__}: {str(e)[:120]})")

    out: "queue.Queue[str]" = queue.Queue()
    t = threading.Thread(target=work, args=(out,), daemon=True)
    t.start()
    try:
        return out.get(timeout=budget_secs)
    except queue.Empty:
        return f"skipped (no result within {budget_secs}s)"


def _child_main(which):
    """The actual measurement; runs under the parent's per-attempt timeout."""
    import jax

    # persistent compilation cache: the fused decode-step Mosaic compiles run
    # 3-6 minutes at T5/GPT-2 scale; caching makes retries and driver re-runs
    # start hot (first-ever run still pays the compile)
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # cache is an optimization, never a requirement
        print(f"compilation cache unavailable: {e}", file=sys.stderr)

    if os.environ.get("BENCH_PLATFORM"):  # CI/debug: e.g. "cpu" (JAX_PLATFORMS is ignored under axon)
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # backstop watchdog just below the parent timeout so BENCH_PROFILE traces
    # get flushed and a JSON error line gets emitted before the parent SIGKILL
    watchdog_secs = max(int(os.environ.get("BENCH_CHILD_WATCHDOG", "0")), 0)
    trace_dir = os.environ.get("BENCH_PROFILE")
    if watchdog_secs:
        import threading

        def _abort():
            print(f"bench watchdog: no result within {watchdog_secs}s (TPU tunnel likely down); aborting",
                  file=sys.stderr, flush=True)
            if trace_dir:
                try:
                    jax.profiler.stop_trace()
                    print(f"partial profiler trace written to {trace_dir}", file=sys.stderr, flush=True)
                except Exception:
                    pass
            emit(which, 0.0, 0.0, error=f"watchdog timeout after {watchdog_secs}s")
            os._exit(3)

        wd_timer = threading.Timer(watchdog_secs, _abort)
        wd_timer.daemon = True
        wd_timer.start()

    # BENCH_PROFILE=/path captures a jax.profiler device trace around the
    # timed region (the reference has no tracing subsystem; SURVEY.md §5)
    import time as _time

    t0 = _time.time()
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    try:
        peak, bw = _device_caps()
        fn = {"vit": bench_vit, "whisper": bench_whisper, "whisper_batch": bench_whisper_batch,
              "gpt2": bench_gpt2_decode, "encodec": bench_encodec, "t5": bench_t5_generate,
              "gpt2_spec": bench_gpt2_speculative}[which]
        value, vs = fn(peak, bw)
    finally:
        if trace_dir:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {trace_dir}", file=sys.stderr)

    # the measurement succeeded: emit it BEFORE the opportunistic golden so a
    # slow/hung golden can never discard a completed run (the parent parses
    # the LAST valid JSON line, so a second emit with the golden wins)
    if watchdog_secs:
        wd_timer.cancel()  # its job (protect the measurement) is done
    emit(which, value, vs)
    golden_budget = int(os.environ.get("BENCH_GOLDEN_SECS", "240"))
    if watchdog_secs:  # never outlive the parent's hard per-attempt timeout
        golden_budget = min(golden_budget, int(watchdog_secs - (_time.time() - t0)) - 10)
    if which == "vit" and golden_budget > 0:
        golden = _try_real_weight_golden(golden_budget)
        print(f"real-weight golden: {golden}", file=sys.stderr)
        emit(which, value, vs, golden=golden)


def main():
    which = os.environ.get("BENCH_MODEL", "vit")
    if which not in METRICS:
        raise SystemExit(f"unknown BENCH_MODEL={which!r}; expected one of {sorted(METRICS)}")

    if os.environ.get("BENCH_CHILD"):
        _child_main(which)
        return

    total_budget = int(os.environ.get("BENCH_WATCHDOG_SECS", "1500"))
    attempts = max(int(os.environ.get("BENCH_ATTEMPTS", "2")), 1)
    per_attempt = total_budget // attempts if total_budget > 0 else None
    last_err = "unknown"
    for i in range(attempts):
        env = dict(os.environ, BENCH_CHILD="1")
        if per_attempt:
            env["BENCH_CHILD_WATCHDOG"] = str(max(per_attempt - 20, 30))
        print(f"bench attempt {i + 1}/{attempts} (timeout {per_attempt}s)", file=sys.stderr, flush=True)
        try:
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                                  timeout=per_attempt, stdout=subprocess.PIPE, text=True)
        except subprocess.TimeoutExpired:
            last_err = f"attempt {i + 1} hard-timed out after {per_attempt}s"
            print(f"bench: {last_err}", file=sys.stderr, flush=True)
            continue
        lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
        parsed = None
        for l in reversed(lines):
            try:
                parsed = json.loads(l)
                break
            except json.JSONDecodeError:
                continue
        if proc.returncode == 0 and parsed and "error" not in parsed:
            print(json.dumps(parsed), flush=True)
            return
        last_err = (parsed or {}).get("error") or f"attempt {i + 1} exited rc={proc.returncode}"
        print(f"bench: {last_err}; retrying" if i + 1 < attempts else f"bench: {last_err}",
              file=sys.stderr, flush=True)
    emit(which, 0.0, 0.0, error=last_err)
    sys.exit(1)


if __name__ == "__main__":
    main()

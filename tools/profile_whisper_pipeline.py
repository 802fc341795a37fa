"""Decompose single-segment Whisper transcription: mel / encode / decode loop.

The bench's 91-96 ms per 30 s segment (331x RT) has three phases inside ONE
jit call (whisper.py _transcribe_full_batch). This times each phase as its
own jit with slope timing over segments (two batch sizes of staged audio,
looped on device) — plus the end-to-end call for reference.

Run: python tools/profile_whisper_pipeline.py [n_tokens]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def timeit(name, fn, *args, reps=12):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    np.asarray(jax.tree.leaves(out)[0])  # host fence through the tunnel
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    print(f"{name:18s} {best:8.2f} ms", flush=True)
    return best


def main():
    n_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1  # 16 = bench shape
    from functools import partial

    from pytorch_models_tpu.models.audio2text.whisper import (
        Whisper, WhisperGenerator, _whisper_encode_body,
        _whisper_generate_batch_body)

    model = Whisper.from_openai("base").to_bf16()
    cfg = model.cfg
    gen = WhisperGenerator(model)
    pre_fwd = gen.preprocessor._forward

    r = np.random.default_rng(0)
    wav = jnp.asarray(r.standard_normal((batch, gen.N_SAMPLES)), jnp.float32)
    init = jnp.asarray([50258, 50259, 50359, 50363], jnp.int32)

    mel_fn = jax.jit(pre_fwd)
    mel = mel_fn(wav)

    enc_fn = jax.jit(partial(_whisper_encode_body, cfg=cfg))

    def enc_wrap(params, mel):
        return _whisper_encode_body(params, cfg, mel)

    enc_fn = jax.jit(enc_wrap)
    memory = enc_fn(model.params, mel)

    @partial(jax.jit, static_argnums=(2,))
    def dec_fn(params, memory, max_tokens, initial_tokens, eot_id):
        return _whisper_generate_batch_body(params, cfg, memory, initial_tokens,
                                            max_tokens, eot_id)

    @partial(jax.jit, static_argnums=(2,))
    def full_fn(params, audio, max_tokens, initial_tokens, eot_id):
        mel = pre_fwd(audio)
        memory = _whisper_encode_body(params, cfg, mel)
        return _whisper_generate_batch_body(params, cfg, memory, initial_tokens,
                                            max_tokens, eot_id)

    # eot_id=-1: never emitted, so the decode always runs the full n_tokens
    print(f"whisper-base B={batch} pipeline, {n_tokens} decode steps")
    t_mel = timeit("mel", mel_fn, wav)
    t_enc = timeit("encode", enc_fn, model.params, mel)
    t_dec = timeit("decode_loop", dec_fn, model.params, memory, n_tokens + 8, init, -1)
    t_full = timeit("full", full_fn, model.params, wav, n_tokens + 8, init, -1)
    n_steps = n_tokens + 8 - len(init)  # prefill emits 1; loop runs the rest
    print(f"decode  {t_dec / n_steps:6.3f} ms/step over {n_steps} steps")
    print(f"sum(mel+enc+dec) = {t_mel + t_enc + t_dec:.2f} vs full {t_full:.2f} "
          f"(gap = per-call overhead)")


if __name__ == "__main__":
    main()

"""Continuous vs static batching on the real TPU (GPT-2-small, bf16).

Workload: requests with mixed generation budgets. Static batching decodes
cohorts of B and waits for each cohort's longest row; continuous batching
admits the next request the moment a slot frees (modulo check_every).
The win is the parked-slot area: sum(max_b - b_i) over each static cohort.

Run: python tools/cb_bench.py [pool_B] [n_requests]
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


class _Tok:
    eos_token_id = -1  # random weights: run to budget (worst case for CB)

    def encode(self, s):
        return [1] * 8

    def decode(self, ids):
        return " ".join(map(str, ids))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pytorch_models_tpu.models.text import ContinuousBatchingGenerator, DecoderGenerator, GPT2

    model = GPT2(12, 768).to_bf16()
    tok = _Tok()
    r = np.random.default_rng(0)
    prompts = [[int(x) for x in r.integers(0, 50_000, (8,))] for _ in range(n_req)]
    budgets = [int(x) for x in r.integers(32, 257, (n_req,))]
    total_gen = sum(budgets)
    print(f"gpt2-small bf16, pool B={b}, {n_req} requests, budgets 32-256 "
          f"(sum {total_gen})", flush=True)

    # --- static: cohorts of B, per-cohort budget = max over the cohort
    static_gen = DecoderGenerator(model, tok)

    def run_static():
        outs = []
        for i in range(0, n_req, b):
            sl = slice(i, i + b)
            outs += static_gen.generate_tokens_batch(prompts[sl], max(budgets[sl]))
        return outs

    # --- continuous
    cb = ContinuousBatchingGenerator(model, tok, batch_size=b, prompt_bucket=64,
                                     check_every=32)

    def run_cb():
        return cb.generate_tokens_many(prompts, budgets)

    for name, fn in (("static", run_static), ("continuous", run_cb)):
        fn()  # compile
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{name:11s} {dt:6.2f} s  ->  {total_gen/dt:8,.0f} useful tok/s",
              flush=True)


if __name__ == "__main__":
    main()

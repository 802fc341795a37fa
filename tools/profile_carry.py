"""Is the while/fori carry being copied every iteration? (TPU)

Run: python tools/profile_carry.py
Then: XLA_FLAGS=--xla_tpu_enable_while_loop_double_buffering=false python tools/profile_carry.py
"""

import os
import time

import jax
import jax.numpy as jnp
from jax import lax

N_STEPS = 64


def timeit(name, fn, *args):
    fn(*args)
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name:40s} {dt / N_STEPS * 1e3:7.3f} ms/step")


def main():
    print("XLA_FLAGS =", os.environ.get("XLA_FLAGS", ""))
    big = jnp.zeros((24, 32, 12, 1024, 64), jnp.bfloat16)  # 1.15 GB
    upd = jnp.ones((24, 32, 12, 1, 64), jnp.bfloat16)

    def ident(buf):
        def body(i, s):
            buf, acc = s
            return buf, acc + i
        buf, acc = lax.fori_loop(0, N_STEPS, body, (buf, jnp.int32(0)))
        return acc + buf[0, 0, 0, 0, 0].astype(jnp.int32)

    def dus(buf):
        def body(i, buf):
            return lax.dynamic_update_slice(buf, upd, (0, 0, 0, i, 0))
        buf = lax.fori_loop(0, N_STEPS, body, buf)
        return buf.astype(jnp.float32).sum()

    def dus_while(buf):
        def cond(s):
            return s[0] < N_STEPS
        def body(s):
            i, buf = s
            return i + 1, lax.dynamic_update_slice(buf, upd, (0, 0, 0, i, 0))
        _, buf = lax.while_loop(cond, body, (jnp.int32(0), buf))
        return buf.astype(jnp.float32).sum()

    timeit("identity body, 1.15GB carry", jax.jit(ident), big)
    timeit("one DUS into 1.15GB carry (fori)", jax.jit(dus), big)
    timeit("one DUS into 1.15GB carry (while)", jax.jit(dus_while), big)


if __name__ == "__main__":
    main()

"""Characterize dynamic_update_slice cost inside on-device loops (TPU).

Hypotheses for the flat ~1.6 ms/step cache-update cost seen in
profile_decode.py: (a) per-DUS op overhead, (b) sublane-dim dynamic index
forcing tile read-modify-write, (c) carry double-buffer copies.
Run: python tools/profile_dus.py
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

B, H, S, D, N_STEPS = 32, 12, 1024, 64, 64


def timeit(name, fn, *args):
    fn(*args)
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name:34s} {dt / N_STEPS * 1e3:7.3f} ms/step")
    return dt / N_STEPS


def loop_list(n_bufs, shape, idx_of_pos):
    """n_bufs separate buffers, one DUS each per step."""
    bufs = [jnp.zeros(shape, jnp.bfloat16) for _ in range(n_bufs)]
    upd_shape = tuple(1 if i == idx_of_pos else s for i, s in enumerate(shape))
    upd = jnp.ones(upd_shape, jnp.bfloat16)

    def run(bufs):
        def body(i, bufs):
            start = tuple(i if k == idx_of_pos else 0 for k in range(len(shape)))
            return [lax.dynamic_update_slice(b, upd, start) for b in bufs]
        bufs = lax.fori_loop(0, N_STEPS, body, bufs)
        return sum(b.astype(jnp.float32).sum() for b in bufs)

    return jax.jit(run), bufs


def main():
    print(f"device: {jax.devices()[0].device_kind}; {N_STEPS} steps; buf (B,H,S,D)=({B},{H},{S},{D}) bf16")

    for n in (24, 12, 4, 1):
        fn, bufs = loop_list(n, (B, H, S, D), 2)
        timeit(f"{n:2d} bufs (B,H,S,D), pos on sublane", fn, bufs)

    fn, bufs = loop_list(24, (S, B, H, D), 0)
    timeit("24 bufs (S,B,H,D), pos leading", fn, bufs)

    fn, bufs = loop_list(1, (24, B, H, S, D), 3)
    timeit(" 1 buf  (24,B,H,S,D) one big DUS", fn, bufs)

    fn, bufs = loop_list(1, (S, 24, B, H, D), 0)
    timeit(" 1 buf  (S,24,B,H,D) pos leading", fn, bufs)

    # static-index write via .at with index arithmetic inside scan instead?
    # also: same 24-buf layout but updates at a CONSTANT position
    bufs = [jnp.zeros((B, H, S, D), jnp.bfloat16) for _ in range(24)]
    upd = jnp.ones((B, H, 1, D), jnp.bfloat16)

    def run_const(bufs):
        def body(i, bufs):
            return [lax.dynamic_update_slice(b, upd + i.astype(jnp.bfloat16), (0, 0, 5, 0)) for b in bufs]
        bufs = lax.fori_loop(0, N_STEPS, body, bufs)
        return sum(b.astype(jnp.float32).sum() for b in bufs)
    timeit("24 bufs const-index DUS", jax.jit(run_const), bufs)


if __name__ == "__main__":
    main()

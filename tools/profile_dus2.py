"""DUS-in-loop cost with COMPUTED updates (no constant-sink broadcast artifact).

Run: python tools/profile_dus2.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

N_STEPS = 64


def timeit(name, fn, *args):
    float(fn(*args))  # compile + warm; host pull fences through the tunnel
    t0 = time.perf_counter()
    float(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt / N_STEPS * 1e3:7.3f} ms/step")


def bench(name, shape, make_upd, make_start, mult=1):
    """One stacked buffer; computed update each step."""
    buf = jnp.zeros(shape, jnp.bfloat16)
    seed = jnp.ones((24, 32, 12, 64), jnp.bfloat16)  # layers x batch x heads x d

    def run(buf, x):
        def body(i, s):
            buf, x = s
            x = x * jnp.bfloat16(1.00001)
            buf = lax.dynamic_update_slice(buf, make_upd(x), make_start(i * mult))
            return buf, x
        buf, x = lax.fori_loop(0, N_STEPS, body, (buf, x))
        return buf.astype(jnp.float32).sum() + x.astype(jnp.float32).sum()

    timeit(name, jax.jit(run), buf, seed)


def main():
    print(f"device: {jax.devices()[0].device_kind}; {N_STEPS} steps; 24x(32,12,S,64) KV bf16, computed updates")

    bench("(24,B,H,1024,64) pos@sublane", (24, 32, 12, 1024, 64),
          lambda x: x[:, :, :, None, :], lambda i: (0, 0, 0, i, 0))
    bench("(1024,24,B,H,64) pos@major", (1024, 24, 32, 12, 64),
          lambda x: x[None], lambda i: (i, 0, 0, 0, 0))
    bench("(24,B,1024,H*64) pos@sublane lanes=768", (24, 32, 1024, 768),
          lambda x: x.reshape(24, 32, 1, 768), lambda i: (0, 0, i, 0))
    # OOMs on 16GB HBM:
    # bench("(24,B,H,8192,64) ALIGNEDx8", (24, 32, 12, 8192, 64),
    #       lambda x: x[:, :, :, None, :], lambda i: (0, 0, 0, i, 0), mult=8)
    bench("(24,B,H,256,64)  pos@sublane", (24, 32, 12, 256, 64),
          lambda x: x[:, :, :, None, :], lambda i: (0, 0, 0, i, 0))
    bench("(256,24,B,H,64)  pos@major", (256, 24, 32, 12, 64),
          lambda x: x[None], lambda i: (i, 0, 0, 0, 0))


if __name__ == "__main__":
    main()

"""Probe: (a) max allocatable HBM on this chip, (b) D2H tunnel bandwidth.

Decides the 2^30 kv sort memory plan: if usable HBM >= 16.5 GB the naive
per-pass ping-pong (8 GB in + 8 GB out) fits; otherwise the final passes
must consume input as they produce output (chunked merge), and D2H
bandwidth decides whether output chunks can stream to host.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

print(f"backend={jax.default_backend()}", flush=True)


@jax.jit
def make(n):
    return jnp.ones((n,), jnp.uint32)


# (a) binary search max allocatable, 0.25 GB granularity
GB = 1 << 28  # u32 elems per GB
lo, hi = 8, 80  # quarter-GB units
while lo < hi:
    mid = (lo + hi + 1) // 2
    try:
        x = jax.jit(lambda: jnp.ones((mid * GB // 4,), jnp.uint32))()
        np.asarray(x[:1])
        del x
        lo = mid
    except Exception as e:
        print(f"  alloc {mid/4:.2f} GB failed: {type(e).__name__}",
              flush=True)
        del e
        hi = mid - 1
print(f"max single alloc ~{lo/4:.2f} GB", flush=True)

# total across 2 buffers
for total_q in (66, 64, 62, 60, 56):
    half = total_q * GB // 8
    try:
        a = jax.jit(lambda: jnp.ones((half,), jnp.uint32))()
        b = jax.jit(lambda: jnp.zeros((half,), jnp.uint32))()
        np.asarray(a[:1]); np.asarray(b[:1])
        print(f"2-buffer total {total_q/4:.2f} GB: OK", flush=True)
        del a, b
        break
    except Exception as e:
        print(f"2-buffer total {total_q/4:.2f} GB failed: "
              f"{type(e).__name__}", flush=True)

# (b) D2H bandwidth: fetch 512 MB
x = jax.jit(lambda: jnp.ones((GB // 2,), jnp.uint32))()
np.asarray(x[:1])
t0 = time.perf_counter()
h = np.asarray(x)
dt = time.perf_counter() - t0
print(f"D2H 512 MB: {dt*1e3:.0f} ms = {0.5/dt:.2f} GB/s", flush=True)
t0 = time.perf_counter()
y = jax.device_put(h)
np.asarray(y[:1])
dt = time.perf_counter() - t0
print(f"H2D 512 MB: {dt*1e3:.0f} ms = {0.5/dt:.2f} GB/s", flush=True)

"""Probe raw TPU primitive throughput to inform the Pallas radix-sort design.

Measures: HBM copy BW, lax.sort (keys, kv), XLA scatter, XLA gather,
take_along_axis, and the composed pipeline's per-pass cost.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from lsdradixsort_tpu.core.timing import time_fn

N = 1 << 27  # 134M

key = jax.random.PRNGKey(0)
keys = jax.random.bits(key, (N,), dtype=jnp.uint32)
vals = jnp.arange(N, dtype=jnp.uint32)
perm = jax.random.permutation(jax.random.PRNGKey(1), N).astype(jnp.uint32)

def report(name, t, nbytes):
    print(f"{name:28s} {t.ms:10.3f} ms   {nbytes/t.seconds/1e9:8.1f} GB/s")

# copy bandwidth
f = jax.jit(lambda x: x + jnp.uint32(1))
t = time_fn(f, keys, iters=20)
report("copy (r+w 4B)", t, N * 8)

# lax.sort keys only
f = jax.jit(jax.lax.sort)
t = time_fn(f, keys, iters=3)
report("lax.sort keys", t, N * 4)
print(f"  -> {N/t.seconds/1e9:.3f} Gelem/s")

# lax.sort kv
f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True))
t = time_fn(f, keys, vals, iters=3)
report("lax.sort kv stable", t, N * 8)
print(f"  -> {N/t.seconds/1e9:.3f} Gelem/s")

# gather via take
f = jax.jit(lambda x, p: x[p])
t = time_fn(f, keys, perm, iters=5)
report("gather x[perm]", t, N * 12)

# scatter via .at[].set
f = jax.jit(lambda x, p: jnp.zeros_like(x).at[p].set(x, unique_indices=True))
t = time_fn(f, keys, perm, iters=5)
report("scatter .at[p].set", t, N * 12)

# 2D take_along_axis (blockwise gather)
B = 1 << 13
k2 = keys.reshape(-1, B)
p2 = jnp.argsort(k2 & 0xFF, axis=1, stable=True).astype(jnp.int32)
f = jax.jit(lambda x, p: jnp.take_along_axis(x, p, axis=1))
t = time_fn(f, k2, p2, iters=5)
report(f"take_along_axis B={B}", t, N * 12)

# argsort of digits per block
f = jax.jit(lambda x: jnp.argsort(x & 0xFF, axis=1, stable=True))
t = time_fn(f, k2, iters=3)
report(f"argsort8bit axis=1 B={B}", t, N * 8)

"""Micro-benchmarks of XLA/TPU primitives that decide the sort architecture.

Timing strategy: the axon tunnel has ~20ms host roundtrip latency, so we
enqueue ITERS async dispatches back-to-back and fetch one byte at the end;
per-op time = (total - roundtrip)/ITERS.
"""
import time
import jax, jax.numpy as jnp
import numpy as np

N = 1 << 26  # 64M u32 = 256MB
ITERS = 10

def fetch(r):
    np.asarray(jax.tree.leaves(r)[0].ravel()[:1])

def timeit(f, *args, iters=ITERS):
    r = f(*args); fetch(r)                       # warmup/compile
    t0 = time.perf_counter(); fetch(f(*args)); rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    fetch(r)
    tot = time.perf_counter() - t0
    return max((tot - 0) / iters, 1e-9)  # roundtrip amortized over iters

key = jax.random.PRNGKey(0)
x = jax.block_until_ready(jax.random.bits(key, (N,), dtype=jnp.uint32))

def report(name, t, elems=N, bytes_=None):
    s = f"{name:16s} {t*1e3:8.2f} ms  {elems/t/1e6:9.1f} Melem/s"
    if bytes_: s += f"  {bytes_/t/1e9:7.1f} GB/s"
    print(s, flush=True)

report("copy(+1)", timeit(jax.jit(lambda a: a + jnp.uint32(1)), x), bytes_=8*N)
report("jnp.sort", timeit(jax.jit(jnp.sort), x, iters=3))
idx = jax.block_until_ready(jax.random.permutation(key, N).astype(jnp.int32))
report("gather[perm]", timeit(jax.jit(lambda a, i: a[i]), x, idx, iters=3))
f_scat = jax.jit(lambda a, i: jnp.zeros_like(a).at[i].set(a, unique_indices=True))
report("scatter[perm]", timeit(f_scat, x, idx, iters=3))
# sorted-ish indices scatter (radix pass indices are sorted per digit run)
sidx = jax.block_until_ready(jnp.sort(idx[:N//256]).astype(jnp.int32))
f_scat2 = jax.jit(lambda a, i: jnp.zeros_like(a).at[i].set(a[:i.shape[0]], unique_indices=True, indices_are_sorted=True))
report("scatter[sorted,N/256]", timeit(f_scat2, x, sidx, iters=3), elems=N//256)
report("cumsum 1d", timeit(jax.jit(jnp.cumsum), x), bytes_=8*N)
x2 = x.reshape(-1, 256)
report("cumsum 2d ax0", timeit(jax.jit(lambda a: jnp.cumsum(a, axis=0)), x2), bytes_=8*N)
dig = jax.block_until_ready((x & 0xFF).astype(jnp.uint8))
report("sortkv u8 key", timeit(jax.jit(lambda d, v: jax.lax.sort((d, v), num_keys=1, is_stable=True)), dig, x, iters=3))
report("sortkv u32 key", timeit(jax.jit(lambda d, v: jax.lax.sort((d, v), num_keys=1, is_stable=True)), x, idx, iters=3))

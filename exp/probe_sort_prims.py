"""Probe: XLA row-wise sort widths; in-kernel lax.sort; roll-based cumsum."""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

N = 1 << 24  # 16M for quick sweeps
x = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)

print("== XLA row-wise sort (values, u32) ==")
for W in (128, 256, 512, 1024, 4096):
    xr = x.reshape(-1, W)
    f = jax.jit(lambda a: jnp.sort(a, axis=-1))
    t = time_fn(f, xr, iters=5)
    print(f"  width={W:5d}: {t.ms:8.2f} ms  {N/t.seconds/1e9:6.2f} Gelem/s")

print("== XLA row-wise sort_key_val (u32 composite key, u32 val) ==")
for W in (256, 1024):
    xr = x.reshape(-1, W)
    v = jnp.arange(N, dtype=jnp.uint32).reshape(-1, W)
    f = jax.jit(lambda a, b: jax.lax.sort((a & 0xFF, b), num_keys=1, is_stable=True))
    t = time_fn(f, xr, v, iters=5)
    print(f"  width={W:5d}: {t.ms:8.2f} ms  {N/t.seconds/1e9:6.2f} Gelem/s")

print("== in-kernel lax.sort ==")
R, C = 128, 128
NT = N // (R * C)
def sort_kernel(x_ref, o_ref):
    o_ref[...] = jax.lax.sort(x_ref[...].reshape(R, C), dimension=-1).reshape(1, R, C)
@jax.jit
def ksort(a):
    return pl.pallas_call(
        sort_kernel, grid=(NT,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
    )(a)
try:
    out = ksort(x.reshape(NT, R, C))
    jax.block_until_ready(out)
    t = time_fn(ksort, x.reshape(NT, R, C), iters=5)
    print(f"  OK {t.ms:.2f} ms  {N/t.seconds/1e9:.2f} Gelem/s")
except Exception as e:
    print("  FAIL", str(e).splitlines()[0][:120])

print("== in-kernel roll-based cumsum along lanes (log steps) ==")
def cumsum_lanes(v):  # (R, C) int32, C=128
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    for s in (1, 2, 4, 8, 16, 32, 64):
        v = v + jnp.where(lane >= s, pltpu.roll(v, s, 1), 0)
    return v
def cum_kernel(x_ref, o_ref):
    v = (x_ref[...].reshape(R, C) & 1).astype(jnp.int32)
    o_ref[...] = cumsum_lanes(v).reshape(1, R, C).astype(jnp.uint32)
@jax.jit
def kcum(a):
    return pl.pallas_call(
        cum_kernel, grid=(NT,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
    )(a)
try:
    xr = x.reshape(NT, R, C)
    out = kcum(xr)
    ref = np.cumsum(np.asarray(xr) & 1, axis=-1).astype(np.uint32)
    t = time_fn(kcum, xr, iters=5)
    print(f"  OK {t.ms:.2f} ms  {N/t.seconds/1e9:.2f} Gelem/s  correct={bool((np.asarray(out)==ref).all())}")
except Exception as e:
    print("  FAIL", str(e).splitlines()[0][:120])

print("== bigger copy BW check (2^28 u32) ==")
big = jax.random.bits(jax.random.PRNGKey(1), (1 << 28,), dtype=jnp.uint32)
f = jax.jit(lambda a: a + jnp.uint32(1))
t = time_fn(f, big, iters=10)
print(f"  {t.ms:.2f} ms  {big.size*8/t.seconds/1e9:.1f} GB/s")

print("== in-kernel batched matmul perm: shared L(128,128) @ X ==")
def mm_kernel(x_ref, o_ref):
    xx = x_ref[...].reshape(R, C).astype(jnp.float32)
    L = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) >=
         jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)).astype(jnp.float32)
    o_ref[...] = jnp.dot(L, xx, preferred_element_type=jnp.float32
                         ).reshape(1, R, C).astype(jnp.uint32)
@jax.jit
def kmm(a):
    return pl.pallas_call(
        mm_kernel, grid=(NT,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
    )(a)
try:
    xr = (x & jnp.uint32(0xFF)).reshape(NT, R, C)
    out = kmm(xr)
    jax.block_until_ready(out)
    t = time_fn(kmm, xr, iters=5)
    print(f"  OK {t.ms:.2f} ms  {N/t.seconds/1e9:.2f} Gelem/s (cumsum-along-rows via MXU)")
except Exception as e:
    print("  FAIL", str(e).splitlines()[0][:120])

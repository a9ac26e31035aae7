"""Ceiling probe v2 (single process): XLA vs pallas big-block vs read/write-only."""
import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

N = 1 << 27
LANES = 128
t0 = time.time()


def rep(name, t, gbytes):
    print(f"{name:40s} {t.ms:8.2f} ms {gbytes/t.seconds:7.1f} GB/s "
          f"[at {time.time()-t0:.0f}s]", flush=True)


x = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
jax.block_until_ready(x)
print(f"data ready {time.time()-t0:.1f}s", flush=True)

f1 = jax.jit(lambda a: a + 1)
rep("xla x+1 flat", time_fn(f1, x, iters=10), N * 8 / 1e9)

xr = x.reshape(N // LANES, LANES)
for rpb in (2048, 8192, 16384):
    nb = (N // LANES) // rpb
    spec = pl.BlockSpec((rpb, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    def kern(i_ref, o_ref):
        o_ref[...] = i_ref[...] + 1
    fp = jax.jit(lambda a, spec=spec, nb=nb: pl.pallas_call(
        kern, grid=(nb,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.uint32))(a))
    rep(f"pallas blocks {rpb*512//1024}KB", time_fn(fp, xr, iters=10),
        N * 8 / 1e9)

fs = jax.jit(lambda a: jnp.sum(a, dtype=jnp.uint32))
rep("xla sum (read-only)", time_fn(fs, x, iters=10), N * 4 / 1e9)
fw = jax.jit(lambda: jnp.zeros((N,), jnp.uint32) + 7)
rep("xla fill (write-only)", time_fn(fw, iters=10), N * 4 / 1e9)

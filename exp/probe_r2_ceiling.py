"""Round-2 probe: is the ~310 GB/s measured copy ceiling real? (VERDICT #3)

Variants: XLA elementwise, donation, pallas streamed blocks of various
sizes, pure-DMA HBM->HBM kernel with deep pipelining, multiple arrays.
v5e spec: 819 GB/s.
"""
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

N = 1 << 27  # 512 MB u32
LANES = 128


def rep(name, t, gbytes):
    print(f"{name:48s} {t.ms:8.2f} ms {gbytes/t.seconds:7.1f} GB/s")


def xla_copy():
    x = jnp.arange(N, dtype=jnp.uint32)
    f = jax.jit(lambda a: a + 1)
    jax.block_until_ready(f(x))
    rep("xla x+1", time_fn(f, x, iters=10), N * 4 * 2 / 1e9)


def xla_copy_donate():
    f = jax.jit(lambda a: a + 1, donate_argnums=0)
    def g():
        x = jnp.arange(N, dtype=jnp.uint32)
        jax.block_until_ready(x)
        import time
        t0 = time.perf_counter()
        y = x
        for _ in range(10):
            y = f(y)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / 10
    s = g()
    print(f"{'xla x+1 donated':48s} {s*1e3:8.2f} ms {N*4*2/1e9/s:7.1f} GB/s")


def pallas_block_copy(rows_per_block):
    rows = N // LANES
    nb = rows // rows_per_block
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1
    spec = pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    x = jnp.arange(N, dtype=jnp.uint32).reshape(rows, LANES)
    f = jax.jit(lambda a: pl.pallas_call(
        kern, grid=(nb,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32))(a))
    jax.block_until_ready(f(x))
    rep(f"pallas blocks ({rows_per_block}x128={rows_per_block*512//1024}KB)",
        time_fn(f, x, iters=10), N * 4 * 2 / 1e9)


def pallas_dma_hbm(chunk_rows, depth):
    """Pure HBM->HBM DMA, no VMEM staging, DEPTH outstanding."""
    rows = N // LANES
    nchunks = rows // chunk_rows
    def kern(x_hbm, o_hbm, sems):
        def mk(i):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * chunk_rows, chunk_rows), :],
                o_hbm.at[pl.ds(i * chunk_rows, chunk_rows), :],
                sems.at[i % depth])
        for i in range(depth):
            mk(i).start()
        def body(i, _):
            mk(i).wait()
            @pl.when(i + depth < nchunks)
            def _():
                mk(i + depth).start()
            return 0
        jax.lax.fori_loop(0, nchunks, body, 0)
    x = jnp.arange(N, dtype=jnp.uint32).reshape(rows, LANES)
    f = jax.jit(lambda a: pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(a))
    jax.block_until_ready(f(x))
    rep(f"pure DMA hbm->hbm chunk={chunk_rows*512//1024}KB depth={depth}",
        time_fn(f, x, iters=10), N * 4 * 2 / 1e9)


def two_streams():
    """Two independent arrays in one jit — does concurrency help?"""
    x = jnp.arange(N // 2, dtype=jnp.uint32)
    y = jnp.arange(N // 2, dtype=jnp.uint32)
    f = jax.jit(lambda a, b: (a + 1, b + 1))
    jax.block_until_ready(f(x, y))
    rep("xla two arrays x+1", time_fn(f, x, y, iters=10), N * 4 * 2 / 1e9)


CASES = {
    "xla": xla_copy,
    "donate": xla_copy_donate,
    "pb512": functools.partial(pallas_block_copy, 512),
    "pb2048": functools.partial(pallas_block_copy, 2048),
    "pb8192": functools.partial(pallas_block_copy, 8192),
    "dma512": functools.partial(pallas_dma_hbm, 512, 4),
    "dma2048": functools.partial(pallas_dma_hbm, 2048, 4),
    "dma8192": functools.partial(pallas_dma_hbm, 8192, 8),
    "two": two_streams,
}

if __name__ == "__main__":
    import sys
    for name in (sys.argv[1:] or CASES):
        CASES[name]()

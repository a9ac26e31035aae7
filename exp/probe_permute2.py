"""Probe round 2: 2D take_along_axis in Pallas, pipelined DMA fan-out."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

R, C = 64, 128
NT = 2048


def try_one(name, fn, *args, check=None):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t = time_fn(fn, *args, iters=10)
        n = args[0].size
        line = f"{name:36s} OK  {t.ms:9.3f} ms  {n/t.seconds/1e9:7.2f} Gelem/s"
        if check is not None:
            line += f"  correct={bool((np.asarray(out).reshape(check.shape) == check).all())}"
        print(line)
        return out, t
    except Exception as e:
        print(f"{name:36s} FAIL {str(e).splitlines()[0][:140]}")
        return None, None


x = jax.random.bits(jax.random.PRNGKey(0), (NT, R, C), dtype=jnp.uint32)

# ---- Q1 retry: 2D lane gather ----
def lane_gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(
        x_ref[...].reshape(R, C), idx_ref[...].reshape(R, C), axis=-1
    ).reshape(1, R, C)

def mk(kernel, idx_dtype=jnp.int32):
    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
        )(x, idx)
    return f

idxs = jax.vmap(lambda k: jax.random.permutation(k, C))(
    jax.random.split(jax.random.PRNGKey(1), NT * R)).reshape(NT, R, C).astype(jnp.int32)
ref = np.take_along_axis(np.asarray(x), np.asarray(idxs), axis=-1)
try_one("Q1 2D lane gather axis=-1", mk(lane_gather_kernel), x, idxs, check=ref)

# ---- Q2 retry: 2D sublane gather ----
def sub_gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(
        x_ref[...].reshape(R, C), idx_ref[...].reshape(R, C), axis=0
    ).reshape(1, R, C)

idxs2 = jax.random.randint(jax.random.PRNGKey(2), (NT, R, C), 0, R, dtype=jnp.int32)
ref2 = np.take_along_axis(np.asarray(x), np.asarray(idxs2), axis=-2)
try_one("Q2 2D sublane gather axis=0", mk(sub_gather_kernel), x, idxs2, check=ref2)

# ---- Q3: flat gather as (1, T)? needs idx 2D (1, T) ----
RT = R * C
def flat_kernel(x_ref, idx_ref, o_ref):
    xf = x_ref[...].reshape(1, RT)
    o_ref[...] = jnp.take_along_axis(
        xf, idx_ref[...].reshape(1, RT), axis=-1).reshape(1, R, C)

idxf = jax.vmap(lambda k: jax.random.permutation(k, RT))(
    jax.random.split(jax.random.PRNGKey(3), NT)).reshape(NT, R, C).astype(jnp.int32)
reff = np.take_along_axis(np.asarray(x).reshape(NT, RT), np.asarray(idxf).reshape(NT, RT),
                          axis=-1).reshape(NT, R, C)
try_one("Q3 flat (1,8192) gather", mk(flat_kernel), x, idxf, check=reff)

# ---- Q3b: wide-row gather: (8, 1024) shape gather along lanes ----
R2, C2 = 8, 1024
def wide_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(
        x_ref[...].reshape(R2, C2), idx_ref[...].reshape(R2, C2), axis=-1
    ).reshape(1, R2, C2)

@jax.jit
def wide(x, idx):
    return pl.pallas_call(
        wide_kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, R2, C2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, R2, C2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R2, C2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, R2, C2), jnp.uint32),
    )(x, idx)

xw = x.reshape(NT, R2, C2)
idxw = jax.vmap(lambda k: jax.random.permutation(k, C2))(
    jax.random.split(jax.random.PRNGKey(5), NT * R2)).reshape(NT, R2, C2).astype(jnp.int32)
refw = np.take_along_axis(np.asarray(xw), np.asarray(idxw), axis=-1)
try_one("Q3b wide (8,1024) lane gather", wide, xw, idxw, check=refw)

# ---- Q4: pipelined DMA fan-out with 8 outstanding ----
NSEM = 8
def dma_kernel(off_ref, x_hbm, o_hbm, sems):
    i = pl.program_id(0)
    def mkdma(j):
        src = off_ref[i, j]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, 32), :], o_hbm.at[pl.ds(src, 32), :],
            sems.at[j % NSEM])
    for j in range(NSEM):
        mkdma(j).start()
    def body(j, _):
        mkdma(j).wait()
        @pl.when(j + NSEM < 256)
        def _():
            mkdma(j + NSEM).start()
        return 0
    jax.lax.fori_loop(0, 256, body, 0)

@jax.jit
def dma_fanout(x2, offs):
    return pl.pallas_call(
        dma_kernel,
        grid=(NT // 16,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NT * R, C), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offs, x2)

x2 = x.reshape(-1, 128)
offs = jax.random.randint(jax.random.PRNGKey(4), (NT // 16, 256), 0,
                          x2.shape[0] - 32, dtype=jnp.int32)
out, t = try_one("Q4 pipelined DMA fan-out (8 deep)", dma_fanout, x2, offs)
if t is not None:
    ndma = (NT // 16) * 256
    print(f"   {ndma} DMAs 16KB: {t.seconds/ndma*1e9:.0f} ns/DMA, "
          f"{ndma*32*128*4/t.seconds/1e9:.1f} GB/s")

# ---- Q4b: bigger runs (128 rows = 64KB per DMA) ----
def dma_kernel_big(off_ref, x_hbm, o_hbm, sems):
    i = pl.program_id(0)
    def mkdma(j):
        src = off_ref[i, j]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, 128), :], o_hbm.at[pl.ds(src, 128), :],
            sems.at[j % NSEM])
    for j in range(NSEM):
        mkdma(j).start()
    def body(j, _):
        mkdma(j).wait()
        @pl.when(j + NSEM < 256)
        def _():
            mkdma(j + NSEM).start()
        return 0
    jax.lax.fori_loop(0, 256, body, 0)

@jax.jit
def dma_fanout_big(x2, offs):
    return pl.pallas_call(
        dma_kernel_big,
        grid=(NT // 16,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NT * R, C), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offs, x2)

offs2 = jax.random.randint(jax.random.PRNGKey(6), (NT // 16, 256), 0,
                           x2.shape[0] - 128, dtype=jnp.int32)
out, t = try_one("Q4b pipelined DMA 64KB runs", dma_fanout_big, x2, offs2)
if t is not None:
    ndma = (NT // 16) * 256
    print(f"   {ndma} DMAs 64KB: {t.seconds/ndma*1e9:.0f} ns/DMA, "
          f"{ndma*128*128*4/t.seconds/1e9:.1f} GB/s")

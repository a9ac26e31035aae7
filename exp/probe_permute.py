"""Probe intra-VMEM permutation primitives in Pallas on real TPU.

Q1: does jnp.take_along_axis(x, idx, axis=-1) (per-row lane gather) compile
    in a Pallas TPU kernel, and how fast?
Q2: same along axis=0 (sublane gather)?
Q3: one-hot matmul permutation throughput?
Q4: dynamic-offset DMA fan-out (HBM scatter of runs) cost per DMA?
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

R, C = 64, 128  # tile = 8192
NT = 2048       # tiles -> 16M elements


def try_one(name, fn, *args):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t = time_fn(fn, *args, iters=10)
        n = args[0].size
        print(f"{name:34s} OK  {t.ms:9.3f} ms  {n/t.seconds/1e9:7.2f} Gelem/s")
        return out
    except Exception as e:
        msg = str(e).split(chr(10))[0][:140]
        print(f"{name:34s} FAIL {msg}")
        return None


# ---- Q1: lane gather per row ----
def lane_gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=-1)

@jax.jit
def lane_gather(x, idx):
    return pl.pallas_call(
        lane_gather_kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
    )(x, idx)

x = jax.random.bits(jax.random.PRNGKey(0), (NT, R, C), dtype=jnp.uint32)
idxs = jax.vmap(lambda k: jax.random.permutation(k, C))(
    jax.random.split(jax.random.PRNGKey(1), NT * R)).reshape(NT, R, C).astype(jnp.int32)
out = try_one("Q1 lane gather (tala axis=-1)", lane_gather, x, idxs)
if out is not None:
    ref = np.take_along_axis(np.asarray(x), np.asarray(idxs), axis=-1)
    print("   correct:", bool((np.asarray(out) == ref).all()))

# ---- Q2: sublane gather ----
def sub_gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=-2)

@jax.jit
def sub_gather(x, idx):
    return pl.pallas_call(
        sub_gather_kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
    )(x, idx)

idxs2 = jax.vmap(lambda k: jax.random.permutation(k, R))(
    jax.random.split(jax.random.PRNGKey(2), NT * C)).reshape(NT, C, R)
idxs2 = jnp.swapaxes(idxs2, 1, 2).astype(jnp.int32)
out = try_one("Q2 sublane gather (tala axis=-2)", sub_gather, x, idxs2)
if out is not None:
    ref = np.take_along_axis(np.asarray(x), np.asarray(idxs2), axis=-2)
    print("   correct:", bool((np.asarray(out) == ref).all()))

# ---- Q2b: full-tile flat gather as (T,1)? try 2D (R*C) reshaped gather ----
def flat_gather_kernel(x_ref, idx_ref, o_ref):
    xf = x_ref[...].reshape(1, R * C)
    o_ref[...] = jnp.take_along_axis(xf, idx_ref[...].reshape(1, R * C),
                                     axis=-1).reshape(1, R, C)

@jax.jit
def flat_gather(x, idx):
    return pl.pallas_call(
        flat_gather_kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
    )(x, idx)

idxf = jax.vmap(lambda k: jax.random.permutation(k, R * C))(
    jax.random.split(jax.random.PRNGKey(3), NT)).reshape(NT, R, C).astype(jnp.int32)
out = try_one("Q2b flat tile gather 8192", flat_gather, x, idxf)
if out is not None:
    xf = np.asarray(x).reshape(NT, -1)
    ref = np.take_along_axis(xf, np.asarray(idxf).reshape(NT, -1), axis=-1)
    print("   correct:", bool((np.asarray(out).reshape(NT, -1) == ref).all()))

# ---- Q3: one-hot matmul lane permutation (128x128 per row, batched) ----
def onehot_kernel(x_ref, idx_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)          # (R, C)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, C, C), 2)
    p = (idx_ref[0][:, :, None] == lane).astype(jnp.float32)  # (R, C, C)
    y = jax.lax.dot_general(x[:, None, :], p, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = y.reshape(1, R, C).astype(jnp.uint32)

@jax.jit
def onehot_perm(x, idx):
    return pl.pallas_call(
        onehot_kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
    )(x & jnp.uint32(0xFFFF), idx)  # 16-bit values, exact in f32
out = try_one("Q3 one-hot matmul lane perm", onehot_perm, x, idxs)

# ---- Q4: dynamic-offset DMA fan-out: copy 256 runs of 32 elems each per tile
def dma_kernel(off_ref, x_hbm, o_hbm, sem):
    i = pl.program_id(0)
    def body(j, _):
        src = off_ref[i, j]
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, 32), :],
            o_hbm.at[pl.ds(src, 32), :],
            sem,
        )
        dma.start()
        dma.wait()
        return 0
    jax.lax.fori_loop(0, 256, body, 0)

@jax.jit
def dma_fanout(x2, offs):
    return pl.pallas_call(
        dma_kernel,
        grid=(NT // 16,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offs, x2)

x2 = x.reshape(-1, 128)  # (NT*R, 128)
offs = jax.random.randint(jax.random.PRNGKey(4), (NT // 16, 256), 0,
                          x2.shape[0] - 32, dtype=jnp.int32)
out = try_one("Q4 dyn DMA fan-out 256/prog", dma_fanout, x2, offs)
if out is not None:
    ndma = (NT // 16) * 256
    t = time_fn(dma_fanout, x2, offs, iters=10)
    print(f"   {ndma} DMAs of 16KB: {t.ms:.3f} ms -> {t.seconds/ndma*1e9:.0f} ns/DMA, "
          f"{ndma*32*128*4/t.seconds/1e9:.1f} GB/s")

"""Micro-probe: cost of one bitonic compare-exchange stage, roll-based vs
reshape-halves, keys-only and kv, on a (8192, 128) VMEM buffer (2^20 elems).

The merge cascade's row stages (dist >= 1024 <=> rd >= 8 sublanes) pair row
r with r ^ rd — a static (g, 2, rd, 128) split. If Mosaic lowers the split
view to plain vector ops, a CE stage is min+max+2 half-selects (~2
full-array ops) instead of 2 rolls + selects + compares (~7). This probe
times R repeated stages of each formulation in a single kernel.
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

ROWS = 8192
LANES = 128
REPS = 57           # one full cascade's worth of stages


def _roll_kernel(x_ref, o_ref, *, rd, reps, kv):
    key = x_ref[...]
    val = key ^ jnp.uint32(0x9E3779B9) if kv else None
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    is_lower = (row & rd) == 0
    for _ in range(reps):
        pk = jnp.where(is_lower, pltpu.roll(key, ROWS - rd, 0),
                       pltpu.roll(key, rd, 0))
        if kv:
            pv = jnp.where(is_lower, pltpu.roll(val, ROWS - rd, 0),
                           pltpu.roll(val, rd, 0))
            take_p = (pk < key) | ((pk == key) & (pv < val))
        else:
            take_p = pk < key
        swap = take_p == is_lower
        key = jnp.where(swap, pk, key)
        if kv:
            val = jnp.where(swap, pv, val)
    o_ref[...] = key ^ val if kv else key


def _reshape_kernel(x_ref, o_ref, *, rd, reps, kv):
    g = ROWS // (2 * rd)
    key = x_ref[...].reshape(g, 2, rd, LANES)
    val = key ^ jnp.uint32(0x9E3779B9) if kv else None
    for _ in range(reps):
        a, b = key[:, 0], key[:, 1]
        if kv:
            av, bv = val[:, 0], val[:, 1]
            t = (b < a) | ((b == a) & (bv < av))
            nav = jnp.where(t, bv, av)
            nbv = jnp.where(t, av, bv)
            val = jnp.stack([nav, nbv], axis=1)
            na = jnp.where(t, b, a)
            nb = jnp.where(t, a, b)
            key = jnp.stack([na, nb], axis=1)
        else:
            # NOT jnp.minimum/maximum: Mosaic fails to legalize
            # arith.minui on u32 vectors (probed 2026-08-19)
            t = b < a
            key = jnp.stack([jnp.where(t, b, a), jnp.where(t, a, b)],
                            axis=1)
    key = key.reshape(ROWS, LANES)
    o_ref[...] = key ^ val.reshape(ROWS, LANES) if kv else key


def run(kern, rd, kv, label):
    k = functools.partial(kern, rd=rd, reps=REPS, kv=kv)
    f = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    x = jax.random.bits(jax.random.PRNGKey(0), (ROWS, LANES),
                        dtype=jnp.uint32)
    t = time_fn(jax.jit(f), x, iters=10, warmup=3)
    per_stage_ps = t.ms * 1e9 / REPS / (ROWS * LANES)
    print(f"{label:28s} rd={rd:3d} {t.ms:7.3f} ms/call "
          f"{per_stage_ps:6.1f} ps/elem/stage", flush=True)


for rd in (8, 64, 128, 256, 512, 1024):
    run(_roll_kernel, rd, False, "roll keys")
    run(_reshape_kernel, rd, False, "reshape keys")
    run(_roll_kernel, rd, True, "roll kv")
    run(_reshape_kernel, rd, True, "reshape kv")
for rd in (1, 4):
    run(_reshape_kernel, rd, False, "reshape keys (subtile)")
    run(_reshape_kernel, rd, True, "reshape kv   (subtile)")

"""Bisect the Mosaic crash: minimal bitonic-ish kernels."""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128
R, NT = 128, 4
k = jax.random.bits(jax.random.PRNGKey(0), (NT, R, C), dtype=jnp.uint32)


def run(name, kernel):
    @jax.jit
    def f(a):
        return pl.pallas_call(
            kernel, grid=(NT,),
            in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
        )(a)
    try:
        out = f(k)
        jax.block_until_ready(out)
        print(f"{name:46s} OK")
        return out
    except Exception as e:
        print(f"{name:46s} FAIL {str(e).splitlines()[0][:100]}")
        return None


def k1(x_ref, o_ref):  # uint32 compare
    x = x_ref[...].reshape(R, C)
    y = pltpu.roll(x, 1, 1)
    o_ref[...] = jnp.where(x < y, x, y).reshape(1, R, C)
run("1 u32 cmp + lane roll", k1)

def k2(x_ref, o_ref):  # sublane roll on (R,C)
    x = x_ref[...].reshape(R, C)
    y = pltpu.roll(x, 1, 0)
    o_ref[...] = jnp.where(x < y, x, y).reshape(1, R, C)
run("2 u32 cmp + sublane roll", k2)

def k3(x_ref, o_ref):  # bool logic ops
    x = x_ref[...].reshape(R, C)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    is_lower = (flat & 1) == 0
    asc = (flat & 2) == 0
    m = jnp.logical_not(jnp.logical_xor(is_lower, jnp.logical_not(asc)))
    o_ref[...] = jnp.where(m, x, pltpu.roll(x, 1, 1)).reshape(1, R, C)
run("3 bool xor/not masks", k3)

def k4(x_ref, o_ref):  # one full CE stage (lane dist)
    key = x_ref[...].reshape(R, C)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    dist = 1
    is_lower = (flat & dist) == 0
    asc = (flat & (2 * dist)) == 0
    pk = jnp.where(is_lower, pltpu.roll(key, C - dist, 1),
                   pltpu.roll(key, dist, 1))
    want_small = is_lower == asc
    take_p = pk < key
    pflat = jnp.where(is_lower, flat + dist, flat - dist)
    take_p = jnp.where(pk == key, pflat < flat, take_p)
    swap = take_p != want_small
    o_ref[...] = jnp.where(swap, pk, key).reshape(1, R, C)
run("4 one full CE stage", k4)

def k5(x_ref, o_ref):  # 10 CE stages unrolled
    key = x_ref[...].reshape(R, C)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    for kk in range(1, 5):
        for j in range(kk - 1, -1, -1):
            dist = 1 << j
            is_lower = (flat & dist) == 0
            asc = (flat & (1 << kk)) == 0
            pk = jnp.where(is_lower, pltpu.roll(key, C - dist, 1),
                           pltpu.roll(key, dist, 1))
            want_small = is_lower == asc
            take_p = pk < key
            pflat = jnp.where(is_lower, flat + dist, flat - dist)
            take_p = jnp.where(pk == key, pflat < flat, take_p)
            swap = take_p != want_small
            key = jnp.where(swap, pk, key)
    o_ref[...] = key.reshape(1, R, C)
out = run("5 ten CE stages (sorts 16-blocks)", k5)
if out is not None:
    a = np.asarray(out[0]).reshape(-1)
    ref = np.asarray(k[0]).reshape(-1, 16)
    ref = np.sort(ref, axis=-1).reshape(-1)
    print("   sorts 16-blocks correctly:", bool((a == ref).all()))

def k6(x_ref, o_ref):  # k4 but with logical_xor instead of ==/!= on bools
    key = x_ref[...].reshape(R, C)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    dist = 1
    is_lower = (flat & dist) == 0
    asc = (flat & (2 * dist)) == 0
    pk = jnp.where(is_lower, pltpu.roll(key, C - dist, 1),
                   pltpu.roll(key, dist, 1))
    want_small = jnp.logical_not(jnp.logical_xor(is_lower, asc))
    take_p = pk < key
    pflat = jnp.where(is_lower, flat + dist, flat - dist)
    take_p = jnp.where(pk == key, pflat < flat, take_p)
    swap = jnp.logical_xor(take_p, want_small)
    o_ref[...] = jnp.where(swap, pk, key).reshape(1, R, C)
run("6 CE stage w/ logical_xor", k6)

def k7(x_ref, o_ref):  # k4 minus the tie-break where
    key = x_ref[...].reshape(R, C)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    dist = 1
    is_lower = (flat & dist) == 0
    asc = (flat & (2 * dist)) == 0
    pk = jnp.where(is_lower, pltpu.roll(key, C - dist, 1),
                   pltpu.roll(key, dist, 1))
    want_small = is_lower == asc
    take_p = pk < key
    swap = take_p != want_small
    o_ref[...] = jnp.where(swap, pk, key).reshape(1, R, C)
run("7 CE stage no tie-break", k7)

def k8(x_ref, o_ref):  # isolate: where on (pk == key) with int32 cmp inside
    key = x_ref[...].reshape(R, C)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    pk = pltpu.roll(key, 1, 1)
    pflat = flat + 1
    take_p = jnp.where(pk == key, pflat < flat, pk < key)
    o_ref[...] = jnp.where(take_p, pk, key).reshape(1, R, C)
run("8 tie-break where alone", k8)

"""Prototype: stable bitonic sort of (R,128) u32 kv tiles in one Pallas kernel.

Keys compared as bias-flipped int32 (monotone order-preserving transform of
u32), ties broken by val (unique index in the pipeline) -> STABLE.
"""
import time
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128


def bitonic_tile_kernel(k_ref, v_ref, ok_ref, ov_ref, *, R):
    n = R * C
    bias = jnp.full((R, C), -2147483648, jnp.int32)
    key = (k_ref[...].reshape(R, C).astype(jnp.int32)) ^ bias  # u32 order in i32
    val = v_ref[...].reshape(R, C).astype(jnp.int32)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    nbits = n.bit_length() - 1
    for kph in range(1, nbits + 1):
        for j in range(kph - 1, -1, -1):
            dist = 1 << j
            is_lower = (flat & dist) == 0
            if kph < nbits:
                asc = (flat & (1 << kph)) == 0
                want_small = is_lower == asc
            else:
                want_small = is_lower
            if dist < C:
                pk = jnp.where(is_lower, pltpu.roll(key, C - dist, 1),
                               pltpu.roll(key, dist, 1))
                pv = jnp.where(is_lower, pltpu.roll(val, C - dist, 1),
                               pltpu.roll(val, dist, 1))
            else:
                rd = dist // C
                pk = jnp.where(is_lower, pltpu.roll(key, R - rd, 0),
                               pltpu.roll(key, rd, 0))
                pv = jnp.where(is_lower, pltpu.roll(val, R - rd, 0),
                               pltpu.roll(val, rd, 0))
            take_p = (pk < key) | ((pk == key) & (pv < val))
            swap = take_p == want_small
            key = jnp.where(swap, pk, key)
            val = jnp.where(swap, pv, val)
    ok_ref[...] = (key ^ bias).astype(jnp.uint32).reshape(1, R, C)
    ov_ref[...] = val.astype(jnp.uint32).reshape(1, R, C)


def make_sort(R, NT):
    kern = functools.partial(bitonic_tile_kernel, R=R)
    @jax.jit
    def f(k, v):
        return pl.pallas_call(
            kern,
            grid=(NT,),
            in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
                       jax.ShapeDtypeStruct((NT, R, C), jnp.uint32)],
        )(k, v)
    return f


if __name__ == "__main__":
    from lsdradixsort_tpu.core.timing import time_fn
    for R, NT in ((128, 64), (128, 512), (1024, 64)):
        n = NT * R * C
        k = jax.random.bits(jax.random.PRNGKey(0), (NT, R, C), dtype=jnp.uint32)
        v = jnp.arange(n, dtype=jnp.uint32).reshape(NT, R, C)
        f = make_sort(R, NT)
        t0 = time.perf_counter()
        try:
            ok, ov = f(k, v)
            jax.block_until_ready(ok)
        except Exception as e:
            print(f"R={R}: FAIL {str(e).splitlines()[0][:120]}")
            continue
        compile_s = time.perf_counter() - t0
        ks = np.asarray(ok[0]).reshape(-1)
        kv0 = np.asarray(k[0]).reshape(-1)
        good = bool((ks == np.sort(kv0)).all())
        perm = np.argsort(kv0, kind="stable").astype(np.uint32)
        vgood = bool((np.asarray(ov[0]).reshape(-1) == perm).all())
        t = time_fn(f, k, v, iters=5)
        st = (R * C).bit_length() - 1
        st = st * (st + 1) // 2
        print(f"R={R:5d} NT={NT:4d} ({R*C//1024}K/tile, {st} st): "
              f"compile {compile_s:.1f}s, {t.ms:.2f} ms for {n/1e6:.1f}M "
              f"-> {n/t.seconds/1e9:.3f} Gelem/s, keys={good} pairs={vgood}")

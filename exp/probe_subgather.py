"""Hunt for a working cross-row (sublane) gather in Pallas/Mosaic.

A fast sublane gather collapses the radix-sort grouping problem
(ROADMAP.md §3.2). Try every plausible spelling.
"""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

C = 128


def run(name, kernel, R, NT, idx_shape=None, check_fn=None):
    x = jax.random.bits(jax.random.PRNGKey(0), (NT, R, C), dtype=jnp.uint32)
    idx = jax.random.randint(jax.random.PRNGKey(1), idx_shape or (NT, R, C),
                             0, R, dtype=jnp.int32)
    @jax.jit
    def f(a, i):
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[pl.BlockSpec((1, R, C), lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,) + (idx_shape or (NT, R, C))[1:],
                                   lambda k: (k,) + (0,) * (len(idx_shape or (NT, R, C)) - 1),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, C), lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32),
        )(a, i)
    try:
        out = f(x, idx)
        jax.block_until_ready(out)
        t = time_fn(f, x, idx, iters=10)
        n = NT * R * C
        ok = check_fn(np.asarray(x), np.asarray(idx), np.asarray(out)) \
            if check_fn else "?"
        print(f"{name:44s} OK  {t.ms:7.2f} ms {n/t.seconds/1e9:6.2f} G/s"
              f" correct={ok}")
    except Exception as e:
        print(f"{name:44s} FAIL {str(e).splitlines()[0][:90]}")


def chk_sub(x, idx, out):
    return bool((out == np.take_along_axis(x, idx, axis=1)).all())


# 1) plain take_along_axis axis=0, small R
def k1(x_ref, i_ref, o_ref, R):
    o_ref[...] = jnp.take_along_axis(x_ref[...].reshape(R, C),
                                     i_ref[...].reshape(R, C),
                                     axis=0).reshape(1, R, C)
for R in (8, 32, 128):
    run(f"1 tala axis=0 R={R}", functools.partial(k1, R=R), R, 16,
        check_fn=chk_sub)

# 2) transpose -> lane gather -> transpose (idx transposed too)
def k2(x_ref, i_ref, o_ref, R):
    xt = x_ref[...].reshape(R, C).T       # (C, R): rows=lanes swapped
    it = i_ref[...].reshape(R, C).T       # (C, R) values in [0, R)
    gt = jnp.take_along_axis(xt, it, axis=1)   # gather along R (now lanes)
    o_ref[...] = gt.T.reshape(1, R, C)
for R in (128,):
    run(f"2 transpose+lane gather R={R}", functools.partial(k2, R=R), R, 16,
        check_fn=chk_sub)

# 3) one-hot int8 matmul row-select: out[r,l] = sum_s [idx[r,l]==s] x[s,l]
#    shared across lanes only if idx same per row -> test PER-ROW idx (R,1)
def k3(x_ref, i_ref, o_ref, R):
    x = x_ref[...].reshape(R, C)
    idx = i_ref[...].reshape(R, 1)        # one source row per dest row
    it = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    P = (idx == it).astype(jnp.int8)      # (R dest, R src)
    lo = (x & 0xFFFF).astype(jnp.int8)    # placeholder; exactness via 4 planes
    out = jnp.zeros((R, C), jnp.int32)
    for b in range(4):
        plane = (((x >> (8 * b)) & 0xFF) - 128).astype(jnp.int8)
        c = jax.lax.dot_general(P, plane, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        out = out + ((c + 128) << (8 * b))
    o_ref[...] = out.astype(jnp.uint32).reshape(1, R, C)
def chk_rowsel(x, idx, out):
    want = np.take_along_axis(x, np.broadcast_to(idx, x.shape), axis=1)
    return bool((out == want).all())
run("3 one-hot matmul row-select (R,1) idx", functools.partial(k3, R=128),
    128, 16, idx_shape=(16, 128, 1), check_fn=chk_rowsel)

# 4) dynamic row loop: out[r] = x[idx[r,0]] via fori + dynamic ds read
def k4(x_ref, i_ref, o_ref, R):
    def body(r, _):
        src = i_ref[0, r, 0]
        o_ref[0, pl.ds(r, 1), :] = x_ref[0, pl.ds(src, 1), :]
        return 0
    jax.lax.fori_loop(0, R, body, 0)
run("4 scalar row-loop dynamic ds", functools.partial(k4, R=128),
    128, 16, idx_shape=(16, 128, 1), check_fn=chk_rowsel)

"""Round-2 probe batch 1: the primitives the MSD-partition sort design needs.

P1: wide lane-gather  take_along_axis(x, idx, axis=1) on (128, W), W up to 8192
P2: native sublane gather on (8, W) (take_along_axis axis=0, R=8) at wide W
P4: scalar fori row-copy with dynamic ds on VMEM refs (VMEM->VMEM row shuffle)
P7: jnp.cumsum inside kernel (does jax 0.9 Mosaic lower it?)
P8: per-element variable shift (x >> s vector)
"""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn


def run(name, build, check_fn=None, iters=20):
    try:
        f, args, n = build()
        out = jax.block_until_ready(f(*args))
        t = time_fn(f, *args, iters=iters)
        ok = check_fn(args, np.asarray(out)) if check_fn else "?"
        print(f"{name:52s} OK {t.ms:8.3f} ms {n/t.seconds/1e9:7.2f} G/s "
              f"{1e9*t.seconds/n*1000:7.2f} ps/elem correct={ok}")
    except Exception as e:
        msg = str(e).replace(chr(10), ' ')[:110]
        print(f"{name:52s} FAIL {msg}")


# ---------------- P1: wide lane gather ----------------
def p1(W, NT=64):
    R = 128
    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=1)[None]
    def build():
        x = jax.random.bits(jax.random.PRNGKey(0), (NT, R, W), dtype=jnp.uint32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (NT, R, W), 0, W,
                                 dtype=jnp.int32)
        spec = pl.BlockSpec((1, R, W), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
        f = jax.jit(lambda a, i: pl.pallas_call(
            kern, grid=(NT,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((NT, R, W), jnp.uint32))(a, i))
        return f, (x, idx), NT * R * W
    def chk(args, out):
        x, idx = args
        return bool((out == np.take_along_axis(np.asarray(x), np.asarray(idx),
                                               axis=2)).all())
    run(f"P1 lane-gather (128,{W})", build, chk)


# ---------------- P2: sublane gather R=8, wide ----------------
def p2(W, NT=64):
    R = 8
    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=0)[None]
    def build():
        x = jax.random.bits(jax.random.PRNGKey(0), (NT, R, W), dtype=jnp.uint32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (NT, R, W), 0, R,
                                 dtype=jnp.int32)
        spec = pl.BlockSpec((1, R, W), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
        f = jax.jit(lambda a, i: pl.pallas_call(
            kern, grid=(NT,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((NT, R, W), jnp.uint32))(a, i))
        return f, (x, idx), NT * R * W
    def chk(args, out):
        x, idx = args
        return bool((out == np.take_along_axis(np.asarray(x), np.asarray(idx),
                                               axis=1)).all())
    run(f"P2 sublane-gather (8,{W})", build, chk)


# ---------------- P4: scalar row-copy fori with dynamic ds ----------------
def p4(R=2048, NT=16):
    C = 128
    def kern(x_ref, i_ref, o_ref):
        def body(r, _):
            src = i_ref[0, r // C, r % C]
            o_ref[0, pl.ds(r, 1), :] = x_ref[0, pl.ds(src, 1), :]
            return 0
        jax.lax.fori_loop(0, R, body, 0)
    def build():
        x = jax.random.bits(jax.random.PRNGKey(0), (NT, R, C), dtype=jnp.uint32)
        perm = jax.vmap(lambda k: jax.random.permutation(k, R))(
            jax.random.split(jax.random.PRNGKey(1), NT)).astype(jnp.int32)
        idx = perm.reshape(NT, R // C, C)
        f = jax.jit(lambda a, i: pl.pallas_call(
            kern, grid=(NT,),
            in_specs=[pl.BlockSpec((1, R, C), lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, R // C, C), lambda k: (k, 0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, R, C), lambda k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32))(a, i))
        return f, (x, idx), NT * R * C
    def chk(args, out):
        x, idx = args
        want = np.asarray(x)[np.arange(NT)[:, None],
                             np.asarray(idx).reshape(NT, R)]
        return bool((out == want).all())
    run(f"P4 scalar row-copy R={R} (rows: {R} per tile)", build, chk)


# ---------------- P7: cumsum in kernel ----------------
def p7(NT=16):
    R, C = 128, 128
    def kern(x_ref, o_ref):
        o_ref[...] = jnp.cumsum(x_ref[0], axis=1)[None]
    def build():
        x = jnp.ones((NT, R, C), jnp.int32)
        spec = pl.BlockSpec((1, R, C), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
        f = jax.jit(lambda a: pl.pallas_call(
            kern, grid=(NT,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.int32))(a))
        return f, (x,), NT * R * C
    def chk(args, out):
        return bool((out[0, 0] == np.arange(1, C + 1)).all())
    run("P7 jnp.cumsum axis=1 in kernel", build, chk)


# ---------------- P8: variable vector shift ----------------
def p8(NT=16):
    R, C = 128, 128
    def kern(x_ref, s_ref, o_ref):
        o_ref[...] = (x_ref[...] >> s_ref[...]) & 0xFF
    def build():
        x = jax.random.bits(jax.random.PRNGKey(0), (NT, R, C), dtype=jnp.uint32)
        s = (jax.random.randint(jax.random.PRNGKey(1), (NT, R, C), 0, 4,
                                dtype=jnp.int32) * 8).astype(jnp.uint32)
        spec = pl.BlockSpec((1, R, C), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
        f = jax.jit(lambda a, b: pl.pallas_call(
            kern, grid=(NT,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((NT, R, C), jnp.uint32))(a, b))
        return f, (x, s), NT * R * C
    def chk(args, out):
        x, s = (np.asarray(a) for a in args)
        return bool((out == ((x >> s) & 0xFF)).all())
    run("P8 variable vector shift", build, chk)


CASES = {}
for W in (128, 256, 1024, 2048, 4096, 8192):
    CASES[f"p1_{W}"] = functools.partial(p1, W, NT=max(8, (1 << 23) // (128 * W)))
for W in (128, 2048):
    CASES[f"p2_{W}"] = functools.partial(p2, W, NT=max(8, (1 << 23) // (8 * W)))
CASES["p4"] = p4
CASES["p7"] = p7
CASES["p8"] = p8

if __name__ == "__main__":
    import sys
    for name in (sys.argv[1:] or CASES):
        CASES[name]()

"""Re-measure in-kernel op costs with FAT blocks (1MB+) to remove grid overhead.

Every kernel processes (RB, 128, 128) per grid step = RB*64KB.
Baseline 'passthrough' kernel isolates the HBM+grid floor; op cost = delta.
"""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

R, C = 128, 128
RB = 16           # sub-blocks per grid step -> 1MB in, 1MB out
NT = 128          # grid steps -> 32M elements total
N = NT * RB * R * C
print(f"N = {N/1e6:.0f}M elems, {NT} grid steps of {RB*R*C*4//1024}KB")

x = jax.random.bits(jax.random.PRNGKey(0), (NT * RB, R, C), dtype=jnp.uint32)


def run(name, kernel, inputs, n_in=1):
    @jax.jit
    def f(*args):
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[pl.BlockSpec((RB, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM) for _ in range(n_in)],
            out_specs=pl.BlockSpec((RB, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT * RB, R, C), jnp.uint32),
        )(*args)
    try:
        out = f(*inputs)
        jax.block_until_ready(out)
        t = time_fn(f, *inputs, iters=10)
        print(f"{name:40s} {t.ms:9.3f} ms  {N/t.seconds/1e9:7.2f} Gelem/s"
              f"  ({t.seconds/N*1e9:.3f} ns/elem)")
        return out, t
    except Exception as e:
        print(f"{name:40s} FAIL {str(e).splitlines()[0][:110]}")
        return None, None


# 0) passthrough floor
def pass_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]
run("0 passthrough (copy)", pass_kernel, (x,))

# 1) one elementwise op
def add_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.uint32(1)
run("1 add", add_kernel, (x,))

# 2) 16 elementwise ops
def add16_kernel(x_ref, o_ref):
    v = x_ref[...]
    for _ in range(16):
        v = v + jnp.uint32(1)
    o_ref[...] = v
run("2 add x16", add16_kernel, (x,))

# 3) 64 elementwise ops
def add64_kernel(x_ref, o_ref):
    v = x_ref[...]
    for _ in range(16):
        v = (v + jnp.uint32(3)) * jnp.uint32(5)
        v = v ^ (v >> jnp.uint32(7))
    o_ref[...] = v
run("3 mixed x64", add64_kernel, (x,))

# 4) one dynamic lane gather (per (RB*R)-row, 128 lanes)
idx = jax.vmap(lambda k: jax.random.permutation(k, C))(
    jax.random.split(jax.random.PRNGKey(1), NT * RB * R)
).reshape(NT * RB, R, C).astype(jnp.int32)
def gather1_kernel(x_ref, idx_ref, o_ref):
    xx = x_ref[...].reshape(RB * R, C)
    ii = idx_ref[...].reshape(RB * R, C)
    o_ref[...] = jnp.take_along_axis(xx, ii, axis=-1).reshape(RB, R, C)
out, _ = run("4 lane gather x1", gather1_kernel, (x, idx), n_in=2)
if out is not None:
    ref = np.take_along_axis(np.asarray(x).reshape(-1, C),
                             np.asarray(idx).reshape(-1, C), axis=-1)
    print("   correct:", bool((np.asarray(out).reshape(-1, C) == ref).all()))

# 5) four chained lane gathers
def gather4_kernel(x_ref, idx_ref, o_ref):
    xx = x_ref[...].reshape(RB * R, C)
    ii = idx_ref[...].reshape(RB * R, C)
    for _ in range(4):
        xx = jnp.take_along_axis(xx, ii, axis=-1)
    o_ref[...] = xx.reshape(RB, R, C)
run("5 lane gather x4", gather4_kernel, (x, idx), n_in=2)

# 6) one static-pattern gather (XOR butterfly partner)
def gatherstat_kernel(x_ref, o_ref):
    xx = x_ref[...].reshape(RB * R, C)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB * R, C), 1)
    ii = lane ^ 16
    o_ref[...] = jnp.take_along_axis(xx, ii, axis=-1).reshape(RB, R, C)
run("6 static XOR gather x1", gatherstat_kernel, (x,))

# 7) roll x8 (lane rolls, static)
def roll8_kernel(x_ref, o_ref):
    v = x_ref[...].reshape(RB * R, C)
    for s in (1, 2, 4, 8, 16, 32, 64, 1):
        v = v + pltpu.roll(v, s, 1)
    o_ref[...] = v.reshape(RB, R, C)
run("7 roll+add x8 (lanes)", roll8_kernel, (x,))

# 8) roll x8 on sublanes
def roll8s_kernel(x_ref, o_ref):
    v = x_ref[...].reshape(RB * R, C)
    for s in (1, 2, 4, 8, 16, 32, 64, 1):
        v = v + pltpu.roll(v, s, 0)
    o_ref[...] = v.reshape(RB, R, C)
run("8 roll+add x8 (sublanes)", roll8s_kernel, (x,))

# 9) full row-major cumsum via rolls: 7 lane steps masked
def cums_kernel(x_ref, o_ref):
    v = (x_ref[...].reshape(RB * R, C) & jnp.uint32(1)).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB * R, C), 1)
    for s in (1, 2, 4, 8, 16, 32, 64):
        v = v + jnp.where(lane >= s, pltpu.roll(v, s, 1), 0)
    o_ref[...] = v.astype(jnp.uint32).reshape(RB, R, C)
out, _ = run("9 masked roll-cumsum (7 steps)", cums_kernel, (x,))
if out is not None:
    ref = np.cumsum(np.asarray(x).reshape(-1, C) & 1, axis=-1).astype(np.uint32)
    print("   correct:", bool((np.asarray(out).reshape(-1, C) == ref).all()))

# 10) transpose each 128x128
def tr_kernel(x_ref, o_ref):
    xx = x_ref[...]
    o_ref[...] = jnp.swapaxes(xx, 1, 2)
run("10 transpose 128x128 xRB", tr_kernel, (x,))

# 11) matmul: shared tri(128x128) f32 @ each (128,128) block
def mm_kernel(x_ref, o_ref):
    xx = (x_ref[...] & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
    L = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) >=
         jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)).astype(jnp.float32)
    y = jax.lax.dot_general(L, xx, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # y: (R, RB, C) -> back
    o_ref[...] = jnp.swapaxes(y, 0, 1).astype(jnp.int32).astype(jnp.uint32)
run("11 shared 128x128 matmul per block", mm_kernel, (x,))

# 12) bitonic compare-exchange stage x8 (roll partner + select), 1 stream
def bit8_kernel(x_ref, o_ref):
    v = x_ref[...].reshape(RB * R, C).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB * R, C), 1)
    for s in (1, 2, 4, 8, 16, 32, 64, 1):
        up = (lane & s) == 0
        partner = jnp.where(up, pltpu.roll(v, -s, 1), pltpu.roll(v, s, 1))
        keep_min = up == ((lane & (2 * s)) == 0)
        lo = jnp.minimum(v, partner); hi = jnp.maximum(v, partner)
        v = jnp.where(keep_min, lo, hi)
    o_ref[...] = v.astype(jnp.uint32).reshape(RB, R, C)
run("12 bitonic CE stage x8 (1 stream)", bit8_kernel, (x,))

"""Probe round 3: in-kernel scatter-along-lanes, cumsum, transpose, roll."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

R, C = 128, 128
NT = 1024  # 16M elems


def run(name, kernel, inputs, out_dtype=jnp.uint32, check=None):
    @jax.jit
    def f(*args):
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT, R, C), out_dtype),
        )(*args)
    try:
        out = f(*inputs)
        jax.block_until_ready(out)
        t = time_fn(f, *inputs, iters=10)
        n = inputs[0].size
        line = f"{name:38s} OK  {t.ms:9.3f} ms  {n/t.seconds/1e9:7.2f} Gelem/s"
        if check is not None:
            ok = bool((np.asarray(out) == check).all())
            line += f"  correct={ok}"
        print(line)
        return out
    except Exception as e:
        print(f"{name:38s} FAIL {str(e).splitlines()[0][:130]}")
        return None


x = jax.random.bits(jax.random.PRNGKey(0), (NT, R, C), dtype=jnp.uint32)
perm = jax.vmap(lambda k: jax.random.permutation(k, C))(
    jax.random.split(jax.random.PRNGKey(1), NT * R)).reshape(NT, R, C).astype(jnp.int32)

# (a) scatter along lanes: out[r, idx[r,l]] = x[r,l]
def scatter_kernel(x_ref, idx_ref, o_ref):
    xx = x_ref[...].reshape(R, C)
    ii = idx_ref[...].reshape(R, C)
    o = jnp.zeros((R, C), jnp.uint32).at[
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 0), ii].set(xx)
    o_ref[...] = o.reshape(1, R, C)

ref = np.zeros((NT, R, C), np.uint32)
np.put_along_axis(ref.reshape(NT * R, C),
                  np.asarray(perm).reshape(NT * R, C),
                  np.asarray(x).reshape(NT * R, C), axis=-1)
run("a1 lane scatter .at[iota,idx].set", scatter_kernel, (x, perm), check=ref)

def scatter_kernel2(x_ref, idx_ref, o_ref):
    xx = x_ref[...].reshape(R, C)
    ii = idx_ref[...].reshape(R, C)
    o = jnp.take_along_axis(jnp.zeros((R, C), jnp.uint32), ii, axis=-1,
                            mode='fill')  # dummy to force no
    o_ref[...] = jnp.place(o, o == o, xx).reshape(1, R, C)
run("a2 (skip)", lambda *_: None, (x,))

# (b) cumsum along lanes and sublanes
def cumlane_kernel(x_ref, o_ref):
    o_ref[...] = jnp.cumsum(x_ref[...].reshape(R, C) & 1, axis=-1,
                            dtype=jnp.uint32).reshape(1, R, C)
run("b1 cumsum axis=-1 (lanes)", cumlane_kernel, (x,),
    check=np.cumsum(np.asarray(x) & 1, axis=-1, dtype=np.uint32))

def cumsub_kernel(x_ref, o_ref):
    o_ref[...] = jnp.cumsum(x_ref[...].reshape(R, C) & 1, axis=0,
                            dtype=jnp.uint32).reshape(1, R, C)
run("b2 cumsum axis=0 (sublanes)", cumsub_kernel, (x,),
    check=np.cumsum(np.asarray(x) & 1, axis=-2, dtype=np.uint32))

# (c) transpose 128x128
def transpose_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(R, C).T.reshape(1, R, C)
run("c transpose 128x128", transpose_kernel, (x,),
    check=np.swapaxes(np.asarray(x), 1, 2))

# (d) roll along lanes by dynamic amount per row? static first
def roll_kernel(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...].reshape(R, C), 5, 1).reshape(1, R, C)
run("d1 static roll lanes", roll_kernel, (x,),
    check=np.roll(np.asarray(x), 5, axis=2))

# (e) combined 1-bit split of each row via gather (rank->invert via scatter of iota)
def split_kernel(x_ref, o_ref):
    xx = x_ref[...].reshape(R, C)
    bit = (xx & 1).astype(jnp.int32)
    inv = 1 - bit
    cz = jnp.cumsum(inv, axis=-1)            # zeros cumcount
    nz = cz[:, -1:]
    rank = jnp.where(bit == 0, cz - 1,
                     jax.lax.broadcasted_iota(jnp.int32, (R, C), 1) - cz + nz)
    o = jnp.zeros((R, C), jnp.uint32).at[
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 0), rank].set(xx)
    o_ref[...] = o.reshape(1, R, C)

xs = np.asarray(x)
b = xs & 1
refsplit = np.zeros_like(xs)
for t in range(2):  # small check on first 2 tiles only
    for r in range(R):
        row = xs[t, r]
        refsplit[t, r] = np.concatenate([row[row & 1 == 0], row[row & 1 == 1]])
out = run("e row 1-bit split (cumsum+scatter)", split_kernel, (x,))
if out is not None:
    print("   correct:", bool((np.asarray(out)[:2] == refsplit[:2]).all()))

"""Probe: r=8 histogram via nibble-factorized int8 MXU counting.

count[hi, lo] = sum_i [hi(x_i)==hi][lo(x_i)==lo]  ->  OHhi^T @ OHlo.
Question: does Mosaic lower a dot_general contracting over (rows, lanes)?
Fallback: reshape (rows*128, 16)? or per-16-row chunks?
"""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

LANES = 128


def hist_mxu_kernel(keys_ref, out_ref, *, rows, bpg, r, group):
    shift = r * group
    for b in range(bpg):
        x = (keys_ref[b] >> shift).astype(jnp.int32)
        hi = (x >> 4) & 0xF
        lo = x & 0xF
        # one-hots as (rows, 16, LANES) int8 planes, batched matmul over
        # rows contracting lanes -> (rows, 16, 16), then reduce over rows
        it = jax.lax.broadcasted_iota(jnp.int32, (rows, 16, LANES), 1)
        ohh = (hi[:, None, :] == it).astype(jnp.int8)
        ohl = (lo[:, None, :] == it).astype(jnp.int8)
        c = jax.lax.dot_general(ohh, ohl, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        out_ref[b] = jnp.sum(c, axis=0).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("block_size",))
def hist_mxu(keys, block_size):
    n = keys.shape[0]
    rows = block_size // LANES
    nb = n // block_size
    bpg = max(1, (1 << 20) // (block_size * 4))
    while nb % bpg:
        bpg -= 1
    out = pl.pallas_call(
        functools.partial(hist_mxu_kernel, rows=rows, bpg=bpg, r=8, group=0),
        grid=(nb // bpg,),
        in_specs=[pl.BlockSpec((bpg, rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bpg, 16, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 16, 16), jnp.uint32),
    )(keys.reshape(nb, rows, LANES))
    return out.reshape(nb, 256)


if __name__ == "__main__":
    n = 1 << 24
    keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
    for block in (1 << 15, 1 << 17):
        try:
            h = hist_mxu(keys, block)
            jax.block_until_ready(h)
        except Exception as e:
            print(f"block={block}: FAIL {str(e).splitlines()[0][:110]}")
            continue
        hn = np.asarray(h)
        k = np.asarray(keys).reshape(-1, block) & 0xFF
        want = np.stack([np.bincount(row, minlength=256) for row in k])
        ok = (hn == want).all()
        t = time_fn(functools.partial(hist_mxu, block_size=block), keys, iters=10)
        print(f"block={block}: correct={ok}  {t.ms:.2f} ms "
              f"{n*4/t.seconds/1e9:.1f} GB/s read")

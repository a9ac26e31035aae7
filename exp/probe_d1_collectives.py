"""VERDICT r1 #9: minimal repro for the D=1 degenerate-collective failures.

Round 1 observed: dist ops on a 1-device mesh compile-OOM at 2^24 and hit
runtime FAILED_PRECONDITION at 2^22 (bench/runner.py caps D=1 dist runs at
2^20). Bisect which collective triggers it at which size.
"""
import sys
import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map
import numpy as np

mesh = Mesh(np.array(jax.devices()[:1]), ("x",))


def tryrun(name, fn, *args):
    try:
        out = jax.block_until_ready(fn(*args))
        print(f"{name:44s} OK", flush=True)
    except Exception as e:
        print(f"{name:44s} FAIL {str(e).splitlines()[0][:110]}", flush=True)


for nlog in (20, 22, 24):
    n = 1 << nlog
    x = jnp.arange(n, dtype=jnp.uint32)

    # 1. psum of a small per-shard value
    f1 = jax.jit(shard_map(lambda a: jax.lax.psum(jnp.sum(a), "x"),
                           mesh=mesh, in_specs=P("x"), out_specs=P()))
    tryrun(f"psum scalar n=2^{nlog}", f1, x)

    # 2. all_gather of a scalar
    f2 = jax.jit(shard_map(lambda a: jax.lax.all_gather(a[0], "x"),
                           mesh=mesh, in_specs=P("x"), out_specs=P("x")))
    tryrun(f"all_gather scalar n=2^{nlog}", f2, x)

    # 3. ragged/padded all-to-all of the full shard (the dist_sort shuffle)
    def a2a(a):
        return jax.lax.all_to_all(a.reshape(1, -1), "x", 0, 0, tiled=True)
    f3 = jax.jit(shard_map(a2a, mesh=mesh, in_specs=P("x"),
                           out_specs=P("x")))
    tryrun(f"all_to_all full shard n=2^{nlog}", f3, x)

    # 4. local sort inside shard_map (no collective at all)
    f4 = jax.jit(shard_map(lambda a: jax.lax.sort(a), mesh=mesh,
                           in_specs=P("x"), out_specs=P("x")))
    tryrun(f"shard_map local sort n=2^{nlog}", f4, x)

    # 5. the real dist_sort_kv
    from lsdradixsort_tpu.parallel import make_mesh, shard_1d, dist_sort_kv
    m1 = make_mesh(1)
    keys = shard_1d(x, m1)
    vals = shard_1d(jnp.arange(n, dtype=jnp.uint32), m1)
    f5 = jax.jit(functools.partial(dist_sort_kv, mesh=m1))
    tryrun(f"dist_sort_kv n=2^{nlog}", f5, keys, vals)

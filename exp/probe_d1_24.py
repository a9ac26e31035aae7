"""VERDICT r2 #5: minimize the D=1 2^24 dist-program compile crash.

Round 2 bisected the *collectives* individually (exp/probe_d1_collectives.py:
psum / all_gather / all_to_all / local sort each OK through 2^24) and the
full dist_sort_kv OK at 2^22, but the full program at 2^24 killed the
remote compile helper with exit 1 and no diagnostic. This script builds the
program up stage by stage so the crash attaches to one added stage, and is
meant to be run ONE STAGE PER PROCESS (the helper degrades across big
compiles in one process):

    for s in sort splitters plan exchange full; do
        python exp/probe_d1_24.py $s 24 || echo "$s CRASHED"
    done

Stages (all D=1 shard_map over the real chip, n=2^24 kv):
  sort      — local 2-key unstable sort only
  splitters — + _splitter_keys (fori_loop of psum-counted probe rounds)
  plan      — + _local_send_plan (searchsorted + psum + all_gather)
  exchange  — + ragged_all_to_all of (keys, src, vals)
  full      — dist_sort_kv end to end
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import lsdradixsort_tpu.parallel.dist_sort as D
from lsdradixsort_tpu.parallel import make_mesh, shard_1d, dist_sort_kv

STAGE = sys.argv[1] if len(sys.argv) > 1 else "full"
NLOG = int(sys.argv[2]) if len(sys.argv) > 2 else 24
n = 1 << NLOG
mesh = make_mesh(1)
axis = "x"  # = mesh.DATA_AXIS (the r3 draft said "data" and never ran)


def stage_fn(k, v):
    me = jax.lax.axis_index(axis)
    src = (me.astype(jnp.uint32) * jnp.uint32(n)
           + jnp.arange(n, dtype=jnp.uint32))
    sk, ssrc, sv = jax.lax.sort((k, src, v), num_keys=2, is_stable=False)
    if STAGE == "sort":
        return sk, sv
    rks = jnp.arange(1, 1, dtype=jnp.uint32)
    spk = D._splitter_keys(sk, rks, axis)
    if STAGE == "splitters":
        return sk, sv + spk.sum().astype(jnp.uint32)
    offs, sizes = D._local_send_plan(sk, spk, rks, axis)
    if STAGE == "plan":
        return sk, sv + sizes.sum().astype(jnp.uint32)
    received = D._exchange((sk, ssrc, sv), offs, sizes, axis, out_len=n)
    rk, rsrc, rv = received
    if STAGE == "exchange":
        return rk, rv
    out = jax.lax.sort((rk, rsrc, rv), num_keys=2, is_stable=False)
    return out[0], out[2]


keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
vals = jnp.arange(n, dtype=jnp.uint32)
sk_in = shard_1d(keys, mesh)
sv_in = shard_1d(vals, mesh)

if STAGE == "full":
    fn = jax.jit(lambda k, v: dist_sort_kv(k, v, mesh))
else:
    fn = jax.jit(shard_map(stage_fn, mesh=mesh,
                           in_specs=(P(axis), P(axis)),
                           out_specs=(P(axis), P(axis))))

ok, ov = jax.block_until_ready(fn(sk_in, sv_in))
want = np.sort(np.asarray(keys))
got = np.asarray(ok)
print(f"stage={STAGE} n=2^{NLOG}: ran; sorted_ok={bool((got == want).all())}",
      flush=True)

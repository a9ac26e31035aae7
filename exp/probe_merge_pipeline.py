"""A/B the pipelined (double-buffered staging) merge kernel vs the serial
one: per merge pass at 2^27, keys and kv, both CE formulations.

The pipelined kernel starts chunk i+1's window DMAs before chunk i's
cascade runs (kernels/merge.py _merge_kernel_multi_pipe); the serial
kernel start+waits every load before compute. ROADMAP §8 expects the
serial loads to cost ~10-20% of the pass.

Usage: probe_merge_pipeline.py [roll|reshape]  (default roll)
"""
import sys

import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core.timing import time_fn
from lsdradixsort_tpu.kernels import merge as M
from lsdradixsort_tpu.kernels.tile_sort import sort_tiles, sort_tiles_kv

N = 1 << 27
TILE = 1 << 15
CE = next((a for a in sys.argv[1:] if a in ("roll", "reshape")), "roll")

keys = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
iota = jnp.arange(N, dtype=jnp.uint32)
print(f"backend={jax.default_backend()} n=2^27 ce={CE}", flush=True)

x = sort_tiles(keys, tile_rows=TILE // 128, ce=CE)
run = TILE
while run < N:
    buf = M.pass_buf_elems(run)
    tab, ok = M.merge_pass_tables(x, run, buf)
    for pipe in (False, True, "full"):
        t = time_fn(lambda a, tb: M.merge_pass(a, tb, run_len=run,
                                               buf_elems=buf, ce=CE,
                                               pipeline=pipe),
                    x, tab, iters=4, warmup=1)
        print(f"keys run=2^{run.bit_length()-1:2d} pipe={pipe!s:5} "
              f"kernel {t.ms:7.1f} ms  {N/t.ms/1e6:6.1f} Melem/s "
              f"ok={bool(ok)}", flush=True)
    x = M.merge_pass(x, tab, run_len=run, buf_elems=buf, ce=CE)
    run *= M.KWAY
print(f"keys sorted: {bool((x[1:] >= x[:-1]).all())}", flush=True)

xk, xv = sort_tiles_kv(keys, iota, tile_rows=TILE // 128, ce=CE)
run = TILE
while run < N:
    buf = M.pass_buf_elems(run)
    tab, ok = M.merge_pass_tables(xk, run, buf)
    for pipe in (False, True, "full"):
        t = time_fn(lambda a, b, tb: M.merge_pass_kv(
                        a, b, tb, run_len=run, buf_elems=buf, ce=CE,
                        pipeline=pipe),
                    xk, xv, tab, iters=4, warmup=1)
        print(f"kv   run=2^{run.bit_length()-1:2d} pipe={pipe!s:5} "
              f"kernel {t.ms:7.1f} ms  {N/t.ms/1e6:6.1f} Melem/s "
              f"ok={bool(ok)}", flush=True)
    xk, xv = M.merge_pass_kv(xk, xv, tab, run_len=run, buf_elems=buf, ce=CE)
    run *= M.KWAY
print(f"kv keys sorted: {bool((xk[1:] >= xk[:-1]).all())}", flush=True)

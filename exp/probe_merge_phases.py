"""Per-phase timing of the merge sort at 2^27: tile sort + each merge pass,
keys and kv, with the DEPTH-pipelined window DMAs. Guides round-2 tuning
(KWAY / buffer-size / blk sweep).

Usage: probe_merge_phases.py [roll|reshape ...]  (CE formulations to time;
default: both)."""
import sys

import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core.timing import time_fn
from lsdradixsort_tpu.kernels import merge as M
from lsdradixsort_tpu.kernels.tile_sort import sort_tiles, sort_tiles_kv

N = 1 << 27
TILE = 1 << 15

CES = [a for a in sys.argv[1:] if a in ("roll", "reshape")] or \
    ["roll", "reshape"]

keys = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
iota = jnp.arange(N, dtype=jnp.uint32)

print(f"backend={jax.default_backend()} n=2^27 ces={CES}", flush=True)

for ce in CES:
    # --- keys path, phase by phase ---
    t = time_fn(lambda k: sort_tiles(k, tile_rows=TILE // 128, ce=ce), keys,
                iters=4, warmup=2)
    print(f"[{ce:7s}] tile_sort keys: {t.ms:8.1f} ms  "
          f"{N/t.ms/1e6:6.1f} Melem/s", flush=True)
    x = sort_tiles(keys, tile_rows=TILE // 128, ce=ce)

    run = TILE
    while run < N:
        buf = M.pass_buf_elems(run)
        tab, ok = M.merge_pass_tables(x, run, buf)
        tt = time_fn(lambda a, b: M.merge_pass_tables(a, run, buf)[0], x, tab,
                     iters=4, warmup=1)
        t = time_fn(lambda a, tb: M.merge_pass(a, tb, run_len=run,
                                               buf_elems=buf, ce=ce),
                    x, tab, iters=4, warmup=1)
        print(f"[{ce:7s}] merge keys run=2^{run.bit_length()-1:2d} "
              f"buf=2^{buf.bit_length()-1}"
              f" tables {tt.ms:7.1f} ms  kernel {t.ms:7.1f} ms "
              f" {N/t.ms/1e6:6.1f} Melem/s ok={bool(ok)}", flush=True)
        x = M.merge_pass(x, tab, run_len=run, buf_elems=buf, ce=ce)
        run *= M.KWAY

    ok = bool((x[1:] >= x[:-1]).all())
    print(f"[{ce:7s}] keys sorted: {ok}", flush=True)

    # --- kv path ---
    t = time_fn(lambda k, v: sort_tiles_kv(k, v, tile_rows=TILE // 128,
                                           ce=ce)[0],
                keys, iota, iters=4, warmup=2)
    print(f"[{ce:7s}] tile_sort kv:   {t.ms:8.1f} ms  "
          f"{N/t.ms/1e6:6.1f} Melem/s", flush=True)
    xk, xv = sort_tiles_kv(keys, iota, tile_rows=TILE // 128, ce=ce)

    run = TILE
    while run < N:
        buf = M.pass_buf_elems(run)
        tab, ok = M.merge_pass_tables(xk, run, buf)
        t = time_fn(lambda a, b, tb: M.merge_pass_kv(a, b, tb, run_len=run,
                                                     buf_elems=buf, ce=ce),
                    xk, xv, tab, iters=4, warmup=1)
        print(f"[{ce:7s}] merge kv   run=2^{run.bit_length()-1:2d} "
              f"buf=2^{buf.bit_length()-1}"
              f" kernel {t.ms:7.1f} ms  {N/t.ms/1e6:6.1f} Melem/s "
              f"ok={bool(ok)}", flush=True)
        xk, xv = M.merge_pass_kv(xk, xv, tab, run_len=run, buf_elems=buf,
                                 ce=ce)
        run *= M.KWAY

    ok = bool((xk[1:] >= xk[:-1]).all())
    print(f"[{ce:7s}] kv keys sorted: {ok}", flush=True)

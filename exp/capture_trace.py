"""Stage-level trace of the flagship sort — the analog of the reference's
checked-in Nsight Compute reports (six .ncu-rep files at the repo root,
captured with `ncu --kernel-name LSDRadixSortKernel --set full`).

Two modes:

  stages [n_log2=24]  — time each pipeline stage of merge_sort_keys as
      its own jit (tile sort, then per-level sample tables + merge pass),
      print a breakdown table, and append the records to
      reports/trace_sort.jsonl. All stage jits run in ONE process; at
      2^24 each remote Pallas compile is minutes, so expect ~15 min cold.

  stages_kv [n_log2=24] — same for the stable kv pipeline
      (sort_tiles_kv + merge_pass_kv with the rank stream riding).

  xprof [n_log2=24]   — capture a jax.profiler trace of the warm full
      sort into reports/trace_sort_xprof/ (TensorBoard-loadable), if the
      axon backend supports device tracing; falls back to host-only trace
      with a printed note.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core.cache import enable_persistent_cache
from lsdradixsort_tpu.core.timing import time_fn
from lsdradixsort_tpu.ops.sort import merge_sort_keys

enable_persistent_cache()
HERE = os.path.dirname(os.path.abspath(__file__))
REPORTS = os.path.join(HERE, "..", "reports")
MODE = sys.argv[1] if len(sys.argv) > 1 else "stages"
NLOG = int(sys.argv[2]) if len(sys.argv) > 2 else 24
n = 1 << NLOG
t0 = time.time()


def log(msg):
    print(f"{msg} [{time.time()-t0:.0f}s]", flush=True)


keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)

if MODE == "xprof":
    import warnings
    out_dir = os.path.join(REPORTS, "trace_sort_xprof")
    fn = jax.jit(merge_sort_keys)
    np.asarray(fn(keys))[:1]  # compile + warm outside the trace
    log("warm")
    try:
        with jax.profiler.trace(out_dir):
            for _ in range(3):
                r = fn(keys)
            np.asarray(r[:1])
        log(f"trace written to {out_dir}")
    except Exception as e:  # noqa: BLE001
        warnings.warn(f"device trace failed on this backend: {e}")
        raise SystemExit(1)
    raise SystemExit(0)

# ---- stages / stages_kv modes ----
from lsdradixsort_tpu.kernels import merge as M                    # noqa: E402
from lsdradixsort_tpu.kernels.tile_sort import (sort_tiles,        # noqa: E402
                                                sort_tiles_kv)

KV = MODE == "stages_kv"
TILE_LOG2 = 15
tile = 1 << TILE_LOG2
assert n % tile == 0 and (n // tile) & (n // tile - 1) == 0
records = []

if KV:
    iota = jnp.arange(n, dtype=jnp.uint32)
    tiles_fn = jax.jit(lambda k, v: sort_tiles_kv(
        k, v, tile_rows=tile // 128, ce="reshape"))
    t = time_fn(tiles_fn, keys, iota, iters=4, warmup=2)
    x, v = tiles_fn(keys, iota)
else:
    tiles_fn = jax.jit(lambda k: sort_tiles(k, tile_rows=tile // 128,
                                            ce="reshape"))
    t = time_fn(tiles_fn, keys, iters=4, warmup=2)
    x, v = tiles_fn(keys), None
records.append({"stage": "tile_sort", "kv": KV, "ms": round(t.ms, 2),
                "melems_per_s": round(t.gelems_per_s(n) * 1e3, 1)})
log(f"tile_sort: {t.ms:.1f} ms")

run = tile
level = 0
while run < n:
    buf = M.pass_buf_elems(run, M.DEF_BUF)
    tab_fn = jax.jit(lambda k, run=run, buf=buf: M.merge_pass_tables(
        k, run, buf, M.DEF_BLK))
    tt = time_fn(tab_fn, x, iters=4, warmup=2)
    tab, ok = tab_fn(x)
    assert bool(ok), f"tables overflow at run=2^{run.bit_length()-1}"
    if KV:
        pass_fn = jax.jit(lambda k, v, tb, run=run, buf=buf:
                          M.merge_pass_kv(k, v, tb, run_len=run,
                                          buf_elems=buf, blk=M.DEF_BLK,
                                          ce="reshape", pipeline="full"))
        tp = time_fn(pass_fn, x, v, tab, iters=4, warmup=2)
    else:
        pass_fn = jax.jit(lambda k, tb, run=run, buf=buf: M.merge_pass(
            k, tb, run_len=run, buf_elems=buf, blk=M.DEF_BLK, ce="reshape",
            pipeline="full"))
        tp = time_fn(pass_fn, x, tab, iters=4, warmup=2)
    records.append({"stage": f"tables_L{level}", "run_log2":
                    run.bit_length() - 1, "ms": round(tt.ms, 2)})
    records.append({"stage": f"merge_L{level}", "kv": KV, "run_log2":
                    run.bit_length() - 1, "ms": round(tp.ms, 2),
                    "melems_per_s": round(tp.gelems_per_s(n) * 1e3, 1)})
    log(f"L{level} (run=2^{run.bit_length()-1}): tables {tt.ms:.1f} ms, "
        f"merge {tp.ms:.1f} ms")
    if KV:
        x, v = pass_fn(x, v, tab)
    else:
        x = pass_fn(x, tab)
    run *= M.KWAY
    level += 1

ok = bool(np.all(np.asarray(x) == np.sort(np.asarray(keys))))
if KV:
    hostk = np.asarray(keys)
    sv = np.asarray(v)
    ok = ok and bool((hostk[sv] == np.asarray(x)).all())
log(f"chain verify: {'OK' if ok else 'FAILED'}")
total = sum(r["ms"] for r in records)
print(f"# total staged: {total:.1f} ms over {len(records)} stages "
      f"(n=2^{NLOG})", flush=True)
for r in records:
    r["n_log2"] = NLOG
    print(json.dumps(r), flush=True)
with open(os.path.join(REPORTS, "trace_sort.jsonl"), "a") as f:
    for r in records:
        f.write(json.dumps(r) + "\n")

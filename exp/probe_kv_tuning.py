"""On-chip kv/keys 2^27 config A/B: merge-buffer size and tile size
(VERDICT r4 #3 — close the kv 0.953x gap to >= 1.0x baseline).

Stage model (BENCHMARKS.md): the merge cascade runs 3 levels x
(nbits-2..nbits) stages per pass; buf 2^19 cuts 57 -> 54 stages/pass
(-5%) and tile 2^18 trades 120 tile stages + 4 passes for 171 + 3
(-2%). Engine is at ~98% of its compare-network bound, so stage-count
cuts are the remaining lever.

Usage: CONFIGS="15:20,15:19,18:20" timeout 3600 python exp/probe_kv_tuning.py [keys]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from lsdradixsort_tpu.core.cache import enable_persistent_cache  # noqa: E402
from lsdradixsort_tpu.core.timing import time_fn  # noqa: E402
from lsdradixsort_tpu.ops.sort import merge_sort_keys, \
    merge_sort_with_ranks  # noqa: E402

enable_persistent_cache()
KEYS_ONLY = "keys" in sys.argv[1:]
N = 1 << 27


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", flush=True)


keys = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
want = None
if os.environ.get("VERIFY", "1") == "1":
    want = np.sort(np.asarray(keys))

configs = [tuple(int(v) for v in c.split(":"))
           for c in os.environ.get("CONFIGS", "15:19").split(",")]
log(f"{'keys' if KEYS_ONLY else 'kv'} n=2^27 configs={configs}")

for tile_log2, buf_log2 in configs:
    if KEYS_ONLY:
        fn = jax.jit(lambda k, t=tile_log2, b=buf_log2:
                     merge_sort_keys(k, tile_log2=t, max_buf=1 << b))
    else:
        fn = jax.jit(lambda k, t=tile_log2, b=buf_log2:
                     merge_sort_with_ranks(k, tile_log2=t, max_buf=1 << b))
    t0 = time.perf_counter()
    out = fn(keys)
    sk = out if KEYS_ONLY else out[0]
    got = np.asarray(sk)
    tc = time.perf_counter() - t0
    if want is not None:
        ok = bool((got == want).all())
        if not KEYS_ONLY:
            sr = np.asarray(out[1])
            host = np.asarray(keys)
            ok = ok and bool((host[sr] == got).all())
            same = got[1:] == got[:-1]
            ok = ok and bool((~same | (sr[1:] > sr[:-1])).all())
        log(f"tile=2^{tile_log2} buf=2^{buf_log2}: verify "
            f"{'OK' if ok else 'FAILED'} (first call {tc:.0f}s)")
        assert ok
    t = time_fn(fn, keys, iters=4, warmup=2)
    log(f"tile=2^{tile_log2} buf=2^{buf_log2}: {t.ms:.1f} ms = "
        f"{N / t.seconds / 1e6:.0f} Melem/s")

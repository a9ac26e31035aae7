"""Pass-structure A/B for the flagship sort (VERDICT r3 weak #2 / next #8).

Question: can the compare-network bound move by changing the pass
structure?  At 2^27 with KWAY=8 the pass count is 5 HBM round trips for
every tile_log2 in {15, 16, 17} (runs grow 8x per pass; the tile only
shifts the start), and 4 round trips at tile_log2=18 (2^18 -> 2^21 ->
2^24 -> 2^27).  The trade: a 2^18 tile sort runs ~171 bitonic CE stages
vs 120 at 2^15 (sum of 1..log2(tile)), so the saved merge pass
(~33 ms at the measured envelope) buys ~51 extra tile stages
(~6 ps * 51 * 2^27 ~= 41 ms) — the experiment prices which side wins
on real hardware.

Usage: probe_tile_ab.py <tile_log2> [n_log2=27] [kv|keys] [buf_log2=20] [blk=2048]
One config per process (the axon remote-compile helper degrades when one
process batches several big Pallas compiles, ROADMAP §7c).
Appends a JSON record to reports/tile_ab.jsonl.

Stage-count model (kernels/tile_sort.py bitonic_network +
kernels/merge.py _merge_compute): tile sort = sum(1..tile_log2) stages;
each merge pass = (b-2) + (b-1) + b stages for buf = 2^b. At 2^27:
tile 2^15 -> 120 + 4*57 = 348 stages; tile 2^18 -> 171 + 3*57 = 342.
Measured keys 166 ms => 3.55 ps/elem/stage; the model predicts
tile 2^18 at ~163 ms. This probe tests the model on chip.
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
from lsdradixsort_tpu.ops.sort import merge_sort_with_ranks

TL = int(sys.argv[1]) if len(sys.argv) > 1 else 15
NLOG = int(sys.argv[2]) if len(sys.argv) > 2 else 27
MODE = sys.argv[3] if len(sys.argv) > 3 else "keys"
BUF = 1 << int(sys.argv[4]) if len(sys.argv) > 4 else None
BLK = int(sys.argv[5]) if len(sys.argv) > 5 else None
n = 1 << NLOG
t0 = time.time()

keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
want = np.sort(np.asarray(keys))
if MODE == "kv":
    fn = jax.jit(lambda k: merge_sort_with_ranks(k, tile_log2=TL,
                                                 max_buf=BUF, blk=BLK))
    sk, sr = fn(keys)
    sk, sr = np.asarray(sk), np.asarray(sr)
    host = np.asarray(keys)
    ok = bool((sk == want).all()) and bool((host[sr] == sk).all())
    if ok:
        same = sk[1:] == sk[:-1]
        ok = bool((~same | (sr[1:] > sr[:-1])).all())
else:
    fn = jax.jit(lambda k: merge_sort_keys(k, tile_log2=TL, max_buf=BUF,
                                           blk=BLK))
    ok = bool((np.asarray(fn(keys)) == want).all())
print(f"# tile_log2={TL} {MODE} buf={BUF} blk={BLK} verify: "
      f"{'OK' if ok else 'FAILED'} [{time.time()-t0:.0f}s]", flush=True)
assert ok
t = time_fn(fn, keys, iters=4, warmup=2)
rec = {"tile_log2": TL, "n_log2": NLOG, "mode": MODE, "buf": BUF,
       "blk": BLK, "ms": round(t.ms, 1),
       "melems_per_s": round(t.gelems_per_s(n) * 1e3, 1),
       "merge_passes": max(0, -(-(NLOG - TL) // 3)), "verified": ok}
print(json.dumps(rec), flush=True)
path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "reports", "tile_ab.jsonl")
with open(path, "a") as f:
    f.write(json.dumps(rec) + "\n")

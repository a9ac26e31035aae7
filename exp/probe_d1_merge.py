"""D=1 on-chip dist_sort_kv with merge-engine local sorts (VERDICT r3 #4/#5).

The full degenerate-collective dist program at 2^24 crashes the remote
compile helper when the local sorts are jax.lax.sort under shard_map
(probe_d1_24.py, reproduced 2026-08-20: HTTP 500 subprocess exit 1).
Round 4 routed the local sorts through the framework merge engine
(parallel/dist_sort.py engine="auto" -> "merge" on TPU) — this probe
checks whether the rewritten program compiles and verifies at 2^24,
which would close the r3 crash as "path retired" and give the D=1
dist timing with the local-sort speedup.

Usage: probe_d1_merge.py [n_log2=24] [engine=auto]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core.cache import enable_persistent_cache
from lsdradixsort_tpu.core.timing import time_fn
from lsdradixsort_tpu.parallel import make_mesh, shard_1d, dist_sort_kv

enable_persistent_cache()
NLOG = int(sys.argv[1]) if len(sys.argv) > 1 else 24
ENGINE = sys.argv[2] if len(sys.argv) > 2 else "auto"
n = 1 << NLOG
t0 = time.time()

mesh = make_mesh(1)
keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
vals = jnp.arange(n, dtype=jnp.uint32)
sk = shard_1d(keys, mesh)
sv = shard_1d(vals, mesh)
fn = jax.jit(lambda k, v: dist_sort_kv(k, v, mesh, engine=ENGINE))
ok, ov = fn(sk, sv)
kh = np.asarray(ok)
print(f"# compiled+ran [{time.time()-t0:.0f}s]", flush=True)
keys_np = np.asarray(keys)
perm = np.argsort(keys_np, kind="stable")
good = bool((kh == keys_np[perm]).all()) and \
    bool((np.asarray(ov) == perm.astype(np.uint32)).all())
print(f"# verify dist_sort_kv D=1 n=2^{NLOG} engine={ENGINE}: "
      f"{'OK' if good else 'FAILED'}", flush=True)
assert good
t = time_fn(fn, sk, sv, iters=4, warmup=1)
print(f"dist_sort_kv D=1 2^{NLOG} engine={ENGINE}: {t.ms:.1f} ms "
      f"{n / t.seconds / 1e6:.1f} Melem/s", flush=True)

"""Warm the EXACT plain-path flagship jits bench.py will run (keys +
stable kv at 2^27), with no deadline — so the driver's `python bench.py`
measures both phases live in its 510 s window (VERDICT r4 #5; ROADMAP
7d: the verify-path cache entries do NOT warm the plain path).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from lsdradixsort_tpu.core.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
from lsdradixsort_tpu.ops.sort import merge_sort_keys, \
    merge_sort_with_ranks  # noqa: E402

t0 = time.time()
n = 1 << 27
keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)

kfn = jax.jit(merge_sort_keys)
np.asarray(kfn(keys)[:1])
print(f"# keys warm done [{time.time() - t0:.0f}s]", flush=True)

kvfn = jax.jit(merge_sort_with_ranks)
np.asarray(kvfn(keys)[0][:1])
print(f"# kv warm done [{time.time() - t0:.0f}s]", flush=True)

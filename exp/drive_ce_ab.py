"""End-to-end A/B of the CE formulation on the flagship paths at 2^27:

  sort(strategy='merge')  keys-only   ce=roll vs ce=reshape
  merge_sort_with_ranks   stable kv   ce=roll vs ce=reshape

plus pipeline=True vs 'full' for the winner. This is the decision probe
for flipping the production defaults (ROADMAP §7/§8): the micro-probe
(probe_ce_reshape.py) prices a single stage; this prices the whole
cascade including tile sort, table prepass, and window DMAs. Each
configuration verifies sortedness on-device before timing.
"""
import numpy as np
import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core.timing import time_fn
from lsdradixsort_tpu.ops.sort import merge_sort_keys, merge_sort_with_ranks

N = 1 << 27
keys = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
print(f"backend={jax.default_backend()} n=2^27", flush=True)

for ce in ("roll", "reshape", "auto"):
    for pipe in (True, "full"):
        f = jax.jit(lambda k: merge_sort_keys(k, ce=ce, pipeline=pipe))
        out = f(keys)
        ok = bool((out[1:] >= out[:-1]).all())
        t = time_fn(f, keys, iters=4, warmup=1)
        print(f"keys ce={ce:8s} pipe={pipe!s:5} {t.ms:7.1f} ms "
              f"{N/t.ms/1e6:6.1f} Melem/s sorted={ok}", flush=True)

for ce in ("roll", "reshape", "auto"):
    for pipe in (True, "full"):
        f = jax.jit(lambda k: merge_sort_with_ranks(k, ce=ce,
                                                    pipeline=pipe))
        ko, ro = f(keys)
        ok = bool((ko[1:] >= ko[:-1]).all())
        t = time_fn(f, keys, iters=4, warmup=1)
        print(f"kv   ce={ce:8s} pipe={pipe!s:5} {t.ms:7.1f} ms "
              f"{N/t.ms/1e6:6.1f} Melem/s sorted={ok}", flush=True)

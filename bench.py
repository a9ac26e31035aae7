"""Flagship benchmark: full-sort throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the reference's own flagship — sort uniform-random uint32 keys
(BenchmarkLSDRadixSort.md; the reference sorts keys-only). 2^27 elements
(512 MB). Baseline: the reference's best full GPU LSD sort — 0.400
Gelem/s (2^30 uint32, block=512, r=4, RTX 3060 Ti; BASELINE.md:27).

The measured path is the framework's OWN sort (strategy="merge":
VMEM bitonic tile sort + 8-way sample-split merge passes, kernels/merge.py
— not jax.lax.sort, which runs ~1.5x slower on this chip; see
BENCHMARKS.md). Run with --verify to check the output bit-exactly against
np.sort first; --kv additionally reports the stable key-value sort
(sort_with_ranks) as a secondary line.
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core.timing import time_fn
from lsdradixsort_tpu.ops.sort import sort, sort_with_ranks

REFERENCE_GELEMS_PER_S = 0.400  # BASELINE.md best full-sort config


def main() -> int:
    n = 1 << 27
    verify = "--verify" in sys.argv
    kv = "--kv" in sys.argv
    keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
    if verify:
        import numpy as np
        got = np.asarray(sort(keys))
        ok = bool((got == np.sort(np.asarray(keys))).all())
        print(f"# verify sort(merge) n=2^27: {'OK' if ok else 'FAILED'}",
              file=sys.stderr)
        if not ok:
            return 1
    t = time_fn(sort, keys, iters=4, warmup=2)
    gelems = t.gelems_per_s(n)
    if kv:
        tkv = time_fn(sort_with_ranks, keys, iters=4, warmup=2)
        print(f"# kv sort_with_ranks: {tkv.gelems_per_s(n)*1e3:.1f} Melem/s",
              file=sys.stderr)
    print(json.dumps({
        "metric": "sort_throughput",
        "value": round(gelems * 1e3, 2),
        "unit": "Melem/s",
        "vs_baseline": round(gelems / REFERENCE_GELEMS_PER_S, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

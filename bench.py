"""Flagship benchmark: stable key-value sort throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: BASELINE config 2 — sort 2^27 (134M) uint32 keys carrying a
32-bit payload (the row id), i.e. the permutation-producing columnar sort.
Baseline: the reference's best full GPU LSD sort — 0.400 Gelem/s (keys-only,
2^30 uint32, block=512, r=4, RTX 3060 Ti; BASELINE.md).
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core.timing import time_fn
from lsdradixsort_tpu.ops.sort import sort_with_ranks

REFERENCE_GELEMS_PER_S = 0.400  # BASELINE.md best full-sort config


def main() -> None:
    n = 1 << 27  # 134M rows (1 GB of kv data)
    keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
    t = time_fn(sort_with_ranks, keys, iters=4, warmup=2)
    gelems = t.gelems_per_s(n)
    print(json.dumps({
        "metric": "kv_sort_throughput",
        "value": round(gelems * 1e3, 2),
        "unit": "Melem/s",
        "vs_baseline": round(gelems / REFERENCE_GELEMS_PER_S, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())

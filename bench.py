"""Flagship benchmark: full-sort throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "kv_value": N, "kv_vs_baseline": N, ...}

Workload: the reference's own flagship — sort uniform-random uint32 keys
(BenchmarkLSDRadixSort.md; the reference sorts keys-only) — plus the
north-star extension, the stable key-value sort, reported in the same
line (kv_* fields). 2^27 elements (512 MB). Baseline: the reference's
best full GPU LSD sort — 0.400 Gelem/s (2^30 uint32, block=512, r=4,
RTX 3060 Ti; BASELINE.md:27).

The measured path is the framework's OWN sort (strategy="merge":
VMEM bitonic tile sort + 8-way sample-split merge passes, kernels/merge.py
— not jax.lax.sort, which runs slower on this chip; see BENCHMARKS.md).
Run with --verify to check both outputs bit-exactly against numpy first.

Robustness (the reference never loses its numbers — its reports are
checked-in captured stdout): transient TPU/tunnel errors (e.g.
FAILED_PRECONDITION during an outage) are retried with backoff; every
good run is persisted to reports/bench_last_good.json; if all attempts
fail, the last good numbers are emitted with "stale": true and an
"error" field, so the captured line always parses.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

REFERENCE_GELEMS_PER_S = 0.400  # BASELINE.md best full-sort config
LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "reports", "bench_last_good.json")
ATTEMPTS = 3
BACKOFF_S = (15, 60)


def _measure(verify: bool) -> dict:
    """One full measurement attempt. Imports inside so a dead backend at
    import time is also retried."""
    import jax
    import jax.numpy as jnp

    from lsdradixsort_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    from lsdradixsort_tpu.core.timing import time_fn
    from lsdradixsort_tpu.ops.sort import merge_sort_keys, \
        merge_sort_with_ranks

    n = 1 << 27
    keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
    kfn = jax.jit(merge_sort_keys)
    kvfn = jax.jit(merge_sort_with_ranks)
    if verify:
        import numpy as np
        host = np.asarray(keys)
        want = np.sort(host)
        got = np.asarray(kfn(keys))
        ok = bool((got == want).all())
        print(f"# verify sort(merge) n=2^27: {'OK' if ok else 'FAILED'}",
              file=sys.stderr)
        if not ok:
            raise AssertionError("keys-only merge sort mismatch vs np.sort")
        sk, sr = kvfn(keys)
        sk, sr = np.asarray(sk), np.asarray(sr)
        # stable kv: sorted keys match AND the permutation reproduces them
        # with equal-key ranks ascending (stability)
        ok = bool((sk == want).all()) and bool((host[sr] == sk).all())
        if ok:
            same = sk[1:] == sk[:-1]
            ok = bool((~same | (sr[1:] > sr[:-1])).all())
        print(f"# verify kv merge_sort_with_ranks: {'OK' if ok else 'FAILED'}",
              file=sys.stderr)
        if not ok:
            raise AssertionError("stable kv merge sort mismatch")
    t = time_fn(kfn, keys, iters=4, warmup=2)
    tkv = time_fn(kvfn, keys, iters=4, warmup=2)
    gelems = t.gelems_per_s(n)
    gkv = tkv.gelems_per_s(n)
    return {
        "metric": "sort_throughput",
        "value": round(gelems * 1e3, 2),
        "unit": "Melem/s",
        "vs_baseline": round(gelems / REFERENCE_GELEMS_PER_S, 3),
        "kv_value": round(gkv * 1e3, 2),
        "kv_vs_baseline": round(gkv / REFERENCE_GELEMS_PER_S, 3),
        "n": n,
    }


def main() -> int:
    verify = "--verify" in sys.argv
    last_err = None
    for attempt in range(ATTEMPTS):
        try:
            rec = _measure(verify)
            try:
                os.makedirs(os.path.dirname(LAST_GOOD), exist_ok=True)
                with open(LAST_GOOD, "w") as f:
                    json.dump(rec, f)
            except OSError:
                pass
            print(json.dumps(rec))
            return 0
        except Exception as e:  # noqa: BLE001 — retried, then reported
            last_err = f"{type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)
            if attempt + 1 < ATTEMPTS:
                delay = BACKOFF_S[min(attempt, len(BACKOFF_S) - 1)]
                print(f"# attempt {attempt + 1} failed; retrying in "
                      f"{delay}s", file=sys.stderr)
                time.sleep(delay)
    # all attempts failed: emit the last good numbers (stale) or an
    # error-only record — either way the line parses
    rec = {"metric": "sort_throughput", "value": None, "unit": "Melem/s",
           "vs_baseline": None}
    try:
        with open(LAST_GOOD) as f:
            rec = json.load(f)
        rec["stale"] = True
    except (OSError, ValueError):
        pass
    rec["error"] = (last_err or "unknown")[:500]
    print(json.dumps(rec))
    return 1


if __name__ == "__main__":
    sys.exit(main())

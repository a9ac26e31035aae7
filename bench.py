"""Flagship benchmark: full-sort throughput on one chip.

Prints ONE JSON line on stdout:
  {"metric": "sort_throughput", "value": N, "unit": "Melem/s",
   "vs_baseline": N, "kv_value": N, "kv_vs_baseline": N, ...}

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
checked-in captured stdout, BenchmarkLSDRadixSort.md:139-161). Round 3's
capture died rc=124 with NOTHING on stdout because both 2^27 jits
compiled before any output and the process had no signal handling. This
version is structured so a JSON line lands under ANY termination:

  * A best-so-far record is maintained from t=0 (seeded from the
    committed reports/bench_last_good.json, marked "stale": true).
  * The keys-only number is measured FIRST and folded into the record
    the moment it exists; the kv measurement then extends it.
  * SIGTERM/SIGINT/SIGALRM handlers emit the current record and exit.
    An internal deadline (env BENCH_DEADLINE_S, default 510 s) fires
    SIGALRM before a typical external 10-minute kill.
  * The kv phase is skipped entirely if too little budget remains.
  * No long retry sleeps (round 3 burned 75 s in backoff): one retry
    per phase, 5 s apart, transient-error or not.
  * Every good measurement is persisted to reports/bench_last_good.json
    (committed to the repo) so a future cold-kill still emits real data.
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time
import traceback

REFERENCE_GELEMS_PER_S = 0.400  # BASELINE.md best full-sort config
HERE = os.path.dirname(os.path.abspath(__file__))
LAST_GOOD = os.path.join(HERE, "reports", "bench_last_good.json")
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "510"))
T0 = time.monotonic()

# ---- best-so-far record, emitted exactly once under any termination ----
BEST: dict = {"metric": "sort_throughput", "value": None,
              "unit": "Melem/s", "vs_baseline": None}
# per-phase freshness: False until a live measurement lands THIS run.
# Seeded (replayed) fields are marked stale in the emitted record — a
# replayed number must never present as a fresh measurement (ADVICE r4).
FRESH = {"keys": False, "kv": False}
_EMITTED = False


def _emit(partial: bool = False) -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    rec = dict(BEST)
    if partial:
        rec["partial"] = True
    if rec.get("value") is not None and not FRESH["keys"]:
        rec["stale"] = True
    if rec.get("kv_value") is not None and not FRESH["kv"]:
        rec["kv_stale"] = True
    sys.stdout.write(json.dumps(rec) + "\n")
    sys.stdout.flush()


def _on_signal(signum, frame):  # noqa: ARG001
    print(f"# bench: signal {signum} at t={time.monotonic() - T0:.0f}s — "
          f"emitting best-so-far record", file=sys.stderr)
    _emit(partial=True)
    os._exit(0)


def _install_handlers() -> None:
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_signal)
    if hasattr(signal, "SIGALRM") and DEADLINE_S > 0:
        signal.signal(signal.SIGALRM, _on_signal)
        signal.alarm(int(DEADLINE_S))
    # Signal handlers only run at main-thread bytecode boundaries — a
    # main thread blocked for minutes inside the remote-compile RPC
    # defers them indefinitely (observed 2026-08-20: SIGALRM+SIGTERM both
    # pending through a whole kv compile; the round-3 empty capture was
    # this exact corner). A daemon WATCHDOG THREAD runs as long as the
    # blocked native call releases the GIL, so the record still lands.
    if DEADLINE_S > 0:
        import threading

        def _watchdog():
            time.sleep(DEADLINE_S + 5)
            print(f"# bench: watchdog thread at "
                  f"t={time.monotonic() - T0:.0f}s — emitting",
                  file=sys.stderr, flush=True)
            _emit(partial=True)
            os._exit(0)

        threading.Thread(target=_watchdog, daemon=True).start()


def _seed_from_last_good() -> None:
    try:
        with open(LAST_GOOD) as f:
            rec = json.load(f)
        rec.pop("partial", None)
        rec.pop("stale", None)
        rec.pop("kv_stale", None)
        BEST.clear()
        BEST.update(rec)
    except (OSError, ValueError):
        pass


def _persist() -> None:
    try:
        os.makedirs(os.path.dirname(LAST_GOOD), exist_ok=True)
        rec = {k: v for k, v in BEST.items()
               if k not in ("stale", "kv_stale", "partial", "error")}
        with open(LAST_GOOD, "w") as f:
            json.dump(rec, f)
    except OSError:
        pass


def _budget_left() -> float:
    return DEADLINE_S - (time.monotonic() - T0) if DEADLINE_S > 0 else 1e9


def _attempt(phase: str, fn, retries: int = 1):
    """Run fn(); on failure retry once after 5 s. Returns None on failure."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — reported in the record
            BEST["error"] = f"{phase}: {type(e).__name__}: {e}"[:500]
            traceback.print_exc(file=sys.stderr)
            if attempt < retries and _budget_left() > 30:
                time.sleep(5)
    return None


def main() -> int:
    verify = "--verify" in sys.argv
    _seed_from_last_good()
    _install_handlers()

    def _mark(what: str) -> None:
        print(f"# {what} (t={time.monotonic() - T0:.0f}s)", file=sys.stderr,
              flush=True)

    import jax
    import jax.numpy as jnp
    from lsdradixsort_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    from lsdradixsort_tpu.core.timing import time_fn
    from lsdradixsort_tpu.ops.sort import merge_sort_keys, \
        merge_sort_with_ranks
    _mark("imports done")

    n = 1 << 27
    keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
    keys.block_until_ready()
    _mark("datagen done")
    want = None
    if verify:
        import numpy as np
        want = np.sort(np.asarray(keys))

    # Overlap the kv program's compile-cache load / server install with
    # the whole keys phase: in a fresh process each big jit blocks its
    # caller for minutes even on a cache hit (measured r5: keys 166 s,
    # kv longer — reports/bench_warm_r5.log), and serially that blows
    # the 510 s window before kv can measure (VERDICT r4 #5). The jit
    # call releases the GIL inside the blocking native call (the
    # watchdog thread proves this), so a daemon thread warms it in
    # parallel and the kv phase below finds a hot executable.
    import threading
    kvfn = jax.jit(merge_sort_with_ranks)
    kv_ready = threading.Event()

    def _kv_prewarm():
        try:
            import numpy as _np
            r = kvfn(keys)
            _np.asarray(r[0][:1])  # force full install + one execution
            _mark("kv prewarm done")
        except Exception as e:  # noqa: BLE001 — kv phase will retry/report
            print(f"# kv prewarm failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
        finally:
            kv_ready.set()

    threading.Thread(target=_kv_prewarm, daemon=True).start()

    # ---- phase 1: keys-only (the reference's exact workload) ----
    def keys_phase():
        kfn = jax.jit(merge_sort_keys)
        kfn(keys)  # compile (persistent-cache load) + async dispatch
        _mark("keys compile/cache-load done")
        if verify:
            import numpy as np
            got = np.asarray(kfn(keys))
            ok = bool((got == want).all())
            print(f"# verify sort(merge) n=2^27: {'OK' if ok else 'FAILED'}",
                  file=sys.stderr)
            if not ok:
                raise AssertionError("keys merge sort mismatch vs np.sort")
        t = time_fn(kfn, keys, iters=4, warmup=2)
        return t.gelems_per_s(n)

    g = _attempt("keys", keys_phase)
    if g is not None:
        FRESH["keys"] = True
        BEST.pop("error", None)
        BEST.update(value=round(g * 1e3, 2),
                    vs_baseline=round(g / REFERENCE_GELEMS_PER_S, 3), n=n)
        BEST.setdefault("kv_value", None)
        BEST.setdefault("kv_vs_baseline", None)
        _persist()
        print(f"# keys: {BEST['value']} Melem/s "
              f"(t={time.monotonic() - T0:.0f}s)", file=sys.stderr)

    # ---- phase 2: stable kv (north-star config 2), budget permitting ----
    def kv_phase():
        # wait out the background prewarm (leaving emit headroom); the
        # executable is then hot and the measurement takes seconds
        kv_ready.wait(timeout=max(_budget_left() - 45, 0))
        _mark(f"kv prewarm wait over (ready={kv_ready.is_set()})")
        if verify:
            import numpy as np
            host = np.asarray(keys)
            sk, sr = kvfn(keys)
            sk, sr = np.asarray(sk), np.asarray(sr)
            ok = bool((sk == want).all()) and bool((host[sr] == sk).all())
            if ok:  # stability: equal-key ranks strictly ascending
                same = sk[1:] == sk[:-1]
                ok = bool((~same | (sr[1:] > sr[:-1])).all())
            print(f"# verify kv merge_sort_with_ranks: "
                  f"{'OK' if ok else 'FAILED'}", file=sys.stderr)
            if not ok:
                raise AssertionError("stable kv merge sort mismatch")
        t = time_fn(kvfn, keys, iters=4, warmup=2)
        return t.gelems_per_s(n)

    if _budget_left() > 60:
        gkv = _attempt("kv", kv_phase)
        if gkv is not None:
            FRESH["kv"] = True
            BEST.pop("error", None)
            BEST.update(kv_value=round(gkv * 1e3, 2),
                        kv_vs_baseline=round(gkv / REFERENCE_GELEMS_PER_S, 3))
            _persist()
            print(f"# kv: {BEST['kv_value']} Melem/s "
                  f"(t={time.monotonic() - T0:.0f}s)", file=sys.stderr)
    else:
        print(f"# kv phase skipped: {_budget_left():.0f}s left",
              file=sys.stderr)

    _emit()
    # exit code reflects whether a LIVE measurement landed this run — a
    # seeded replay alone is a failure for callers checking rc (ADVICE r4)
    return 0 if FRESH["keys"] else 1


if __name__ == "__main__":
    sys.exit(main())

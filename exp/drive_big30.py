"""On-chip 2^30 stable kv sort through the PUBLIC chunked API
(ops/bigsort.sort_with_ranks_chunked) — north-star config 1 at the
reference's flagship scale (4 GB of keys + 4 GB of ranks), all
device-resident.

Memory plan (see ops/bigsort.py): 8 donated segments of 2^27 sorted
in-place-ish, exact-rank chunked final merge in 2 output ranges with
consumed-prefix trims. Peak ~= 12 GB on the 16 GB chip.

Verification is device-side (drive_kv29.py discipline): per-range
sortedness + cross-range boundary, salted-hash multiset equality of keys
and of the rank permutation, and sampled rank->original-key spot checks
against regenerated segments.

Usage: drive_big30.py [verify|time|warm_hist|warm_sort|warm_merge]

The warm_* phases compile (and persist to the JAX compilation cache) one
big program each, so the verify/time run hits the cache for the dominant
compiles (hist, segment sort, tables, range-0 merge; range 1's trimmed
run lengths and the verify path's range_check/sample_check programs still
compile in-run) — the axon remote-compile helper degrades when one
process batches several big Pallas compiles (ROADMAP §7c), so each phase
gets its own process:
  warm_hist  — the chunked salted-histogram program (verify's oracle)
  warm_sort  — the 2^27 segment stable kv sort (tile sort + 4 merge passes)
  warm_merge — merge_tables_exact_runs + merge_pass_runs at 2^30 shapes
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core.cache import enable_persistent_cache
from lsdradixsort_tpu.ops.bigsort import sort_with_ranks_chunked
from lsdradixsort_tpu.kernels.histogram import digit_histogram

enable_persistent_cache()
t0 = time.time()
S = 8
L = 1 << 27
N = S * L
CH = 1 << 22
SALTS = (0x9E3779B1, 0x85EBCA77)


@jax.jit
def genseg(s):
    return jax.random.bits(jax.random.fold_in(jax.random.PRNGKey(0), s),
                           (L,), dtype=jnp.uint32)


def hists_of(a):
    n = a.shape[0]

    def body(i, acc):
        c = jax.lax.dynamic_slice(a, (i * CH,), (CH,))
        hs = []
        for salt in SALTS:
            h = c * jnp.uint32(salt)
            for g in range(4):
                hs.append(digit_histogram(h, 8, g))
        return acc + jnp.stack(hs)
    return jax.lax.fori_loop(0, n // CH, body,
                             jnp.zeros((8, 256), jnp.uint32))


@jax.jit
def seg_hists(s):
    return hists_of(genseg(s))


@jax.jit
def range_check(kr, rr, prev_last):
    def body(i, acc):
        c = jax.lax.dynamic_slice(kr, (i * CH,), (CH + 1,))
        return acc & jnp.all(c[1:] >= c[:-1])
    n = kr.shape[0]
    srt = jax.lax.fori_loop(0, n // CH - 1, body,
                            jnp.bool_(kr[0] >= prev_last))
    tail = jax.lax.dynamic_slice(kr, (n - CH,), (CH,))
    srt = srt & jnp.all(tail[1:] >= tail[:-1])
    return srt, hists_of(kr), hists_of(rr), kr[-1]


@functools.partial(jax.jit, static_argnames=("s",))
def sample_check(kr, rr, s):
    """For sampled output rows whose rank lies in segment s: the
    regenerated original key at that rank must equal the sorted key."""
    idx = (jnp.arange(1 << 12, dtype=jnp.uint32) * jnp.uint32(131071)
           % jnp.uint32(kr.shape[0]))
    p = jnp.take(rr, idx)
    k = jnp.take(kr, idx)
    seg = genseg(s)
    inseg = (p >= s * L) & (p < (s + 1) * L)
    orig = jnp.take(seg, p - s * L, mode="clip")
    return jnp.all(~inseg | (orig == k))


def run_sort(range_consumer=None, segs=None):
    """With range_consumer, each 4 GB output range is consumed and FREED
    as it completes — holding both ranges while range 1's pass is live
    measured RESOURCE_EXHAUSTED on the 16 GB chip (big30_r4.log).

    segs: pre-built (forced) segments — the timed mode builds them
    OUTSIDE the timing window, matching the reference's discipline of
    timing the sort but not the data staging (events bracket kernels,
    H2D outside — LSDRadixSort.cu:998-1009). Segments are consumed
    (donated), so each timed iteration needs a fresh set."""
    if segs is None:
        segs = [genseg(s) for s in range(S)]
    return sort_with_ranks_chunked(segs, chunk_log2=19, nranges=2,
                                   ce="reshape", pipeline="full",
                                   range_consumer=range_consumer)


MODE = sys.argv[1] if len(sys.argv) > 1 else "verify"

if MODE == "warm_hist":
    jax.block_until_ready(seg_hists(0))
    print(f"warm_hist done [{time.time()-t0:.0f}s]", flush=True)
    sys.exit(0)

if MODE == "warm_sort":
    from lsdradixsort_tpu.ops.bigsort import _seg_sort_fn
    f = jax.jit(_seg_sort_fn(15, "reshape", "full"), donate_argnums=(0,))
    k, vs = f(genseg(0), jnp.uint32(0))
    jax.block_until_ready(k)
    print(f"warm_sort done [{time.time()-t0:.0f}s]", flush=True)
    sys.exit(0)

if MODE == "warm_merge":
    # compile the exact-rank table prepass and the chunked run-merge kernel
    # at the real 2^30 shapes; the runs' VALUES don't matter for compilation
    # (already-sorted iota segments are valid sorted runs), so this phase
    # skips the 8 segment sorts. The runs must INTERLEAVE keys across runs
    # (identical iotas: every chunk draws ~C/S rows from each run) so the
    # merge kernel's per-chunk quarter-capacity contract
    # (max_pair_blocks <= buf_elems//4//blk) holds — constant-per-run keys
    # would pull an entire chunk from ONE run and overrun the VMEM window.
    import functools as _ft
    from lsdradixsort_tpu.kernels import merge as M
    runs_k = [jax.jit(lambda: jax.lax.broadcasted_iota(
        jnp.uint32, (L,), 0))() for s in range(S)]
    runs_r = [jax.jit(lambda s=s: jnp.uint32(s * L) + jax.lax.broadcasted_iota(
        jnp.uint32, (L,), 0))() for s in range(S)]
    C = 1 << 19
    tabf = jax.jit(_ft.partial(M.merge_tables_exact_runs,
                               chunk_elems=C, blk=M.DEF_BLK))
    tab, _ = tabf(runs_k)
    tab_host = np.asarray(tab)
    print(f"warm_merge tables done [{time.time()-t0:.0f}s]", flush=True)
    nch = S * L // C
    outs = M.merge_pass_runs([runs_k, runs_r], jnp.asarray(tab_host),
                             chunk0=0, nchunks=nch // 2, chunk_elems=C,
                             buf_elems=M.DEF_BUF, blk=M.DEF_BLK,
                             ce="reshape", pipeline="full")
    jax.block_until_ready(outs[0])
    print(f"warm_merge done [{time.time()-t0:.0f}s]", flush=True)
    sys.exit(0)

if MODE == "verify":
    hk_in = seg_hists(0)
    print(f"# seg_hists(0) done [{time.time()-t0:.0f}s]", flush=True)
    for s in range(1, S):
        hk_in = hk_in + seg_hists(s)
    print(f"# input key hists done [{time.time()-t0:.0f}s]", flush=True)
    hr_in = jax.jit(lambda: hists_of(
        jax.lax.broadcasted_iota(jnp.uint32, (N,), 0)))()
    jax.block_until_ready(hr_in)
    print(f"# input rank hists done [{time.time()-t0:.0f}s]", flush=True)

    # streaming consumer: check each range on-device as it lands, return
    # only tiny check results, free the 4 GB range buffers immediately
    state = {"last": jnp.uint32(0)}

    def consume(ri, outs):
        k, r = outs
        srt, h1, h2, state["last"] = range_check(k, r, state["last"])
        samp = [bool(sample_check(k, r, s)) for s in range(S)]
        print(f"# range {ri} checked [{time.time()-t0:.0f}s]", flush=True)
        return bool(srt), h1, h2, all(samp)

    results = run_sort(range_consumer=consume)[0]
    print(f"# sort+check done [{time.time()-t0:.0f}s]", flush=True)
    ok_sorted = all(r[0] for r in results)
    hk = sum((r[1] for r in results[1:]), results[0][1])
    hr = sum((r[2] for r in results[1:]), results[0][2])
    ok_samp = all(r[3] for r in results)
    ok_mk = bool(jnp.all(hk == hk_in))
    ok_mr = bool(jnp.all(hr == hr_in))
    print(f"VERIFY chunked kv sort n=2^30: sorted={ok_sorted} "
          f"keys_multiset={ok_mk} rank_multiset={ok_mr} "
          f"samples={ok_samp} [{time.time()-t0:.0f}s]", flush=True)
    sys.exit(0 if (ok_sorted and ok_mk and ok_mr and ok_samp) else 1)

# time: first call compiles everything; time the second. The consumer
# forces each range then releases it (same memory plan as verify).
# Run with LSD_DEBUG=1 to get the bigsort-internal phase timeline; the
# force consumer prints a sub-second timestamp per completed range so the
# timed total can be attributed (r5: the r4 ROADMAP attributed 6.5 s to
# the bisection, but the selection measures 323 ms warm at this geometry
# — reports/probe_fanout_r5.log — so the real split must be measured).

_TMARK = [0.0]


def _mark(what):
    print(f"# time: {what} [{time.perf_counter() - _TMARK[0]:.2f}s]",
          flush=True)


def force(ri, outs):
    np.asarray(outs[0][-128:])
    _mark(f"range {ri} forced")
    return None


run_sort(range_consumer=force)
best = float("inf")
for _ in range(2):
    segs = [genseg(s) for s in range(S)]
    for s_ in segs:
        np.asarray(s_[:1])           # force: keygen outside the timing
    t1 = time.perf_counter()
    _TMARK[0] = t1
    run_sort(range_consumer=force, segs=segs)
    dt = time.perf_counter() - t1
    _mark(f"run_sort total {dt * 1e3:.0f} ms")
    best = min(best, dt)
print(f"chunked kv sort 2^30: {best*1e3:.0f} ms  "
      f"{N/best/1e9:.3f} Gelem/s kv "
      f"(reference keys-only best: 2683 ms, 0.400 G/s)", flush=True)

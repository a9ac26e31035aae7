"""Chip-scale chunked sort — the memory plan that fits 2^30 kv rows on one
16 GB chip (north-star config 1; the reference's flagship 4 GB benchmark,
TestGPULSDRadixSort at LSDRadixSort.cu:912-1030, lifted to stable kv).

The problem: a merge pass ping-pongs input -> output, so a flat 2^30-row
kv pass holds 8 GB in + 8 GB out = 16 GB — more than the chip. The plan:

  1. The input arrives as S equal SEGMENTS (chunked columns, the
     columnar-engine norm). Each segment is stable-kv-sorted on its own
     (existing single-graph pipeline, segment donated), so at any moment
     only ~1 segment's pass buffers are live beyond the data itself.
  2. The final S-way merge runs CHUNKED: exact-rank boundaries (k-way
     selection, kernels/merge.py merge_tables_exact_runs) make every
     output chunk exactly chunk_elems rows, so the pass splits into
     `nranges` independently-allocated output ranges. The Pallas kernel
     reads the S runs from S separate HBM buffers (statically-routed
     window DMAs, merge_pass_runs).
  3. Between ranges, each run's consumed prefix is TRIMMED (donated
     suffix copy at quarter-run granularity), freeing HBM as output
     accumulates: peak ~= data + one range + slack instead of 2x data.

Skew safety: chunks whose block windows would overflow the kernel's
quarter capacity (possible only when >~4x the average chunk mass comes
from one run) are detected from the table on the host and computed by an
exact gather+sort fallback program, then patched into the range.

Output is returned as range-chunked columns (concatenating would itself
allocate 2x — callers stream the ranges).
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lsdradixsort_tpu.kernels import merge as M

LANES = 128


def _debug(msg: str) -> None:
    """Progress prints for chip-scale runs, gated by LSD_DEBUG=1 (a 2^30
    sort spans several multi-minute compiles; silence reads as a hang).
    Includes live HBM bytes_in_use when the backend reports it — the
    2^30 plan lives or dies by what is actually still allocated."""
    if os.environ.get("LSD_DEBUG"):
        mem = ""
        try:
            st = jax.local_devices()[0].memory_stats()
            if st and "bytes_in_use" in st:
                mem = f" [hbm {st['bytes_in_use'] / 1e9:.2f} GB]"
        except Exception:  # noqa: BLE001 — stats are best-effort
            pass
        stamp = (time.strftime("%H:%M:%S")
                 + f".{int(time.time() * 1000) % 1000:03d}")
        print(f"# bigsort {stamp} {msg}{mem}",
              file=sys.stderr, flush=True)


def _seg_sort_fn(tile_log2: int, ce: str, pipeline):
    """Jittable (keys_seg, base) -> stable (keys, ranks[, payloads...])
    sorter for one segment; ranks are GLOBAL positions (base + iota)."""
    from lsdradixsort_tpu.ops.sort import merge_sort_multi

    def f(seg, base, *payloads):
        L = seg.shape[0]
        iota = base + jax.lax.broadcasted_iota(jnp.uint32, (L,), 0)
        k, vs = merge_sort_multi(seg, [iota, *payloads],
                                 tile_log2=tile_log2, ce=ce,
                                 pipeline=pipeline)
        return k, vs
    return f


def _chunk_fallback_fn(S: int, ns: int, C: int, blk: int):
    """Exact gather+sort program for one overflow (skewed) chunk: slice a
    static max-size window from every run, sentinel-mask beyond the block
    window, lax.sort by (key, val0), take the C rows at exact offset pre.
    Run lengths are read from the (static) argument shapes, so trimmed
    runs clamp correctly."""
    W = C + 2 * blk

    def f(tabrow, *streams):          # streams: ns x S run arrays, flat
        runs = [streams[g * S:(g + 1) * S] for g in range(ns)]
        parts = [[] for _ in range(ns)]
        iota = jax.lax.broadcasted_iota(jnp.int32, (W,), 0)
        for s in range(S):
            Ls = runs[0][s].shape[0]
            start = tabrow[s] * LANES
            wlen = tabrow[M.KWAY + s] * blk
            cs = jnp.clip(start, 0, Ls - W)
            off = start - cs
            valid = (iota >= off) & (iota < off + wlen)
            for g in range(ns):
                w = jax.lax.dynamic_slice(runs[g][s], (cs,), (W,))
                parts[g].append(jnp.where(valid, w,
                                          jnp.uint32(0xFFFFFFFF)))
        cols = [jnp.concatenate(p) for p in parts]
        out = jax.lax.sort(tuple(cols), num_keys=min(ns, 2),
                           is_stable=False)
        pre = tabrow[17] * LANES - tabrow[16]
        return [jax.lax.dynamic_slice(o, (pre,), (C,)) for o in out]
    return f


def merge_runs_chunked(run_streams, *, chunk_log2: int = 19,
                       nranges: int = 2, blk: int = M.DEF_BLK,
                       buf_elems: int = M.DEF_BUF, trim: bool = True,
                       ce: str = "reshape", pipeline="full",
                       interpret: bool | None = None,
                       range_consumer=None, consume_inputs: bool = False,
                       fanout: int | None = None):
    """Merge S sorted runs (each stream a list of S separate equal-length
    device buffers) into `nranges` output ranges, trimming consumed input
    between ranges. run_streams[0] = keys; run_streams[1] = val0 (the
    position-consistent tiebreak, REQUIRED: exact boundaries count ties in
    run order); further streams ride. Returns list over streams of lists
    over ranges.

    range_consumer: optional fn(ri, outs) called as each range completes,
    with outs = [one array per stream]. When given, the range buffers are
    RELEASED after the call instead of accumulated and the return value
    is [[consumer results]] — ONE list (in out[0]) of the fn's per-range
    return values; the other streams' lists are empty — at 2^30 the
    accumulated ranges are
    4 GB each, and holding range 0 while range 1's pass is live is what
    pushes the plan past the chip's HBM (measured RESOURCE_EXHAUSTED,
    2026-08-20); streaming consumption caps the peak at
    in-runs + ONE range + pass scratch.

    consume_inputs=True additionally CLEARS the passed run_streams lists:
    the caller's lists otherwise pin every untrimmed run buffer for the
    whole call, so the between-range trims free NOTHING — at 2^30 that
    pins 8 GB and range 1 OOMs at ~18 GB live (measured 2026-08-20,
    big30_r4.log; range 0's 13.4 GB peak fit, range 1's did not).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ns = len(run_streams)
    S = len(run_streams[0])
    if not 2 <= S <= M.KWAY:
        raise ValueError(f"need 2..{M.KWAY} runs, got {S}")
    L = run_streams[0][0].shape[0]
    C = 1 << chunk_log2
    nch = S * L // C
    if nch % nranges:
        raise ValueError(f"nranges={nranges} must divide nchunks={nch}")
    qcap = buf_elems // 4 // blk

    _debug(f"exact-rank tables: S={S} nchunks={nch}")
    tabf = jax.jit(functools.partial(M.merge_tables_exact_runs,
                                     chunk_elems=C, blk=blk, fanout=fanout))
    tab, _ = tabf(run_streams[0])
    tab_host = np.asarray(tab)            # (nch+pad+8, NCOLS), tiny
    _debug("tables on host")
    pair = (tab_host[:nch, M.KWAY:2 * M.KWAY:2]
            + tab_host[:nch, M.KWAY + 1:2 * M.KWAY:2])
    overflow = np.flatnonzero(pair.max(axis=1) > qcap)
    fb = None

    streams = [list(rs) for rs in run_streams]
    if consume_inputs:
        for rs in run_streams:
            rs.clear()
    del run_streams
    trims = np.zeros(S, np.int32)         # rows already trimmed per run
    rng_ch = nch // nranges
    out = [[] for _ in range(ns)]
    for ri in range(nranges):
        c0 = ri * rng_ch
        adj = tab_host.copy()
        adj[:, :S] -= trims[None, :]
        ovf = overflow[(overflow >= c0) & (overflow < c0 + rng_ch)]
        if ovf.size:
            # neutralize overflow chunks for the kernel (no loads/emits)
            adj[ovf, :2 * M.KWAY] = 0
            adj[ovf, 19] = 0
        _debug(f"range {ri}/{nranges}: merge_pass_runs chunks "
               f"[{c0},{c0 + rng_ch}) run_lens="
               f"{[int(r.shape[0]) for r in streams[0]]}")
        outs = M.merge_pass_runs(
            streams, jnp.asarray(adj), chunk0=c0, nchunks=rng_ch,
            chunk_elems=C, buf_elems=buf_elems, blk=blk, ce=ce,
            pipeline=pipeline, interpret=interpret)
        _debug(f"range {ri}: dispatched")
        if ovf.size:
            if fb is None:
                fb = jax.jit(_chunk_fallback_fn(S, ns, C, blk))
            patch = jax.jit(
                lambda dst, src, at: jax.lax.dynamic_update_slice(
                    dst, src, (at,)), donate_argnums=0)
            for c in ovf.tolist():
                row = tab_host[c].copy()
                row[:S] -= trims
                cols = fb(jnp.asarray(row),
                          *[r for rs in streams for r in rs])
                at = (c - c0) * C
                outs = [patch(o, col, at) for o, col in zip(outs, cols)]
        if range_consumer is not None:
            res = range_consumer(ri, outs)
            del outs
            out[0].append(res)
        else:
            for g in range(ns):
                out[g].append(outs[g])
        if trim and ri + 1 < nranges:
            # free each run's consumed prefix (quarter-run granularity);
            # the donated static-slice copy frees the old buffer
            Lr = L // LANES
            for s in range(S):
                consumed = int(tab_host[c0 + rng_ch, s])  # rows
                # keep >= one quarter-run: zero-length refs don't trace,
                # and window starts clamp against the remaining buffer
                t_new = min((consumed // (Lr // 4)) * (Lr // 4),
                            Lr - Lr // 4)
                d = int(t_new - trims[s])
                if d <= 0:
                    continue
                cut = jax.jit(lambda x, d=d * LANES: x[d:],
                              donate_argnums=0)
                for g in range(ns):
                    streams[g][s] = cut(streams[g][s])
                    # serialize: an async batch of all 2*S cut copies
                    # allocates every suffix while every original is
                    # still live (+~5 GB transient at 2^30 — measured
                    # RESOURCE_EXHAUSTED in the time phase); blocking
                    # bounds the transient to ONE cut
                    jax.block_until_ready(streams[g][s])
                trims[s] = t_new
    return out


def sort_kv_chunked(key_segs, val_segs=None, *, tile_log2: int = 15,
                    chunk_log2: int = 19, nranges: int = 2,
                    blk: int = M.DEF_BLK, buf_elems: int = M.DEF_BUF,
                    ce: str = "reshape", pipeline="full",
                    interpret: bool | None = None,
                    range_consumer=None, fanout: int | None = None):
    """Stable kv sort of segment-chunked columns at chip scale.

    key_segs: list of S equal-length u32 segments (S in 2..8, each length
    a power-of-2 multiple of the tile and of blk); together they form the
    logical column keys = concat(key_segs). val_segs: optional matching
    payload segments. Returns (key_ranges, rank_ranges[, val_ranges]) —
    output as `nranges` range-chunked arrays per stream (concatenating at
    2^30 would itself blow the memory plan; stream the ranges). With
    range_consumer set, the range buffers are released instead of
    returned and the return value is a 1-tuple: ([consumer results],) —
    one entry per range, whatever the consumer returned (see
    merge_runs_chunked).

    This is the public 2^30 path: 8 segments of 2^27 u32 keys (+payload)
    sort stably with ~12 GB peak HBM — sorted keys, original positions,
    and payloads emerge without any host round trip. Each segment is
    DONATED (freed as it is consumed).
    """
    S = len(key_segs)
    L = key_segs[0].shape[0]
    if any(int(s.shape[0]) != L for s in key_segs):
        raise ValueError("segments must be equal length")
    has_vals = val_segs is not None
    f = jax.jit(_seg_sort_fn(tile_log2, ce, pipeline),
                donate_argnums=(0,) if not has_vals else (0, 2))
    runs_k, runs_r, runs_v = [], [], []
    for s in range(S):
        _debug(f"segment {s}/{S} sort dispatch")
        base = jnp.uint32(s) * jnp.uint32(L)
        if has_vals:
            k, vs = f(key_segs[s], base, val_segs[s])
            runs_v.append(vs[1])
        else:
            k, vs = f(key_segs[s], base)
        runs_k.append(k)
        runs_r.append(vs[0])
    streams = [runs_k, runs_r] + ([runs_v] if has_vals else [])
    # hand buffer ownership to the merge: local run lists would otherwise
    # pin all S untrimmed runs (8 GB at 2^30) across the whole call and
    # defeat the between-range trims
    del runs_k, runs_r, runs_v
    outs = merge_runs_chunked(streams, chunk_log2=chunk_log2,
                              nranges=nranges, blk=blk,
                              buf_elems=buf_elems, ce=ce,
                              pipeline=pipeline, interpret=interpret,
                              range_consumer=range_consumer,
                              consume_inputs=True, fanout=fanout)
    return tuple(outs)


def sort_with_ranks_chunked(key_segs, **kw):
    """sort_kv_chunked without a payload: (key_ranges, rank_ranges)."""
    return sort_kv_chunked(key_segs, None, **kw)

"""K-way merge-path merge pass — the HBM-scale half of the framework sort.

TPU-native replacement for the reference's global LSD pass structure
(GPULSDRadixSort, LSDRadixSort.cu:839-910) *re-designed for the measured
v5e envelope*: radix partition passes cannot beat XLA's tuned sort on this
chip (no scatter, dynamic gathers ~150 ps/elem — see ROADMAP), so the
framework sort is a merge sort instead:

  1. VMEM tile sort (kernels/tile_sort.py) produces sorted runs.
  2. Each merge pass fuses KWAY=8 runs -> 1 run in ONE HBM round trip:
     an XLA prepass samples every `blk`-th element, sorts the samples per
     group, and derives *block-aligned merge-path windows*: for each
     output chunk (<= buf elements), the 8 source windows that contain
     exactly its elements (plus <=3 blocks of slack each).
  3. A Pallas kernel DMAs the 8 windows into a VMEM buffer laid out as
     4 quarters of [A ascending | +inf pads | B descending], then runs a
     static bitonic half-cleaner cascade (quarters -> halves -> full,
     alternating direction, so each level's input is bitonic by
     construction), rolls the result to a 128-alignment boundary, and
     DMA-emits exactly the chunk's rows at their final positions.

Every data-dependent quantity (window offsets, roll amounts, emit ranges)
is a scalar table computed in the XLA prepass; the kernel's vector code is
100% static — rolls, compares, selects — which is the only fast regime on
this hardware (ROADMAP: bitonic CE stage ~6 ps/elem vs ~150 ps/gather).

Skew safety: the prepass checks every window pair against the buffer
capacity and returns ok=False if any chunk would overflow (pathological
distributions); the caller then falls back to jax.lax.sort for that pass.
Uniform and all-equal-key inputs stay on the fast path (equal keys are
split by run order, which spreads them evenly across chunks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.kernels.tile_sort import (ce_stage_reshape,
                                                ce_swap_mask,
                                                use_reshape_ce)

LANES = 128
KWAY = 8              # fan-in per merge pass
DEF_BLK = 2048        # default sample stride (elements) = one window block
DEF_BUF = 1 << 20     # default VMEM merge buffer capacity (elements; 4 MB)
NCOLS = 24            # scalar-table columns per chunk
DEPTH = 8             # outstanding window-load DMAs per chunk


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def pass_buf_elems(run_len: int, max_buf: int = DEF_BUF) -> int:
    return min(max_buf, KWAY * run_len)


def pass_spc(run_len: int, buf_elems: int, blk: int) -> int:
    """Samples-per-chunk: whole group if it fits the buffer, else fill the
    buffer ~86% leaving 6-sigma headroom for binomial window imbalance and
    the +-3 blocks/window of alignment slack."""
    if KWAY * run_len <= buf_elems:
        return KWAY * (run_len // blk)
    return max(buf_elems // blk - 72, 8)


# ---------------------------------------------------------------------------
# XLA prepass: sample-derived merge-path tables
# ---------------------------------------------------------------------------

def merge_pass_tables(keys: jax.Array, run_len: int, buf_elems: int,
                      blk: int = DEF_BLK, keys2: jax.Array | None = None):
    """Scalar tables for one merge pass (runs of `run_len` -> KWAY*run_len).

    keys: (n,) uint32 sorted in runs of run_len; n % run_len == 0.
    keys2: optional second compared plane — runs are then sorted by the
    PAIR (keys, keys2) and chunk boundaries split ties on the pair (the
    64-bit single-chain sort: keys=hi, keys2=lo, merged with ncmp=3).
    Returns (tables (padded_chunks, NCOLS) int32, ok) where ok is a traced
    bool — False means some chunk would overflow the VMEM buffer (extreme
    skew) and the caller must take the fallback path.
    """
    n = keys.shape[0]
    L = run_len
    nruns = n // L
    ngroups = -(-nruns // KWAY)
    S = L // blk                       # samples (= blocks) per run
    blk_rows = blk // LANES
    spc = pass_spc(L, buf_elems, blk)
    qblocks = buf_elems // 4 // blk
    bufrows = buf_elems // LANES
    nch = -(-(KWAY * S) // spc)        # chunks per group

    # sample via a 1-D strided slice: reshaping keys to (nruns, L) first
    # materializes a full relayout copy at large L (4 GB at n=2^30)
    samp = keys[::blk].reshape(nruns, S)                  # (nruns, S)
    pad_runs = ngroups * KWAY - nruns
    if pad_runs:
        samp = jnp.concatenate(
            [samp, jnp.full((pad_runs, S), 0xFFFFFFFF, jnp.uint32)], 0)
    gsamp = samp.reshape(ngroups, KWAY * S)
    run_in_g = jnp.arange(KWAY, dtype=jnp.uint32)[:, None]
    blk_i = jnp.arange(S, dtype=jnp.uint32)[None, :]
    aux = jnp.broadcast_to(((run_in_g << 16) | blk_i).reshape(1, KWAY * S),
                           (ngroups, KWAY * S))
    if keys2 is not None:
        samp2 = keys2[::blk].reshape(nruns, S)
        if pad_runs:
            samp2 = jnp.concatenate(
                [samp2, jnp.full((pad_runs, S), 0xFFFFFFFF, jnp.uint32)], 0)
        gsamp2 = samp2.reshape(ngroups, KWAY * S)
        sk, sk2, sa = jax.lax.sort((gsamp, gsamp2, aux), dimension=1,
                                   num_keys=3, is_stable=False)
    else:
        sk, sa = jax.lax.sort((gsamp, aux), dimension=1, num_keys=2,
                              is_stable=False)

    irun = jnp.arange(KWAY, dtype=jnp.int32)[None, None, :]
    gidx = jnp.arange(ngroups, dtype=jnp.int32)[:, None, None]
    grun = gidx * KWAY + irun                              # (ng,1,K)
    real = grun < nruns

    if nch > 1:
        # p[g,t,i]: # samples of run i before boundary t (position t*spc)
        onehot = ((sa[:, :, None] >> 16)
                  == jnp.arange(KWAY, dtype=jnp.uint32)).astype(jnp.int32)
        cum = jnp.cumsum(onehot, axis=1)                   # (ng, KS, K)
        tpos = jnp.minimum(jnp.arange(1, nch, dtype=jnp.int32) * spc,
                           KWAY * S - 1)                   # (nch-1,)
        p_mid = cum[:, tpos - 1, :]                        # (ng, nch-1, K)
        bkey = sk[:, tpos][:, :, None]                     # (ng, nch-1, 1)
        bkey2 = sk2[:, tpos][:, :, None] if keys2 is not None else None
        baux = sa[:, tpos]
        brun = (baux >> 16).astype(jnp.int32)[:, :, None]
        bblk = (baux & 0xFFFF).astype(jnp.int32)[:, :, None]

        # exact ranks at interior boundaries via localized binary search
        lo = jnp.maximum(p_mid - 1, 0) * blk
        hi = jnp.minimum(p_mid * blk, L)
        run_base = jnp.minimum(grun, nruns - 1) * L

        def body(_, state):
            lo_, hi_ = state
            live = lo_ < hi_
            mid = (lo_ + hi_) >> 1
            el = jnp.take(keys, run_base + mid, mode="clip")
            if keys2 is not None:
                el2 = jnp.take(keys2, run_base + mid, mode="clip")
                tie = (el2 < bkey2) | ((el2 == bkey2) & (irun < brun))
            else:
                tie = irun < brun
            pred = live & ((el < bkey) | ((el == bkey) & tie))
            lo_ = jnp.where(pred, mid + 1, lo_)
            hi_ = jnp.where(live & ~pred, mid, hi_)
            return lo_, hi_
        steps = blk.bit_length() + 1
        rank_mid, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
        rank_mid = jnp.where(irun == brun, bblk * blk, rank_mid)
        rank_mid = jnp.where(real, rank_mid, 0)
    else:
        rank_mid = jnp.zeros((ngroups, 0, KWAY), jnp.int32)

    zeros = jnp.zeros((ngroups, 1, KWAY), jnp.int32)
    ends = jnp.where(real, jnp.int32(L), 0) + zeros
    rank = jnp.concatenate([zeros, rank_mid, ends], axis=1)  # (ng,nch+1,K)

    r = jnp.sum(rank, axis=2)                               # (ng, nch+1)
    wstart = jnp.maximum(rank[:, :nch] // blk - 1, 0)       # (ng, nch, K)
    wend = jnp.minimum(rank[:, 1:] // blk + 2,
                       jnp.where(real, jnp.int32(S), 0))
    wend = jnp.maximum(wend, wstart)
    wblk = wend - wstart                                    # (ng, nch, K)
    pre = jnp.sum(rank[:, :nch] - wstart * blk, axis=2)     # (ng, nch)

    # adaptive pairing: sort windows by size desc, pair j with KWAY-1-j
    order = jnp.argsort(-wblk, axis=2)                      # (ng, nch, K)
    a_slots = order[:, :, : KWAY // 2]
    b_slots = order[:, :, : KWAY // 2 - KWAY - 1: -1]
    slots = jnp.stack([a_slots, b_slots], axis=3).reshape(
        ngroups, nch, KWAY)                                 # A0 B0 A1 B1...
    s_wblk = jnp.take_along_axis(wblk, slots, axis=2)
    s_wstart = jnp.take_along_axis(wstart, slots, axis=2)
    s_grun = jnp.take_along_axis(jnp.broadcast_to(grun, wblk.shape),
                                 slots, axis=2)
    src_row = (jnp.minimum(s_grun, nruns - 1) * (L // LANES)
               + s_wstart * blk_rows)

    pair_sum = s_wblk[:, :, 0::2] + s_wblk[:, :, 1::2]
    ok = jnp.all(pair_sum <= qblocks)

    rp = (r // LANES) * LANES                               # aligned ranks
    # pads are +inf and rank LAST, so the chunk's first element sits at
    # sorted-buffer position `pre` (windows hold pre elements below it)
    start = pre - (r[:, :nch] - rp[:, :nch])
    m = (-start) % LANES
    emit_row0 = (start + m) // LANES
    gbase_rows = (jnp.arange(ngroups, dtype=jnp.int32)[:, None]
                  * (KWAY * L // LANES))
    out_row0 = gbase_rows + rp[:, :nch] // LANES
    emit_rows = (rp[:, 1:] - rp[:, :nch]) // LANES
    ok = (ok & jnp.all(start >= 0)
          & jnp.all(emit_row0 + emit_rows <= bufrows))

    nchunks = ngroups * nch
    pad_ch = -(-nchunks // 8) * 8
    # 8 extra all-zero rows beyond the grid so the pipelined kernel's
    # look-ahead block (tab_next, chunk i+1) is always in bounds; zero rows
    # start no DMAs and emit nothing. Grid = tab.shape[0] - 8.
    tab = jnp.zeros((pad_ch + 8, NCOLS), jnp.int32)
    tab = tab.at[:nchunks, 0:KWAY].set(src_row.reshape(nchunks, KWAY))
    tab = tab.at[:nchunks, KWAY:2 * KWAY].set(s_wblk.reshape(nchunks, KWAY))
    tab = tab.at[:nchunks, 16].set(m.reshape(nchunks))
    tab = tab.at[:nchunks, 17].set(emit_row0.reshape(nchunks))
    tab = tab.at[:nchunks, 18].set(out_row0.reshape(nchunks))
    tab = tab.at[:nchunks, 19].set(emit_rows.reshape(nchunks))
    return tab, ok


# ---------------------------------------------------------------------------
# Pallas merge kernel
# ---------------------------------------------------------------------------

def _flip_blocks(x, bufrows: int, blk_rows: int):
    """Reverse element order within every blk-element block: XOR-complement
    the row bits within each blk_rows group + reverse lanes. Static only."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    j = 1
    while j < blk_rows:
        up = pltpu.roll(x, bufrows - j, 0)   # value from row + j
        dn = pltpu.roll(x, j, 0)             # value from row - j
        x = jnp.where((row & j) == 0, up, dn)
        j *= 2
    j = 1
    while j < LANES:
        up = pltpu.roll(x, LANES - j, 1)
        dn = pltpu.roll(x, j, 1)
        x = jnp.where((lane & j) == 0, up, dn)
        j *= 2
    return x


def _shift_flat_right(x, s: int):
    """Value at flat row-major position f - s, for static s in [1, LANES)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rolled = pltpu.roll(x, s, 1)
    prev = pltpu.roll(rolled, 1, 0)
    return jnp.where(lane >= s, rolled, prev)




def _load_windows(tab_ref, trow, in_hbms, bufs, sems, sbase, *, qrows: int,
                  blk_rows: int, abits: int, action: str):
    """Start and/or wait the KWAY window-load DMA sets for one chunk.

    A slots load contiguous ascending at quarter starts (bit-decomposed
    into power-of-2 DMAs); B slots load per-block in mirrored order packed
    at the quarter END, so the +inf pad gap sits between A (ascending) and
    B (descending) — rise, plateau, fall stays bitonic.

    in_hbms is indexed [slot][stream]: the flat kernels bind the same
    per-stream refs to every slot (all windows live in one array); the
    runs-based kernel (merge_pass_runs) binds slot s to run s's own HBM
    buffers, which is what lets a chip-scale pass read its 8 input runs
    from 8 separately-freeable buffers.

    action: "both" = start+wait inline (the serial path), "start" = issue
    only, "wait" = re-derive identical descriptors and wait them. Deferred
    waits are safe by byte conservation: every started DMA is waited on the
    same semaphore pool before the buffers are read, so the last wait can
    only return once every transfer has landed.
    """
    ns = len(bufs)
    pool = ns * DEPTH
    for s in range(KWAY):
        q = s // 2
        src = tab_ref[trow, s]
        wblk = tab_ref[trow, KWAY + s]
        if s % 2 == 0:   # A: contiguous ascending at quarter start
            for j in range(abits, -1, -1):
                sz = 1 << j

                @pl.when((wblk & sz) != 0)
                def _(src=src, wblk=wblk, j=j, sz=sz, q=q, s=s):
                    pref = ((wblk >> (j + 1)) << (j + 1)) * blk_rows
                    for gi, (hbm, buf) in enumerate(zip(in_hbms[s], bufs)):
                        dma = pltpu.make_async_copy(
                            hbm.at[pl.ds(src + pref, sz * blk_rows), :],
                            buf.at[pl.ds(q * qrows + pref,
                                         sz * blk_rows), :],
                            sems.at[sbase + (ns * j + gi) % pool])
                        if action != "wait":
                            dma.start()
                        if action != "start":
                            dma.wait()
        else:            # B: per-block, mirrored; DEPTH block-groups
            # outstanding hide the per-descriptor issue cost on the
            # serial path

            def mkb(b, gi, src=src, wblk=wblk, q=q, s=s):
                dst = q * qrows + qrows - (b + 1) * blk_rows
                return pltpu.make_async_copy(
                    in_hbms[s][gi].at[pl.ds(src + b * blk_rows, blk_rows), :],
                    bufs[gi].at[pl.ds(dst, blk_rows), :],
                    sems.at[sbase + (ns * b + gi) % pool])

            if action == "both":
                def bbody(b, _):
                    @pl.when(b >= DEPTH)
                    def _():
                        for gi in range(ns):
                            mkb(b - DEPTH, gi).wait()
                    for gi in range(ns):
                        mkb(b, gi).start()
                    return 0
                jax.lax.fori_loop(0, wblk, bbody, 0)

                def bdrain(b, _):
                    for gi in range(ns):
                        mkb(b, gi).wait()
                    return 0
                jax.lax.fori_loop(jnp.maximum(wblk - DEPTH, 0), wblk,
                                  bdrain, 0)
            else:
                def bone(b, _):
                    for gi in range(ns):
                        d = mkb(b, gi)
                        if action == "start":
                            d.start()
                        else:
                            d.wait()
                    return 0
                jax.lax.fori_loop(0, wblk, bone, 0)


def _emit_rows(tab_ref, trow, bufs, out_hbms, sems, sbase, *, ebits: int,
               action: str):
    """Start and/or wait the bit-decomposed emit DMAs for one chunk."""
    ns = len(bufs)
    pool = ns * DEPTH
    e0 = tab_ref[trow, 17]
    o0 = tab_ref[trow, 18]
    ecnt = tab_ref[trow, 19]
    for j in range(ebits, -1, -1):
        sz = 1 << j

        @pl.when((ecnt & sz) != 0)
        def _(j=j, sz=sz):
            pref = (ecnt >> (j + 1)) << (j + 1)
            for gi, (buf, hbm) in enumerate(zip(bufs, out_hbms)):
                dma = pltpu.make_async_copy(
                    buf.at[pl.ds(e0 + pref, sz), :],
                    hbm.at[pl.ds(o0 + pref, sz), :],
                    sems.at[sbase + (ns * j + gi) % pool])
                if action != "wait":
                    dma.start()
                if action != "start":
                    dma.wait()


def _merge_compute(xs, tab_ref, trow, *, bufrows: int, blk_rows: int,
                   ce: str, ncmp: int | None = None):
    """The in-VMEM merge: flip B regions descending, run the half-cleaner
    cascade (quarters -> halves -> full), roll right to the 128-alignment
    boundary. xs = [keys] + payload streams; the first ncmp-1 payloads
    (default 1) are comparison tiebreaks, further streams ride uncompared
    (ncmp=3 is the 64-bit (hi, lo, pos) single-chain merge)."""
    if ncmp is None:
        ncmp = min(2, len(xs))
    qrows = bufrows // 4
    row = jax.lax.broadcasted_iota(jnp.int32, (bufrows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bufrows, LANES), 1)
    inb = jnp.zeros((bufrows, LANES), jnp.bool_)
    for q in range(4):
        wb = tab_ref[trow, KWAY + 2 * q + 1]
        hi = (q + 1) * qrows
        lo = hi - wb * blk_rows
        inb = inb | ((row >= lo) & (row < hi))
    xs = [jnp.where(inb, _flip_blocks(x, bufrows, blk_rows), x) for x in xs]

    nbits = (bufrows * LANES).bit_length() - 1
    bias = jnp.full((bufrows, LANES), -2147483648, jnp.int32)
    key = xs[0].astype(jnp.int32) ^ bias
    vals = [x.astype(jnp.int32) ^ bias for x in xs[1:]]
    for level in range(3):
        size_bits = nbits - 2 + level
        if level < 2:
            desc = (row & (1 << (size_bits - 7))) != 0
        else:
            desc = jnp.zeros((bufrows, LANES), jnp.bool_)
        for j in range(size_bits - 1, -1, -1):
            dist = 1 << j
            if use_reshape_ce(ce, dist):
                key, vals = ce_stage_reshape(
                    key, vals if vals else None, dist // LANES,
                    size_bits - j - 1 if level < 2 else None, bufrows,
                    ncmp=ncmp)
                vals = [] if vals is None else vals
                continue
            if dist < LANES:
                is_lower = (lane & dist) == 0
                pk = jnp.where(is_lower, pltpu.roll(key, LANES - dist, 1),
                               pltpu.roll(key, dist, 1))
                pvs = [jnp.where(is_lower, pltpu.roll(v, LANES - dist, 1),
                                 pltpu.roll(v, dist, 1)) for v in vals]
            else:
                rd = dist // LANES
                is_lower = (row & rd) == 0
                pk = jnp.where(is_lower, pltpu.roll(key, bufrows - rd, 0),
                               pltpu.roll(key, rd, 0))
                pvs = [jnp.where(is_lower, pltpu.roll(v, bufrows - rd, 0),
                                 pltpu.roll(v, rd, 0)) for v in vals]
            want_small = is_lower ^ desc
            swap = ce_swap_mask(key, vals, pk, pvs, want_small, ncmp)
            key = jnp.where(swap, pk, key)
            vals = [jnp.where(swap, pv, v) for pv, v in zip(pvs, vals)]
    xs = [(key ^ bias).astype(jnp.uint32)] + \
        [(v ^ bias).astype(jnp.uint32) for v in vals]

    m = tab_ref[trow, 16]
    for j in range(6, -1, -1):
        sz = 1 << j
        bit = (m & sz) != 0
        xs = [jnp.where(bit, _shift_flat_right(x, sz), x) for x in xs]
    return xs


def _merge_kernel_multi(tab_ref, *refs, bufrows: int, blk_rows: int,
                        in_rows: int, ce: str, ns: int, nslots: int = 0,
                        out_rows: int | None = None,
                        ncmp: int | None = None):
    """Serial multi-stream kernel: ns = 1 + #payload streams (ns=1 is the
    keys-only sort). The FIRST payload acts as the comparison tiebreak, so
    when it is unique and ordered consistently with run order (e.g. the
    original row index, as in sort_with_ranks) the merge is a stable key
    sort; further payloads ride the exchanges uncompared. refs layout:
    in_hbms[ns] (or in_hbms[nslots*ns] when nslots > 0: slot-major lists
    of per-run buffers, the merge_pass_runs form), out_hbms[ns], bufs[ns],
    sems (pool of ns*DEPTH)."""
    if nslots:
        in_hbms = [refs[s * ns:(s + 1) * ns] for s in range(nslots)]
        in_hbms += [in_hbms[0]] * (KWAY - nslots)
        refs = refs[nslots * ns:]
    else:
        in_hbms = [refs[:ns]] * KWAY      # same refs for every slot
        refs = refs[ns:]
    out_hbms = refs[:ns]
    bufs = list(refs[ns:2 * ns])
    sems = refs[2 * ns]
    trow = pl.program_id(0) % 8
    qrows = bufrows // 4
    max_ablk = min(qrows, in_rows) // blk_rows
    abits = max_ablk.bit_length() - 1 if max_ablk else 0
    ebits = min(bufrows, out_rows or in_rows).bit_length() - 1

    for buf in bufs:
        buf[...] = jnp.full((bufrows, LANES), 0xFFFFFFFF, jnp.uint32)
    _load_windows(tab_ref, trow, in_hbms, bufs, sems, 0, qrows=qrows,
                  blk_rows=blk_rows, abits=abits, action="both")
    xs = _merge_compute([buf[...] for buf in bufs], tab_ref, trow,
                        bufrows=bufrows, blk_rows=blk_rows, ce=ce,
                        ncmp=ncmp)
    for buf, x in zip(bufs, xs):
        buf[...] = x
    _emit_rows(tab_ref, trow, bufs, out_hbms, sems, 0, ebits=ebits,
               action="both")


def _merge_kernel_multi_pipe(tabc_ref, tabn_ref, *refs, bufrows: int,
                             blk_rows: int, in_rows: int, ce: str, ns: int,
                             emit_overlap: bool = False, nslots: int = 0,
                             out_rows: int | None = None,
                             ncmp: int | None = None):
    """Pipelined variant: chunk i+1's window DMAs land in a STAGING buffer
    set while chunk i's merge cascade runs on the COMPUTE set, hiding the
    window-load transfer time (~10-20% of the serial pass) behind compute.

    Per grid step i: wait chunk i's loads (started at step i-1, or started
    inline at i=0), vector-copy staging -> compute, refill staging with
    +inf pads, start chunk i+1's loads (from tabn = the look-ahead table
    block; the prepass pads 8 zero rows past the grid so this is always in
    bounds and the final step starts zero DMAs), then merge + emit from
    the compute set. Loads use sems[0:pool], emits sems[pool:2*pool], so
    in-flight next-chunk loads never share a semaphore with emit waits.

    emit_overlap additionally defers the emit waits one chunk: results are
    copied to a third buffer set and their DMAs fly while chunk i+1's
    cascade runs (chunk i-1's emit pool is drained before the buffers are
    reused; the final grid step drains its own). refs layout gains a
    leading tabp_ref (chunk i-1's table row, for re-deriving the deferred
    wait descriptors) and an eb[ns] buffer set after stage.

    refs layout: [tabp_ref if emit_overlap], in_hbms[ns], out_hbms[ns],
    comp[ns], stage[ns], [eb[ns] if emit_overlap],
    sems (pool of 2*ns*DEPTH)."""
    if emit_overlap:
        tabp_ref, refs = refs[0], refs[1:]
    if nslots:
        in_hbms = [refs[s * ns:(s + 1) * ns] for s in range(nslots)]
        in_hbms += [in_hbms[0]] * (KWAY - nslots)
        refs = refs[nslots * ns:]
    else:
        in_hbms = [refs[:ns]] * KWAY      # same refs for every slot
        refs = refs[ns:]
    out_hbms = refs[:ns]
    comp = list(refs[ns:2 * ns])
    stage = list(refs[2 * ns:3 * ns])
    if emit_overlap:
        eb = list(refs[3 * ns:4 * ns])
        sems = refs[4 * ns]
    else:
        sems = refs[3 * ns]
    i = pl.program_id(0)
    trow = i % 8
    ntrow = (i + 1) % 8
    qrows = bufrows // 4
    max_ablk = min(qrows, in_rows) // blk_rows
    abits = max_ablk.bit_length() - 1 if max_ablk else 0
    ebits = min(bufrows, out_rows or in_rows).bit_length() - 1
    pool = ns * DEPTH

    @pl.when(i == 0)
    def _():
        for buf in stage:
            buf[...] = jnp.full((bufrows, LANES), 0xFFFFFFFF, jnp.uint32)
        _load_windows(tabc_ref, trow, in_hbms, stage, sems, 0, qrows=qrows,
                      blk_rows=blk_rows, abits=abits, action="start")

    _load_windows(tabc_ref, trow, in_hbms, stage, sems, 0, qrows=qrows,
                  blk_rows=blk_rows, abits=abits, action="wait")
    for cb, sb in zip(comp, stage):
        cb[...] = sb[...]
    for buf in stage:
        buf[...] = jnp.full((bufrows, LANES), 0xFFFFFFFF, jnp.uint32)
    _load_windows(tabn_ref, ntrow, in_hbms, stage, sems, 0, qrows=qrows,
                  blk_rows=blk_rows, abits=abits, action="start")

    xs = _merge_compute([cb[...] for cb in comp], tabc_ref, trow,
                        bufrows=bufrows, blk_rows=blk_rows, ce=ce,
                        ncmp=ncmp)
    for cb, x in zip(comp, xs):
        cb[...] = x
    if not emit_overlap:
        _emit_rows(tabc_ref, trow, comp, out_hbms, sems, pool, ebits=ebits,
                   action="both")
    else:
        ptrow = (i + 7) % 8          # chunk i-1's table row

        @pl.when(i > 0)
        def _():
            _emit_rows(tabp_ref, ptrow, eb, out_hbms, sems, pool,
                       ebits=ebits, action="wait")
        for e, cb in zip(eb, comp):
            e[...] = cb[...]
        _emit_rows(tabc_ref, trow, eb, out_hbms, sems, pool, ebits=ebits,
                   action="start")

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            _emit_rows(tabc_ref, trow, eb, out_hbms, sems, pool,
                       ebits=ebits, action="wait")


@functools.partial(jax.jit,
                   static_argnames=("run_len", "buf_elems", "blk",
                                    "interpret", "ce", "pipeline", "ncmp"))
def merge_pass_multi(keys: jax.Array, vals, tables: jax.Array,
                     run_len: int, buf_elems: int, blk: int = DEF_BLK,
                     interpret: bool | None = None, ce: str = "roll",
                     pipeline: bool = True, ncmp: int | None = None):
    """One KWAY merge pass with any number of payload streams.

    vals: tuple/list of (n,) uint32 arrays. The FIRST is the comparison
    tiebreak (see _merge_kernel_multi); the rest ride uncompared. Returns
    (sorted_keys, [payloads...]).

    pipeline=True double-buffers the window loads (next chunk's DMAs land
    behind the current chunk's merge cascade) at the cost of ns extra VMEM
    buffers; pipeline="full" additionally defers the emit waits one chunk
    (triple buffer: loads AND stores overlap compute); pipeline=False is
    the serial single-buffer kernel.

    Contract (multi-payload): the pass orders rows by (key, val0) but
    assigns equal keys to output chunks by their input position, so with
    >= 2 payload streams val0 must order equal keys consistently with
    position (e.g. positions themselves, or join's tag|position packing).
    With exactly one payload no condition is needed — rows tied on both
    streams are identical and interchangeable.
    """
    if interpret is None:
        interpret = _interpret_default()
    vals = list(vals)
    ns = 1 + len(vals)
    n = keys.shape[0]
    bufrows = buf_elems // LANES
    tab_spec = pl.BlockSpec((8, NCOLS), lambda i: (i // 8, 0),
                            memory_space=pltpu.SMEM)
    if pipeline:
        full = pipeline == "full"
        kern = functools.partial(_merge_kernel_multi_pipe, bufrows=bufrows,
                                 blk_rows=blk // LANES, in_rows=n // LANES,
                                 ce=ce, ns=ns, emit_overlap=full, ncmp=ncmp)
        tabn_spec = pl.BlockSpec((8, NCOLS), lambda i: ((i + 1) // 8, 0),
                                 memory_space=pltpu.SMEM)
        tab_specs, tabs = [tab_spec, tabn_spec], (tables, tables)
        nbuf, sem_pool = 2 * ns, 2 * ns * DEPTH
        if full:
            tabp_spec = pl.BlockSpec(
                (8, NCOLS), lambda i: ((jnp.maximum(i, 1) - 1) // 8, 0),
                memory_space=pltpu.SMEM)
            tab_specs.append(tabp_spec)
            tabs = tabs + (tables,)
            nbuf = 3 * ns
    else:
        kern = functools.partial(_merge_kernel_multi, bufrows=bufrows,
                                 blk_rows=blk // LANES, in_rows=n // LANES,
                                 ce=ce, ns=ns, ncmp=ncmp)
        tab_specs, tabs = [tab_spec], (tables,)
        nbuf, sem_pool = ns, ns * DEPTH
    shape = jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32)
    outs = pl.pallas_call(
        kern,
        grid=(tables.shape[0] - 8,),
        in_specs=tab_specs + [pl.BlockSpec(memory_space=pl.ANY)] * ns,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * ns,
        out_shape=[shape] * ns,
        scratch_shapes=(
            [pltpu.VMEM((bufrows, LANES), jnp.uint32)] * nbuf
            + [pltpu.SemaphoreType.DMA((sem_pool,))]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*tabs, keys.reshape(n // LANES, LANES),
      *[v.reshape(n // LANES, LANES) for v in vals])
    return outs[0].reshape(n), [o.reshape(n) for o in outs[1:]]


# ---------------------------------------------------------------------------
# Chip-scale chunked pass: runs in separate HBM buffers, exact-rank chunks
# ---------------------------------------------------------------------------

def merge_tables_exact_runs(run_keys, chunk_elems: int, blk: int = DEF_BLK,
                            fanout: int | None = None,
                            rounds: int | None = None):
    """EXACT-rank merge tables for S separately-buffered sorted runs.

    Unlike merge_pass_tables (whose chunk boundaries float at sample
    positions, so chunk sizes are data-dependent), every chunk here is
    EXACTLY chunk_elems rows: boundary t sits at global sorted rank
    t*chunk_elems, found by in-graph k-way selection (value search + tie
    fill in run order). Static chunk sizes
    are what let the chip-scale sort (ops/bigsort.py) split its final
    pass into independently-allocated output ranges and trim consumed
    run prefixes between them — the memory plan that fits a 2^30-row kv
    sort on one 16 GB chip.

    fanout=None (default) is a 32-round value bisection. An integer
    fanout >= 3 probes fanout-1 evenly spaced candidates per boundary
    per round instead (the distributed splitter search's interval
    shrink, parallel/dist_sort.py:_splitter_keys), collapsing 2^32 in
    ~log_{fanout-1}(2^32) rounds. MEASURED on-chip at the production
    2^30 geometry (S=8 x 2^27, 2047 boundaries,
    reports/probe_fanout_r5.log, r5): bisection 323 ms vs fanout=16
    1304 ms vs fanout=256 14086 ms — the narrow bisection gathers are
    dispatch-latency-bound (~46 us/step) while wide probe rounds pay
    XLA's full ~15 ns/elem gather cost, so MORE probes per round lose
    on one chip. (On a real multi-host mesh the tradeoff flips: rounds
    are blocking collectives, which is why dist_sort fans out 256-wide.)
    The r4 ROADMAP's attribution of 6.5 s to this selection was wrong —
    see the probe log. rounds overrides the derived exact-collapse
    round count (tests).

    Tie order: boundary ranks count elements by (key, run, in-run pos),
    which matches the merge kernel's (key, val0) order exactly when val0
    is the original global position and runs are position-ordered
    segments of the input (the bigsort contract).

    run_keys: list of S (L,) u32 sorted arrays, S <= KWAY, equal L,
    L % blk == 0. chunk_elems: power of two, multiple of max(blk, 128).

    Returns (tab, max_pair_blocks): tab is ((nch + 8), NCOLS) i32 in the
    merge-kernel layout, except col s is the src row WITHIN run s's own
    buffer (static slot s <-> run s pairing) and out_row0 (col 18) is
    ABSOLUTE (merge_pass_runs re-bases it per chunk range).
    max_pair_blocks (traced i32) is the largest quarter load
    wblk[2q]+wblk[2q+1] over all chunks — callers check it against the
    kernel quarter capacity buf_elems/4/blk and take a fallback for the
    (skewed) chunks that would overflow.
    """
    S = len(run_keys)
    L = run_keys[0].shape[0]
    C = chunk_elems
    n = S * L
    nch = n // C
    blk_rows = blk // LANES

    # --- exact boundary ranks by k-way selection -------------------------
    # find, per boundary, the smallest v with count(key <= v) >= rank+1
    g = jnp.arange(1, nch, dtype=jnp.uint32) * jnp.uint32(C)   # (nch-1,)
    if fanout is None:
        def body(_, state):
            vlo, vhi = state
            live = vlo < vhi
            mid = vlo + ((vhi - vlo) >> 1)
            cnt = jnp.zeros_like(g)
            for kr in run_keys:
                cnt = cnt + jnp.searchsorted(kr, mid,
                                             side="right").astype(jnp.uint32)
            pred = cnt >= g + 1
            vhi = jnp.where(live & pred, mid, vhi)
            vlo = jnp.where(live & ~pred, mid + 1, vlo)
            return vlo, vhi

        nrounds = 32
    else:
        F = fanout
        if F < 3:
            raise ValueError(f"fanout={F} must be >= 3")
        if rounds is None:
            # width recurrence: w' <= w // (F-1) + (F-3); any w <= F-1
            # collapses to 0 in one round (consecutive unit-step probes)
            w, rounds = 1 << 32, 0
            while w > 0:
                w = w // (F - 1) + (F - 3) if w > F - 1 else 0
                rounds += 1
        nrounds = rounds
        jj = jnp.arange(F - 1, dtype=jnp.uint32)[None, :]

        def body(_, lohi):
            vlo, vhi = lohi
            w = vhi - vlo
            step = jnp.maximum(w // jnp.uint32(F - 1), jnp.uint32(1))
            # step*(F-2) <= (w//(F-1))*(F-2) < 2^32: no uint32 overflow
            offs = jnp.minimum(step[:, None] * jj, w[:, None])  # (nb, F-1)
            probes = vlo[:, None] + offs
            cnt = jnp.zeros((probes.size,), jnp.uint32)
            for kr in run_keys:
                cnt = cnt + jnp.searchsorted(
                    kr, probes.reshape(-1), side="right").astype(jnp.uint32)
            geq = cnt.reshape(probes.shape) >= (g + 1)[:, None]  # monotone
            any_ = jnp.any(geq, axis=1)
            first = jnp.argmax(geq, axis=1)                     # 0 if none
            pf = jnp.take_along_axis(probes, first[:, None], 1)[:, 0]
            pprev = jnp.take_along_axis(
                probes, jnp.maximum(first - 1, 0)[:, None], 1)[:, 0]
            new_hi = jnp.where(any_, pf, vhi)
            # ~any_ implies probes[:,-1] < vhi (count(<=vhi) >= g+1 is
            # the loop invariant), so the +1 below cannot wrap
            new_lo = jnp.where(any_, jnp.where(first > 0, pprev + 1, vlo),
                               probes[:, -1] + 1)
            return new_lo, new_hi

    vstar, _ = jax.lax.fori_loop(
        0, nrounds, body, (jnp.zeros_like(g),
                           jnp.full_like(g, 0xFFFFFFFF)))  # key of rank-g elem
    lo = jnp.stack([jnp.searchsorted(kr, vstar, side="left")
                    for kr in run_keys], axis=1).astype(jnp.int32)
    hi = jnp.stack([jnp.searchsorted(kr, vstar, side="right")
                    for kr in run_keys], axis=1).astype(jnp.int32)
    eq = hi - lo
    need = g.astype(jnp.int32) - jnp.sum(lo, axis=1)       # elems == vstar
    cum = jnp.cumsum(eq, axis=1) - eq                      # fill run-by-run
    take = jnp.clip(need[:, None] - cum, 0, eq)
    rank_mid = lo + take                                   # (nch-1, S)

    rank = jnp.concatenate([
        jnp.zeros((1, S), jnp.int32), rank_mid,
        jnp.full((1, S), L, jnp.int32)], axis=0)           # (nch+1, S)

    # --- block-aligned windows + exact in-buffer offsets -----------------
    wstart = rank[:nch] // blk
    wend = jnp.maximum((rank[1:] + blk - 1) // blk, wstart)
    wblk = wend - wstart                                   # (nch, S)
    pre = jnp.sum(rank[:nch] - wstart * blk, axis=1)       # exact
    if S < KWAY:
        z = jnp.zeros((nch, KWAY - S), jnp.int32)
        wstart = jnp.concatenate([wstart, z], axis=1)
        wblk = jnp.concatenate([wblk, z], axis=1)
    max_pair = jnp.max(wblk[:, 0::2] + wblk[:, 1::2])

    m = (-pre) % LANES
    tab = jnp.zeros((-(-nch // 8) * 8 + 8, NCOLS), jnp.int32)
    tab = tab.at[:nch, 0:KWAY].set(wstart * blk_rows)
    tab = tab.at[:nch, KWAY:2 * KWAY].set(wblk)
    tab = tab.at[:nch, 16].set(m)
    tab = tab.at[:nch, 17].set((pre + m) // LANES)
    tab = tab.at[:nch, 18].set(jnp.arange(nch, dtype=jnp.int32)
                               * (C // LANES))
    tab = tab.at[:nch, 19].set(C // LANES)
    return tab, max_pair


@functools.partial(jax.jit,
                   static_argnames=("chunk0", "nchunks",
                                    "chunk_elems", "buf_elems", "blk",
                                    "interpret", "ce", "pipeline", "ncmp"))
def merge_pass_runs(run_streams, tables: jax.Array, *,
                    chunk0: int, nchunks: int, chunk_elems: int,
                    buf_elems: int, blk: int = DEF_BLK,
                    interpret: bool | None = None, ce: str = "roll",
                    pipeline: bool = True, ncmp: int | None = None):
    """One chunk RANGE of a merge pass whose S input runs live in separate
    HBM buffers (slot s reads run s's own buffer — statically routed DMAs).

    run_streams: list over ns streams of lists over S runs of (L_s,) u32
    arrays; run lengths may DIFFER (trimmed prefixes), but every stream of
    run s has the same length. tables: from merge_tables_exact_runs, src
    rows already adjusted for any trim. Produces chunks
    [chunk0, chunk0+nchunks) as ns arrays of (nchunks * chunk_elems,) — a
    16 GB-scale pass emits its output as independently-allocated ranges
    while earlier ranges' consumed input prefixes are trimmed away
    (ops/bigsort.py).

    Capacity contract: the caller has checked max_pair_blocks <=
    buf_elems // 4 // blk for every chunk in the range (overflow chunks
    take the gather fallback in bigsort).
    """
    if interpret is None:
        interpret = _interpret_default()
    ns = len(run_streams)
    S = len(run_streams[0])
    L = min(int(r.shape[0]) for r in run_streams[0])
    C = chunk_elems
    bufrows = buf_elems // LANES
    # range slice + re-base out_row0; zero look-ahead rows so the pipelined
    # kernel's final prefetch starts no DMAs
    npad = -(-nchunks // 8) * 8
    tsl = jax.lax.slice(tables, (chunk0, 0), (chunk0 + nchunks, NCOLS))
    tsl = tsl.at[:, 18].add(-(chunk0 * (C // LANES)))
    tab = jnp.zeros((npad + 8, NCOLS), jnp.int32).at[:nchunks].set(tsl)

    tab_spec = pl.BlockSpec((8, NCOLS), lambda i: (i // 8, 0),
                            memory_space=pltpu.SMEM)
    kw = dict(bufrows=bufrows, blk_rows=blk // LANES, in_rows=L // LANES,
              ce=ce, ns=ns, nslots=S, out_rows=nchunks * C // LANES,
              ncmp=ncmp)
    if pipeline:
        full = pipeline == "full"
        kern = functools.partial(_merge_kernel_multi_pipe,
                                 emit_overlap=full, **kw)
        tabn_spec = pl.BlockSpec((8, NCOLS), lambda i: ((i + 1) // 8, 0),
                                 memory_space=pltpu.SMEM)
        tab_specs, tabs = [tab_spec, tabn_spec], (tab, tab)
        nbuf, sem_pool = 2 * ns, 2 * ns * DEPTH
        if full:
            tabp_spec = pl.BlockSpec(
                (8, NCOLS), lambda i: ((jnp.maximum(i, 1) - 1) // 8, 0),
                memory_space=pltpu.SMEM)
            tab_specs.append(tabp_spec)
            tabs = tabs + (tab,)
            nbuf = 3 * ns
    else:
        kern = functools.partial(_merge_kernel_multi, **kw)
        tab_specs, tabs = [tab_spec], (tab,)
        nbuf, sem_pool = ns, ns * DEPTH
    ins = []
    for s in range(S):                    # slot-major, stream-minor
        for gi in range(ns):
            r = run_streams[gi][s]
            ins.append(r.reshape(r.shape[0] // LANES, LANES))
    shape = jax.ShapeDtypeStruct((nchunks * C // LANES, LANES), jnp.uint32)
    outs = pl.pallas_call(
        kern,
        grid=(npad,),
        in_specs=tab_specs + [pl.BlockSpec(memory_space=pl.ANY)] * (S * ns),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * ns,
        out_shape=[shape] * ns,
        scratch_shapes=(
            [pltpu.VMEM((bufrows, LANES), jnp.uint32)] * nbuf
            + [pltpu.SemaphoreType.DMA((sem_pool,))]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*tabs, *ins)
    return [o.reshape(nchunks * C) for o in outs]


def merge_pass_kv(keys: jax.Array, vals: jax.Array, tables: jax.Array,
                  run_len: int, buf_elems: int, blk: int = DEF_BLK,
                  interpret: bool | None = None, ce: str = "roll",
                  pipeline: bool = True):
    """One KWAY merge pass carrying a payload stream (merge_pass_multi
    with a single payload).

    Stability contract: within equal keys the merge orders by the PAYLOAD,
    so this is a stable key sort exactly when vals are unique and
    consistent with run order (e.g. original row indices)."""
    ok, ovs = merge_pass_multi(keys, [vals], tables, run_len=run_len,
                               buf_elems=buf_elems, blk=blk,
                               interpret=interpret, ce=ce,
                               pipeline=pipeline)
    return ok, ovs[0]


def merge_pass(keys: jax.Array, tables: jax.Array, run_len: int,
               buf_elems: int, blk: int = DEF_BLK,
               interpret: bool | None = None, ce: str = "roll",
               pipeline: bool = True) -> jax.Array:
    """Execute one KWAY keys-only merge pass given prepass tables
    (merge_pass_multi with no payload streams).

    keys: (n,) uint32, sorted in runs of run_len (n % run_len == 0).
    Returns keys re-ordered into sorted runs of KWAY*run_len.
    """
    out, _ = merge_pass_multi(keys, [], tables, run_len=run_len,
                              buf_elems=buf_elems, blk=blk,
                              interpret=interpret, ce=ce,
                              pipeline=pipeline)
    return out

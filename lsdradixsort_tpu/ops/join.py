"""Hash join (north star config 4: build 10M / probe 100M uint32 keys).

TPU-native design: a *sort-merge* join expressed entirely in sorts, scans
and compactions — the operators this framework is fast at — instead of a
pointer-chasing hash table (TPU has no efficient random access):

  1. concatenate build and probe rows, tagged 0/1 (build first);
  2. one stable sort by (key, tag): every probe row lands directly after
     the build row with the same key, if any;
  3. a segmented "broadcast first row of each key-run" scan propagates the
     build value (and a hit flag) to all probe rows of that key;
  4. one final sort keyed by (matched ? probe position : sentinel)
     compacts the hits to the front in probe order, matching the golden
     model bit-exactly.

`hash_join` requires unique build keys (primary-key join), as in the
golden oracle; output arrays are full probe length, first `count` rows
valid. `hash_join_multi` lifts the restriction to many-to-many (duplicate
build keys) with a caller-supplied static output bound.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lsdradixsort_tpu.kernels.fill_forward import fill_forward_last


@functools.partial(jax.jit, static_argnames=("engine", "tile_log2"))
def hash_join(build_keys: jax.Array, build_vals: jax.Array,
              probe_keys: jax.Array, probe_vals: jax.Array,
              engine: str = "xla", tile_log2: int = 15):
    """Inner equi-join. Returns (count, probe_keys, probe_vals, build_vals)
    in probe order; rows past `count` are unspecified.

    engine="merge" runs the main (key, tag|pos) sort through the framework
    merge sort (ops/sort.merge_sort_multi — packed positions are a unique
    tiebreak, so the result is bit-identical); "xla" uses jax.lax.sort;
    "vmem" uses the lane-bucketed VMEM hash table for SMALL build sides
    (kernels/hash_table.py: probe cost grows with build size, so it only
    wins below a few thousand build keys) and falls back to the sort-merge
    path via lax.cond if any hash chain overflows — the result is
    bit-identical either way."""
    nb, np_ = build_keys.shape[0], probe_keys.shape[0]
    if engine == "vmem":
        from lsdradixsort_tpu.kernels.hash_table import (build_table,
                                                         plan_rows,
                                                         probe_table)
        from lsdradixsort_tpu.ops.filter import compact
        tk, tv, cnt, ok = build_table(build_keys, build_vals,
                                      plan_rows(nb))

        def _fast(_):
            m, bvo = probe_table(tk, tv, cnt, probe_keys)
            return compact(m == 1, probe_keys, probe_vals, bvo)

        def _slow(_):
            return hash_join(build_keys, build_vals, probe_keys,
                             probe_vals, engine="xla",
                             tile_log2=tile_log2)

        return jax.lax.cond(ok, _fast, _slow, operand=None)
    keys = jnp.concatenate([build_keys, probe_keys])
    # pack (tag, probe position) into one u32: bit 31 = tag (build 0,
    # probe 1), low bits = row position — build/probe ordering per key
    # comes free from the numeric order. A row is EITHER build or probe,
    # so build value and probe value share one stream too: the main sort
    # carries 3 streams instead of 5.
    packed = jnp.concatenate([
        jnp.arange(nb, dtype=jnp.uint32),
        jnp.arange(np_, dtype=jnp.uint32) | jnp.uint32(0x80000000)])
    val = jnp.concatenate([build_vals, probe_vals])

    if engine == "merge":
        from lsdradixsort_tpu.ops.sort import merge_sort_multi
        sk, (spacked, sval) = merge_sort_multi(keys, [packed, val],
                                               tile_log2=tile_log2)
    else:
        sk, spacked, sval = jax.lax.sort((keys, packed, val), num_keys=2,
                                         is_stable=False)
    is_build = spacked < jnp.uint32(0x80000000)

    # Broadcast each build row's value to the probe rows of its key via the
    # Pallas fill-forward kernel (kernels/fill_forward.py): the last build
    # row at-or-before i is mine iff its key equals mine (build keys are
    # unique, and build rows sort before probes of the same key). The XLA
    # spellings are unusable: associative_scan compiles pathologically at
    # >=2^24 rows, cummax+gather costs ~15 ns/row vs ~0.4 ns here.
    bk_fill, seg_bval, has_build = fill_forward_last(is_build, sk, sval)
    seg_hit = (has_build == 1) & (bk_fill == sk)

    matched = ~is_build & seg_hit
    count = jnp.sum(matched.astype(jnp.uint32))
    # compact matches to the front in probe order with ONE sort: matched
    # rows keyed by their (unique) probe position, everything else keyed
    # past the probe range
    order_key = jnp.where(matched, spacked & jnp.uint32(0x7FFFFFFF),
                          jnp.uint32(0xFFFFFFFF))
    _, ok, opv, obv = jax.lax.sort((order_key, sk, sval, seg_bval),
                                   num_keys=1, is_stable=False)
    # outputs are probe-length: matches (<= np_) sorted to the front
    return count, ok[:np_], opv[:np_], obv[:np_]


@functools.partial(jax.jit, static_argnames=("engine", "tile_log2"))
def probe_lookup(build_keys: jax.Array, build_vals: jax.Array,
                 probe_keys: jax.Array, engine: str = "xla",
                 tile_log2: int = 15):
    """Per-row dictionary lookup: for every probe row, (match u32 0/1,
    build_val) in PROBE INPUT ORDER (build_val 0 where unmatched).
    Unique build keys. The relational building block behind the join
    family: LEFT OUTER JOIN = attach these columns to the probe table;
    semi-join = filter on match (ops/filter.filter_in_set); anti-join =
    filter on ~match (filter_not_in_set).

    Same engines as hash_join: "xla" / "merge" sort-merge spellings, or
    "vmem" (small build sides; the VMEM table already answers in probe
    order, so this op is its natural API)."""
    nb, np_ = build_keys.shape[0], probe_keys.shape[0]
    if engine == "vmem":
        from lsdradixsort_tpu.kernels.hash_table import (build_table,
                                                         plan_rows,
                                                         probe_table)
        tk, tv, cnt, okflag = build_table(build_keys, build_vals,
                                          plan_rows(nb))

        def _fast(_):
            return probe_table(tk, tv, cnt, probe_keys)

        def _slow(_):
            return probe_lookup(build_keys, build_vals, probe_keys,
                                engine="xla", tile_log2=tile_log2)

        return jax.lax.cond(okflag, _fast, _slow, operand=None)

    keys = jnp.concatenate([build_keys, probe_keys])
    packed = jnp.concatenate([
        jnp.arange(nb, dtype=jnp.uint32),
        jnp.arange(np_, dtype=jnp.uint32) | jnp.uint32(0x80000000)])
    val = jnp.concatenate([build_vals, jnp.zeros((np_,), jnp.uint32)])
    if engine == "merge":
        from lsdradixsort_tpu.ops.sort import merge_sort_multi
        sk, (spacked, sval) = merge_sort_multi(keys, [packed, val],
                                               tile_log2=tile_log2)
    else:
        sk, spacked, sval = jax.lax.sort((keys, packed, val), num_keys=2,
                                         is_stable=False)
    is_build = spacked < jnp.uint32(0x80000000)
    bk_fill, seg_bval, has_build = fill_forward_last(is_build, sk, sval)
    matched = ~is_build & (has_build == 1) & (bk_fill == sk)
    # restore probe input order: every probe row keyed by its position,
    # build rows sentinel-keyed past them
    order_key = jnp.where(is_build, jnp.uint32(0xFFFFFFFF),
                          spacked & jnp.uint32(0x7FFFFFFF))
    _, m, bv = jax.lax.sort(
        (order_key, matched.astype(jnp.uint32),
         jnp.where(matched, seg_bval, jnp.uint32(0))),
        num_keys=1, is_stable=False)
    return m[:np_], bv[:np_]


@jax.jit
def probe_lookup64(build_hi: jax.Array, build_lo: jax.Array,
                   build_vals: jax.Array, probe_hi: jax.Array,
                   probe_lo: jax.Array):
    """probe_lookup for 64-bit keys given as (hi, lo) u32 planes (the
    columnar 64-bit representation, core/keycodec.py §64-bit): per probe
    row, (match u32 0/1, build_val) in probe input order. Unique build
    keys. Join equality is bit-equality, so i64/f64 callers pass their
    bit planes directly — no codec needed.

    Same sort-merge design as probe_lookup with a 3-key sort
    ((hi, lo, tag|pos)) and one fill-forward sweep per key plane; the
    segment hit test compares BOTH planes."""
    nb, np_ = build_hi.shape[0], probe_hi.shape[0]
    hi = jnp.concatenate([build_hi, probe_hi])
    lo = jnp.concatenate([build_lo, probe_lo])
    packed = jnp.concatenate([
        jnp.arange(nb, dtype=jnp.uint32),
        jnp.arange(np_, dtype=jnp.uint32) | jnp.uint32(0x80000000)])
    val = jnp.concatenate([build_vals, jnp.zeros((np_,), jnp.uint32)])
    shi, slo, spacked, sval = jax.lax.sort((hi, lo, packed, val),
                                           num_keys=3, is_stable=False)
    is_build = spacked < jnp.uint32(0x80000000)
    hi_fill, seg_bval, has_build = fill_forward_last(is_build, shi, sval)
    lo_fill, _, _ = fill_forward_last(is_build, slo, sval)
    matched = (~is_build & (has_build == 1)
               & (hi_fill == shi) & (lo_fill == slo))
    order_key = jnp.where(is_build, jnp.uint32(0xFFFFFFFF),
                          spacked & jnp.uint32(0x7FFFFFFF))
    _, m, bv = jax.lax.sort(
        (order_key, matched.astype(jnp.uint32),
         jnp.where(matched, seg_bval, jnp.uint32(0))),
        num_keys=1, is_stable=False)
    return m[:np_], bv[:np_]


@jax.jit
def hash_join64(build_hi: jax.Array, build_lo: jax.Array,
                build_vals: jax.Array, probe_hi: jax.Array,
                probe_lo: jax.Array, probe_vals: jax.Array):
    """Inner equi-join on 64-bit keys as (hi, lo) u32 planes (unique
    build keys). Returns (count, probe_hi, probe_lo, probe_vals,
    build_vals) in probe order; rows past `count` unspecified."""
    from lsdradixsort_tpu.ops.filter import compact
    m, bv = probe_lookup64(build_hi, build_lo, build_vals,
                           probe_hi, probe_lo)
    return compact(m == 1, probe_hi, probe_lo, probe_vals, bv)


@functools.partial(jax.jit,
                   static_argnames=("max_out", "engine", "tile_log2",
                                    "return_build_idx"))
def hash_join_multi(build_keys: jax.Array, build_vals: jax.Array,
                    probe_keys: jax.Array, probe_vals,
                    max_out: int, engine: str = "xla",
                    tile_log2: int = 15,
                    probe_valid: jax.Array | None = None,
                    return_build_idx: bool = False):
    """Inner equi-join with DUPLICATE build keys allowed (many-to-many).

    Lifts hash_join's primary-key restriction: every probe row matches ALL
    build rows sharing its key. Probe-major output — for each probe row in
    input order, one output row per matching build row, matching build rows
    in stable build order. Returns (count, probe_keys, probe_vals,
    build_vals); the arrays are `max_out` long, rows past min(count,
    max_out) are unspecified, and if count > max_out the arrays hold the
    correct first max_out rows (count is the untruncated total, so callers
    can detect overflow and re-run with a larger bound — the TPU-native
    spelling of a data-dependent output size under static shapes).

    probe_vals may be a tuple of uint32 streams (all returned, same
    positions); probe_valid masks probe rows out entirely (used by the
    distributed fragment join for padded exchanges); return_build_idx
    appends the index into the stable-sorted build side for each output
    row — callers can gather any extra build column, or derive a global
    build rank.

    Same sort-based design as hash_join, plus run geometry: the sorted
    build side is described per run by (start, length); probes pick their
    run up via the fill-forward broadcast, and a rank-decode expansion
    (exclusive scan of per-probe lengths + searchsorted) materializes the
    cross-product rows without any scatter.
    """
    single = not isinstance(probe_vals, (tuple, list))
    pvals = (probe_vals,) if single else tuple(probe_vals)
    nb, np_ = build_keys.shape[0], probe_keys.shape[0]

    # sorted build side, stable (original position tiebreak)
    sbk, _, sbv = jax.lax.sort(
        (build_keys, jnp.arange(nb, dtype=jnp.uint32), build_vals),
        num_keys=2, is_stable=False)
    bpos = jnp.arange(nb, dtype=jnp.uint32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sbk[1:] != sbk[:-1]])
    # run start index per build row: last flagged (run-head) row at-or-
    # before me — one fill-forward sweep
    _, run_start, _ = fill_forward_last(is_start, sbk, bpos)
    # run length, valid AT THE LAST ROW of each run (the only row whose
    # value the probe-side fill-forward ever delivers)
    run_len = bpos - run_start + jnp.uint32(1)

    # combined (key, tag|pos) sort — build rows first per key. Build and
    # probe rows are disjoint, so the first two value streams are dual-use:
    # stream1 = run_start (build) / probe_val[0] (probe), stream2 = run_len
    # (build) / validity (probe). Extra probe streams ride with zeros on
    # build rows.
    zeros_b = jnp.zeros((nb,), jnp.uint32)
    valid = (jnp.ones((np_,), jnp.uint32) if probe_valid is None
             else probe_valid.astype(jnp.uint32))
    keys = jnp.concatenate([sbk, probe_keys])
    packed = jnp.concatenate([
        bpos, jnp.arange(np_, dtype=jnp.uint32) | jnp.uint32(0x80000000)])
    stream1 = jnp.concatenate([run_start, pvals[0]])
    stream2 = jnp.concatenate([run_len, valid])
    extras = [jnp.concatenate([zeros_b, pv]) for pv in pvals[1:]]
    if engine == "merge":
        from lsdradixsort_tpu.ops.sort import merge_sort_multi
        sk, (spacked, s1, s2, *sex) = merge_sort_multi(
            keys, [packed, stream1, stream2] + extras, tile_log2=tile_log2)
    else:
        sk, spacked, s1, s2, *sex = jax.lax.sort(
            (keys, packed, stream1, stream2, *extras), num_keys=2,
            is_stable=False)
    is_build = spacked < jnp.uint32(0x80000000)

    # each probe row learns its key's build-run (start, len); the last
    # build row at-or-before it is its run's LAST row, where run_len is
    # exact. Two fill-forward sweeps (one per carried scalar).
    bk_fill, f_start, has_build = fill_forward_last(is_build, sk, s1)
    _, f_len, _ = fill_forward_last(is_build, sk, s2)
    matched = ~is_build & (has_build == 1) & (bk_fill == sk)
    if probe_valid is not None:
        matched = matched & (s2 == 1)     # s2 carries validity on probes
    lens = jnp.where(matched, f_len, jnp.uint32(0))

    # compact hit probes to the front in probe order; misses (and build
    # rows) carry len 0 and sort past them
    order_key = jnp.where(matched, spacked & jnp.uint32(0x7FFFFFFF),
                          jnp.uint32(0xFFFFFFFF))
    _, cpk, cpv, cstart, clen, *cex = jax.lax.sort(
        (order_key, sk, s1, f_start, lens, *sex), num_keys=1,
        is_stable=False)
    count = jnp.sum(clen, dtype=jnp.uint32)

    # rank-decode expansion: output row j belongs to the hit probe r with
    # offs[r] <= j < offs[r]+clen[r]; offsets are strictly increasing over
    # hits (len >= 1) and flat (= count) after them, so r is a searchsorted
    offs = jnp.cumsum(clen, dtype=jnp.uint32) - clen
    j = jnp.arange(max_out, dtype=jnp.uint32)
    r = jnp.searchsorted(offs, j, side="right").astype(jnp.uint32)
    r = jnp.maximum(r, jnp.uint32(1)) - jnp.uint32(1)
    d = j - offs[r]
    bidx = jnp.minimum(cstart[r] + d, jnp.uint32(max(nb - 1, 0)))
    out_pv = cpv[r] if single else tuple(c[r] for c in (cpv, *cex))
    out = (count, cpk[r], out_pv, sbv[bidx])
    return out + (bidx,) if return_build_idx else out

"""Filter / selection operators (north star config 3, BASELINE.json).

TPU-native compaction: there is no efficient scatter on TPU, so
order-preserving compaction is expressed as a *stable sort by the negated
predicate* — selected rows float to the front in original order, rejected
rows sink to the back. Static shapes are preserved (XLA requirement): ops
return the full-length array plus the count of selected rows; the tail
beyond `count` is unspecified.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


_STREAM_TILE = 1 << 15   # kernels/compaction.py grid-step granularity


def _bits_u32(a: jax.Array) -> jax.Array:
    """Reinterpret any 32-bit column as u32 bits (identity for u32)."""
    if a.dtype == jnp.uint32:
        return a
    if a.dtype.itemsize == 4:
        return jax.lax.bitcast_convert_type(a, jnp.uint32)
    raise TypeError(f"compact moves 32-bit columns, got {a.dtype}")


def _bits_back(a: jax.Array, dtype) -> jax.Array:
    return a if jnp.dtype(dtype) == jnp.uint32 else (
        jax.lax.bitcast_convert_type(a, dtype))


@jax.jit
def compact(mask: jax.Array, *arrays):
    """Stable compaction: rows where mask is True move to the front.

    Returns (count, *compacted_arrays). Order among selected rows is
    preserved (stable), matching the golden model bit-exactly on the first
    `count` rows. The tail beyond `count` is unspecified.

    Large inputs stream through the Pallas compaction kernel — ONE pass
    with every array riding the same bitonic partition
    (kernels/compaction.compact_stream_multi); small ones keep the
    sort-based path (grid overheads dominate below one tile).
    """
    from lsdradixsort_tpu.kernels.compaction import compact_stream_multi
    n = mask.shape[0]
    count = jnp.sum(mask, dtype=jnp.uint32)
    if n >= _STREAM_TILE:
        npad = -(-n // _STREAM_TILE) * _STREAM_TILE
        m = mask.astype(jnp.uint32)
        if npad != n:
            m = jnp.concatenate(
                [m, jnp.zeros((npad - n,), jnp.uint32)])
        padded = []
        for a in arrays:
            ap = a if npad == n else jnp.concatenate(
                [a, jnp.zeros((npad - n,), a.dtype)])
            # BITCAST, not astype: the kernel moves rows, it must not
            # reinterpret values (astype would round float payloads)
            padded.append(_bits_u32(ap))
        packed = compact_stream_multi(m, padded)
        outs = [_bits_back(p[:n], a.dtype)
                for p, a in zip(packed, arrays)]
        return (count, *outs)
    sort_key = jnp.where(mask, jnp.uint32(0), jnp.uint32(1))
    # unstable 2-key sort with a unique iota tiebreak == stable 1-key sort,
    # minus XLA's 1.4x is_stable tax (see ops/sort.py sort_with_ranks)
    iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    out = jax.lax.sort((sort_key, iota, *arrays), num_keys=2,
                       is_stable=False)
    return (count, *out[2:])


@jax.jit
def filter_keys(keys: jax.Array, lo, hi):
    """Range selection: rows with lo <= key < hi (order-preserving).

    Returns (count, packed_keys).
    """
    lo = jnp.asarray(lo, keys.dtype)
    hi = jnp.asarray(hi, keys.dtype)
    mask = (keys >= lo) & (keys < hi)
    return compact(mask, keys)


@jax.jit
def filter_kv(keys: jax.Array, values: jax.Array, lo, hi):
    """Range selection over key-value rows. Returns (count, keys, values)."""
    lo = jnp.asarray(lo, keys.dtype)
    hi = jnp.asarray(hi, keys.dtype)
    mask = (keys >= lo) & (keys < hi)
    return compact(mask, keys, values)


def _in_set_mask(keys: jax.Array, set_keys: jax.Array) -> jax.Array:
    """Membership mask: probes the lane-bucketed VMEM hash table
    (kernels/hash_table.py, semi mode: one lane-gather per chain row per
    probe block) — the small-build fast path the sort-merge join cannot
    match for dimension-table-sized sets. If a hash chain overflows the
    planned depth, a lax.cond falls back to a sorted-set searchsorted
    membership test (XLA gather), so the result never depends on the
    hash."""
    from lsdradixsort_tpu.kernels.hash_table import (build_table, plan_rows,
                                                     probe_table)
    nset = set_keys.shape[0]
    tk, tv, cnt, ok = build_table(set_keys, set_keys, plan_rows(nset))

    def _fast(_):
        m, _unused = probe_table(tk, tv, cnt, keys, semi=True)
        return m == 1

    def _slow(_):
        ss = jnp.sort(set_keys)
        idx = jnp.clip(jnp.searchsorted(ss, keys), 0, nset - 1)
        return ss[idx] == keys

    return jax.lax.cond(ok, _fast, _slow, operand=None)


@jax.jit
def filter_in_set(keys: jax.Array, set_keys: jax.Array, *values):
    """IN-list semi-join filter: keep rows whose key appears in `set_keys`
    (unique membership keys, order-preserving). Returns (count, keys,
    *values). Membership via the VMEM hash table (see _in_set_mask)."""
    return compact(_in_set_mask(keys, set_keys), keys, *values)


@jax.jit
def filter_not_in_set(keys: jax.Array, set_keys: jax.Array, *values):
    """NOT IN anti-join filter: keep rows whose key does NOT appear in
    `set_keys` (unique membership keys, order-preserving). Returns
    (count, keys, *values). Same engine as filter_in_set, inverted."""
    return compact(~_in_set_mask(keys, set_keys), keys, *values)

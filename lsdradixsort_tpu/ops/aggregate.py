"""Hash-aggregate operators: GROUP BY key → reduce(values).

North-star config 3 (BASELINE.json): "filter + hash aggregate (GROUP BY
SUM) over 100M-row columnar batch".

TPU-native design: sort-based aggregation instead of a hash table. TPU has
no atomics and scatters serialize, so the idiomatic plan is

  1. stable sort rows by group key (reuses the flagship sort);
  2. mark run boundaries where the sorted key changes;
  3. per-run reduction via the *cumsum-at-boundaries* trick: the sum of a
     run equals the difference of the inclusive cumsum at consecutive run
     ends — one vectorized cumsum, no segment scatter;
  4. compact boundary rows to the front (sort-by-predicate compaction).

Sums use modular uint arithmetic so results are bit-exact against the
golden model regardless of association order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core import keycodec
from lsdradixsort_tpu.ops.filter import compact


@functools.partial(jax.jit, static_argnames=("engine", "tile_log2"))
def group_by_sum(group_keys: jax.Array, values: jax.Array,
                 engine: str = "xla", tile_log2: int = 15):
    """GROUP BY group_keys SUM(values).

    Returns (num_groups, unique_keys_sorted, sums): the first `num_groups`
    rows of the outputs are the result; the tail is unspecified.
    """
    return group_by_aggregate(group_keys, values, reduction="sum",
                              engine=engine, tile_log2=tile_log2)


@functools.partial(jax.jit,
                   static_argnames=("reduction", "engine", "tile_log2"))
def group_by_aggregate(group_keys: jax.Array, values: jax.Array,
                       reduction: str = "sum", engine: str = "xla",
                       tile_log2: int = 15):
    """GROUP BY with reduction in {"sum", "min", "max", "count"}.

    engine="merge" routes the grouping sort through the framework merge
    sort (ops/sort.merge_sort_multi / merge_sort_keys); "xla" uses
    jax.lax.sort. Results are identical (modular sums are
    order-independent; min/max sort by (key, value) in both engines).

    Dtypes (core/keycodec.py): group keys may be u32/i32/f32 (groups
    return sorted in that dtype's order). Values may be u32/i32 for sum
    (i32 sums are exact two's-complement mod 2^32 — the bits of the true
    sum) and u32/i32/f32 for min/max (codec-monotone, so the reduced
    code IS the reduced value). f32 SUM is rejected: float addition is
    not associative, so no order-independent bit-exact spelling exists.
    """
    kdt = group_keys.dtype
    group_keys = keycodec.encode(group_keys)
    vdt = values.dtype
    if reduction == "sum":
        if vdt == jnp.float32:
            raise TypeError("f32 SUM is order-dependent; no bit-exact "
                            "spelling (cast to int or use min/max/count)")
        if vdt == jnp.int32:
            values = jax.lax.bitcast_convert_type(values, jnp.uint32)
    elif reduction in ("min", "max"):
        values = keycodec.encode(values)

    def _key_out(uk):
        return keycodec.decode(uk, kdt)

    def _val_out(v):
        if reduction == "sum" and vdt == jnp.int32:
            return jax.lax.bitcast_convert_type(v, jnp.int32)
        if reduction in ("min", "max"):
            return keycodec.decode(v, vdt)
        return v

    n = group_keys.shape[0]
    if reduction == "sum":
        # modular sums are order-independent: no stability needed, so skip
        # the iota tiebreak stream (1.1-1.4x on the dominant sort)
        if engine == "merge":
            from lsdradixsort_tpu.ops.sort import merge_sort_multi
            sk, (sv,) = merge_sort_multi(group_keys, [values],
                                         tile_log2=tile_log2)
        else:
            sk, sv = jax.lax.sort((group_keys, values), num_keys=1,
                                  is_stable=False)
        is_last = jnp.concatenate([sk[1:] != sk[:-1],
                                   jnp.ones((1,), dtype=bool)])
    elif reduction == "count":
        if engine == "merge":
            from lsdradixsort_tpu.ops.sort import merge_sort_keys
            sk = merge_sort_keys(group_keys, tile_log2=tile_log2)
        else:
            sk = jax.lax.sort(group_keys)
        is_last = jnp.concatenate([sk[1:] != sk[:-1],
                                   jnp.ones((1,), dtype=bool)])
    if reduction == "sum":
        csum = jnp.cumsum(sv, dtype=sv.dtype)           # modular wraparound
        count, uk, run_end_csum = compact(is_last, sk, csum)
        # order among run-ends is preserved, so consecutive compacted rows
        # are consecutive runs; subtract the previous run's cumsum
        prev = jnp.concatenate([jnp.zeros((1,), sv.dtype), run_end_csum[:-1]])
        sums = run_end_csum - prev
        return count, _key_out(uk), _val_out(sums)
    if reduction == "count":
        pos = jnp.arange(n, dtype=jnp.uint32)
        count, uk, run_end_pos = compact(is_last, sk, pos)
        prev = jnp.concatenate([-jnp.ones((1,), jnp.uint32), run_end_pos[:-1]])
        return count, _key_out(uk), run_end_pos - prev
    if reduction in ("min", "max"):
        # re-sort by (key, value): a run's min is then its FIRST value and
        # its max its LAST — no segmented scan needed (associative_scan
        # compiles pathologically at >=2^24 on TPU)
        if engine == "merge":
            from lsdradixsort_tpu.ops.sort import merge_sort_multi
            sk2, (sv2,) = merge_sort_multi(group_keys, [values],
                                           tile_log2=tile_log2)
        else:
            sk2, sv2 = jax.lax.sort((group_keys, values), num_keys=2,
                                    is_stable=False)
        if reduction == "min":
            is_head = jnp.concatenate([jnp.ones((1,), dtype=bool),
                                       sk2[1:] != sk2[:-1]])
            count, uk, agg = compact(is_head, sk2, sv2)
        else:  # max
            is_tail = jnp.concatenate([sk2[1:] != sk2[:-1],
                                       jnp.ones((1,), dtype=bool)])
            count, uk, agg = compact(is_tail, sk2, sv2)
        return count, _key_out(uk), _val_out(agg)
    raise ValueError(f"unknown reduction {reduction!r}")


@functools.partial(jax.jit, static_argnames=("engine", "tile_log2"))
def filtered_group_by_sum(keys: jax.Array, group_keys: jax.Array,
                          values: jax.Array, lo, hi, engine: str = "xla",
                          tile_log2: int = 15):
    """BASELINE config 3 as one fused plan: SELECT group, SUM(value) WHERE
    lo <= key < hi GROUP BY group.

    Filtering is folded into the aggregation sort instead of materializing
    a compacted intermediate: rejected rows get a sentinel group key that
    sorts last and is excluded from the group count. One sort total.
    Returns (num_groups, unique_group_keys_sorted, sums).

    The kept/rejected tag rides packed with the row position
    ((tag << 31) | pos, n <= 2^31): a unique tiebreak ordered consistently
    with input position, which satisfies the merge engine's multi-payload
    tie contract (a bare 0/1 tag does not — equal keys are chunk-assigned
    by position there), so engine="merge" routes through the framework
    sort.
    """
    lo = jnp.asarray(lo, keys.dtype)
    hi = jnp.asarray(hi, keys.dtype)
    n = keys.shape[0]
    keep = (keys >= lo) & (keys < hi)
    # sentinel 0xFFFFFFFF may collide with a real group key; disambiguate
    # with the packed tag (kept rows of the colliding key sort first)
    gk = jnp.where(keep, group_keys, jnp.uint32(0xFFFFFFFF))
    packed = jnp.where(keep, jnp.uint32(0), jnp.uint32(0x80000000)) \
        | jnp.arange(n, dtype=jnp.uint32)
    if engine == "merge":
        from lsdradixsort_tpu.ops.sort import merge_sort_multi
        sk, (spacked, sv) = merge_sort_multi(gk, [packed, values],
                                             tile_log2=tile_log2)
    else:
        sk, spacked, sv = jax.lax.sort((gk, packed, values), num_keys=2,
                                       is_stable=False)
    kept = spacked < jnp.uint32(0x80000000)
    csum = jnp.cumsum(jnp.where(kept, sv, jnp.uint32(0)), dtype=sv.dtype)
    is_last = jnp.concatenate([(sk[1:] != sk[:-1]) | (kept[1:] != kept[:-1]),
                               jnp.ones((1,), bool)]) & kept
    count, uk, run_end_csum = compact(is_last, sk, csum)
    prev = jnp.concatenate([jnp.zeros((1,), sv.dtype), run_end_csum[:-1]])
    return count, uk, run_end_csum - prev

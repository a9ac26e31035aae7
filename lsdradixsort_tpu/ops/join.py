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

Build keys must be unique (primary-key join), as in the golden oracle.
Output arrays are full probe length; the first `count` rows are valid.
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
    tiebreak, so the result is bit-identical); "xla" uses jax.lax.sort."""
    nb, np_ = build_keys.shape[0], probe_keys.shape[0]
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

"""Streaming compaction kernel + filter ops (kernels/compaction.py)."""
import numpy as np
import pytest
import jax.numpy as jnp

from lsdradixsort_tpu.kernels.compaction import compact_stream
from lsdradixsort_tpu.ops.filter import compact, filter_keys, filter_kv


@pytest.mark.parametrize("nt", [1, 3])
@pytest.mark.parametrize("p", [0.0, 0.5, 1.0, 0.01])
def test_compact_stream(rng, nt, p):
    n = nt * (1 << 15)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    mask = (rng.random(n) < p).astype(np.uint32)
    out = np.asarray(compact_stream(jnp.asarray(mask), jnp.asarray(x)))
    cnt = int(mask.sum())
    np.testing.assert_array_equal(out[:cnt], x[mask.astype(bool)])


def test_compact_stream_carry_chains(rng):
    # counts that force odd carries across every tile boundary
    n = 4 << 15
    x = np.arange(n, dtype=np.uint32)
    mask = np.zeros(n, np.uint32)
    mask[:: 7] = 1    # 1/7 selectivity -> never row-aligned
    out = np.asarray(compact_stream(jnp.asarray(mask), jnp.asarray(x)))
    cnt = int(mask.sum())
    np.testing.assert_array_equal(out[:cnt], x[mask.astype(bool)])


def test_compact_stream_multi_three(rng):
    from lsdradixsort_tpu.kernels.compaction import compact_stream_multi
    n = 2 << 15
    xs = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(3)]
    mask = (rng.random(n) < 0.3).astype(np.uint32)
    outs = compact_stream_multi(jnp.asarray(mask),
                                [jnp.asarray(x) for x in xs])
    cnt = int(mask.sum())
    for x, out in zip(xs, outs):
        np.testing.assert_array_equal(np.asarray(out)[:cnt],
                                      x[mask.astype(bool)])


def test_filter_ops_large(rng):
    n = (1 << 16) + 12345    # non-multiple of the stream tile
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    lo, hi = np.uint32(1 << 30), np.uint32(3 << 30)
    count, packed = filter_keys(jnp.asarray(keys), lo, hi)
    want = keys[(keys >= lo) & (keys < hi)]
    assert int(count) == want.size
    np.testing.assert_array_equal(np.asarray(packed)[: want.size], want)

    vals = np.arange(n, dtype=np.uint32)
    count2, pk, pv = filter_kv(jnp.asarray(keys), jnp.asarray(vals), lo, hi)
    sel = (keys >= lo) & (keys < hi)
    np.testing.assert_array_equal(np.asarray(pk)[: want.size], keys[sel])
    np.testing.assert_array_equal(np.asarray(pv)[: want.size], vals[sel])


def test_filter_small_path(rng):
    n = 1000   # below the stream tile: sort-based path
    keys = rng.integers(0, 100, n, dtype=np.uint32)
    count, packed = filter_keys(jnp.asarray(keys), 10, 50)
    want = keys[(keys >= 10) & (keys < 50)]
    assert int(count) == want.size
    np.testing.assert_array_equal(np.asarray(packed)[: want.size], want)

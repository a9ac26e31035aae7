"""Merge-sort pass + full framework sort (kernels/merge.py, ops/sort.py).

Golden-model differential tests (reference discipline: CheckArrays,
Utils.cpp:62-68) at shrunken geometry so Pallas interpret mode stays fast:
tile=2^10, blk=128, buf=2^13.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from lsdradixsort_tpu.kernels import merge as M
from lsdradixsort_tpu.kernels.tile_sort import sort_tiles
from lsdradixsort_tpu.ops.sort import merge_sort_keys, sort

TILE_LOG = 10
BLK = 128
MAXBUF = 1 << 13


def _msort(keys):
    return merge_sort_keys(jnp.asarray(keys, jnp.uint32),
                           tile_log2=TILE_LOG, max_buf=MAXBUF, blk=BLK)


@pytest.mark.parametrize("pipeline", [True, False, "full"])
def test_single_pass_tables_and_merge(rng, pipeline):
    # 8 sorted runs of 1024 -> one 8192 run, single chunk per group
    n, L = 1 << 13, 1 << 10
    x = np.sort(rng.integers(0, 2**32, (8, L), dtype=np.uint32),
                axis=1).reshape(-1)
    buf = M.pass_buf_elems(L, MAXBUF)
    tab, ok = M.merge_pass_tables(jnp.asarray(x), L, buf, BLK)
    assert bool(ok)
    out = M.merge_pass(jnp.asarray(x), tab, run_len=L, buf_elems=buf,
                       blk=BLK, pipeline=pipeline)
    np.testing.assert_array_equal(np.asarray(out), np.sort(x))


def test_single_pass_reshape_ce(rng):
    # the reshape-halves compare-exchange formulation, keys and kv
    n, L = 1 << 13, 1 << 10
    x = np.sort(rng.integers(0, 2**32, (8, L), dtype=np.uint32),
                axis=1).reshape(-1)
    buf = M.pass_buf_elems(L, MAXBUF)
    tab, ok = M.merge_pass_tables(jnp.asarray(x), L, buf, BLK)
    assert bool(ok)
    out = M.merge_pass(jnp.asarray(x), tab, run_len=L, buf_elems=buf,
                       blk=BLK, ce="reshape")
    np.testing.assert_array_equal(np.asarray(out), np.sort(x))
    # kv: duplicate-heavy keys, iota payload -> stable ranks
    xd = np.sort((x % 97).astype(np.uint32).reshape(8, L), axis=1).reshape(-1)
    v = np.arange(n, dtype=np.uint32)
    tab, ok = M.merge_pass_tables(jnp.asarray(xd), L, buf, BLK)
    assert bool(ok)
    ok_, ov = M.merge_pass_kv(jnp.asarray(xd), jnp.asarray(v), tab,
                              run_len=L, buf_elems=buf, blk=BLK,
                              ce="reshape")
    want = np.lexsort((v, xd))
    np.testing.assert_array_equal(np.asarray(ok_), xd[want])
    np.testing.assert_array_equal(np.asarray(ov), v[want])


def test_single_pass_multi_stream(rng):
    # two payload streams: first is the tiebreak, second rides uncompared
    n, L = 1 << 13, 1 << 10
    k = (rng.integers(0, 37, n, dtype=np.uint32))
    v0 = np.arange(n, dtype=np.uint32)
    v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    order = np.lexsort((v0.reshape(8, L), k.reshape(8, L)))
    k2 = np.take_along_axis(k.reshape(8, L), order, 1).reshape(-1)
    v02 = np.take_along_axis(v0.reshape(8, L), order, 1).reshape(-1)
    v12 = np.take_along_axis(v1.reshape(8, L), order, 1).reshape(-1)
    buf = M.pass_buf_elems(L, MAXBUF)
    tab, ok = M.merge_pass_tables(jnp.asarray(k2), L, buf, BLK)
    assert bool(ok)
    sk, (s0, s1) = M.merge_pass_multi(
        jnp.asarray(k2), [jnp.asarray(v02), jnp.asarray(v12)], tab,
        run_len=L, buf_elems=buf, blk=BLK)
    want = np.lexsort((v0, k))
    np.testing.assert_array_equal(np.asarray(sk), k[want])
    np.testing.assert_array_equal(np.asarray(s0), v0[want])
    np.testing.assert_array_equal(np.asarray(s1), v1[want])


@pytest.mark.parametrize("n", [1 << 13, (1 << 14) - 777])
def test_merge_sort_multi_op(rng, n):
    from lsdradixsort_tpu.ops.sort import merge_sort_multi
    k = rng.integers(0, 50, n, dtype=np.uint32)
    v0 = np.arange(n, dtype=np.uint32)
    v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    sk, (s0, s1) = merge_sort_multi(
        jnp.asarray(k), [jnp.asarray(v0), jnp.asarray(v1)],
        tile_log2=TILE_LOG, max_buf=MAXBUF, blk=BLK)
    want = np.lexsort((v0, k))
    np.testing.assert_array_equal(np.asarray(sk), k[want])
    np.testing.assert_array_equal(np.asarray(s0), v0[want])
    np.testing.assert_array_equal(np.asarray(s1), v1[want])


def test_merge_sort_multi_sentinel_collision(rng):
    # contract-violating case: ragged n, >= 2 payloads, and REAL rows equal
    # to the (0xFFFFFFFF, 0xFFFFFFFF) padding sentinel pair. The in-graph
    # collision guard must route to the exact pad-free path so the riding
    # payloads of those rows survive (without it they are interchangeable
    # with padding and their v1 data can be lost).
    from lsdradixsort_tpu.ops.sort import merge_sort_multi
    n = (1 << 13) - 100                              # ragged -> padding
    k = rng.integers(0, 50, n, dtype=np.uint32)
    v0 = np.arange(n, dtype=np.uint32)
    v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    hot = rng.choice(n, 5, replace=False)
    k[hot] = 0xFFFFFFFF
    v0[hot] = 0xFFFFFFFF                             # == sentinel pair
    sk, (s0, s1) = merge_sort_multi(
        jnp.asarray(k), [jnp.asarray(v0), jnp.asarray(v1)],
        tile_log2=TILE_LOG, max_buf=MAXBUF, blk=BLK)
    want = np.lexsort((v0, k))
    np.testing.assert_array_equal(np.asarray(sk), k[want])
    np.testing.assert_array_equal(np.asarray(s0), v0[want])
    # the 5 colliding rows tie on (key, val0); their v1 values must all
    # survive (order within the tie group is by original position)
    np.testing.assert_array_equal(np.asarray(s1)[:-5], v1[want][:-5])
    np.testing.assert_array_equal(np.asarray(s1)[-5:],
                                  v1[np.sort(hot)])


def test_multi_chunk_pass(rng):
    # 8 runs of 8192 with buf 8192 -> many chunks per group
    n, L = 1 << 16, 1 << 13
    x = np.sort(rng.integers(0, 2**32, (8, L), dtype=np.uint32),
                axis=1).reshape(-1)
    buf = M.pass_buf_elems(L, MAXBUF)
    assert buf < M.KWAY * L
    tab, ok = M.merge_pass_tables(jnp.asarray(x), L, buf, BLK)
    assert bool(ok)
    out = M.merge_pass(jnp.asarray(x), tab, run_len=L, buf_elems=buf,
                       blk=BLK)
    np.testing.assert_array_equal(np.asarray(out), np.sort(x))


@pytest.mark.parametrize("pipeline", [True, False, "full"])
def test_multi_chunk_multi_stream_heavy_ties(rng, pipeline):
    # multi-chunk pass with riding streams: equal keys span chunk
    # boundaries; val0 (global position) satisfies the consistency
    # contract, v1 must arrive uncorrupted at exact positions
    n, L = 1 << 16, 1 << 13
    k = np.sort(rng.integers(0, 7, (8, L), dtype=np.uint32),
                axis=1).reshape(-1)                  # massive tied spans
    v0 = np.arange(n, dtype=np.uint32)               # position-consistent
    v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    buf = M.pass_buf_elems(L, MAXBUF)
    assert buf < M.KWAY * L                          # multi-chunk
    tab, ok = M.merge_pass_tables(jnp.asarray(k), L, buf, BLK)
    assert bool(ok)
    sk, (s0, s1) = M.merge_pass_multi(
        jnp.asarray(k), [jnp.asarray(v0), jnp.asarray(v1)], tab,
        run_len=L, buf_elems=buf, blk=BLK, pipeline=pipeline)
    want = np.lexsort((v0, k))
    np.testing.assert_array_equal(np.asarray(sk), k[want])
    np.testing.assert_array_equal(np.asarray(s0), v0[want])
    np.testing.assert_array_equal(np.asarray(s1), v1[want])


@pytest.mark.parametrize("n", [1 << 13, 1 << 16, (1 << 16) - 777, 1000, 1,
                               11 * (1 << 10) + 5])
def test_merge_sort_keys_random(rng, n):
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(_msort(x)), np.sort(x))


def test_merge_sort_duplicates_heavy(rng):
    x = rng.integers(0, 7, 1 << 16, dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(_msort(x)), np.sort(x))


def test_merge_sort_all_equal():
    x = np.full(1 << 16, 0xDEADBEEF, np.uint32)
    np.testing.assert_array_equal(np.asarray(_msort(x)), x)


def test_merge_sort_presorted_and_reverse(rng):
    x = np.arange(1 << 16, dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(_msort(x)), x)
    np.testing.assert_array_equal(np.asarray(_msort(x[::-1].copy())), x)


def test_merge_sort_extreme_values(rng):
    x = rng.choice(np.array([0, 1, 0xFFFFFFFE, 0xFFFFFFFF], np.uint32),
                   1 << 13).astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(_msort(x)), np.sort(x))


def test_sort_op_merge_strategy(rng):
    # the public op's default path at production geometry (interpret mode)
    x = rng.integers(0, 2**32, 1 << 15, dtype=np.uint32)
    got = sort(jnp.asarray(x))   # default strategy="merge"
    np.testing.assert_array_equal(np.asarray(got), np.sort(x))


def test_merge_pass_kv_and_ranks(rng):
    from lsdradixsort_tpu.ops.sort import merge_sort_with_ranks
    for n in (1 << 13, (1 << 16) - 333):
        x = rng.integers(0, 50, n, dtype=np.uint32)  # heavy duplicates
        sk, perm = merge_sort_with_ranks(
            jnp.asarray(x), tile_log2=TILE_LOG, max_buf=MAXBUF, blk=BLK)
        want = np.argsort(x, kind="stable")
        np.testing.assert_array_equal(np.asarray(perm), want.astype(np.uint32))
        np.testing.assert_array_equal(np.asarray(sk), x[want])


def test_merge_ranks_stability_all_equal():
    from lsdradixsort_tpu.ops.sort import merge_sort_with_ranks
    n = 1 << 13
    x = np.full(n, 42, np.uint32)
    sk, perm = merge_sort_with_ranks(
        jnp.asarray(x), tile_log2=TILE_LOG, max_buf=MAXBUF, blk=BLK)
    np.testing.assert_array_equal(np.asarray(perm),
                                  np.arange(n, dtype=np.uint32))

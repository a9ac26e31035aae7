"""Randomized differential fuzz of the flagship merge engine: small
configurations (n, tile size, payload count, key distribution) against
numpy.

Shape diversity is deliberately bounded (n snapped to a small set, two
tile sizes) so trials REUSE compiled programs: on this backend each
distinct merge-cascade shape is a large LLVM compile, and accumulating
dozens in one process reproduces the JIT-code segfault the conftest
mitigates between modules (see conftest header). clear_caches between
shape groups bounds it within this test too.

The targeted tests (test_merge.py) pin the known-hard cases; this sweep
guards the space BETWEEN them — ragged tails, tiny tiles, pathological
distributions, multi-stream tie handling."""
import jax
import numpy as np
import jax.numpy as jnp

from lsdradixsort_tpu.ops.sort import (merge_sort_keys,
                                       merge_sort_with_ranks,
                                       merge_sort_multi)

NS = (1777, 6 << 10, 20_480, 33_000)   # ragged + aligned, 1-3 merge passes


def _dist(rng, n, kind):
    if kind == 0:
        return rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    if kind == 1:
        return rng.integers(0, 4, n, dtype=np.uint64).astype(np.uint32)
    if kind == 2:
        return np.sort(rng.integers(0, 1 << 32, n,
                                    dtype=np.uint64)).astype(np.uint32)
    if kind == 3:
        return np.sort(rng.integers(0, 1 << 32, n, dtype=np.uint64))[
            ::-1].astype(np.uint32)
    if kind == 4:
        return np.full(n, rng.integers(0, 1 << 32), np.uint32)
    # mostly-one-value with a sprinkle (splitter-table stress)
    x = np.full(n, 7, np.uint32)
    m = rng.random(n) < 0.02
    x[m] = rng.integers(0, 1 << 32, int(m.sum()), dtype=np.uint64).astype(
        np.uint32)
    return x


def test_merge_engine_fuzz():
    rng = np.random.default_rng(2026)
    for gi, (n, tile_log2) in enumerate([(NS[0], 8), (NS[1], 8),
                                         (NS[2], 9), (NS[3], 9)]):
        for kind in range(6):
            keys = _dist(rng, n, kind)
            cfg = f"n={n} tile=2^{tile_log2} kind={kind}"
            jk = jnp.asarray(keys)
            perm = np.argsort(keys, kind="stable")
            if kind % 3 == 0:
                got = np.asarray(merge_sort_keys(jk, tile_log2=tile_log2))
                np.testing.assert_array_equal(got, np.sort(keys),
                                              err_msg=cfg)
            elif kind % 3 == 1:
                sk, ranks = merge_sort_with_ranks(jk, tile_log2=tile_log2)
                np.testing.assert_array_equal(np.asarray(sk), keys[perm],
                                              err_msg=cfg)
                np.testing.assert_array_equal(np.asarray(ranks),
                                              perm.astype(np.uint32),
                                              err_msg=cfg)
            else:
                vals = [np.arange(n, dtype=np.uint32),
                        rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(
                            np.uint32)]
                sk, outs = merge_sort_multi(
                    jk, [jnp.asarray(v) for v in vals],
                    tile_log2=tile_log2)
                np.testing.assert_array_equal(np.asarray(sk), keys[perm],
                                              err_msg=cfg)
                for v, o in zip(vals, outs):
                    np.testing.assert_array_equal(np.asarray(o), v[perm],
                                                  err_msg=cfg)
        jax.clear_caches()   # release this shape group's JIT code

"""Benchmark suite runner — the reference's L4/L5 layers as a CLI.

The reference fuses testing and benchmarking: each Test* function times the
CPU golden, times the GPU kernels, verifies element-by-element, and prints a
per-config report; main() sweeps configs behind compile-time #defines
(LSDRadixSort.cu:912-1185). Here the same discipline is a CLI:

    python -m lsdradixsort_tpu.bench sort --n 27 --verify
    python -m lsdradixsort_tpu.bench histogram --n 27 --sweep
    python -m lsdradixsort_tpu.bench all --out report

Every record carries achieved GB/s and the fraction of the chip's HBM
roofline (the reference's implicit metric; north star asks for >80%).
Reports are structured JSON plus the same human-readable lines the
Benchmark*.md files capture.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from lsdradixsort_tpu.core import datagen, roofline
from lsdradixsort_tpu.core.timing import time_fn, time_host
from lsdradixsort_tpu.utils import check_arrays


@dataclasses.dataclass
class Record:
    suite: str
    config: dict
    device_ms: float
    melems_per_s: float
    gbytes_per_s: float
    roofline_frac: float
    host_ms: float | None = None
    speedup_vs_host: float | None = None
    verified: bool | None = None

    def line(self) -> str:
        s = (f"[{self.suite}] {self.config} : {self.device_ms:.3f} ms, "
             f"{self.melems_per_s:.1f} Melem/s, {self.gbytes_per_s:.1f} GB/s "
             f"({100 * self.roofline_frac:.1f}% of roofline)")
        if self.speedup_vs_host is not None:
            s += f", x{self.speedup_vs_host:.2f} vs host"
        if self.verified is not None:
            s += ", verified" if self.verified else ", VERIFY FAILED"
        return s


# --budget deadline, enforced at this single choke point: once exceeded,
# remaining configs are SKIPPED LOUDLY (printed + recorded in the report's
# "skipped" list — a silent cap would read as full coverage; VERDICT r2)
_DEADLINE: float | None = None
_SKIPPED: list[dict] = []


def set_budget(seconds: float | None) -> None:
    global _DEADLINE
    _DEADLINE = None if seconds is None else time.time() + seconds
    _SKIPPED.clear()


def _bench(suite, config, fn, args, n, bytes_moved, host_fn=None,
           host_args=None, verify=None, iters=5) -> Record | None:
    if _DEADLINE is not None and time.time() > _DEADLINE:
        _SKIPPED.append({"suite": suite, "config": config})
        print(f"[{suite}] {config} : SKIPPED (budget exhausted)", flush=True)
        return None
    rl = roofline.detect()
    t = time_fn(fn, *args, iters=iters)
    rec = Record(
        suite=suite, config=config, device_ms=t.ms,
        melems_per_s=n / t.seconds / 1e6,
        gbytes_per_s=bytes_moved / t.seconds / 1e9,
        roofline_frac=rl.fraction(bytes_moved, t.seconds),
    )
    if host_fn is not None:
        th = time_host(host_fn, *host_args)
        rec.host_ms = th.ms
        rec.speedup_vs_host = th.seconds / t.seconds
    if verify is not None:
        try:
            verify()
            rec.verified = True
        except AssertionError:
            rec.verified = False
    return rec


# ---------------------------------------------------------------------------
# Suites (mirror the reference's Benchmark* sweeps, cu:1064-1150)
# ---------------------------------------------------------------------------

def suite_sort(n_log2: int, verify: bool, sweep: bool) -> list[Record]:
    from lsdradixsort_tpu.ops.sort import (sort, sort_kv,
                                           merge_sort_with_ranks)
    from lsdradixsort_tpu import native
    n = 1 << n_log2
    keys = datagen.random_keys(n)
    out = []
    # the framework sort (strategy="merge", the default) vs jax.lax.sort
    fn = jax.jit(lambda k: sort(k))
    fx = jax.jit(lambda k: sort(k, strategy="xla"))
    ver = verx = None
    host_fn = host_args = None
    if native.available():
        # host baseline: the reference's CPU-golden timing (cu:984-990)
        keys_np = np.asarray(keys)
        host_fn = lambda: native.radix_sort(keys_np)
        host_args = ()
    if verify:
        keys_np = np.asarray(keys)
        ver = lambda: check_arrays(fn(keys), np.sort(keys_np))
        verx = lambda: check_arrays(fx(keys), np.sort(keys_np))
    out.append(_bench("sort/keys", {"n": n, "strategy": "merge"}, fn,
                      (keys,), n, bytes_moved=8 * n, host_fn=host_fn,
                      host_args=host_args, verify=ver))
    out.append(_bench("sort/keys_xla", {"n": n}, fx, (keys,), n,
                      bytes_moved=8 * n, verify=verx))
    # f32 keys through the order-preserving codec (core/keycodec.py):
    # prices the encode/decode overhead on the same engine
    fkeys = jax.lax.bitcast_convert_type(
        datagen.random_keys(n, seed=3) >> 9, jnp.float32) + jnp.float32(1.0)
    ff = jax.jit(lambda k: sort(k))
    vf = None
    if verify:
        fkeys_np = np.asarray(fkeys)
        def vf():
            got = np.asarray(ff(fkeys))
            want = np.sort(fkeys_np)
            assert (got == want).all()
    out.append(_bench("sort/keys_f32", {"n": n, "strategy": "merge"}, ff,
                      (fkeys,), n, bytes_moved=8 * n, verify=vf))
    vals = jnp.arange(n, dtype=jnp.uint32)
    # explicit strategy="xla": sort_kv's DEFAULT is the merge engine now
    # (r5, measured 1.18x) — this row keeps the XLA bar on the books
    fkv = jax.jit(lambda k, v: sort_kv(k, v, strategy="xla"))
    fmr = jax.jit(merge_sort_with_ranks)
    vkv = vmr = None
    if verify:
        keys_np = np.asarray(keys)
        perm = np.argsort(keys_np, kind="stable")
        def vkv():
            sk, sv = fkv(keys, vals)
            check_arrays(sk, keys_np[perm])
            check_arrays(sv, perm.astype(np.uint32))
        def vmr():
            sk, sv = fmr(keys)
            check_arrays(sk, keys_np[perm])
            check_arrays(sv, perm.astype(np.uint32))
    out.append(_bench("sort/kv", {"n": n, "strategy": "xla"}, fkv,
                      (keys, vals), n, bytes_moved=16 * n, verify=vkv))
    out.append(_bench("sort/kv_merge", {"n": n}, fmr, (keys,), n,
                      bytes_moved=16 * n, verify=vmr))
    if sweep:
        # tile/buffer geometry A/B (stage-count model, ROADMAP 7g/8):
        # buf 2^19 cuts the merge cascade 57 -> 54 stages per pass,
        # tile 2^18 trades 120 tile stages + 4 passes for 171 + 3
        from lsdradixsort_tpu.ops.sort import merge_sort_keys
        for tl, bl in ((15, 19), (18, 20), (18, 19)):
            fg = jax.jit(lambda k, t=tl, b=bl: merge_sort_keys(
                k, tile_log2=t, max_buf=1 << b))
            fgkv = jax.jit(lambda k, t=tl, b=bl: merge_sort_with_ranks(
                k, tile_log2=t, max_buf=1 << b))
            vg = vgkv = None
            if verify:
                keys_np = np.asarray(keys)
                perm = np.argsort(keys_np, kind="stable")
                vg = lambda f=fg, keys_np=keys_np: check_arrays(
                    f(keys), np.sort(keys_np))
                def vgkv(f=fgkv, keys_np=keys_np, perm=perm):
                    sk, sv = f(keys)
                    check_arrays(sk, keys_np[perm])
                    check_arrays(sv, perm.astype(np.uint32))
            out.append(_bench(f"sort/keys_t{tl}_b{bl}", {"n": n}, fg,
                              (keys,), n, bytes_moved=8 * n, verify=vg))
            out.append(_bench(f"sort/kv_t{tl}_b{bl}", {"n": n}, fgkv,
                              (keys,), n, bytes_moved=16 * n, verify=vgkv))
        # 64-bit keys: single-chain (hi, lo, pos) ncmp=3 engine vs the
        # two-pass LSD spelling vs XLA (ROADMAP §8 decision record)
        from lsdradixsort_tpu.ops.sort import sort64_with_ranks
        hi64 = datagen.random_keys(n, seed=11)
        lo64 = datagen.random_keys(n, seed=12)
        for strat in ("merge", "merge2", "xla"):
            f64 = jax.jit(lambda h, l, s=strat: sort64_with_ranks(
                h, l, strategy=s))
            v64 = None
            if verify:
                h_np, l_np = np.asarray(hi64), np.asarray(lo64)
                w64 = np.argsort(h_np.astype(np.uint64) << np.uint64(32)
                                 | l_np, kind="stable")
                def v64(f=f64, h_np=h_np, l_np=l_np, w64=w64):
                    sh, sl, sp = f(hi64, lo64)
                    check_arrays(sh, h_np[w64])
                    check_arrays(sl, l_np[w64])
                    check_arrays(sp, w64.astype(np.uint32))
            out.append(_bench(f"sort/64bit_{strat}", {"n": n}, f64,
                              (hi64, lo64), n, bytes_moved=24 * n,
                              verify=v64))
        # the composed LSD radix pipeline (histogram -> scans -> scatter,
        # the reference's pass structure) — correctness scaffold; XLA's
        # scatter keeps it off the fast path (ROADMAP.md §1)
        nc = min(n, 1 << 24)
        ckeys = keys[:nc]
        cfn = jax.jit(lambda k: sort(k, strategy="composed"))
        cver = None
        if verify:
            ck_np = np.asarray(ckeys)
            cver = lambda: check_arrays(cfn(ckeys), np.sort(ck_np))
        out.append(_bench("sort/composed_r8", {"n": nc}, cfn, (ckeys,), nc,
                          bytes_moved=8 * nc, verify=cver, iters=2))
    return out


def suite_tile_sort(n_log2: int, verify: bool, sweep: bool) -> list[Record]:
    """Block-local stable kv sort (TestLSDBinaryRadixSort analog, cu:423-477)."""
    from lsdradixsort_tpu.kernels.tile_sort import sort_tiles_kv
    n = 1 << n_log2
    keys = datagen.random_keys(n)
    vals = jnp.arange(n, dtype=jnp.uint32)
    rows_opts = (16, 64, 128, 512) if sweep else (128,)
    out = []
    for rows in rows_opts:
        tile = rows * 128
        if n % tile:
            continue
        fn = jax.jit(lambda k, v, r=rows: sort_tiles_kv(k, v, tile_rows=r))
        ver = None
        if verify:
            keys_np = np.asarray(keys)
            def ver(f=fn, t=tile, keys_np=keys_np):
                sk, sv = f(keys, vals)
                sk, sv = np.asarray(sk), np.asarray(sv)
                for i in range(0, n, t):
                    seg = keys_np[i:i + t]
                    p = np.argsort(seg, kind="stable")
                    check_arrays(sk[i:i + t], seg[p])
                    check_arrays(sv[i:i + t], p.astype(np.uint32) + i)
        out.append(_bench("tile_sort", {"n": n, "tile": tile}, fn,
                          (keys, vals), n, bytes_moved=16 * n, verify=ver))
    return out


def suite_shuffle(n_log2: int, verify: bool, sweep: bool) -> list[Record]:
    """DMA run-shuffle bandwidth (the radix scatter's data movement)."""
    from lsdradixsort_tpu.kernels.shuffle import shuffle_row_runs
    n = 1 << n_log2
    rows = n // 128
    x = datagen.random_keys(n).reshape(rows, 128)
    run_opts = (8, 32, 128, 512) if sweep else (32, 128)
    out = []
    for run in run_opts:
        nch = rows // run
        src = jnp.arange(nch, dtype=jnp.int32) * run
        dst = (nch - 1 - jnp.arange(nch, dtype=jnp.int32)) * run
        lens = jnp.full(nch, run, jnp.int32)
        fn = jax.jit(lambda a, s, d, l, r=run: shuffle_row_runs(
            a, s, d, l, out_rows=rows, fixed_rows=r))
        ver = None
        if verify:
            xs = np.asarray(x)
            def ver(f=fn, run=run, nch=nch, xs=xs, s=src, d=dst, l=lens):
                got = np.asarray(f(x, s, d, l))
                want = np.concatenate(
                    [xs[i * run:(i + 1) * run] for i in range(nch - 1, -1, -1)])
                check_arrays(got, want)
        out.append(_bench("shuffle", {"rows": rows, "run_rows": run,
                                      "run_kb": run * 128 * 4 // 1024},
                          fn, (x, src, dst, lens), n, bytes_moved=8 * n,
                          verify=ver))
    return out


def suite_histogram(n_log2: int, verify: bool, sweep: bool) -> list[Record]:
    from lsdradixsort_tpu.kernels.histogram import block_digit_histograms
    from lsdradixsort_tpu import golden
    n = 1 << n_log2
    keys = datagen.random_keys(n)
    rs = (1, 2, 4, 8) if sweep else (4, 8)
    blocks = (1 << 13, 1 << 15, 1 << 17) if sweep else (1 << 15,)
    cbs = (8, 4) if sweep else (8,)
    out = []
    for r in rs:
        for block in blocks:
            if n % block:
                continue
            for cb in cbs:
                fn = jax.jit(lambda k, r=r, b=block, cb=cb:
                             block_digit_histograms(k, r, 0, b,
                                                    counter_bits=cb))
                ver = None
                if verify:
                    keys_np = np.asarray(keys)
                    ver = lambda r=r, b=block, f=fn: check_arrays(
                        f(keys), golden.digit_histograms(keys_np, r, 0, b))
                out.append(_bench(
                    "histogram", {"n": n, "r": r, "block": block, "cb": cb},
                    fn, (keys,), n, bytes_moved=4 * n, verify=ver))
    return out


def suite_scan(n_log2: int, verify: bool, sweep: bool) -> list[Record]:
    from lsdradixsort_tpu.kernels.scan import exclusive_scan
    from lsdradixsort_tpu import golden
    n = 1 << n_log2
    a = datagen.random_keys(n)
    out = []
    from lsdradixsort_tpu.kernels.scan import exclusive_scan_hierarchical
    rows_options = (128, 256, 512, 1024) if sweep else (512,)
    for rows in rows_options:
        for name, kern in (("scan/carry", exclusive_scan),
                           ("scan/hier", exclusive_scan_hierarchical)):
            fn = jax.jit(lambda x, k=kern, rows=rows: k(x, block_rows=rows))
            ver = None
            if verify:
                a_np = np.asarray(a)
                ver = lambda f=fn: check_arrays(f(a), golden.prefix_sum(a_np))
            out.append(_bench(name, {"n": n, "block_rows": rows}, fn, (a,),
                              n, bytes_moved=8 * n, verify=ver))
    return out


def suite_transpose(n_log2: int, verify: bool, sweep: bool) -> list[Record]:
    """Matrix transpose (TestTranspose analog, cu:546-637). On TPU this is
    an XLA relayout — benchmarked to document that the reference's tiled
    smem kernel is a no-op concern here."""
    from lsdradixsort_tpu.kernels.transpose import transpose
    n = 1 << n_log2
    shapes = [(1 << (n_log2 // 2), n >> (n_log2 // 2))]
    if sweep:
        shapes += [(256, n // 256), (n // 256, 256)]
    out = []
    for rows, cols in shapes:
        a = datagen.random_keys(n).reshape(rows, cols)
        fn = jax.jit(transpose)
        ver = None
        if verify:
            a_np = np.asarray(a)
            ver = lambda f=fn, a_np=a_np: check_arrays(f(a), a_np.T)
        out.append(_bench("transpose", {"rows": rows, "cols": cols}, fn,
                          (a,), n, bytes_moved=8 * n, verify=ver))
    return out


def suite_query(n_log2: int, verify: bool, sweep: bool) -> list[Record]:
    """filter + aggregate + join — north star configs 3-4."""
    from lsdradixsort_tpu.ops import filter_kv, group_by_sum, hash_join
    n = 1 << n_log2
    keys = datagen.random_keys_bounded(n, 0, 1 << 20, seed=1)
    vals = jnp.arange(n, dtype=jnp.uint32)
    out = []
    from lsdradixsort_tpu import golden
    lo, hi = jnp.uint32(1 << 18), jnp.uint32(1 << 19)
    ffn = jax.jit(lambda k, v: filter_kv(k, v, lo, hi))
    fver = None
    if verify:
        k_np, v_np = np.asarray(keys), np.asarray(vals)
        def fver():
            cnt, fk, fv = ffn(keys, vals)
            mask = (k_np >= (1 << 18)) & (k_np < (1 << 19))
            wk, wv = k_np[mask], v_np[mask]
            assert int(cnt) == wk.size
            check_arrays(fk[:wk.size], wk)
            check_arrays(fv[:wk.size], wv)
    out.append(_bench("query/filter", {"n": n}, ffn, (keys, vals), n,
                      bytes_moved=16 * n, verify=fver))
    gfn = jax.jit(group_by_sum)
    gver = None
    if verify:
        k_np, v_np = np.asarray(keys), np.asarray(vals)
        def gver():
            cnt, uk, sums = gfn(keys, vals)
            wk, ws = golden.group_by_sum(k_np, v_np)
            assert int(cnt) == wk.size
            check_arrays(uk[:wk.size], wk)
            check_arrays(sums[:wk.size], ws)
    out.append(_bench("query/group_by_sum", {"n": n}, gfn, (keys, vals), n,
                      bytes_moved=16 * n, verify=gver))
    if sweep:
        # engine A/B: the same op with its grouping sort routed through
        # the framework merge sort
        gfn_m = jax.jit(lambda k, v: group_by_sum(k, v, engine="merge"))
        gver_m = None
        if verify:
            def gver_m():
                cnt, uk, sums = gfn_m(keys, vals)
                wk, ws = golden.group_by_sum(np.asarray(keys),
                                             np.asarray(vals))
                assert int(cnt) == wk.size
                check_arrays(uk[:wk.size], wk)
                check_arrays(sums[:wk.size], ws)
        out.append(_bench("query/group_by_sum_merge", {"n": n}, gfn_m,
                          (keys, vals), n, bytes_moved=16 * n,
                          verify=gver_m))
    from lsdradixsort_tpu.ops.aggregate import filtered_group_by_sum
    gk2 = datagen.random_keys_bounded(n, 0, 1 << 10, seed=7)
    qfn = jax.jit(lambda k, g, v: filtered_group_by_sum(
        k, g, v, jnp.uint32(1 << 18), jnp.uint32(1 << 19)))
    qver = None
    if verify:
        k_np = np.asarray(keys)
        g_np, v_np = np.asarray(gk2), np.asarray(vals)
        def qver():
            cnt, uk, sums = qfn(keys, gk2, vals)
            mask = (k_np >= (1 << 18)) & (k_np < (1 << 19))
            wk, ws = golden.group_by_sum(g_np[mask], v_np[mask])
            assert int(cnt) == wk.size
            check_arrays(uk[:wk.size], wk)
            check_arrays(sums[:wk.size], ws)
    out.append(_bench("query/filtered_group_by (config 3)", {"n": n}, qfn,
                      (keys, gk2, vals), n, bytes_moved=20 * n, verify=qver))
    if sweep:
        qfn_m = jax.jit(lambda k, g, v: filtered_group_by_sum(
            k, g, v, jnp.uint32(1 << 18), jnp.uint32(1 << 19),
            engine="merge"))
        qver_m = None
        if verify:
            k_np = np.asarray(keys)
            g_np, v_np = np.asarray(gk2), np.asarray(vals)
            def qver_m():
                cnt, uk, sums = qfn_m(keys, gk2, vals)
                mask = (k_np >= (1 << 18)) & (k_np < (1 << 19))
                wk, ws = golden.group_by_sum(g_np[mask], v_np[mask])
                assert int(cnt) == wk.size
                check_arrays(uk[:wk.size], wk)
                check_arrays(sums[:wk.size], ws)
        out.append(_bench("query/filtered_group_by_merge", {"n": n}, qfn_m,
                          (keys, gk2, vals), n, bytes_moved=20 * n,
                          verify=qver_m))
    nb = max(n // 10, 1)
    bkeys = jax.random.permutation(
        jax.random.PRNGKey(2), jnp.arange(nb, dtype=jnp.uint32))
    bvals = bkeys * jnp.uint32(3)
    pkeys = datagen.random_keys_bounded(n, 0, 2 * nb, seed=3)
    jfn = jax.jit(hash_join)
    jver = None
    if verify:
        bk_np, bv_np = np.asarray(bkeys), np.asarray(bvals)
        pk_np, pv_np = np.asarray(pkeys), np.asarray(vals)
        def jver():
            cnt, jk, jpv, jbv = jfn(bkeys, bvals, pkeys, vals)
            wk, wpv, wbv = golden.hash_join(bk_np, bv_np, pk_np, pv_np)
            assert int(cnt) == wk.size
            check_arrays(jk[:wk.size], wk)
            check_arrays(jpv[:wk.size], wpv)
            check_arrays(jbv[:wk.size], wbv)
    out.append(_bench("query/hash_join", {"build": nb, "probe": n}, jfn,
                      (bkeys, bvals, pkeys, vals), n,
                      bytes_moved=8 * (n + nb) + 24 * n, verify=jver))
    if sweep:
        jfn_m = jax.jit(lambda b, bv, p, pv: hash_join(b, bv, p, pv,
                                                       engine="merge"))
        jver_m = None
        if verify:
            def jver_m():
                cnt, jk, jpv, jbv = jfn_m(bkeys, bvals, pkeys, vals)
                wk, wpv, wbv = golden.hash_join(
                    np.asarray(bkeys), np.asarray(bvals),
                    np.asarray(pkeys), np.asarray(vals))
                assert int(cnt) == wk.size
                check_arrays(jk[:wk.size], wk)
                check_arrays(jpv[:wk.size], wpv)
                check_arrays(jbv[:wk.size], wbv)
        out.append(_bench("query/hash_join_merge", {"build": nb, "probe": n},
                          jfn_m, (bkeys, bvals, pkeys, vals), n,
                          bytes_moved=8 * (n + nb) + 24 * n, verify=jver_m))
    # many-to-many join: ~4 build rows per key, output bound 2x probe count
    from lsdradixsort_tpu.ops import hash_join_multi
    bkeys_m = datagen.random_keys_bounded(nb, 0, max(nb // 4, 1), seed=5)
    max_out = 2 * n
    jmfn = jax.jit(lambda b, bv, p, pv: hash_join_multi(
        b, bv, p, pv, max_out=max_out))
    jmver = None
    if verify:
        bkm_np = np.asarray(bkeys_m)
        bv_np2 = np.asarray(bvals)
        pk_np2, pv_np2 = np.asarray(pkeys), np.asarray(vals)
        def jmver():
            cnt, jk, jpv, jbv = jmfn(bkeys_m, bvals, pkeys, vals)
            wk, wpv, wbv = golden.hash_join_multi(bkm_np, bv_np2, pk_np2,
                                                  pv_np2)
            assert int(cnt) == wk.size
            m = min(wk.size, max_out)
            check_arrays(jk[:m], wk[:m])
            check_arrays(jpv[:m], wpv[:m])
            check_arrays(jbv[:m], wbv[:m])
    out.append(_bench("query/hash_join_multi", {"build": nb, "probe": n,
                                                "max_out": max_out},
                      jmfn, (bkeys_m, bvals, pkeys, vals), n,
                      bytes_moved=8 * (n + nb) + 24 * max_out, verify=jmver))

    # small-build fast path: VMEM lane-bucketed hash table
    # (kernels/hash_table.py) — dimension-table join + IN-list semi-join
    from lsdradixsort_tpu.ops import filter_in_set
    nbs = 1 << 10
    bkeys_s = jax.random.permutation(
        jax.random.PRNGKey(7), jnp.arange(1 << 12, dtype=jnp.uint32))[:nbs]
    bvals_s = bkeys_s ^ jnp.uint32(0xABC)
    pkeys_s = datagen.random_keys_bounded(n, 0, 1 << 12, seed=8)
    jsfn = jax.jit(lambda b, bv, p, pv: hash_join(b, bv, p, pv,
                                                  engine="vmem"))
    jsver = None
    if verify:
        bks_np, bvs_np = np.asarray(bkeys_s), np.asarray(bvals_s)
        pks_np, pvs_np = np.asarray(pkeys_s), np.asarray(vals)
        def jsver():
            cnt, jk, jpv, jbv = jsfn(bkeys_s, bvals_s, pkeys_s, vals)
            wk, wpv, wbv = golden.hash_join(bks_np, bvs_np, pks_np, pvs_np)
            assert int(cnt) == wk.size
            check_arrays(jk[:wk.size], wk)
            check_arrays(jpv[:wk.size], wpv)
            check_arrays(jbv[:wk.size], wbv)
    out.append(_bench("query/hash_join_vmem_small",
                      {"build": nbs, "probe": n}, jsfn,
                      (bkeys_s, bvals_s, pkeys_s, vals), n,
                      bytes_moved=16 * n, verify=jsver))
    sfn = jax.jit(filter_in_set)
    sver = None
    if verify:
        pks_np2, v_np2 = np.asarray(pkeys_s), np.asarray(vals)
        bks_np2 = np.asarray(bkeys_s)
        def sver():
            cnt, fk, fv = sfn(pkeys_s, bkeys_s, vals)
            mask = np.isin(pks_np2, bks_np2)
            assert int(cnt) == int(mask.sum())
            check_arrays(fk[:int(cnt)], pks_np2[mask])
            check_arrays(fv[:int(cnt)], v_np2[mask])
    out.append(_bench("query/filter_in_set", {"set": nbs, "n": n}, sfn,
                      (pkeys_s, bkeys_s, vals), n,
                      bytes_moved=16 * n, verify=sver))

    # ORDER BY ... LIMIT k: histogram-guided top-k (ops/topk.py) — one
    # histogram pass + one compaction pass + a static-B tail sort.
    # Full-range keys so the 256-bin threshold actually selects (the
    # bounded `keys` above all share one high byte = permanent fallback)
    from lsdradixsort_tpu.ops.topk import top_k, unique
    kk = 1 << 10
    tkeys = datagen.random_keys(n, seed=9)
    tfn = jax.jit(lambda x: top_k(x, kk, largest=True))
    tver = None
    if verify:
        tkeys_np = np.asarray(tkeys)
        def tver():
            tv, ti = tfn(tkeys)
            order = np.argsort(~tkeys_np, kind="stable")[:kk]
            check_arrays(tv, tkeys_np[order])
            check_arrays(ti, order.astype(np.uint32))
    out.append(_bench("query/top_k", {"n": n, "k": kk}, tfn, (tkeys,), n,
                      bytes_moved=8 * n, verify=tver))

    # SELECT DISTINCT + counts
    ufn = jax.jit(unique)
    uver = None
    if verify:
        keys_np2 = np.asarray(keys)
        def uver():
            cnt, uk, cts = ufn(keys)
            wk, wc = np.unique(keys_np2, return_counts=True)
            assert int(cnt) == wk.size
            check_arrays(uk[:wk.size], wk)
            check_arrays(cts[:wk.size], wc.astype(np.uint32))
    out.append(_bench("query/unique", {"n": n}, ufn, (keys,), n,
                      bytes_moved=16 * n, verify=uver))
    return out


def suite_dist(n_log2: int, verify: bool, sweep: bool) -> list[Record]:
    """Distributed kv-sort over all local devices (north-star config 5).

    On a multi-chip slice this measures scaling efficiency vs the 1-chip
    flagship; on one chip it exercises the full shard_map path at D=1.
    Reports per-shard balance (exact by construction — equal-key rank
    splitting keeps shards balanced under any skew).
    """
    from lsdradixsort_tpu.parallel import make_mesh, shard_1d, dist_sort_kv
    from lsdradixsort_tpu.ops.sort import sort_with_ranks
    d = len(jax.devices())
    if d == 1:
        # D=1 exercises the path at degenerate mesh size. Bisected in r2
        # (exp/probe_d1_collectives.py): psum/all_gather/all_to_all/local
        # sort under shard_map are individually fine through 2^24 and
        # dist_sort_kv itself passes at 2^22 (round 1's runtime
        # FAILED_PRECONDITION no longer reproduces); at 2^24 the remote
        # compile helper crashes (exit 1, no diagnostic) on the full
        # degenerate-collective program. Cap at the measured-safe 2^22.
        n_log2 = min(n_log2, 22)
    n = 1 << n_log2
    mesh = make_mesh(d)
    keys = datagen.random_keys(n)
    vals = jnp.arange(n, dtype=jnp.uint32)
    sk = shard_1d(keys, mesh)
    sv = shard_1d(vals, mesh)
    fn = jax.jit(lambda k, v: dist_sort_kv(k, v, mesh))
    ver = None
    if verify:
        keys_np = np.asarray(keys)
        perm = np.argsort(keys_np, kind="stable")
        def ver():
            ok, ov = fn(sk, sv)
            check_arrays(ok, keys_np[perm])
            check_arrays(ov, perm.astype(np.uint32))
    out = [_bench("dist/sort_kv", {"n": n, "devices": d}, fn, (sk, sv), n,
                  bytes_moved=16 * n, verify=ver)]
    # single-device reference for scaling efficiency — recorded as a
    # structured field on the dist record, not just printed (VERDICT #10)
    t1 = time_fn(sort_with_ranks, keys, iters=3)
    rec = out[0]
    ratio = t1.seconds / rec.device_ms * 1e3
    if d > 1:
        eff = ratio / d
        rec.config["scaling_eff"] = round(eff, 4)
        print(f"# scaling efficiency vs 1-device sort_with_ranks: "
              f"{100 * eff:.1f}% at D={d}")
    else:
        # At D=1 the ratio measures dist-machinery overhead vs the local
        # sort, NOT scaling — label it honestly (VERDICT r2 weak #4)
        rec.config["d1_dist_overhead"] = round(1.0 / ratio, 4)
        print(f"# D=1: dist path costs {1.0 / ratio:.2f}x the local "
              f"sort_with_ranks (machinery overhead, not scaling)")
    return out


SUITES: dict[str, Callable] = {
    # dist first: the collective program fails with FAILED_PRECONDITION when
    # compiled after many pallas executables in the same process (axon quirk)
    "dist": suite_dist,
    "sort": suite_sort,
    "tile_sort": suite_tile_sort,
    "shuffle": suite_shuffle,
    "histogram": suite_histogram,
    "scan": suite_scan,
    "transpose": suite_transpose,
    "query": suite_query,
}


def run_suite(name: str, n_log2: int = 24, verify: bool = False,
              sweep: bool = False) -> tuple[list[Record], list[dict]]:
    """Run suites; a crashed suite is recorded in `failed`, not swallowed
    (the reference only skips *known-infeasible* configs with a printed
    reason, cu:940-964 — we keep the sweep going but surface the failure
    in the report and the exit code)."""
    names = list(SUITES) if name == "all" else [name]
    records: list[Record] = []
    failed: list[dict] = []
    for s in names:
        try:
            for rec in SUITES[s](n_log2, verify, sweep):
                if rec is None:          # budget-skipped config
                    continue
                print(rec.line(), flush=True)
                records.append(rec)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            failed.append({"suite": s, "error": msg})
            print(f"[{s}] SUITE FAILED: {msg}", flush=True)
    return records, failed


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("suite", choices=[*SUITES, "all"])
    p.add_argument("--n", type=int, default=24, help="log2 element count")
    p.add_argument("--verify", action="store_true",
                   help="check against golden models (reference discipline)")
    p.add_argument("--sweep", action="store_true",
                   help="sweep block sizes / digit widths like the reference")
    p.add_argument("--out", type=str, default=None,
                   help="write <out>.json and <out>.md reports")
    p.add_argument("--budget", type=float, default=None,
                   help="wall-clock budget in seconds; configs past the "
                        "deadline are skipped loudly and listed in the "
                        "report")
    p.add_argument("--no-cache", action="store_true",
                   help="disable the persistent XLA compilation cache")
    args = p.parse_args()
    if not args.no_cache:
        from lsdradixsort_tpu.core.cache import enable_persistent_cache
        d = enable_persistent_cache()
        print(f"# compilation cache: {d}")
    set_budget(args.budget)
    rl = roofline.detect()
    print(f"# device: {rl.device_kind}, HBM roofline {rl.hbm_gbps} GB/s "
          f"(measured ceiling; spec {rl.spec_gbps})")
    records, failed = run_suite(args.suite, args.n, args.verify, args.sweep)
    if args.out:
        with open(args.out + ".json", "w") as f:
            json.dump({"records": [dataclasses.asdict(r) for r in records],
                       "failed_suites": failed,
                       "skipped": _SKIPPED,
                       "session": time.strftime("%Y-%m-%d %H:%M")}, f,
                      indent=1)
        with open(args.out + ".md", "w") as f:
            f.write(f"# Benchmark report — {rl.device_kind}, "
                    f"{time.strftime('%Y-%m-%d')}\n\n")
            for r in records:
                f.write(r.line() + "\n")
            for fl in failed:
                f.write(f"FAILED {fl['suite']}: {fl['error']}\n")
    # automation keys on the exit code: any verify failure or crashed
    # suite is a nonzero exit (ADVICE r1)
    bad_verify = [r for r in records if getattr(r, "verified", None) is False]
    if failed or bad_verify:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

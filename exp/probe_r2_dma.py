"""Round-2 probe batch 2: DMA economics + fused gather marginal costs.

D1: HBM->HBM DMA row-run shuffle rate vs run size (256B..64KB), 2-D (rows,128) refs
D2: 1-D element-granular HBM->HBM DMA runs (unaligned offsets) — does it work? rate?
D3: VMEM->VMEM DMA issue cost (small runs inside a kernel)
G1: marginal cost of chained sublane-gathers (8,2048) in-VMEM
G2: marginal cost of chained lane-gathers (128,128) in-VMEM
"""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

LANES = 128


def report(name, ms, n, unit="elem", extra=""):
    print(f"{name:56s} {ms:8.3f} ms {n/ms*1e3/1e9:7.2f} G{unit}/s "
          f"{ms*1e9/n:7.1f} ps/{unit} {extra}")


# ---------------- D1/D2: HBM DMA run shuffle, 2-D rows vs 1-D elements ----
def dma_runs(kind, run_elems, total=1 << 25):
    """Permute `total` u32 elements in runs of `run_elems` via DMA."""
    nruns = total // run_elems
    DEPTH = 8
    if kind == "rows2d":
        rows_per_run = run_elems // LANES
        def kern(src_ref, dst_ref, x_hbm, o_hbm, sems):
            def mk(i):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(src_ref[0, i] * rows_per_run, rows_per_run), :],
                    o_hbm.at[pl.ds(dst_ref[0, i] * rows_per_run, rows_per_run), :],
                    sems.at[i % DEPTH])
            for i in range(min(DEPTH, nruns)):
                mk(i).start()
            def body(i, _):
                mk(i).wait()
                nxt = i + DEPTH
                @pl.when(nxt < nruns)
                def _():
                    mk(nxt).start()
                return 0
            jax.lax.fori_loop(0, nruns, body, 0)
        shape = (total // LANES, LANES)
    else:  # elems1d: element-granular offsets, deliberately odd-offset
        def kern(src_ref, dst_ref, x_hbm, o_hbm, sems):
            def mk(i):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(src_ref[0, i] * run_elems, run_elems)],
                    o_hbm.at[pl.ds(dst_ref[0, i] * run_elems, run_elems)],
                    sems.at[i % DEPTH])
            for i in range(min(DEPTH, nruns)):
                mk(i).start()
            def body(i, _):
                mk(i).wait()
                nxt = i + DEPTH
                @pl.when(nxt < nruns)
                def _():
                    mk(nxt).start()
                return 0
            jax.lax.fori_loop(0, nruns, body, 0)
        shape = (total,)
    x = jax.random.bits(jax.random.PRNGKey(0), shape, dtype=jnp.uint32)
    perm = jax.random.permutation(jax.random.PRNGKey(1), nruns).astype(jnp.int32)
    iden = jnp.arange(nruns, dtype=jnp.int32)
    f = jax.jit(lambda a, s, d: pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, nruns), lambda k: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, nruns), lambda k: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(s.reshape(1, -1), d.reshape(1, -1), a))
    try:
        out = jax.block_until_ready(f(x, perm, iden))
        xs = np.asarray(x).reshape(nruns, run_elems)
        ok = bool((np.asarray(out).reshape(nruns, run_elems)[np.asarray(perm)]
                   == xs).all()) if kind != "rows2d" else bool(
            (np.asarray(out).reshape(nruns, run_elems)
             [np.argsort(np.asarray(perm))] == xs).all())
        t = time_fn(f, x, perm, iden, iters=10)
        gb = total * 4 * 2 / 1e9  # read + write
        report(f"{kind} run={run_elems*4}B x{nruns}", t.ms, total,
               extra=f"{gb/t.seconds:6.1f} GB/s(r+w) correct={ok}")
    except Exception as e:
        print(f"{kind} run={run_elems*4}B FAIL {str(e)[:100]}")


# ---------------- D3: VMEM->VMEM DMA issue cost ----------------
def vmem_dma(run_elems, nruns=512):
    """Shuffle runs inside VMEM scratch; measures issue cost dominated rate."""
    rows_per_run = max(1, run_elems // LANES)
    R = nruns * rows_per_run
    DEPTH = 8
    def kern(x_ref, src_ref, o_ref, scratch, sems):
        scratch[...] = x_ref[...]
        def mk(i):
            return pltpu.make_async_copy(
                scratch.at[pl.ds(src_ref[0, i] * rows_per_run, rows_per_run), :],
                o_ref.at[pl.ds(i * rows_per_run, rows_per_run), :],
                sems.at[i % DEPTH])
        for i in range(min(DEPTH, nruns)):
            mk(i).start()
        def body(i, _):
            mk(i).wait()
            nxt = i + DEPTH
            @pl.when(nxt < nruns)
            def _():
                mk(nxt).start()
            return 0
        jax.lax.fori_loop(0, nruns, body, 0)
    x = jax.random.bits(jax.random.PRNGKey(0), (R, LANES), dtype=jnp.uint32)
    perm = jax.random.permutation(jax.random.PRNGKey(1), nruns).astype(jnp.int32)
    f = jax.jit(lambda a, s: pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nruns), lambda k: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((R, LANES), jnp.uint32),
                        pltpu.SemaphoreType.DMA((DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(a, s.reshape(1, -1)))
    try:
        out = jax.block_until_ready(f(x, perm))
        ok = bool((np.asarray(out).reshape(nruns, -1)
                   == np.asarray(x).reshape(nruns, -1)[np.asarray(perm)]).all())
        t = time_fn(f, x, perm, iters=20)
        ns_per_dma = t.seconds * 1e9 / nruns
        report(f"vmem dma run={rows_per_run*LANES*4}B x{nruns}", t.ms,
               R * LANES, extra=f"{ns_per_dma:7.1f} ns/dma correct={ok}")
    except Exception as e:
        print(f"vmem dma run={rows_per_run*LANES*4}B FAIL {str(e)[:100]}")


# ---------------- G1/G2: marginal fused gather cost ----------------
def chained(kind, K, R, W, NT):
    def kern(x_ref, i_ref, o_ref):
        x = x_ref[0]
        idx = i_ref[0]
        for _ in range(K):
            if kind == "sub":
                x = jnp.take_along_axis(x, idx, axis=0)
            else:
                x = jnp.take_along_axis(x, idx, axis=1)
        o_ref[...] = x[None]
    x = jax.random.bits(jax.random.PRNGKey(0), (NT, R, W), dtype=jnp.uint32)
    hi = R if kind == "sub" else W
    idx = jax.random.randint(jax.random.PRNGKey(1), (NT, R, W), 0, hi,
                             dtype=jnp.int32)
    spec = pl.BlockSpec((1, R, W), lambda k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda a, i: pl.pallas_call(
        kern, grid=(NT,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NT, R, W), jnp.uint32))(a, i))
    try:
        jax.block_until_ready(f(x, idx))
        t = time_fn(f, x, idx, iters=20)
        return t.ms
    except Exception as e:
        print(f"chained {kind} K={K} FAIL {str(e)[:90]}")
        return None


def marginal(kind, R, W, NT=64):
    a = chained(kind, 2, R, W, NT)
    b = chained(kind, 10, R, W, NT)
    if a is not None and b is not None:
        n = NT * R * W
        per = (b - a) / 8 * 1e9 / n * 1000
        print(f"G marginal {kind}-gather ({R},{W})"
              f"{'':24s} {per:7.1f} ps/elem/gather  (K2={a:.3f}ms K10={b:.3f}ms)")


CASES = {}
for re_ in (64, 256, 1024, 4096, 16384):
    CASES[f"d1_{re_}"] = functools.partial(dma_runs, "rows2d", re_)
for re_ in (512, 2048, 8192):
    CASES[f"d2_{re_}"] = functools.partial(dma_runs, "elems1d", re_)
for re_ in (128, 512, 2048):
    CASES[f"d3_{re_}"] = functools.partial(vmem_dma, re_)
CASES["g1"] = functools.partial(marginal, "sub", 8, 2048)
CASES["g2"] = functools.partial(marginal, "lane", 128, 128)

if __name__ == "__main__":
    import sys
    for name in (sys.argv[1:] or CASES):
        CASES[name]()

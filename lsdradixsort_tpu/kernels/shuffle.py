"""DMA run-shuffle — the TPU-native counterpart of the reference's global
scatter (LSDRadixSortKernel's `b[dst] = val`, LSDRadixSort.cu:831-836).

TPU vector units cannot scatter; the hardware that CAN move data to
arbitrary addresses at full bandwidth is the DMA engine. This kernel moves
**runs of whole 128-lane rows** between HBM buffers at dynamic, data-derived
offsets whose source/destination rows come from scalar-prefetch operands.
The fixed-size path keeps up to `DEPTH` copies outstanding; the
variable-length path decomposes each run by binary weight (one DMA per set
bit, drained as issued) since DMA shapes must be static.

Measured on TPU v5e: ~195 ns/DMA issue cost; 84 GB/s effective at 16 KB
runs, 205 GB/s at 64 KB runs (exp/probe_permute2.py) vs 310 GB/s straight
copy — so runs of >= 32-64 KB shuffle at near-roofline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEPTH = 8          # outstanding DMAs
MAX_LEN_BITS = 16  # run length < 2**MAX_LEN_BITS rows


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _shuffle_kernel(src_ref, dst_ref, len_ref, x_hbm, o_hbm, sems,
                    *, runs_per_step: int, total_runs: int,
                    in_rows: int, out_rows: int):
    step = pl.program_id(0)
    base = step * runs_per_step  # refs are per-step (8, rps//8) SMEM slices
    cols = runs_per_step // 8
    max_bits = min(MAX_LEN_BITS, min(in_rows, out_rows).bit_length() - 1)

    # One wave per length-bit so every in-flight DMA has the same static
    # size. Each DMA is started and drained immediately (no overlap): at
    # the >=4 KB run sizes this kernel targets, the measured rate is within
    # ~10% of the pipelined fixed-size path, so the simpler form stands.
    for bit in range(max_bits + 1):
        size = 1 << bit

        def wave(i, _, bit=bit, size=size):
            valid = jnp.logical_and(base + i < total_runs,
                                    (len_ref[i // cols, i % cols] & size) != 0)

            @pl.when(valid)
            def _():
                ln = len_ref[i // cols, i % cols]
                # chunk for this bit starts after all higher-bit chunks
                off = (ln >> (bit + 1)) << (bit + 1)
                dma = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(src_ref[i // cols, i % cols] + off, size), :],
                    o_hbm.at[pl.ds(dst_ref[i // cols, i % cols] + off, size), :],
                    sems.at[i % DEPTH],
                )
                dma.start()
                dma.wait()
            return 0
        jax.lax.fori_loop(0, runs_per_step, wave, 0)


def _shuffle_kernel_pipelined(src_ref, dst_ref, len_ref, x_hbm, o_hbm, sems,
                              *, runs_per_step: int, total_runs: int,
                              chunk_rows: int):
    """Fast path: all runs are exact multiples of `chunk_rows`; issue
    chunk-sized DMAs with DEPTH outstanding."""
    step = pl.program_id(0)
    base = step * runs_per_step
    cols = runs_per_step // 8

    def mkdma(i):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_ref[i // cols, i % cols], chunk_rows), :],
            o_hbm.at[pl.ds(dst_ref[i // cols, i % cols], chunk_rows), :],
            sems.at[i % DEPTH],
        )

    for i in range(min(DEPTH, runs_per_step)):
        @pl.when(base + i < total_runs)
        def _(i=i):
            mkdma(i).start()

    def body(i, _):
        @pl.when(base + i < total_runs)
        def _():
            mkdma(i).wait()
        nxt = i + DEPTH
        @pl.when(jnp.logical_and(nxt < runs_per_step,
                                 base + nxt < total_runs))
        def _():
            mkdma(nxt).start()
        return 0
    jax.lax.fori_loop(0, runs_per_step, body, 0)


def _shuffle_elem_kernel(src_ref, dst_ref, len_ref, x_hbm, o_hbm, sems,
                         *, runs_per_step: int, total_runs: int,
                         max_bits: int):
    step = pl.program_id(0)
    base = step * runs_per_step
    cols = runs_per_step // 8

    for bit in range(max_bits + 1):
        size = 1 << bit

        def wave(i, _, bit=bit, size=size):
            valid = jnp.logical_and(base + i < total_runs,
                                    (len_ref[i // cols, i % cols] & size) != 0)

            @pl.when(valid)
            def _():
                ln = len_ref[i // cols, i % cols]
                off = (ln >> (bit + 1)) << (bit + 1)
                dma = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(src_ref[i // cols, i % cols] + off, size)],
                    o_hbm.at[pl.ds(dst_ref[i // cols, i % cols] + off, size)],
                    sems.at[i % DEPTH],
                )
                dma.start()
                dma.wait()
            return 0
        jax.lax.fori_loop(0, runs_per_step, wave, 0)


@functools.partial(jax.jit, static_argnames=("out_elems", "runs_per_step",
                                             "max_len_bits", "interpret"))
def shuffle_elem_runs(x: jax.Array, src: jax.Array, dst: jax.Array,
                      run_len: jax.Array, out_elems: int,
                      runs_per_step: int = 256, max_len_bits: int = 16,
                      interpret: bool | None = None) -> jax.Array:
    """Element-granular run shuffle: out[dst[i]:dst[i]+len[i]] = x[src[i]:..].

    The 1-D sibling of shuffle_row_runs. Lengths decompose by binary
    weight; uncovered output elements are unspecified; lengths must be
    < 2**max_len_bits.

    ON-CHIP ALIGNMENT CONSTRAINT: Mosaic tiles 1-D refs at 1024 elements
    and rejects slices that are not 1024-aligned in offset and size
    ("Slice shape along dimension 0 must be aligned to tiling (1024)"), so
    on real TPUs every src/dst offset and every run length must be a
    multiple of 1024 (interpret mode accepts arbitrary values). This is
    also why a DMA can never fix up runs whose src and dst disagree
    mod-granule — copies preserve offset modulo the tile — and why the
    merge kernel (kernels/merge.py) re-aligns data with in-VMEM rolls
    before emitting. See ROADMAP.md §6.
    """
    if interpret is None:
        interpret = _interpret_default()
    nruns = src.shape[0]
    grid = (pl.cdiv(nruns, runs_per_step),)
    if runs_per_step % 8:
        raise ValueError("runs_per_step must be a multiple of 8")
    mb = min(max_len_bits, max(out_elems, 2).bit_length() - 1)
    kern = functools.partial(_shuffle_elem_kernel,
                             runs_per_step=runs_per_step, total_runs=nruns,
                             max_bits=mb)
    padded = grid[0] * runs_per_step
    pad = padded - nruns
    cols = runs_per_step // 8

    def _prep(a):
        a = a.astype(jnp.int32)
        if pad:
            a = jnp.pad(a, (0, pad))
        return a.reshape(grid[0] * 8, cols)
    run_spec = pl.BlockSpec((8, cols), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[run_spec, run_spec, run_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((out_elems,), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(_prep(src), _prep(dst), _prep(run_len), x)


@functools.partial(jax.jit, static_argnames=("out_rows", "runs_per_step",
                                             "fixed_rows", "interpret"))
def shuffle_row_runs(x: jax.Array, src_rows: jax.Array, dst_rows: jax.Array,
                     run_rows: jax.Array, out_rows: int,
                     runs_per_step: int = 256, fixed_rows: int = 0,
                     interpret: bool | None = None) -> jax.Array:
    """Copy row-runs of `x` to new offsets: the data movement of a radix pass.

    x: (rows, 128) uint32. For each run i:
        out[dst_rows[i] : dst_rows[i] + run_rows[i]] =
          x[src_rows[i] : src_rows[i] + run_rows[i]]
    Output rows not covered by any run are UNSPECIFIED (the HBM buffer is
    not zero-initialized); callers must cover every output row they read.
    `fixed_rows > 0` promises every run_rows[i] == fixed_rows (enables the
    fully pipelined path). Variable-length runs are decomposed by binary
    weight with lengths capped at 2**MAX_LEN_BITS rows: runs longer than
    65536 rows (8.4M elements) would be silently truncated — split such
    runs before calling.
    """
    if interpret is None:
        interpret = _interpret_default()
    nruns = src_rows.shape[0]
    grid = (pl.cdiv(nruns, runs_per_step),)
    if fixed_rows:
        kern = functools.partial(_shuffle_kernel_pipelined,
                                 runs_per_step=runs_per_step,
                                 total_runs=nruns, chunk_rows=fixed_rows)
    else:
        kern = functools.partial(_shuffle_kernel, runs_per_step=runs_per_step,
                                 total_runs=nruns, in_rows=x.shape[0],
                                 out_rows=out_rows)
    # pad the run tables to a grid multiple and slice one step's worth into
    # SMEM per grid step (full tables can exceed the 1 MB SMEM budget)
    padded = grid[0] * runs_per_step
    pad = padded - nruns
    if runs_per_step % 8:
        raise ValueError("runs_per_step must be a multiple of 8")
    cols = runs_per_step // 8

    def _prep(a):
        a = a.astype(jnp.int32)
        if pad:
            a = jnp.pad(a, (0, pad))
        # (8, cols) SMEM blocks satisfy the (8,·)-divisibility rule
        return a.reshape(grid[0] * 8, cols)
    run_spec = pl.BlockSpec((8, cols), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[run_spec, run_spec, run_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(_prep(src_rows), _prep(dst_rows), _prep(run_rows), x)

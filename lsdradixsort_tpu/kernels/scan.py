"""Exclusive prefix-sum (scan) Pallas kernels.

TPU-native reimplementation of the reference's scan family:

  * BlockPrefixSumKernel — per-block Blelloch up/down-sweep in shared memory
    with optional carry-out of block totals (LSDRadixSort.cu:141-207);
  * GPUPrefixSum — recursive multi-level scan + AddBlockSumsKernel fix-up
    (LSDRadixSort.cu:265-302).

The TPU design is different and simpler: Pallas grid steps execute
**sequentially** on a TensorCore, so a single kernel pass can thread an
inter-block carry through a VMEM scratch accumulator — the hierarchical
recursion and the fix-up kernel collapse into one sweep. Within a block the
scan is a row-cumsum (VPU log-steps across 128 lanes) plus a row-offset
cumsum down the sublanes; uint32 wraparound matches the golden model
bit-exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _signed(x):
    """View unsigned as signed: Mosaic has no unsigned reductions; int32
    modular adds are bit-identical to uint32."""
    if jnp.issubdtype(x.dtype, jnp.unsignedinteger):
        bits = jnp.iinfo(x.dtype).bits
        return x.astype(jnp.dtype(f"int{bits}"))
    return x


def _cumsum(x, axis: int):
    """Inclusive scan via log-step shifted adds (Hillis-Steele): Mosaic has
    no cumsum primitive. Requires x.shape[axis] to be a power of two."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    k = 1
    while k < n:
        rolled = pltpu.roll(x, k, axis)
        x = x + jnp.where(idx >= k, rolled, jnp.zeros_like(x))
        k *= 2
    return x


def _cumsum_lanes_mxu(x):
    """Inclusive lane cumsum of int32 (rows, 128) on the MXU, exact mod 2^32.

    Split into 8-bit planes (int8 matmul accumulates in int32 — exact
    integer arithmetic; f32 matmul is NOT bit-exact on TPU, it lowers to
    bf16 passes), multiply each by an upper-triangular ones matrix,
    recombine with wrapping int32 adds. Replaces 7 masked-roll VPU steps —
    the scan goes from VPU-bound toward HBM-bound.
    """
    rows, lanes = x.shape
    tri = (jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0) <=
           jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
           ).astype(jnp.int8)
    # byte planes are 0..255; int8 holds -128..127, so shift by -128 and add
    # the closed-form correction 128 * (lane_index + 1) back after the matmul
    corr = 128 * (jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1) + 1)
    out = jnp.zeros((rows, lanes), jnp.int32)
    for b in range(4):
        plane = (((x >> (8 * b)) & 0xFF) - 128).astype(jnp.int8)
        c = jax.lax.dot_general(plane, tri, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        out = out + ((c + corr) << (8 * b))
    return out


def _tile_exclusive_scan(tile):
    """Exclusive scan of a (rows, 128) tile in row-major element order.

    Returns (scanned_tile, tile_total) in the signed view of tile.dtype.
    """
    tile = _signed(tile)
    incl = _cumsum_lanes_mxu(tile)                              # within rows
    row_tot = incl[:, -1:]                                      # (rows, 1)
    # note: reshaping (rows,1) through (rows/128,128) to reuse the MXU path
    # fails Mosaic layout inference ("unsupported shape cast"); keep rolls
    row_off = _cumsum(row_tot, axis=0) - row_tot
    excl = incl - tile + row_off                                # exclusive
    total = row_off[-1:, :] + row_tot[-1:, :]                   # (1, 1)
    return excl, total


def _scan_kernel(x_ref, out_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0, 0] = jnp.zeros((), carry_ref.dtype)

    excl, total = _tile_exclusive_scan(x_ref[0])
    out_ref[...] = (excl + carry_ref[0, 0])[None].astype(out_ref.dtype)
    carry_ref[0, 0] = carry_ref[0, 0] + total[0, 0]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def exclusive_scan(x: jax.Array, block_rows: int = 512,
                   interpret: bool | None = None) -> jax.Array:
    """Exclusive prefix sum of a 1-D array (any length), grid-sequential.

    Replaces GPUPrefixSum + AddBlockSumsKernel (LSDRadixSort.cu:265-302)
    with a single carry-threaded sweep; no divisibility constraint (the
    reference silently requires count % threads_per_block == 0, cu:270).
    """
    if interpret is None:
        interpret = _interpret_default()
    n = x.shape[0]
    dtype = x.dtype
    block = block_rows * LANES
    padded = -(-n // block) * block
    if padded != n:
        x = jnp.pad(x, (0, padded - n))
    num_blocks = padded // block
    x3 = x.reshape(num_blocks, block_rows, LANES)
    out = pl.pallas_call(
        _scan_kernel,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec((1, block_rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, dtype),
        scratch_shapes=[
            pltpu.SMEM((1, 1), _signed(jnp.zeros((), dtype)).dtype)],
        interpret=interpret,
    )(x3)
    return out.reshape(padded)[:n]


def _block_totals_kernel(x_ref, sums_ref, *, bpg: int):
    for b in range(bpg):
        sums_ref[b] = jnp.sum(_signed(x_ref[b]))[None, None].astype(
            sums_ref.dtype)


def _scan_fixup_kernel(x_ref, off_ref, out_ref, *, bpg: int):
    for b in range(bpg):
        excl, _ = _tile_exclusive_scan(x_ref[b])
        out_ref[b] = (excl + _signed(off_ref[b, 0])).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def exclusive_scan_hierarchical(x: jax.Array, block_rows: int = 512,
                                interpret: bool | None = None) -> jax.Array:
    """Exclusive prefix sum via the reference's hierarchical decomposition
    (GPUPrefixSum, cu:265-302), TPU-shaped: (1) per-block totals (pure-read
    pass, fully pipelined), (2) tiny top-level scan in XLA, (3) per-block
    scan + offset add (independent steps, fully pipelined).

    Unlike the grid-sequential carry scan, no step depends on the previous
    one, so the Pallas pipeline overlaps DMA with compute across the whole
    grid: ~2x faster at 2^27 despite moving 3n instead of 2n bytes.
    """
    if interpret is None:
        interpret = _interpret_default()
    n = x.shape[0]
    dtype = x.dtype
    block = block_rows * LANES
    padded = -(-n // block) * block
    if padded != n:
        x = jnp.pad(x, (0, padded - n))
    num_blocks = padded // block
    # amortize the per-grid-step pipeline overhead: >=1 MB of data per step
    bpg = max(1, (1 << 20) // (block * 4))
    while num_blocks % bpg:
        bpg -= 1
    x3 = x.reshape(num_blocks, block_rows, LANES)
    sums = pl.pallas_call(
        functools.partial(_block_totals_kernel, bpg=bpg),
        grid=(num_blocks // bpg,),
        in_specs=[pl.BlockSpec((bpg, block_rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bpg, 1, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks, 1, 1), dtype),
        interpret=interpret,
    )(x3).reshape(num_blocks)
    offsets = (jnp.cumsum(sums, dtype=dtype) - sums).reshape(num_blocks, 1, 1)
    out = pl.pallas_call(
        functools.partial(_scan_fixup_kernel, bpg=bpg),
        grid=(num_blocks // bpg,),
        in_specs=[pl.BlockSpec((bpg, block_rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bpg, 1, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bpg, block_rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, dtype),
        interpret=interpret,
    )(x3, offsets)
    return out.reshape(padded)[:n]


def _block_scan_kernel(x_ref, out_ref, sums_ref):
    excl, total = _tile_exclusive_scan(x_ref[0])
    out_ref[...] = excl[None].astype(out_ref.dtype)
    sums_ref[...] = total[None].astype(sums_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def block_prefix_sums(x: jax.Array, block_size: int,
                      interpret: bool | None = None):
    """Independent exclusive scan of each block + per-block totals.

    Mirrors BlockPrefixSumKernel with carry-out (LSDRadixSort.cu:180-207):
    returns (scans, block_sums) where scans[i*B:(i+1)*B] is the exclusive
    scan of block i and block_sums[i] its total. Requires n % block_size == 0
    and block_size % 128 == 0.
    """
    if interpret is None:
        interpret = _interpret_default()
    n = x.shape[0]
    if n % block_size or block_size % LANES:
        raise ValueError(f"n={n} must be divisible by block_size={block_size},"
                         f" block_size by {LANES}")
    rows = block_size // LANES
    num_blocks = n // block_size
    x3 = x.reshape(num_blocks, rows, LANES)
    scans, sums = pl.pallas_call(
        _block_scan_kernel,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x3.shape, x.dtype),
            jax.ShapeDtypeStruct((num_blocks, 1, 1), x.dtype),
        ],
        interpret=interpret,
    )(x3)
    return scans.reshape(n), sums.reshape(num_blocks)

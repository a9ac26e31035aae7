"""Per-block digit histogram Pallas kernels.

TPU-native reimplementation of BuildHistogramsKernel (reference:
LSDRadixSort.cu:660-702). The CUDA kernel zero-inits 2^r shared-memory
counters and `atomicInc`s them per element; TPU has no atomics, so we count
with a **byte-packed accumulator** trick on the VPU:

  * each uint32 accumulator lane packs 4 byte-counters (4 digit bins);
  * an element of digit d adds (1 << ((d % 4) * 8)) to accumulator d // 4,
    selected by comparing d // 4 against the accumulator id;
  * rows are summed in chunks of <=248 so a byte-counter can never overflow
    (each lane sees at most `rows` elements per chunk);
  * the packed per-lane counters are unpacked and lane-reduced at the end.

This costs ~3 VPU ops per element per 4 bins — for 4-bit digits ~15 ops/elem,
within striking distance of the HBM read roofline, with zero MXU use and no
atomics. Layout: the key stream is viewed as (num_blocks * ROWS, 128); one
grid step = one block of (ROWS, 128) = `block_size` keys.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Max rows summed before unpacking. Counting runs in int32 (Mosaic has no
# unsigned reductions), so the packed value must stay positive: the top byte
# counter (<= rows per chunk) must stay < 128. Must be a multiple of 8 so
# chunk slice offsets stay sublane-aligned.
_MAX_CHUNK_ROWS = 112


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _hist_kernel(keys_ref, out_ref, *, r: int, group: int, rows: int,
                 bpg: int, counter_bits: int):
    """Histogram `bpg` blocks per grid step (amortizes the ~2.5 us/step
    pipeline overhead that dominates single-block launches).

    counter_bits picks the packing: 8 (4 byte-counters/u32, chunks of 112
    rows) or 4 (8 nibble-counters/u32, chunks of 8 rows — HALF the
    accumulator planes, so ~half the dominant one-hot compare/select/add
    cost at r=8; the sign bit is harmless because unpack masks after the
    arithmetic shift). The one-hot loop is Theta(bins/slots) per element
    either way — ROADMAP.md SS5.

    cb=4 unpack is TWO-LEVEL (r5): the per-chunk nibble-packed totals are
    split once into two byte-packed accumulators (even/odd nibble slots,
    5 ops per plane per chunk) which absorb up to 15 chunks before the
    full i32 unpack — the old per-chunk (naccs, slots, LANES) unpack was
    ~96 ops/elem, half the whole kernel's VPU work (VERDICT r4 #6); the
    two-level form cuts it to ~2.5 ops/elem amortized. Byte counters
    stay < 128 (8 elems/chunk x 15 chunks), so the i32 sign bit is never
    touched. Why not the MXU: an int8 one-hot matmul contracts one
    element per systolic row (the one-hot matrix is data-dependent and
    full-rank, so elements cannot share contraction rows without the
    lane->sublane relayout Mosaic cannot lower) — measured 2.5x SLOWER
    at 16x16 outputs (exp/probe_hist_mxu.py, round 1; ROADMAP SS5).
    """
    bins = 1 << r
    cb = counter_bits
    slots = 32 // cb
    naccs = (bins + slots - 1) // slots
    # chunk rows: any single counter sees <= chunk elements per lane, and
    # must fit counter_bits; keep chunks sublane-aligned (multiples of 8)
    chunk_rows = _MAX_CHUNK_ROWS if cb == 8 else 8
    shift = jnp.uint32(r * group)
    mask = jnp.uint32(bins - 1)
    n_chunks = (rows + chunk_rows - 1) // chunk_rows
    # everything below is pure broadcasting — Mosaic supports neither
    # concatenate of small vectors nor dynamic_update_slice in kernels
    acc_iota = jax.lax.broadcasted_iota(jnp.int32, (naccs, 1, 1), 0)
    slot_shift = cb * jax.lax.broadcasted_iota(jnp.int32, (1, slots, 1), 1)
    slot_mask = jnp.int32((1 << cb) - 1)
    sbits = cb.bit_length() - 1          # log2(counter_bits)
    SUPER = 15                           # chunks absorbed per byte-level
    nib_mask = jnp.int32(0x0F0F0F0F)
    byte_shift = 8 * jax.lax.broadcasted_iota(jnp.int32, (1, 4, 1), 1)
    for b in range(bpg):
        keys = keys_ref[b]  # (rows, LANES)
        digits = jnp.bitwise_and(jnp.right_shift(keys, shift),
                                 mask).astype(jnp.int32)
        # packed one-hot increment: slot (d % slots), accumulator (d // slots)
        inc = jnp.left_shift(jnp.int32(1),
                             jnp.left_shift(jnp.bitwise_and(digits, slots - 1),
                                            sbits))
        acc_id = jnp.right_shift(digits, 5 - sbits)

        def chunk_packed(c):
            lo = c * chunk_rows
            hi = min(lo + chunk_rows, rows)
            # slice in 2-D before broadcasting: Mosaic mislowers sublane
            # slices of 3-D broadcasts to shape-mismatched gathers
            aid_c, inc_c = acc_id[lo:hi], inc[lo:hi]
            # (naccs, chunk_rows, LANES): each element contributes its
            # packed one-hot counter to exactly one accumulator plane
            contrib = jnp.where(aid_c[None] == acc_iota, inc_c[None],
                                jnp.int32(0))
            return jnp.sum(contrib, axis=1)                # (naccs, LANES)

        if cb == 8:
            lane_tot = jnp.zeros((naccs, slots, LANES), jnp.int32)
            for c in range(n_chunks):
                packed = chunk_packed(c)
                lane_tot = lane_tot + jnp.bitwise_and(
                    jnp.right_shift(packed[:, None, :], slot_shift),
                    slot_mask)
            # (naccs, slots): row-major flatten (outside the kernel — in-
            # kernel sublane->lane relayouts lower poorly) is bin order
            # slots*a + j
            out_ref[b] = jnp.sum(lane_tot, axis=2).astype(jnp.uint32)
        else:
            # two-level: nibble chunks -> byte accumulators -> i32 planes
            lt_even = jnp.zeros((naccs, 4, LANES), jnp.int32)
            lt_odd = jnp.zeros((naccs, 4, LANES), jnp.int32)
            for sc in range(0, n_chunks, SUPER):
                beven = jnp.zeros((naccs, LANES), jnp.int32)
                bodd = jnp.zeros((naccs, LANES), jnp.int32)
                for c in range(sc, min(sc + SUPER, n_chunks)):
                    packed = chunk_packed(c)
                    beven = beven + jnp.bitwise_and(packed, nib_mask)
                    bodd = bodd + jnp.bitwise_and(
                        jnp.right_shift(packed, 4), nib_mask)
                lt_even = lt_even + jnp.bitwise_and(
                    jnp.right_shift(beven[:, None, :], byte_shift), 0xFF)
                lt_odd = lt_odd + jnp.bitwise_and(
                    jnp.right_shift(bodd[:, None, :], byte_shift), 0xFF)
            # two outputs in byte-slot order; the host interleaves them
            # back to nibble-slot (bin) order — in-kernel interleave would
            # need a concatenate Mosaic doesn't lower
            out_ref[b, 0] = jnp.sum(lt_even, axis=2).astype(jnp.uint32)
            out_ref[b, 1] = jnp.sum(lt_odd, axis=2).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("r", "group", "block_size",
                                             "counter_bits", "interpret"))
def block_digit_histograms(keys: jax.Array, r: int, group: int,
                           block_size: int, counter_bits: int = 8,
                           interpret: bool | None = None) -> jax.Array:
    """Per-block digit histograms: (num_blocks, 2**r) uint32.

    Block i's row counts r-bit digit `group` occurrences among
    keys[i*block_size:(i+1)*block_size] — the exact contract of
    BuildHistogramsKernel (LSDRadixSort.cu:660-702). Requires
    len(keys) % block_size == 0 and block_size % 128 == 0.
    counter_bits: 8 (byte-packed) or 4 (nibble-packed — half the one-hot
    planes, ~2x fewer VPU ops at r=8; see _hist_kernel).
    """
    n = keys.shape[0]
    if n % block_size or block_size % LANES:
        raise ValueError(
            f"n={n} must be divisible by block_size={block_size}, "
            f"block_size by {LANES}")
    if counter_bits not in (4, 8):
        raise ValueError(f"counter_bits must be 4 or 8, got {counter_bits}")
    bins = 1 << r
    rows = block_size // LANES
    num_blocks = n // block_size
    if interpret is None:
        interpret = _interpret_default()
    # 3-D layout: block dims (1, rows, LANES) / (1, naccs, slots) always
    # satisfy the TPU constraint that a block's last two dims be
    # (8,128)-divisible or equal to the array dims.
    slots = 32 // counter_bits
    naccs = (bins + slots - 1) // slots
    # blocks per grid step: target >= 1 MB of keys per step to amortize the
    # per-step pipeline overhead; must divide num_blocks
    bpg = max(1, (1 << 20) // (block_size * 4))
    while num_blocks % bpg:
        bpg -= 1
    grid = (num_blocks // bpg,)
    kern = functools.partial(_hist_kernel, r=r, group=group, rows=rows,
                             bpg=bpg, counter_bits=counter_bits)
    in_spec = pl.BlockSpec((bpg, rows, LANES), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    if counter_bits == 8:
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[in_spec],
            out_specs=pl.BlockSpec((bpg, naccs, slots), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_blocks, naccs, slots),
                                           jnp.uint32),
            interpret=interpret,
        )(keys.reshape(num_blocks, rows, LANES))
        return out.reshape(num_blocks, naccs * slots)[:, :bins]
    # cb=4 two-level kernel emits byte-slot-major (parity, accs, 4);
    # interleave back to nibble-slot (bin) order on the host side
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((bpg, 2, naccs, 4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks, 2, naccs, 4),
                                       jnp.uint32),
        interpret=interpret,
    )(keys.reshape(num_blocks, rows, LANES))
    # [b, parity, a, jb] -> bin = 8*a + 2*jb + parity
    out = jnp.moveaxis(out, 1, 3).reshape(num_blocks, naccs * slots)
    return out[:, :bins]


@functools.partial(jax.jit, static_argnames=("r", "group", "interpret"))
def digit_histogram(keys: jax.Array, r: int, group: int,
                    interpret: bool | None = None) -> jax.Array:
    """Whole-array digit histogram: (2**r,) uint32 (sum of block histograms)."""
    n = keys.shape[0]
    # pick a block size that divides n; fall back to one block
    block = _pick_block(n)
    h = block_digit_histograms(keys, r, group, block, interpret=interpret)
    return jnp.sum(h, axis=0, dtype=jnp.uint32)


def _pick_block(n: int) -> int:
    for block in (1 << 17, 1 << 15, 1 << 13, 1 << 10, 1 << 8, LANES):
        if n % block == 0:
            return block
    raise ValueError(f"n={n} must be a multiple of {LANES}")

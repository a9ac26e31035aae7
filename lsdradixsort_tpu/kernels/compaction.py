"""Streaming order-preserving compaction — the filter operator's engine.

Replaces the full-length `jax.lax.sort` spelling of compaction
(ops/filter.py round 1, ~0.18 Gelem/s) with a single sequential-grid
Pallas pass (VERDICT r1 #6): per 32K-element tile,

  1. build the composite key (!pred << 15 | position) and run the in-VMEM
     bitonic network with the data riding — selected elements float to the
     tile front in original order (a stable partition);
  2. prepend the carry (the <128 leftover elements of previous tiles) via
     a bit-decomposed flat roll;
  3. DMA out every complete 128-lane row at the running output cursor and
     keep the new <128-element remainder as the carry.

The carry (output cursor, pending count, pending row) lives in SMEM/VMEM
scratch that persists across the sequential grid — the same pattern as the
carry-threaded scan (kernels/scan.py). Output rows past ceil(count/128)
are unspecified, matching ops/filter.compact's contract.

Reference parity: this is the TPU spelling of what a CUDA stream
compaction does with atomics/scatter; the reference has no filter op (it
is a north-star extension, BASELINE config 3).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.kernels.tile_sort import bitonic_network

LANES = 128
TILE_ROWS = 256                 # 32K elements per grid step
SPILL_ROWS = 8                  # room for the <128-element carry prepend


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _shift_flat_right(x, s: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rolled = pltpu.roll(x, s, 1)
    prev = pltpu.roll(rolled, 1, 0)
    return jnp.where(lane >= s, rolled, prev)


def _compact_kernel(m_ref, *refs, rows: int, ntiles: int, k: int):
    """k-stream compaction grid step: one bitonic partition of the
    composite (predicate, position) key with all k payload streams riding,
    then per-stream carry-prepend + row-aligned DMA emit. refs layout:
    x_refs[k], o_hbms[k], ebufs[k], pends[k], carry, sems."""
    x_refs = refs[:k]
    o_hbms = refs[k:2 * k]
    ebufs = refs[2 * k:3 * k]
    pends = refs[3 * k:4 * k]
    carry = refs[4 * k]
    sems = refs[4 * k + 1]
    step = pl.program_id(0)
    erows = rows + SPILL_ROWS

    @pl.when(step == 0)
    def _():
        carry[0] = jnp.int32(0)      # output row cursor
        carry[1] = jnp.int32(0)      # pending element count
        for pend in pends:
            pend[...] = jnp.zeros((SPILL_ROWS, LANES), jnp.uint32)

    mask = m_ref[0].reshape(rows, LANES)
    datas = [x_ref[0].reshape(rows, LANES).astype(jnp.int32)
             for x_ref in x_refs]
    pos = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1))
    comp = jnp.where(mask != 0, pos, pos + rows * LANES)
    comp, sorted_datas = bitonic_network(comp, datas, rows,
                                         compare_val=False)
    cnt = jnp.sum((mask != 0).astype(jnp.int32))

    np_ = carry[1]
    orow = carry[0]
    total = np_ + cnt
    emit = total >> 7
    last = step == ntiles - 1
    emit_n = jnp.where(last, (total + LANES - 1) >> 7, emit)
    row = jax.lax.broadcasted_iota(jnp.int32, (erows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (erows, LANES), 1)

    for si in range(k):
        ebuf, pend = ebufs[si], pends[si]
        # place sorted tile into ebuf rows [0, rows), zero the spill rows,
        # then flat-roll right by the pending count so the leftover
        # elements' slot opens up at the front (the roll spills into the
        # zeroed rows instead of wrapping data away)
        ebuf[pl.ds(0, rows), :] = sorted_datas[si].astype(jnp.uint32)
        ebuf[pl.ds(rows, SPILL_ROWS), :] = jnp.zeros((SPILL_ROWS, LANES),
                                                     jnp.uint32)
        x = ebuf[...]
        for j in range(6, -1, -1):
            sz = 1 << j
            x = jnp.where((np_ & sz) != 0, _shift_flat_right(x, sz), x)
        pj = jnp.broadcast_to(pend[0:1, :], (erows, LANES))
        x = jnp.where((row == 0) & (lane < np_), pj, x)
        # on the final tile, zero the tail of the partial row (emitted too)
        x = jnp.where(last & (row * LANES + lane >= total), jnp.uint32(0), x)
        ebuf[...] = x

    for j in range(erows.bit_length() - 1, -1, -1):
        sz = 1 << j

        @pl.when((emit_n & sz) != 0)
        def _(j=j, sz=sz):
            pref = (emit_n >> (j + 1)) << (j + 1)
            dmas = [pltpu.make_async_copy(
                ebufs[si].at[pl.ds(pref, sz), :],
                o_hbms[si].at[pl.ds(orow + pref, sz), :],
                sems.at[si]) for si in range(k)]
            for dma in dmas:
                dma.start()
            for dma in dmas:
                dma.wait()

    # keep the remainder (< 128 elements) as the new pending row: roll the
    # buffer up by `emit` rows and take row 0
    for si in range(k):
        x = ebufs[si][...]
        for j in range(erows.bit_length() - 1, -1, -1):
            sz = 1 << j
            x = jnp.where((emit & sz) != 0, pltpu.roll(x, erows - sz, 0), x)
        pends[si][...] = x[0:SPILL_ROWS, :]
    carry[0] = orow + emit
    carry[1] = total & (LANES - 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_stream_multi(mask: jax.Array, xs,
                         interpret: bool | None = None):
    """Order-preserving compaction of k streams by one mask, in ONE pass.

    xs: tuple/list of (n,) uint32 arrays. Returns a list of packed (n,)
    uint32 arrays: in each, the first sum(mask) elements are that stream's
    selected elements in original order; the tail is unspecified. n must
    be a multiple of 32768 (ops/filter pads with mask=0). The bitonic
    partition runs once with all payloads riding — k-stream cost is far
    below k single-stream passes."""
    if interpret is None:
        interpret = _interpret_default()
    xs = list(xs)
    k = len(xs)
    n = xs[0].shape[0]
    rows = TILE_ROWS
    tile = rows * LANES
    if n % tile:
        raise ValueError(f"n={n} must be a multiple of {tile}")
    nt = n // tile
    kern = functools.partial(_compact_kernel, rows=rows, ntiles=nt, k=k)
    spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32)
    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[spec] * (1 + k),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_shape=[shape] * k,
        scratch_shapes=(
            [pltpu.VMEM((rows + SPILL_ROWS, LANES), jnp.uint32)] * k
            + [pltpu.VMEM((SPILL_ROWS, LANES), jnp.uint32)] * k
            + [pltpu.SMEM((2,), jnp.int32),
               pltpu.SemaphoreType.DMA((max(k, 1),))]),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mask.astype(jnp.uint32).reshape(nt, rows, LANES),
      *[x.reshape(nt, rows, LANES) for x in xs])
    outs = outs if isinstance(outs, (tuple, list)) else [outs]
    return [o.reshape(n) for o in outs]


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_stream(mask: jax.Array, x: jax.Array,
                   interpret: bool | None = None) -> jax.Array:
    """Order-preserving compaction of x by mask (uint32/bool 0/1).

    Returns packed (n,) uint32: the first sum(mask) elements are x's
    selected elements in original order; the tail is unspecified. n must
    be a multiple of 32768 (ops/filter pads with mask=0).
    """
    return compact_stream_multi(mask, [x], interpret=interpret)[0]

"""Fill-forward (last-flagged-row broadcast) Pallas kernel.

The segmented-broadcast primitive behind the join: given rows sorted so
that each key's unique "source" row (the build row) precedes its consumers
(probe rows), propagate the source row's (key, value) to every following
row. Consumers check `key == own_key` to know whether the nearest source
actually belongs to their run.

Both obvious XLA spellings are unusable at scale on TPU:
`jax.lax.associative_scan` never finishes compiling at >=2^24 rows, and
cummax-of-positions + gather costs ~15 ns/row (XLA gather). This kernel
does it in one sweep: within a (rows,128) tile, log2(T) masked roll steps
implement the flat-order "copy last valid forward" recurrence; a
grid-sequential SMEM carry threads the last source row across tiles
(same pattern as the carry scan, kernels/scan.py).

Cost: ~16 steps x ~12 VPU ops ~ 0.05 ns/row + HBM traffic — two orders of
magnitude under the gather spelling.
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


def _shift_flat(x, s: int, rows: int):
    """Value at flat row-major position f - s (garbage for f < s)."""
    if s % LANES == 0:
        return pltpu.roll(x, s // LANES, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rolled = pltpu.roll(x, s % LANES, 1)
    # elements whose lane wrapped need the previous row's value
    fixed = pltpu.roll(rolled, (s // LANES) + 1, 0)
    same = pltpu.roll(rolled, s // LANES, 0)
    return jnp.where(lane >= (s % LANES), same, fixed)


def _ff_kernel(flag_ref, key_ref, val_ref, okey_ref, oval_ref, ovalid_ref,
               carry_ref, *, rows: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = jnp.zeros((), jnp.int32)   # carry_valid
        carry_ref[1] = jnp.zeros((), jnp.int32)   # carry_key
        carry_ref[2] = jnp.zeros((), jnp.int32)   # carry_val

    valid = flag_ref[0].astype(jnp.int32)         # (rows, LANES) 0/1
    key = key_ref[0].astype(jnp.int32)
    val = val_ref[0].astype(jnp.int32)
    # zero out non-source entries so unfilled slots are well-defined
    key = jnp.where(valid == 1, key, 0)
    val = jnp.where(valid == 1, val, 0)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1))
    s = 1
    n = rows * LANES
    while s < n:
        # mask the wrap-around: positions f < s have no predecessor f - s
        pv = jnp.where(flat >= s, _shift_flat(valid, s, rows), 0)
        pk = _shift_flat(key, s, rows)
        pl_ = _shift_flat(val, s, rows)
        take = valid == 0
        key = jnp.where(take & (pv == 1), pk, key)
        val = jnp.where(take & (pv == 1), pl_, val)
        valid = jnp.where(take, pv, valid)
        s *= 2
    # rows before this tile's first source take the carried source
    cv, ck, cl = carry_ref[0], carry_ref[1], carry_ref[2]
    key = jnp.where(valid == 1, key, ck)
    val = jnp.where(valid == 1, val, cl)
    valid = jnp.maximum(valid, cv)
    okey_ref[...] = key[None].astype(jnp.uint32)
    oval_ref[...] = val[None].astype(jnp.uint32)
    ovalid_ref[...] = valid[None].astype(jnp.uint32)
    carry_ref[0] = valid[rows - 1, LANES - 1]
    carry_ref[1] = key[rows - 1, LANES - 1]
    carry_ref[2] = val[rows - 1, LANES - 1]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fill_forward_last(flag: jax.Array, key: jax.Array, val: jax.Array,
                      tile_rows: int = 512, interpret: bool | None = None):
    """For each row i: the (key, val) of the last row j <= i with flag[j],
    plus a validity mask (0 until the first flagged row).

    flag: bool/int (n,); key/val: uint32 (n,). n is padded internally to a
    tile multiple (padding rows are unflagged and their outputs dropped).
    Returns (keys, vals, valid) each (n,) uint32.
    """
    if interpret is None:
        interpret = _interpret_default()
    n = flag.shape[0]
    tile = tile_rows * LANES
    padded = -(-n // tile) * tile
    pad = padded - n
    f = jnp.pad(flag.astype(jnp.uint32), (0, pad))
    k = jnp.pad(key, (0, pad))
    v = jnp.pad(val, (0, pad))
    nt = padded // tile
    spec = pl.BlockSpec((1, tile_rows, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((nt, tile_rows, LANES), jnp.uint32)
    ok, ov, ovalid = pl.pallas_call(
        functools.partial(_ff_kernel, rows=tile_rows),
        grid=(nt,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[shape, shape, shape],
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )(f.reshape(nt, tile_rows, LANES), k.reshape(nt, tile_rows, LANES),
      v.reshape(nt, tile_rows, LANES))
    return (ok.reshape(padded)[:n], ov.reshape(padded)[:n],
            ovalid.reshape(padded)[:n])

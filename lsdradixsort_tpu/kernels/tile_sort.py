"""Stable in-VMEM tile sort — the TPU counterpart of the reference's
block-local sort kernel (SMEMLSDBinaryRadixSort / LSDBinaryRadixSortKernel,
LSDRadixSort.cu:373-421).

The CUDA kernel sorts one thread-block's elements in shared memory with a
bit-serial split (scan + scatter per bit). TPU has no scatter, so the
equivalent primitive is a **vectorized bitonic network run entirely in
VMEM**: compare-exchange partners are fetched with lane/sublane rotations
(`pltpu.roll`), all patterns are static, and the whole tile sorts in
log^2(T) stages of pure VPU work — zero HBM traffic between stages.

Stability: keys are compared as bias-flipped int32 (order-isomorphic to
uint32) with the value stream as tie-break. When values are the element's
global index (as in `argsort` or the sort pipelines), ties resolve by
original position, which makes the tile sort **stable** — verified
bit-exactly against numpy's stable argsort on the real chip.

Measured on TPU v5e (BENCHMARKS.md): 0.97 Gelem/s stable kv at
16K-element tiles, 1.54 Gelem/s keys-only — vs the reference's
1K-element smem blocks.
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


def _as_val_list(val):
    """Normalize the payload argument: None | array | tuple/list of arrays
    -> (list, was_single)."""
    if val is None:
        return [], False
    if isinstance(val, (tuple, list)):
        return list(val), False
    return [val], True


# ce='auto' policy: the 2026-08-19 on-chip stage probe (exp/
# probe_ce_reshape.py) has reshape-halves winning at rd=8 (53 vs 95
# ps/elem/stage keys) through rd=64 (47 vs 208 kv), and roll winning at
# rd=1024 (47 vs 51 keys, 54 vs 66 kv) — pick per stage by distance.
AUTO_RESHAPE_MAX_DIST = 64 * LANES

CE_MODES = ("roll", "reshape", "auto")


def use_reshape_ce(ce: str, dist: int) -> bool:
    """Static per-stage choice of the half-split CE formulation.

    ce must be one of CE_MODES: 'roll' (rotation-based pair fetch),
    'reshape' (half-split view for every row stage), or 'auto' (reshape
    for 8*LANES <= dist <= AUTO_RESHAPE_MAX_DIST, roll elsewhere — the
    measured per-distance winner).
    """
    if ce not in CE_MODES:
        raise ValueError(f"ce={ce!r}: pick from {CE_MODES}")
    return dist >= 8 * LANES and (
        ce == "reshape"
        or (ce == "auto" and dist <= AUTO_RESHAPE_MAX_DIST))


def lex_lt_eq(key, vals, pk, pvs, ncmp: int):
    """Strict lexicographic compare over the first ncmp streams:
    returns (lt, eq) where lt = (pk, pvs[:ncmp-1]) < (key, vals[:ncmp-1])
    and eq = full compared-tuple equality. ncmp=1 compares keys only;
    ncmp=3 is the 64-bit (hi, lo, pos) single-chain compare."""
    lt = pk < key
    eq = pk == key
    for i in range(ncmp - 1):
        lt = lt | (eq & (pvs[i] < vals[i]))
        eq = eq & (pvs[i] == vals[i])
    return lt, eq


def ce_swap_mask(key, vals, pk, pvs, want_small, ncmp: int):
    """The unified compare-exchange decision. Streams beyond the compared
    prefix ride uncompared; when such riders exist the two pair halves
    must agree on exact compared-tuple ties or a tie would duplicate one
    riding value and drop another — never swap on ties (strict compares in
    the half's preferred direction). With no riders a plain swap is exact
    (tied rows are then identical and interchangeable)."""
    lt, eq = lex_lt_eq(key, vals, pk, pvs, ncmp)
    if len(vals) > ncmp - 1:          # riding streams: never swap on ties
        gt = ~lt & ~eq
        # boolean algebra, not jnp.where: a bool-valued select lowers to
        # an i8 select + i8->i1 trunci, which the chipless Mosaic AOT
        # compiler rejects ("Unsupported target bitwidth for truncation",
        # 2026-08-20 — this line was the whole query-suite compile crash)
        return (want_small & lt) | (~want_small & gt)
    return lt == want_small


def ce_stage_reshape(key, val, rd: int, desc_bit: int | None, rows: int,
                     compare_val: bool = True, ncmp: int | None = None):
    """One compare-exchange stage at row distance rd (rd >= 8, a whole
    number of sublane tiles) via the static (g, 2, rd, LANES) half-split
    view: compare the two halves directly and re-stack — 1 compare + 2
    selects per stream vs the roll formulation's 2 rolls + compare + 2
    selects. desc_bit: bit of the group index whose set value makes the
    pair descending (None = all ascending). Ties never swap (each pair is
    evaluated once here, so tie consistency is automatic).

    val may be a single payload array or a tuple/list of them; the first
    ncmp-1 payloads are comparison tiebreaks (default: 1 iff compare_val).
    """
    vals, single = _as_val_list(val)
    if ncmp is None:
        ncmp = 2 if (compare_val and vals) else 1
    g = rows // (2 * rd)
    k4 = key.reshape(g, 2, rd, LANES)
    a, b = k4[:, 0], k4[:, 1]
    halves = [(v.reshape(g, 2, rd, LANES)[:, 0],
               v.reshape(g, 2, rd, LANES)[:, 1]) for v in vals]
    t, _ = lex_lt_eq(a, [h[0] for h in halves],
                     b, [h[1] for h in halves], ncmp)
    if desc_bit is not None:
        gi = jax.lax.broadcasted_iota(jnp.int32, (g, rd, LANES), 0)
        t = t ^ (((gi >> desc_bit) & 1) != 0)
    key = jnp.stack([jnp.where(t, b, a), jnp.where(t, a, b)],
                    axis=1).reshape(rows, LANES)
    out_vals = [jnp.stack([jnp.where(t, bv, av), jnp.where(t, av, bv)],
                          axis=1).reshape(rows, LANES)
                for av, bv in halves]
    if not vals:
        return key, None
    return key, (out_vals[0] if single else out_vals)


def bitonic_network(key, val, rows: int, compare_val: bool = True,
                    seg_elems: int | None = None, ce: str = "roll",
                    ncmp: int | None = None):
    """In-kernel bitonic sorting network on a (rows, 128) int32 key array
    with an optional riding payload. Usable from any Pallas kernel body.

    key: (rows, 128) int32 (caller applies the uint32 order-isomorphic
    bias if needed). val: payload — a single array or a tuple/list of
    arrays riding the exchanges; the FIRST is compared as tiebreak iff
    compare_val (pass unique values for stability). seg_elems limits the
    network to sorting each seg_elems-sized row-major segment
    independently (the segmented form used by compaction / bucket sorts).
    ce selects the compare-exchange formulation per stage: 'roll'
    (rotation pair fetch, default), 'reshape' (half-split view for every
    row stage, dist >= 1024), or 'auto' (reshape only for 8*LANES <= dist
    <= AUTO_RESHAPE_MAX_DIST where the on-chip probe has it winning, roll
    elsewhere). ncmp: number of compared streams (key + first ncmp-1
    payloads, lexicographic) — ncmp=3 with a unique third stream is the
    64-bit single-chain (hi, lo, pos) sort; default matches compare_val.
    """
    vals, single = _as_val_list(val)
    if ncmp is None:
        ncmp = 2 if (compare_val and vals) else 1
    n = rows * LANES
    seg = seg_elems or n
    flat = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1))
    nbits = seg.bit_length() - 1
    for kph in range(1, nbits + 1):
        for j in range(kph - 1, -1, -1):
            dist = 1 << j
            if use_reshape_ce(ce, dist):
                key, vals = ce_stage_reshape(
                    key, vals, dist // LANES,
                    kph - 1 - j if kph < nbits else None, rows,
                    compare_val, ncmp=ncmp)
                vals = [] if vals is None else vals
                continue
            is_lower = (flat & dist) == 0
            if kph < nbits:
                asc = (flat & (1 << kph)) == 0
                want_small = is_lower == asc
            else:
                want_small = is_lower
            if dist < LANES:
                pk = jnp.where(is_lower, pltpu.roll(key, LANES - dist, 1),
                               pltpu.roll(key, dist, 1))
                pvs = [jnp.where(is_lower, pltpu.roll(v, LANES - dist, 1),
                                 pltpu.roll(v, dist, 1)) for v in vals]
            else:
                rd = dist // LANES
                pk = jnp.where(is_lower, pltpu.roll(key, rows - rd, 0),
                               pltpu.roll(key, rd, 0))
                pvs = [jnp.where(is_lower, pltpu.roll(v, rows - rd, 0),
                                 pltpu.roll(v, rd, 0)) for v in vals]
            swap = ce_swap_mask(key, vals, pk, pvs, want_small, ncmp)
            key = jnp.where(swap, pk, key)
            vals = [jnp.where(swap, pv, v) for pv, v in zip(pvs, vals)]
    if not vals:
        return key, None
    return key, (vals[0] if single else vals)


def _bitonic_kernel(k_ref, v_ref, ok_ref, ov_ref, *, rows: int,
                    ce: str = "roll"):
    """Sort one (rows, 128) tile by (key, val) ascending, row-major order."""
    bias = jnp.full((rows, LANES), -2147483648, jnp.int32)
    key = k_ref[...].reshape(rows, LANES).astype(jnp.int32) ^ bias
    val = v_ref[...].reshape(rows, LANES).astype(jnp.int32)
    key, val = bitonic_network(key, val, rows, ce=ce)
    ok_ref[...] = (key ^ bias).astype(jnp.uint32).reshape(1, rows, LANES)
    ov_ref[...] = val.astype(jnp.uint32).reshape(1, rows, LANES)


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret", "ce"))
def sort_tiles_kv(keys: jax.Array, values: jax.Array, tile_rows: int = 128,
                  interpret: bool | None = None, ce: str = "roll"):
    """Stable (key, value)-sort within each tile of `tile_rows * 128` elems.

    keys/values: uint32 (n,), n % (tile_rows * 128) == 0; tile_rows a power
    of two. Values act as tie-break, so pass unique values (e.g. indices)
    for a stable key sort. Returns (sorted_keys, values_along).

    Reference parity: LSDBinaryRadixSortKernel sorts one block in smem
    (cu:404-421); this sorts each VMEM tile, at vastly larger tile sizes
    (128K vs 1K elements).
    """
    n = keys.shape[0]
    tile = tile_rows * LANES
    if n % tile or tile_rows & (tile_rows - 1):
        raise ValueError(f"n={n} must be a multiple of tile={tile}, "
                         f"tile_rows={tile_rows} a power of 2")
    if interpret is None:
        interpret = _interpret_default()
    nt = n // tile
    kern = functools.partial(_bitonic_kernel, rows=tile_rows, ce=ce)
    spec = pl.BlockSpec((1, tile_rows, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    ok, ov = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((nt, tile_rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((nt, tile_rows, LANES), jnp.uint32)],
        interpret=interpret,
    )(keys.reshape(nt, tile_rows, LANES), values.reshape(nt, tile_rows, LANES))
    return ok.reshape(n), ov.reshape(n)


def _bitonic_multi_kernel(*refs, rows: int, nv: int, ce: str,
                          ncmp: int | None = None):
    """Sort one (rows, 128) tile by the compared prefix (key + ncmp-1
    payloads, default (key, val0)) ascending with nv payload streams
    riding; refs = k_ref, v_refs[nv], ok_ref, ov_refs[nv]."""
    k_ref = refs[0]
    v_refs = refs[1:1 + nv]
    ok_ref = refs[1 + nv]
    ov_refs = refs[2 + nv:]
    bias = jnp.full((rows, LANES), -2147483648, jnp.int32)
    key = k_ref[...].reshape(rows, LANES).astype(jnp.int32) ^ bias
    vals = [v[...].reshape(rows, LANES).astype(jnp.int32) ^ bias
            for v in v_refs]
    key, vals = bitonic_network(key, vals, rows, ce=ce, ncmp=ncmp)
    ok_ref[...] = (key ^ bias).astype(jnp.uint32).reshape(1, rows, LANES)
    for ov, v in zip(ov_refs, vals):
        ov[...] = (v ^ bias).astype(jnp.uint32).reshape(1, rows, LANES)


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret", "ce", "ncmp"))
def sort_tiles_multi(keys: jax.Array, values, tile_rows: int = 128,
                     interpret: bool | None = None, ce: str = "roll",
                     ncmp: int | None = None):
    """Tile-local sort with any number of riding payload streams.

    values: tuple/list of (n,) uint32. The first ncmp-1 (default 1) are
    comparison tiebreaks (lexicographic after the key; a unique last
    compared stream => stable sort); the rest ride uncompared — the
    multi-column analog of sort_tiles_kv. ncmp=3 with values
    (lo, positions) is the 64-bit single-chain tile sort. Returns
    (sorted_keys, [payloads...]).
    """
    n = keys.shape[0]
    tile = tile_rows * LANES
    if n % tile or tile_rows & (tile_rows - 1):
        raise ValueError(f"n={n} must be a multiple of tile={tile}, "
                         f"tile_rows={tile_rows} a power of 2")
    if interpret is None:
        interpret = _interpret_default()
    values = list(values)
    nv = len(values)
    nt = n // tile
    kern = functools.partial(_bitonic_multi_kernel, rows=tile_rows, nv=nv,
                             ce=ce, ncmp=ncmp)
    spec = pl.BlockSpec((1, tile_rows, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((nt, tile_rows, LANES), jnp.uint32)
    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[spec] * (1 + nv),
        out_specs=[spec] * (1 + nv),
        out_shape=[shape] * (1 + nv),
        interpret=interpret,
    )(keys.reshape(nt, tile_rows, LANES),
      *[v.reshape(nt, tile_rows, LANES) for v in values])
    return outs[0].reshape(n), [o.reshape(n) for o in outs[1:]]


def _bitonic_keys_kernel(k_ref, ok_ref, *, rows: int, ce: str = "roll"):
    """Keys-only tile sort: no payload stream, and ties need no break —
    equal keys compare not-less on both pair halves, so neither swaps
    (consistent and correct since the values are identical). ~2x the kv
    kernel's stage rate."""
    bias = jnp.full((rows, LANES), -2147483648, jnp.int32)
    key = k_ref[...].reshape(rows, LANES).astype(jnp.int32) ^ bias
    key, _ = bitonic_network(key, None, rows, ce=ce)
    ok_ref[...] = (key ^ bias).astype(jnp.uint32).reshape(1, rows, LANES)


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret", "ce"))
def sort_tiles(keys: jax.Array, tile_rows: int = 128,
               interpret: bool | None = None,
               ce: str = "roll") -> jax.Array:
    """Sort uint32 keys ascending within each tile (keys-only)."""
    n = keys.shape[0]
    tile = tile_rows * LANES
    if n % tile or tile_rows & (tile_rows - 1):
        raise ValueError(f"n={n} must be a multiple of tile={tile}, "
                         f"tile_rows={tile_rows} a power of 2")
    if interpret is None:
        interpret = _interpret_default()
    nt = n // tile
    spec = pl.BlockSpec((1, tile_rows, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    ok = pl.pallas_call(
        functools.partial(_bitonic_keys_kernel, rows=tile_rows, ce=ce),
        grid=(nt,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nt, tile_rows, LANES), jnp.uint32),
        interpret=interpret,
    )(keys.reshape(nt, tile_rows, LANES))
    return ok.reshape(n)

"""VMEM lane-bucketed hash table — the small-build join/semi-join engine.

North-star config 4 names a "bucketed VMEM hash table"; round 1 priced a
general one out (ROADMAP.md §3: the only in-kernel gather Mosaic lowers is
`take_along_axis(axis=1, width exactly 128)` at ~147 ps/elem, so probing a
table of S slots costs ~S/128 gathers per probe element — linear in table
size — while the sort-merge join is size-independent). The corollary cuts
the other way for SMALL build sides: a table of a few thousand slots is
probed in a handful of gathers, far under the sort-merge join's ~13-18
ns/row, which must sort the full probe stream. This module is that fast
path: dimension-table joins and IN-list semi-joins.

Layout: 128 lane-buckets x `rows` chain slots, as (rows, 128) u32 key and
value planes plus a (1, 128) chain-length row, all VMEM-resident for the
whole probe stream. lane(k) = top 7 bits of the u32 multiplicative mix.
Probing scans every chain row with one lane-gather per plane; empty slots
are excluded by the chain-length compare (no sentinel keys needed), so a
probe block costs 1 + rows gathers (semi) or 1 + 2*rows (join).

Build is plain XLA on the (tiny) build side: stable-sort keys by lane,
rank within the lane run, scatter to (rank, lane). Chains longer than
`rows` overflow; `build_table` reports `ok` and callers fall back to the
sort-merge join (ops/join.py wires this as a lax.cond), so correctness
never depends on the hash behaving.

No reference analog (the reference is sort-only); this implements the
component SURVEY §7 planned as `kernels/hash_table.py`.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MIX = 0x9E3779B1                # odd (golden-ratio) multiplier
DEF_BLK_ROWS = 512              # probe elements per grid step = 64K


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def lane_of(keys: jax.Array) -> jax.Array:
    """Bucket lane of each key: top 7 bits of the multiplicative mix
    (high bits of k*odd are the well-mixed ones)."""
    return ((keys * jnp.uint32(MIX)) >> 25).astype(jnp.int32)


def plan_rows(n_build: int, slack: float = 3.0) -> int:
    """Static chain depth for n_build keys over 128 lane-buckets: mean
    load + slack standard deviations (Poisson). Overflow is not fatal —
    build reports it and callers fall back — so the tail bound is modest."""
    lam = max(n_build / LANES, 1.0)
    return int(math.ceil(lam + slack * math.sqrt(lam) + 2.0))


@functools.partial(jax.jit, static_argnames=("rows",))
def build_table(keys: jax.Array, vals: jax.Array, rows: int):
    """Build the (rows, 128) table. Returns (tk, tv, cnt, ok): key and
    value planes, the (1, 128) u32 chain-length row, and a bool scalar —
    False iff any lane chain overflowed `rows` (table then misses the
    dropped keys; callers must take the fallback path)."""
    nb = keys.shape[0]
    lane = lane_of(keys)
    order = jnp.argsort(lane, stable=True)
    slane = lane[order]
    first = jnp.searchsorted(slane, slane, side="left")
    rank = jnp.arange(nb, dtype=jnp.int32) - first.astype(jnp.int32)
    flat = rank * LANES + slane
    flat = jnp.where(rank < rows, flat, rows * LANES)  # drop overflow
    tk = jnp.zeros((rows * LANES,), jnp.uint32).at[flat].set(
        keys[order], mode="drop").reshape(rows, LANES)
    tv = jnp.zeros((rows * LANES,), jnp.uint32).at[flat].set(
        vals[order], mode="drop").reshape(rows, LANES)
    cnt = jnp.zeros((LANES,), jnp.uint32).at[lane].add(
        jnp.uint32(1)).reshape(1, LANES)
    ok = (cnt <= jnp.uint32(rows)).all()
    return tk, tv, jnp.minimum(cnt, jnp.uint32(rows)), ok


def _probe_kernel(tk_ref, tv_ref, cnt_ref, p_ref, om_ref, ov_ref, *,
                  rows: int, semi: bool):
    k = p_ref[0]
    shape = k.shape
    lanes = ((k * jnp.uint32(MIX)) >> 25).astype(jnp.int32)
    cnt = jnp.take_along_axis(
        jnp.broadcast_to(cnt_ref[...], shape), lanes, axis=1)
    out_m = jnp.zeros(shape, jnp.uint32)
    out_v = jnp.zeros(shape, jnp.uint32)
    for r in range(rows):
        gk = jnp.take_along_axis(
            jnp.broadcast_to(tk_ref[pl.ds(r, 1), :], shape), lanes, axis=1)
        m = (gk == k) & (cnt > jnp.uint32(r))
        out_m = jnp.where(m, jnp.uint32(1), out_m)
        if not semi:
            gv = jnp.take_along_axis(
                jnp.broadcast_to(tv_ref[pl.ds(r, 1), :], shape), lanes,
                axis=1)
            out_v = jnp.where(m, gv, out_v)
    om_ref[0] = out_m
    ov_ref[0] = out_v


@functools.partial(jax.jit, static_argnames=("semi", "blk_rows",
                                             "interpret"))
def probe_table(tk: jax.Array, tv: jax.Array, cnt: jax.Array,
                probe_keys: jax.Array, semi: bool = False,
                blk_rows: int = DEF_BLK_ROWS,
                interpret: bool | None = None):
    """Probe the whole stream against the VMEM table. Returns
    (match u32 0/1, build_val u32) per probe row, in probe order
    (build_val is 0 where unmatched, and always 0 for semi=True).
    Unique build keys assumed (last chain match wins otherwise)."""
    if interpret is None:
        interpret = _interpret_default()
    rows = tk.shape[0]
    n = probe_keys.shape[0]
    blk = blk_rows * LANES
    nb = -(-n // blk)
    npad = nb * blk
    p = probe_keys if npad == n else jnp.concatenate(
        [probe_keys, jnp.zeros((npad - n,), jnp.uint32)])
    tab_spec = pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((1, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec((1, blk_rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_probe_kernel, rows=rows, semi=semi)
    m, v = pl.pallas_call(
        kern, grid=(nb,),
        in_specs=[tab_spec, tab_spec, cnt_spec, blk_spec],
        out_specs=[blk_spec, blk_spec],
        out_shape=[jax.ShapeDtypeStruct((nb, blk_rows, LANES), jnp.uint32)
                   ] * 2,
        interpret=interpret,
    )(tk, tv, cnt, p.reshape(nb, blk_rows, LANES))
    return m.reshape(-1)[:n], v.reshape(-1)[:n]

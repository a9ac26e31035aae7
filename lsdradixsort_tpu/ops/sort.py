"""Sort operators — the flagship op family.

TPU-native replacement for GPULSDRadixSort (reference: LSDRadixSort.cu:839-910),
the host orchestrator that loops histogram → local scans → transpose →
global scan → rank-and-scatter over 32/r digit groups.

Strategies:

  * ``"merge"`` (default) — the framework's own sort: VMEM bitonic tile
    sort + 8-way sample-split merge passes (kernels/merge.py). Measured
    808 Melem/s on v5e at 2^27 keys (ce=reshape + fully-pipelined DMAs,
    ROADMAP §7c) — 2.5x jax.lax.sort and 2.02x the reference GPU's best.
  * ``"xla"`` — jax.lax.sort, the XLA-native bar the framework beats.
  * ``"composed"`` — a faithful LSD radix pipeline composed from this
    framework's own kernels (block_digit_histograms → per-block digit scans →
    digit-major global scan → stable rank + permute), the direct analog of
    the reference's pass structure (cu:845-906); an XLA-scatter-bound
    correctness scaffold.

All sorts are stable (key-value variants preserve the input order of
equal keys bit-exactly, verified against the golden model). Keys may be
uint32, int32, or float32 and the order ascending (default) or
descending — non-u32 dtypes and descending order run through the
order-preserving u32 codecs in core/keycodec.py, so every strategy and
kernel sees only u32 codes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lsdradixsort_tpu.core import keycodec
from lsdradixsort_tpu.core.digits import get_digit, num_digit_groups
from lsdradixsort_tpu.kernels.histogram import block_digit_histograms
from lsdradixsort_tpu.kernels.scan import exclusive_scan

_STRATEGIES = ("merge", "xla", "composed")


@functools.partial(jax.jit, static_argnames=("strategy", "r", "block_size",
                                             "descending"))
def sort(keys: jax.Array, strategy: str = "merge", r: int = 8,
         block_size: int = 1 << 13, descending: bool = False) -> jax.Array:
    """Sort u32/i32/f32 keys (TestGPULSDRadixSort path, cu:912-1030).

    The default "merge" strategy is the framework's own sort (VMEM tile
    sort + 8-way sample-split merge passes, kernels/merge.py) — faster
    than jax.lax.sort on v5e for large keys-only inputs. Signed/float
    keys and descending order run through the order-preserving u32 codecs
    (core/keycodec.py; float NaN/-0.0 semantics documented there).
    """
    code = keycodec.encode(keys, descending)
    if strategy == "merge":
        out = merge_sort_keys(code)
    elif strategy == "xla":
        out = jax.lax.sort(code)
    elif strategy == "composed":
        out = _composed_lsd_sort(code, r=r, block_size=block_size)
    else:
        raise ValueError(
            f"unknown strategy {strategy!r}; pick from {_STRATEGIES}")
    return keycodec.decode(out, keys.dtype, descending)


def merge_sort_keys(keys: jax.Array, tile_log2: int = 15,
                    max_buf: int | None = None,
                    blk: int | None = None,
                    skew_fallback: bool = True,
                    ce: str = "reshape", pipeline="full"):
    """The framework sort: tile sort + 8-way merge passes (kernels/merge.py).

    Any n >= 1 (padded internally with 0xFFFFFFFF sentinels). tile_log2 /
    max_buf / blk are tuning knobs (tests shrink them to keep interpret
    mode fast); production defaults are tile=2^15, buf=2^20, blk=2048.

    skew_fallback=True (default) handles pathological key distributions
    in-graph: any pass whose sample-split tables would overflow the VMEM
    buffer runs jax.lax.sort instead (a lax.cond branch). That branch
    costs ~4x n bytes of peak HBM, which does not fit at n = 2^30 on a
    16 GB chip — callers at that scale pass skew_fallback=False and get
    (sorted, ok) back: ok is the AND of all per-pass capacity checks, and
    the caller re-sorts on the host side in the astronomically rare case
    it is False (exp/drive_merge30.py does exactly this).
    """
    from lsdradixsort_tpu.kernels import merge as M
    from lsdradixsort_tpu.kernels.tile_sort import sort_tiles
    if max_buf is None:
        max_buf = M.DEF_BUF
    if blk is None:
        blk = min(M.DEF_BLK, 1 << tile_log2)
    n = keys.shape[0]
    tile = 1 << tile_log2
    # power-of-2 tile count: every pass's run length (tile * 8^k) must
    # divide the padded size, which a plain ceil-to-tile multiple does not
    # guarantee (11 tiles -> pass 2 sees a ragged 3-tile run)
    npad = tile * (1 << max(0, (-(-n // tile) - 1).bit_length()))
    x = keys if npad == n else jnp.concatenate(
        [keys, jnp.full((npad - n,), 0xFFFFFFFF, jnp.uint32)])
    ok_all = jnp.bool_(True)
    x = sort_tiles(x, tile_rows=tile // 128, ce=ce)
    run = tile
    # NOTE (2^30 on a 16 GB chip): XLA retires each pass's buffers two
    # passes late, so the 5-pass single-graph peak is 4 live 4 GB buffers
    # = 16 GB and does not compile. Split the pipeline into two jits at a
    # pass boundary with donate_argnums on the second — see
    # exp/drive_merge30.py for the pattern. Single-graph works to 2^29.
    while run < npad:
        buf = M.pass_buf_elems(run, max_buf)
        tab, ok = M.merge_pass_tables(x, run, buf, blk)
        if skew_fallback:
            x = jax.lax.cond(
                ok,
                lambda x, tab: M.merge_pass(x, tab, run_len=run,
                                            buf_elems=buf, blk=blk, ce=ce,
                                            pipeline=pipeline),
                lambda x, tab: jax.lax.sort(x),
                x, tab)
        else:
            ok_all = ok_all & ok
            x = M.merge_pass(x, tab, run_len=run, buf_elems=buf, blk=blk,
                             ce=ce, pipeline=pipeline)
        run *= M.KWAY
    x = x[:n] if npad != n else x
    return x if skew_fallback else (x, ok_all)


def merge_sort_with_ranks(keys: jax.Array, tile_log2: int = 15,
                          max_buf: int | None = None,
                          blk: int | None = None,
                          ce: str = "reshape", pipeline="full"):
    """Framework stable kv sort: returns (sorted_keys, original_positions).

    The row index rides as the payload through the tile sort and every
    merge pass and doubles as the comparison tiebreak, which makes the
    whole pipeline stable (kernels/merge.py stability contract). Same
    output as sort_with_ranks (the XLA flagship path), produced by the
    framework's own kernels.
    """
    from lsdradixsort_tpu.kernels import merge as M
    from lsdradixsort_tpu.kernels.tile_sort import sort_tiles_kv
    if max_buf is None:
        max_buf = M.DEF_BUF
    if blk is None:
        blk = min(M.DEF_BLK, 1 << tile_log2)
    n = keys.shape[0]
    tile = 1 << tile_log2
    npad = tile * (1 << max(0, (-(-n // tile) - 1).bit_length()))
    x = keys if npad == n else jnp.concatenate(
        [keys, jnp.full((npad - n,), 0xFFFFFFFF, jnp.uint32)])
    # pad rows carry iotas >= n: among equal sentinel keys the real rows
    # (iota < n) sort first, so x[:n] keeps exactly the real rows
    iota = jax.lax.broadcasted_iota(jnp.uint32, (npad,), 0)
    x, v = sort_tiles_kv(x, iota, tile_rows=tile // 128, ce=ce)
    run = tile
    while run < npad:
        buf = M.pass_buf_elems(run, max_buf)
        tab, ok = M.merge_pass_tables(x, run, buf, blk)
        x, v = jax.lax.cond(
            ok,
            lambda x, v, tab: M.merge_pass_kv(x, v, tab, run_len=run,
                                              buf_elems=buf, blk=blk, ce=ce,
                                              pipeline=pipeline),
            lambda x, v, tab: jax.lax.sort((x, v), num_keys=2,
                                           is_stable=False),
            x, v, tab)
        run *= M.KWAY
    return (x[:n], v[:n]) if npad != n else (x, v)


def merge_sort_multi(keys: jax.Array, values, tile_log2: int = 15,
                     max_buf: int | None = None,
                     blk: int | None = None,
                     ce: str = "reshape", pipeline="full"):
    """Framework sort of (keys, values[0]) lexicographic with any number of
    payload streams riding (kernels/merge.py multi-stream engine).

    values: tuple/list of (n,) uint32. The FIRST is the comparison
    tiebreak; the rest move with their row uncompared. Returns
    (sorted_keys, [payloads...]).

    Padding contract: inputs whose length is not a multiple of the tile
    are padded with (key, val0) = (0xFFFFFFFF, 0xFFFFFFFF) sentinel rows,
    which sort last and are sliced off. This is exact when values[0] never
    equals 0xFFFFFFFF on a 0xFFFFFFFF key (guaranteed when val0 is
    positions or join's tag|position packing) or when there is only one
    payload stream (sentinel-equal rows are then indistinguishable). With
    >= 2 payloads a real row EQUAL to the sentinel pair would be
    interchangeable with padding and could lose its riding payloads — that
    case is detected in-graph (one vector compare) and routed to a
    guaranteed-correct 3-key XLA sort with an injected unique position
    tiebreak (lax.cond), so the result is exact for every input.

    Skew fallback: any pass whose sample tables overflow the VMEM buffer
    runs jax.lax.sort (num_keys=2) for that pass instead (lax.cond).
    """
    from lsdradixsort_tpu.kernels import merge as M
    from lsdradixsort_tpu.kernels.tile_sort import sort_tiles_multi
    if max_buf is None:
        max_buf = M.DEF_BUF
    if blk is None:
        blk = min(M.DEF_BLK, 1 << tile_log2)
    values = list(values)
    n = keys.shape[0]
    tile = 1 << tile_log2
    npad = tile * (1 << max(0, (-(-n // tile) - 1).bit_length()))

    def _merge_path(keys, values):
        if npad != n:
            pad = jnp.full((npad - n,), 0xFFFFFFFF, jnp.uint32)
            keys = jnp.concatenate([keys, pad])
            values = [jnp.concatenate([v, pad]) for v in values]
        x, vs = sort_tiles_multi(keys, values, tile_rows=tile // 128, ce=ce)
        run = tile
        while run < npad:
            buf = M.pass_buf_elems(run, max_buf)
            tab, ok = M.merge_pass_tables(x, run, buf, blk)
            x, vs = jax.lax.cond(
                ok,
                lambda x, vs, tab, run=run, buf=buf: M.merge_pass_multi(
                    x, vs, tab, run_len=run, buf_elems=buf, blk=blk, ce=ce,
                    pipeline=pipeline),
                lambda x, vs, tab: (lambda out: (out[0], list(out[1:])))(
                    jax.lax.sort((x, *vs), num_keys=2, is_stable=False)),
                x, vs, tab)
            run *= M.KWAY
        if npad != n:
            x, vs = x[:n], [v[:n] for v in vs]
        return x, vs

    if npad != n and len(values) >= 2:
        # a real (0xFFFFFFFF, 0xFFFFFFFF) row would be indistinguishable
        # from the sentinel padding — take the pad-free exact path instead
        collide = jnp.any((keys == jnp.uint32(0xFFFFFFFF))
                          & (values[0] == jnp.uint32(0xFFFFFFFF)))

        def _exact_path(keys, values):
            iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
            out = jax.lax.sort((keys, values[0], iota, *values[1:]),
                               num_keys=3, is_stable=False)
            return out[0], [out[1], *out[3:]]

        return jax.lax.cond(collide, _exact_path, _merge_path, keys, values)
    return _merge_path(keys, values)


@functools.partial(jax.jit, static_argnames=("strategy", "r", "block_size",
                                             "tile_log2", "descending"))
def sort_kv(keys: jax.Array, values: jax.Array, strategy: str = "merge",
            r: int = 8, block_size: int = 1 << 13, tile_log2: int = 15,
            descending: bool = False):
    """Stable key-value sort (north-star extension; keys u32/i32/f32, any
    payload).

    strategy="merge" (default — measured 1.18x the XLA spelling for the
    2^27 stable kv sort on v5e, 381 vs 322 Melem/s, BENCHMARKS.md r4)
    runs the framework engine: the row index rides as
    the (unique, position-consistent) tiebreak stream and every u32
    payload leaf rides uncompared — stable for arbitrary payloads.
    "xla" is jax.lax.sort with the injected-iota spelling — pick it when
    compile latency matters more than throughput (the merge pipeline is
    a multi-kernel Pallas program; first compile is minutes vs seconds).
    "composed" is the faithful LSD radix scaffold. Signed/float keys and
    descending order run through the u32 codecs (core/keycodec.py);
    stability is unaffected (tie groups are invariant under the
    bijection).
    """
    code = keycodec.encode(keys, descending)
    if strategy == "merge":
        flat_vals, treedef = jax.tree.flatten(values)
        if any(v.dtype.itemsize != 4 for v in flat_vals):
            # the merge engine moves u32 lanes; non-32-bit payloads take
            # the XLA path (any dtype) rather than a lossy cast
            strategy = "xla"
    if strategy == "merge":
        n = keys.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
        # 32-bit payloads ride BITCAST to u32 (lossless — riding streams
        # are never compared; astype would corrupt f32/i32 values)
        dts = [v.dtype for v in flat_vals]
        u32 = [v if v.dtype == jnp.uint32
               else jax.lax.bitcast_convert_type(v, jnp.uint32)
               for v in flat_vals]
        sk, outs = merge_sort_multi(code, [iota, *u32],
                                    tile_log2=tile_log2)
        back = [o if dt == jnp.uint32
                else jax.lax.bitcast_convert_type(o, dt)
                for o, dt in zip(outs[1:], dts)]
        sv = jax.tree.unflatten(treedef, back)
    elif strategy == "xla":
        sk, sv = _stable_sort_kv_xla(code, values)
    elif strategy == "composed":
        sk, sv = _composed_lsd_sort_kv(code, values, r=r,
                                       block_size=block_size)
    else:
        raise ValueError(
            f"unknown strategy {strategy!r}; pick from {_STRATEGIES}")
    return keycodec.decode(sk, keys.dtype, descending), sv


@functools.partial(jax.jit, static_argnames=("descending",))
def sort_with_ranks(keys: jax.Array, descending: bool = False):
    """Sort keys, returning (sorted_keys, original_positions).

    The columnar-engine primitive: sort one key column, use the returned
    permutation to gather every other column. Equivalent to a stable
    key-value sort whose payload is the row index — BASELINE config 2's
    "keys + 32-bit payloads" with payload = row id.

    Implementation note: a 2-key UNSTABLE lax.sort on (key, iota) returns
    exactly the stable permutation (the iota is a unique total tiebreak) and
    measures 1.43x faster than is_stable=True on v5e (416 ms vs 595 ms for
    2^27 rows) — XLA's stable path pays for tie bookkeeping the unique
    secondary key makes redundant.
    """
    n = keys.shape[0]
    code = keycodec.encode(keys, descending)
    iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    sk, perm = jax.lax.sort((code, iota), num_keys=2, is_stable=False)
    return keycodec.decode(sk, keys.dtype, descending), perm


@functools.partial(jax.jit, static_argnames=("descending",))
def argsort(keys: jax.Array, descending: bool = False) -> jax.Array:
    """Stable argsort of u32/i32/f32 keys."""
    _, perm = sort_with_ranks(keys, descending)
    return perm


@functools.partial(jax.jit, static_argnames=("descending", "strategy",
                                             "tile_log2"))
def sort_lex(key_cols, descending=False, strategy: str = "merge",
             tile_log2: int = 15):
    """Stable multi-column lexicographic sort: ORDER BY col0, col1, ...
    (col0 primary). Returns (sorted_cols_tuple, original_positions).

    key_cols: sequence of equal-length u32/i32/f32 columns. descending:
    one bool for all columns or a per-column tuple (mixed ASC/DESC).
    Ties across ALL columns break by original position (stable).

    This is the reference's LSD digit-group loop (LSDRadixSort.cu:62-69)
    lifted to whole columns as digits: one stable pass per column, least
    significant (last) first, on the framework merge engine (or
    strategy="xla"). A segmented sort (sort within runs of a segment-id
    column) is exactly sort_lex([segment_id, key]).
    """
    cols = list(key_cols)
    k = len(cols)
    if k == 0:
        raise ValueError("sort_lex needs at least one key column")
    if isinstance(descending, bool):
        descending = (descending,) * k
    if len(descending) != k:
        raise ValueError("descending must be a bool or one per column")
    codes = [keycodec.encode(c, d) for c, d in zip(cols, descending)]
    n = cols[0].shape[0]
    perm = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    # LSD over columns: stable passes from least to most significant.
    # Each pass sorts by one column with a fresh current-position iota as
    # the (unique) tiebreak — preserving the previous pass's order — and
    # every other code column plus the running permutation riding.
    for i in reversed(range(k)):
        others = [codes[j] for j in range(k) if j != i]
        iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
        if strategy == "merge":
            key_s, outs = merge_sort_multi(codes[i], [iota, perm, *others],
                                           tile_log2=tile_log2)
            perm = outs[1]
            rest = outs[2:]
        elif strategy == "xla":
            out = jax.lax.sort((codes[i], iota, perm, *others), num_keys=2,
                               is_stable=False)
            key_s, perm, rest = out[0], out[2], out[3:]
        else:
            raise ValueError(f"strategy {strategy!r}: pick 'merge' or 'xla'")
        it = iter(rest)
        codes = [key_s if j == i else next(it) for j in range(k)]
    decoded = tuple(keycodec.decode(c, col.dtype, d)
                    for c, col, d in zip(codes, cols, descending))
    return decoded, perm


@functools.partial(jax.jit, static_argnames=("dtype", "descending",
                                             "strategy", "tile_log2"))
def sort64_with_ranks(key_hi: jax.Array, key_lo: jax.Array,
                      dtype: str = "uint64", descending: bool = False,
                      strategy: str = "merge", tile_log2: int = 15):
    """Stable sort by a 64-bit key column given as (hi, lo) u32 planes.

    Returns (sorted_hi, sorted_lo, original_positions) — the columnar
    64-bit analog of sort_with_ranks (x64 stays off on TPU; 64-bit
    columns live as two u32 planes, core/keycodec.py). dtype is the
    logical key type: "uint64", "int64", or "float64" (IEEE total order,
    as the 32-bit codec).

    strategy "merge" (default) is the SINGLE-CHAIN engine: one stable
    merge pipeline comparing (hi, lo, position) at every compare-exchange
    (ncmp=3) — half the HBM traffic of the two-pass LSD spelling, for
    ~1.5x the per-stage vector work (ROADMAP §8). "merge2" is the two-pass
    LSD composition lifted to 32-bit digits: a stable pass by the low
    plane, then a stable pass by the high plane — exactly the reference's
    digit-group loop (LSDRadixSort.cu:62-69) with r=32 and the framework's
    stable merge engine as the per-digit sorter.
    """
    chi, clo = keycodec.encode64(key_hi, key_lo, dtype, descending)
    n = key_hi.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    # the sorted iota tiebreak of pass 1 IS the pass-1 permutation
    if strategy == "merge":
        hi_o, lo_o, perm = _merge1_sort64(chi, clo, tile_log2=tile_log2)
    elif strategy == "merge2":
        lo_s, (perm1, hi_s) = merge_sort_multi(clo, [iota, chi],
                                               tile_log2=tile_log2)
        iota2 = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
        hi_o, (_, lo_o, perm) = merge_sort_multi(
            hi_s, [iota2, lo_s, perm1], tile_log2=tile_log2)
    elif strategy == "xla":
        lo_s, perm1, hi_s = jax.lax.sort((clo, iota, chi), num_keys=2,
                                         is_stable=False)
        iota2 = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
        hi_o, _, lo_o, perm = jax.lax.sort(
            (hi_s, iota2, lo_s, perm1), num_keys=2, is_stable=False)
    else:
        raise ValueError(f"strategy {strategy!r}: pick 'merge', 'merge2' "
                         f"or 'xla'")
    hi_o, lo_o = keycodec.decode64(hi_o, lo_o, dtype, descending)
    return hi_o, lo_o, perm


def _merge1_sort64(chi, clo, tile_log2: int = 15,
                   max_buf: int | None = None, blk: int | None = None,
                   ce: str = "reshape", pipeline="full"):
    """Single-chain stable 64-bit sort: ONE tile-sort + merge pipeline
    whose compare-exchanges order by (hi, lo, position) — the merge
    engine's ncmp=3 mode, with the prepass boundary search comparing the
    (hi, lo) pair (merge_pass_tables keys2=). Returns (hi, lo, positions),
    all three streams moved by the same exchanges.

    Pads sort last exactly: pad rows are (hi, lo, pos) =
    (0xFFFFFFFF, 0xFFFFFFFF, >= n) and positions are a unique strict
    tiebreak, so the order is total and stable by construction.
    """
    from lsdradixsort_tpu.kernels import merge as M
    from lsdradixsort_tpu.kernels.tile_sort import sort_tiles_multi
    if max_buf is None:
        max_buf = M.DEF_BUF
    if blk is None:
        blk = min(M.DEF_BLK, 1 << tile_log2)
    n = chi.shape[0]
    tile = 1 << tile_log2
    npad = tile * (1 << max(0, (-(-n // tile) - 1).bit_length()))
    if npad != n:
        pad = jnp.full((npad - n,), 0xFFFFFFFF, jnp.uint32)
        chi = jnp.concatenate([chi, pad])
        clo = jnp.concatenate([clo, pad])
    iota = jax.lax.broadcasted_iota(jnp.uint32, (npad,), 0)
    hi, (lo, pos) = sort_tiles_multi(chi, [clo, iota],
                                     tile_rows=tile // 128, ce=ce, ncmp=3)
    run = tile
    while run < npad:
        buf = M.pass_buf_elems(run, max_buf)
        tab, ok = M.merge_pass_tables(hi, run, buf, blk, keys2=lo)
        hi, (lo, pos) = jax.lax.cond(
            ok,
            lambda h, l, p, tab, run=run, buf=buf: (
                lambda o: (o[0], o[1]))(M.merge_pass_multi(
                    h, [l, p], tab, run_len=run, buf_elems=buf, blk=blk,
                    ce=ce, pipeline=pipeline, ncmp=3)),
            lambda h, l, p, tab: (lambda o: (o[0], [o[1], o[2]]))(
                jax.lax.sort((h, l, p), num_keys=3, is_stable=False)),
            hi, lo, pos, tab)
        run *= M.KWAY
    if npad != n:
        hi, lo, pos = hi[:n], lo[:n], pos[:n]
    return hi, lo, pos


@functools.partial(jax.jit, static_argnames=("block_size",))
def sort_blocks_kv(keys: jax.Array, values: jax.Array,
                   block_size: int = 1 << 14):
    """Stable kv sort within each `block_size` block (Pallas bitonic).

    The user-facing form of the reference's block-local sort
    (TestLSDBinaryRadixSort, cu:423-477) — a partial-sort primitive for
    windowed/segmented query plans. block_size must be a power of two
    multiple of 128; n a multiple of block_size. Runs entirely in VMEM:
    967 Melem/s at 16K blocks on v5e (BENCHMARKS.md).
    """
    from lsdradixsort_tpu.kernels.tile_sort import sort_tiles_kv
    return sort_tiles_kv(keys, values, tile_rows=block_size // 128)


def _stable_sort_kv_xla(keys, values):
    """Stable kv sort via an injected unique iota tiebreak + unstable 2-key
    sort — bit-identical to is_stable=True and never slower (measured equal
    with payload, 1.43x faster when the payload is the iota itself)."""
    n = keys.shape[0]
    flat_vals, treedef = jax.tree.flatten(values)
    iota = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    out = jax.lax.sort((keys, iota, *flat_vals), num_keys=2, is_stable=False)
    return out[0], jax.tree.unflatten(treedef, out[2:])


# ---------------------------------------------------------------------------
# Composed LSD radix pipeline (reference pass structure, cu:845-906)
# ---------------------------------------------------------------------------

def _pass_destinations(keys, r: int, group: int, block_size: int):
    """Global stable destination of every element for one radix pass.

    dst = global_offset[digit][block] + local_rank, where global offsets are
    the exclusive scan of the digit-major (transposed) histogram matrix
    (cu:877-895) and local_rank is the element's stable rank among equal
    digits within its block (cu:829-833).
    """
    n = keys.shape[0]
    nb = n // block_size
    digits = get_digit(keys, r, group)                      # (n,) int32
    # per-block histograms via the Pallas kernel (C7)
    hist = block_digit_histograms(keys, r, group, block_size)  # (nb, bins) u32
    # digit-major global offsets: transpose + flat exclusive scan (C6 + C4)
    gscan = exclusive_scan(hist.T.reshape(-1).astype(jnp.uint32))
    gofs = gscan.reshape(-1, nb)                            # (bins, nb)
    # per-block exclusive digit offsets (local scan of each histogram row,
    # the BlockPrefixSumKernel-per-row step at cu:866-870)
    lofs = jnp.cumsum(hist, axis=1, dtype=jnp.uint32) - hist  # (nb, bins)
    # stable local rank among equal digits within the block, via
    # argsort/inverse-argsort (vectorized equivalent of the in-smem binary
    # split sort, cu:373-402)
    dig2 = digits.reshape(nb, block_size)
    order = jnp.argsort(dig2, axis=1, stable=True)
    sorted_dig = jnp.take_along_axis(dig2, order, axis=1)
    pos = jnp.broadcast_to(jnp.arange(block_size, dtype=jnp.uint32),
                           (nb, block_size))
    rank_sorted = pos - jnp.take_along_axis(lofs, sorted_dig, axis=1)
    inv = jnp.argsort(order, axis=1)
    local_rank = jnp.take_along_axis(rank_sorted, inv, axis=1)  # (nb, B)
    block_ids = jnp.broadcast_to(jnp.arange(nb)[:, None], (nb, block_size))
    dst = gofs[dig2, block_ids] + local_rank
    return dst.reshape(n)


def _composed_pass(keys, payload, r, group, block_size):
    dst = _pass_destinations(keys, r, group, block_size)
    out_keys = jnp.zeros_like(keys).at[dst].set(keys, unique_indices=True)
    if payload is None:
        return out_keys, None
    out_payload = jax.tree.map(
        lambda v: jnp.zeros_like(v).at[dst].set(v, unique_indices=True),
        payload)
    return out_keys, out_payload


def _composed_lsd_sort(keys, r: int, block_size: int):
    n = keys.shape[0]
    if n % block_size:
        raise ValueError(f"composed strategy needs n % block_size == 0 "
                         f"(n={n}, block_size={block_size})")
    for group in range(num_digit_groups(r)):
        keys, _ = _composed_pass(keys, None, r, group, block_size)
    return keys


def _composed_lsd_sort_kv(keys, values, r: int, block_size: int):
    n = keys.shape[0]
    if n % block_size:
        raise ValueError(f"composed strategy needs n % block_size == 0 "
                         f"(n={n}, block_size={block_size})")
    for group in range(num_digit_groups(r)):
        keys, values = _composed_pass(keys, values, r, group, block_size)
    return keys, values

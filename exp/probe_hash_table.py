"""VMEM bucketed hash-table probe prototype (VERDICT r1 #5 follow-up).

Prices the ACTUAL kernel, not just the gather primitive: a VMEM-resident
table of S = R*128 slots (keys + values planes, (R, 128) u32 each) probed
by a streamed probe column. Slot = key & (S-1) (the table is built
perfect-hash by construction: slot bits live in the key's low bits, so
every probe costs the full candidate-row scan — the worst, collision-free
case). Per candidate row r the kernel lane-gathers the row's 128 keys and
128 values at each probe's lane (the only in-kernel gather Mosaic lowers:
take_along_axis axis=1, width exactly 128) and selects on
(row == r) & (key match): 2R gathers + 2R selects per probe element.

Predicted from the measured 147 ps/elem/gather: ~2.4 ns/probe at R=8
(1K slots), linear in R. The sort-merge join (ops/join.py) runs 56-77 M
probes/s at config-4 scale, so the VMEM table wins ONLY for small build
sides (<= ~4K slots) and loses above — this probe produces the measured
curve behind ROADMAP §3's retirement (and, if the small-table numbers
hold, motivates a small-build fast path: dimension-table joins / IN-list
semi-join filters).

Also measures the keys-only existence check (semi-join: R gathers, not
2R) and a miss-heavy probe mix (same cost — no early exit on SIMD).
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsdradixsort_tpu.core.timing import time_fn

LANES = 128


def build_table(R: int, seed: int = 0):
    """Perfect-hash table: slot s holds key (rand_high | s), val rand."""
    S = R * LANES
    rng = np.random.default_rng(seed)
    hi = rng.integers(0, 1 << 32, S, dtype=np.uint64).astype(np.uint32)
    tk = ((hi & np.uint32(~np.uint32(S - 1))) | np.arange(S, dtype=np.uint32))
    tv = rng.integers(0, 1 << 32, S, dtype=np.uint64).astype(np.uint32)
    return tk.reshape(R, LANES), tv.reshape(R, LANES)


def make_probes(tk, n, hit_frac=1.0, seed=1):
    """Probe keys drawn from table slots; (1-hit_frac) flipped to misses
    (same slot, different high bits -> full-cost miss)."""
    rng = np.random.default_rng(seed)
    S = tk.size
    slots = rng.integers(0, S, n, dtype=np.int64)
    pk = tk.reshape(-1)[slots].copy()
    miss = rng.random(n) >= hit_frac
    pk[miss] ^= np.uint32(1 << 31)  # change high bits, keep slot bits
    return pk


def probe_kernel(tk_ref, tv_ref, p_ref, ov_ref, *, R, S, semi):
    k = p_ref[0]
    slot = (k & jnp.uint32(S - 1)).astype(jnp.int32)
    lane = slot & (LANES - 1)
    row = slot >> 7
    shape = k.shape
    out = jnp.zeros(shape, jnp.uint32)
    for r in range(R):
        trow = jnp.broadcast_to(tk_ref[pl.ds(r, 1), :], shape)
        gk = jnp.take_along_axis(trow, lane, axis=1)
        m = (row == r) & (gk == k)
        if semi:
            out = jnp.where(m, jnp.uint32(1), out)
        else:
            vrow = jnp.broadcast_to(tv_ref[pl.ds(r, 1), :], shape)
            gv = jnp.take_along_axis(vrow, lane, axis=1)
            out = jnp.where(m, gv, out)
    ov_ref[0] = out


def build_fn(R: int, n: int, semi: bool, blk_rows: int = 512):
    S = R * LANES
    nb = n // (blk_rows * LANES)
    tab_spec = pl.BlockSpec((R, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec((1, blk_rows, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(probe_kernel, R=R, S=S, semi=semi)
    interp = jax.default_backend() == "cpu"
    f = jax.jit(lambda tk, tv, p: pl.pallas_call(
        kern, grid=(nb,), in_specs=[tab_spec, tab_spec, blk_spec],
        out_specs=blk_spec, interpret=interp,
        out_shape=jax.ShapeDtypeStruct((nb, blk_rows, LANES), jnp.uint32),
    )(tk, tv, p.reshape(nb, blk_rows, LANES)))
    return f


def run_case(R: int, n: int, semi: bool, hit_frac: float = 1.0):
    S = R * LANES
    tk, tv = build_table(R)
    pk = make_probes(tk, n, hit_frac)
    f = build_fn(R, n, semi)
    tkj, tvj, pkj = jnp.asarray(tk), jnp.asarray(tv), jnp.asarray(pk)
    out = np.asarray(jax.block_until_ready(f(tkj, tvj, pkj))).reshape(-1)
    # golden
    slots = pk & np.uint32(S - 1)
    hit = tk.reshape(-1)[slots] == pk
    want = np.where(hit, np.uint32(1) if semi else tv.reshape(-1)[slots],
                    np.uint32(0))
    ok = bool((out == want).all())
    t = time_fn(f, tkj, tvj, pkj, iters=8, warmup=2)
    name = "semi" if semi else "join"
    print(f"{name} S={S:6d} (R={R:3d}) hit={hit_frac:.2f} "
          f"{t.ms:8.2f} ms  {n / t.seconds / 1e6:8.1f} M probes/s  "
          f"{1e9 * t.seconds / n:6.2f} ns/probe  ok={ok}", flush=True)


if __name__ == "__main__":
    n = 1 << (24 if jax.default_backend() != "cpu" else 17)
    print(f"backend={jax.default_backend()} probes=2^{n.bit_length()-1}",
          flush=True)
    rs = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64, 128]
    for R in rs:
        run_case(R, n, semi=False)
    for R in rs:
        run_case(R, n, semi=True)
    run_case(8, n, semi=False, hit_frac=0.5)

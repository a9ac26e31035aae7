"""On-chip A/B of the exact-rank boundary selection (VERDICT r4 #1).

merge_tables_exact_runs' k-way selection was a 32-round value bisection —
measured ~6.5 s of the 10.46 s 2^30 kv sort (62%). This probe times, at
the exact production geometry (S=8 runs of 2^27, C=2^19 -> 2047
boundaries), the old bisection (inlined here for the A/B) against the
new multi-probe fanout selection at several fanouts, and verifies each
variant's tables are bit-identical to the bisection's.

Run: timeout 1800 python exp/probe_fanout_select.py [--small]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from lsdradixsort_tpu.core.cache import enable_persistent_cache  # noqa: E402
from lsdradixsort_tpu.core.timing import time_fn  # noqa: E402
from lsdradixsort_tpu.kernels import merge as M  # noqa: E402

enable_persistent_cache()

SMALL = "--small" in sys.argv
S = 8
LOG_L = 24 if SMALL else 27
L = 1 << LOG_L
C = 1 << (19 - (3 if SMALL else 0))
BLK = M.DEF_BLK


def log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", flush=True)


def bisect_tables(run_keys, chunk_elems, blk=M.DEF_BLK):
    """The round-4 32-round bisection selection, inlined for the A/B
    (returns only vstar + the rank fill, enough to compare cost)."""
    S = len(run_keys)
    L = run_keys[0].shape[0]
    C = chunk_elems
    n = S * L
    nch = n // C
    g = jnp.arange(1, nch, dtype=jnp.uint32) * jnp.uint32(C)

    def body(_, state):
        vlo, vhi = state
        live = vlo < vhi
        mid = vlo + ((vhi - vlo) >> 1)
        cnt = jnp.zeros_like(g)
        for kr in run_keys:
            cnt = cnt + jnp.searchsorted(kr, mid,
                                         side="right").astype(jnp.uint32)
        pred = cnt >= g + 1
        vhi = jnp.where(live & pred, mid, vhi)
        vlo = jnp.where(live & ~pred, mid + 1, vlo)
        return vlo, vhi

    vstar, _ = jax.lax.fori_loop(
        0, 32, body, (jnp.zeros_like(g), jnp.full_like(g, 0xFFFFFFFF)))
    lo = jnp.stack([jnp.searchsorted(kr, vstar, side="left")
                    for kr in run_keys], axis=1).astype(jnp.int32)
    hi = jnp.stack([jnp.searchsorted(kr, vstar, side="right")
                    for kr in run_keys], axis=1).astype(jnp.int32)
    eq = hi - lo
    need = g.astype(jnp.int32) - jnp.sum(lo, axis=1)
    cum = jnp.cumsum(eq, axis=1) - eq
    take = jnp.clip(need[:, None] - cum, 0, eq)
    return lo + take


def main():
    log(f"S={S} L=2^{LOG_L} C={C} nch={S * L // C} "
        f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(7)
    runs = []
    for s in range(S):
        k = jax.random.bits(jax.random.fold_in(key, s), (L,),
                            dtype=jnp.uint32)
        runs.append(jax.lax.sort(k))
    jax.block_until_ready(runs)
    log("runs sorted")

    def timeit(name, fn, *a):
        # block_until_ready does NOT force completion under the axon
        # tunnel; time_fn forces via a 1-element host fetch (core/timing)
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        t_compile = time.perf_counter() - t0
        t = time_fn(fn, *a, iters=3, warmup=1)
        log(f"{name}: {t.ms:.0f} ms/call (first-call {t_compile:.1f} s)")
        return out

    bis = jax.jit(functools.partial(bisect_tables, chunk_elems=C, blk=BLK))
    rank_bis = timeit("bisect32(rank_mid only)", bis, runs)

    ref_tab = None
    import os
    flist = tuple(int(x) for x in
                  os.environ.get("FANOUTS", "256,16").split(","))
    for F in flist:
        tabf = jax.jit(functools.partial(M.merge_tables_exact_runs,
                                         chunk_elems=C, blk=BLK, fanout=F))
        tab, mp = timeit(f"fanout={F} (full tables)", tabf, runs)
        if ref_tab is None:
            ref_tab = np.asarray(tab)
        else:
            same = bool((np.asarray(tab) == ref_tab).all())
            log(f"fanout={F} tables == fanout=256 tables: {same}")
            assert same, f"fanout={F} mismatch"

    # cross-check the fanout boundary ranks against the bisection's
    nch = S * L // C
    pre = ref_tab[:nch, 17] * 128 - ref_tab[:nch, 16]
    starts = ref_tab[:nch, :S].sum(axis=1) * 128 + pre
    ok = bool((starts == np.arange(nch) * C).all())
    log(f"fanout tables rank exactness (sum wstart*blk + pre == t*C): {ok}")
    rb = np.asarray(rank_bis)
    wstart_b = rb // BLK  # fanout wstart should match bisect-derived
    ok2 = bool((ref_tab[1:nch, :S] // (BLK // 128) == wstart_b).all())
    log(f"fanout wstart == bisect wstart: {ok2}")


if __name__ == "__main__":
    main()

"""On-chip drive of the round-2 kernels: kv merge, compaction, composed_dma."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from lsdradixsort_tpu.core.timing import time_fn
from lsdradixsort_tpu.ops.sort import merge_sort_with_ranks, sort
from lsdradixsort_tpu.ops.filter import filter_keys

t0 = time.time()
N = 1 << 27


def stamp(msg):
    print(f"{msg} [{time.time()-t0:.0f}s]", flush=True)


keys = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
keys_np = np.asarray(keys)

# ---- kv merge sort (stable, payload = row index) ----
fmr = jax.jit(merge_sort_with_ranks)
sk, perm = fmr(keys)
skn = np.asarray(sk)
pn = np.asarray(perm)
want_perm = np.argsort(keys_np, kind="stable")
ok = bool((pn == want_perm).all()) and bool((skn == keys_np[want_perm]).all())
stamp(f"VERIFY merge_sort_with_ranks 2^27: {ok}")
del skn, pn
if ok:
    t = time_fn(fmr, keys, iters=4)
    stamp(f"kv merge sort: {t.ms:.1f} ms {N/t.seconds/1e9:.3f} Gelem/s")

# ---- streaming compaction (filter) ----
lo, hi = jnp.uint32(1 << 30), jnp.uint32(3 << 30)
ffilt = jax.jit(lambda k: filter_keys(k, lo, hi))
cnt, packed = ffilt(keys)
sel = keys_np[(keys_np >= (1 << 30)) & (keys_np < (3 << 30))]
okf = int(cnt) == sel.size and bool(
    (np.asarray(packed)[: sel.size] == sel).all())
stamp(f"VERIFY filter/compaction 2^27 (sel={sel.size/N:.2f}): {okf}")
if okf:
    t = time_fn(ffilt, keys, iters=4)
    stamp(f"filter: {t.ms:.1f} ms {N/t.seconds/1e9:.3f} Gelem/s")

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

# ---- composed_dma (r=4 and r=6) at 2^24 ----
n2 = 1 << 24
k2 = keys[:n2]
k2n = keys_np[:n2]
w2 = np.sort(k2n)
for r in (4, 6):
    fc = jax.jit(lambda k, r=r: sort(k, strategy="composed_dma", r=r))
    got = np.asarray(fc(k2))
    okc = bool((got == w2).all())
    stamp(f"VERIFY composed_dma r={r} 2^24: {okc}")
    if okc:
        t = time_fn(fc, k2, iters=3)
        stamp(f"composed_dma r={r}: {t.ms:.1f} ms "
              f"{n2/t.seconds/1e9*1e3:.1f} Melem/s")

"""On-chip end-to-end exercise of bigsort's overflow (skew) gather-
fallback patch path (VERDICT r4 #8).

Adversarial distribution: each run holds a disjoint key range, so early
chunks draw their entire mass from ONE run; with the merge buffer shrunk
(buf 2^18 -> quarter capacity 32 blocks < the 64 blocks a 2^17-row chunk
needs from a single run) those chunks overflow the kernel's quarter
contract and must be computed by the exact gather+sort fallback program
and patched into the range (ops/bigsort.py merge_runs_chunked).

Verifies the full output bit-exactly against numpy on the host.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from lsdradixsort_tpu.core.cache import enable_persistent_cache  # noqa: E402
from lsdradixsort_tpu.ops.bigsort import merge_runs_chunked  # noqa: E402
from lsdradixsort_tpu.kernels import merge as M  # noqa: E402

enable_persistent_cache()
S, L = 8, 1 << 18
BLK = 2048
BUF = 1 << 18
CLOG = 17


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", flush=True)


rng = np.random.default_rng(11)
ks, vs = [], []
for s in range(S):
    lo = s * (2 ** 28)
    ks.append(np.sort(rng.integers(lo, lo + 1000, L).astype(np.uint32)))
    vs.append(np.arange(s * L, (s + 1) * L, dtype=np.uint32))

# confirm the geometry actually overflows (host-side table check)
C = 1 << CLOG
qcap = BUF // 4 // BLK
tab, _ = jax.jit(lambda rk: M.merge_tables_exact_runs(
    rk, chunk_elems=C, blk=BLK))([jnp.asarray(k) for k in ks])
tab = np.asarray(tab)
nch = S * L // C
pair = tab[:nch, M.KWAY:2 * M.KWAY:2] + tab[:nch, M.KWAY + 1:2 * M.KWAY:2]
n_over = int((pair.max(axis=1) > qcap).sum())
log(f"nchunks={nch} qcap={qcap} blocks, overflow chunks={n_over}")
assert n_over > 0, "geometry failed to force an overflow chunk"

outs = merge_runs_chunked(
    [[jnp.asarray(k) for k in ks], [jnp.asarray(v) for v in vs]],
    chunk_log2=CLOG, nranges=2, blk=BLK, buf_elems=BUF)
got_k = np.concatenate([np.asarray(r) for r in outs[0]])
got_v = np.concatenate([np.asarray(r) for r in outs[1]])
allk, allv = np.concatenate(ks), np.concatenate(vs)
order = np.lexsort((allv, allk))
ok = bool((got_k == allk[order]).all()) and bool((got_v == allv[order]).all())
log(f"VERIFY skew-fallback merge n=2^{21} ({n_over} overflow chunks "
    f"patched): {'OK' if ok else 'FAILED'}")
sys.exit(0 if ok else 1)

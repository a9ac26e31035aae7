"""On-chip drive of the merge sort: correctness + timing vs jax.lax.sort."""
import sys
import time
import jax
import jax.numpy as jnp
import numpy as np

from lsdradixsort_tpu.core.timing import time_fn
from lsdradixsort_tpu.ops.sort import merge_sort_keys

t0 = time.time()
NLOG = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N = 1 << NLOG

x = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
jax.block_until_ready(x)
print(f"data ready {time.time()-t0:.0f}s", flush=True)

f = jax.jit(merge_sort_keys)
out = f(x)
got = np.asarray(out)
print(f"merge compiled+ran {time.time()-t0:.0f}s", flush=True)
want = np.sort(np.asarray(x))
ok = bool((got == want).all())
print(f"VERIFY merge_sort_keys n=2^{NLOG}: {ok}", flush=True)
if not ok:
    bad = np.nonzero(got != want)[0]
    print(f"  first mismatch at {bad[0]}: got {got[bad[0]]} want {want[bad[0]]}"
          f" ({bad.size} mismatches)", flush=True)
    sys.exit(1)

t = time_fn(f, x, iters=5)
print(f"merge sort: {t.ms:.1f} ms  {N/t.seconds/1e9:.3f} Gelem/s", flush=True)

g = jax.jit(lambda a: jax.lax.sort(a))
jax.block_until_ready(g(x))
t2 = time_fn(g, x, iters=5)
print(f"lax.sort  : {t2.ms:.1f} ms  {N/t2.seconds/1e9:.3f} Gelem/s "
      f"speedup {t2.seconds/t.seconds:.2f}x", flush=True)

"""On-chip r=8 histogram A/B: cb=8 vs the r5 two-level cb=4 kernel
(VERDICT r4 #6). Verifies both against the numpy golden first.

Run: timeout 2400 python exp/probe_hist_r8_r5.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from lsdradixsort_tpu.core.cache import enable_persistent_cache  # noqa: E402
from lsdradixsort_tpu.core.timing import time_fn  # noqa: E402
from lsdradixsort_tpu.kernels.histogram import block_digit_histograms  # noqa: E402
from lsdradixsort_tpu import golden  # noqa: E402

enable_persistent_cache()
import os
N = 1 << int(os.environ.get('NLOG', '24'))
BLOCK = 1 << 15


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", flush=True)


keys = jax.random.bits(jax.random.PRNGKey(3), (N,), dtype=jnp.uint32)
keys_np = np.asarray(keys)
want = golden.digit_histograms(keys_np, 8, 0, BLOCK)

for cb in (4, 8):
    fn = jax.jit(lambda k, cb=cb: block_digit_histograms(
        k, 8, 0, BLOCK, counter_bits=cb))
    t0 = time.perf_counter()
    got = np.asarray(fn(keys))
    log(f"cb={cb}: first call {time.perf_counter() - t0:.1f} s; "
        f"verify {'OK' if (got == want).all() else 'FAILED'}")
    assert (got == want).all(), f"cb={cb} mismatch"
    t = time_fn(fn, keys, iters=10, warmup=2)
    log(f"cb={cb}: {t.ms:.2f} ms = {4 * N / t.seconds / 1e9:.1f} GB/s read")

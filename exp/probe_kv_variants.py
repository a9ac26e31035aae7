"""Which XLA kv-sort formulation is fastest at 2^27 on v5e?"""
import jax
import jax.numpy as jnp
from lsdradixsort_tpu.core.timing import time_fn

N = 1 << 27
keys = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
vals = jnp.arange(N, dtype=jnp.uint32)

variants = {
    "stable num_keys=1": jax.jit(
        lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True)),
    "unstable nk=2 (iota tiebreak)": jax.jit(
        lambda k, v: jax.lax.sort((k, v), num_keys=2, is_stable=False)),
    "unstable nk=1": jax.jit(
        lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=False)),
    "keys only stable": jax.jit(
        lambda k, v: jax.lax.sort((k,), num_keys=1, is_stable=True)),
    "keys only unstable": jax.jit(lambda k, v: jax.lax.sort(k)),
}
for name, f in variants.items():
    t = time_fn(f, keys, vals, iters=3, warmup=2)
    print(f"{name:32s} {t.ms:9.1f} ms  {N/t.seconds/1e9:.3f} Gelem/s")

"""Compile-only HBM accounting for 2^30 variants (chipless)."""
import sys
import jax
import jax.numpy as jnp
from lsdradixsort_tpu.ops.sort import merge_sort_keys

N = 1 << 30


def run(name, fn, *avals):
    try:
        c = jax.jit(fn).lower(*avals).compile()
        m = c.memory_analysis()
        print(f"{name}: temp={m.temp_size_in_bytes/2**30:.2f}GiB "
              f"args={m.argument_size_in_bytes/2**30:.2f} "
              f"out={m.output_size_in_bytes/2**30:.2f}", flush=True)
    except Exception as e:
        msg = [ln for ln in str(e).splitlines() if "Ran out" in ln or
               "Exceeded" in ln][:1]
        print(f"{name}: FAIL {msg}", flush=True)


def sort_only(seed):
    keys = jax.random.bits(jax.random.PRNGKey(seed), (N,), dtype=jnp.uint32)
    out, _ = merge_sort_keys(keys, skew_fallback=False)
    return out[:128]


run("halved sort_only(seed)", sort_only,
    jax.ShapeDtypeStruct((), jnp.int32))


def sort_arg(keys):
    out, _ = merge_sort_keys(keys, skew_fallback=False)
    return out[:128]


run("halved sort(arg)", sort_arg, jax.ShapeDtypeStruct((N,), jnp.uint32))

"""Compile-only memory analysis of the merge sort at 2^27 (no chip needed)."""
import jax
import jax.numpy as jnp
from lsdradixsort_tpu.ops.sort import merge_sort_keys

N = 1 << 27
x = jax.ShapeDtypeStruct((N,), jnp.uint32)


def run(name, fn):
    c = jax.jit(fn).lower(x).compile()
    m = c.memory_analysis()
    print(f"{name}: temp={m.temp_size_in_bytes/2**30:.2f}GiB "
          f"args={m.argument_size_in_bytes/2**30:.2f} "
          f"out={m.output_size_in_bytes/2**30:.2f}", flush=True)


run("merge fallback=True ", lambda a: merge_sort_keys(a))
run("merge fallback=False", lambda a: merge_sort_keys(a,
                                                      skew_fallback=False))

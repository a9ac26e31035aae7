"""Bisect which stage of the 2^30 pipeline owns the HBM peak (chipless)."""
import jax
import jax.numpy as jnp
from lsdradixsort_tpu.kernels import merge as M
from lsdradixsort_tpu.kernels.tile_sort import sort_tiles

N = 1 << 30
TILE = 1 << 15


def run(name, fn, *avals):
    try:
        c = jax.jit(fn).lower(*avals).compile()
        m = c.memory_analysis()
        print(f"{name}: temp={m.temp_size_in_bytes/2**30:.2f}GiB "
              f"args={m.argument_size_in_bytes/2**30:.2f} "
              f"out={m.output_size_in_bytes/2**30:.2f}", flush=True)
    except Exception as e:
        ms = [ln for ln in str(e).splitlines() if "Exceeded" in ln]
        print(f"{name}: FAIL {ms[:1]}", flush=True)


seed_aval = jax.ShapeDtypeStruct((), jnp.int32)


def gen_tile(seed):
    keys = jax.random.bits(jax.random.PRNGKey(seed), (N,), dtype=jnp.uint32)
    return sort_tiles(keys, tile_rows=TILE // 128)[:128]


run("gen+tile_sort", gen_tile, seed_aval)


def gen_tile_p1(seed):
    keys = jax.random.bits(jax.random.PRNGKey(seed), (N,), dtype=jnp.uint32)
    x = sort_tiles(keys, tile_rows=TILE // 128)
    tab, ok = M.merge_pass_tables(x, TILE, M.pass_buf_elems(TILE), M.DEF_BLK)
    x = M.merge_pass(x, tab, run_len=TILE, buf_elems=M.pass_buf_elems(TILE))
    return x[:128]


run("gen+tile+pass1", gen_tile_p1, seed_aval)


def gen_tile_p12(seed):
    keys = jax.random.bits(jax.random.PRNGKey(seed), (N,), dtype=jnp.uint32)
    x = sort_tiles(keys, tile_rows=TILE // 128)
    run_len = TILE
    for _ in range(2):
        buf = M.pass_buf_elems(run_len)
        tab, ok = M.merge_pass_tables(x, run_len, buf, M.DEF_BLK)
        x = M.merge_pass(x, tab, run_len=run_len, buf_elems=buf)
        run_len *= 8
    return x[:128]


run("gen+tile+pass1+pass2", gen_tile_p12, seed_aval)

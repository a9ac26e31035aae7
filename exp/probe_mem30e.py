"""Bisect the single-pass (2^24->2^27 runs) program's 16 GB peak."""
import jax
import jax.numpy as jnp
from lsdradixsort_tpu.kernels import merge as M

N = 1 << 30
RUN = 1 << 27
BUF = M.pass_buf_elems(RUN)


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


xa = jax.ShapeDtypeStruct((N,), jnp.uint32)
spc = M.pass_spc(RUN, BUF, M.DEF_BLK)
S = RUN // M.DEF_BLK
nch = -(-(M.KWAY * S) // spc)
ng = (N // RUN) // M.KWAY
pad_ch = -(-ng * nch // 8) * 8
tabs = jax.ShapeDtypeStruct((pad_ch, M.NCOLS), jnp.int32)

run("prepass only", lambda x: M.merge_pass_tables(x, RUN, BUF)[0], xa)
run("kernel only", lambda x, t: M.merge_pass(x, t, run_len=RUN,
                                             buf_elems=BUF)[:128], xa, tabs)
run("prepass+kernel",
    lambda x: M.merge_pass(x, M.merge_pass_tables(x, RUN, BUF)[0],
                           run_len=RUN, buf_elems=BUF)[:128], xa)

import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)

def try_case(name, fn):
    try:
        ok = fn()
        print(f"{name}: OK {ok}")
    except Exception as e:
        msg = str(e).replace('\n', ' | ')[:500]
        print(f"{name}: FAILED {msg}")

# sublane gather with S=8
def case_sub8():
    S, L = 8, 128
    x = jnp.arange(S * L, dtype=jnp.int32).reshape(S, L)
    idx = jnp.asarray(rng.permuted(np.broadcast_to(np.arange(S)[:, None], (S, L)), axis=0).astype(np.int32))
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
    return np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), 0))
try_case("sublane gather S=8", case_sub8)

# sublane gather with S=32
def case_sub32():
    S, L = 32, 128
    x = jnp.arange(S * L, dtype=jnp.int32).reshape(S, L)
    idx = jnp.asarray(rng.permuted(np.broadcast_to(np.arange(S)[:, None], (S, L)), axis=0).astype(np.int32))
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
    return np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), 0))
try_case("sublane gather S=32", case_sub32)

# lane gather with wide rows: (8, 512)? lane-gather across >128 via reshape semantics
def case_lane512():
    S, L = 8, 512
    x = jnp.arange(S * L, dtype=jnp.int32).reshape(S, L)
    idx = jnp.asarray(rng.permuted(np.broadcast_to(np.arange(L)[None, :], (S, L)), axis=1).astype(np.int32))
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
    return np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), 1))
try_case("lane gather L=512", case_lane512)

def case_lane2048():
    S, L = 64, 2048
    x = jnp.arange(S * L, dtype=jnp.int32).reshape(S, L)
    idx = jnp.asarray(rng.permuted(np.broadcast_to(np.arange(L)[None, :], (S, L)), axis=1).astype(np.int32))
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
    return np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), 1))
try_case("lane gather (64,2048)", case_lane2048)

# DMA: static offset first, 2D shapes, proper sem type
def case_dma_static():
    C = 8
    xs = jnp.arange(C * 128, dtype=jnp.int32).reshape(C, 128)
    def k(x_ref, o_ref, sem):
        cp = pltpu.make_async_copy(x_ref, o_ref.at[pl.ds(8, C), :], sem)
        cp.start(); cp.wait()
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((C * 4, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(xs)
    return np.array_equal(np.asarray(out)[8:16], np.asarray(xs))
try_case("DMA static offset VMEM->ANY 2D", case_dma_static)

# DMA dynamic offset from SMEM scalar
def case_dma_dyn():
    C = 8
    xs = jnp.arange(C * 128, dtype=jnp.int32).reshape(C, 128)
    ofs = jnp.array([16], dtype=jnp.int32)
    def k(o_ref_smem, x_ref, o_ref, sem):
        cp = pltpu.make_async_copy(x_ref, o_ref.at[pl.ds(o_ref_smem[0], C), :], sem)
        cp.start(); cp.wait()
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((C * 4, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(ofs, xs)
    return np.array_equal(np.asarray(out)[16:24], np.asarray(xs))
try_case("DMA dynamic offset", case_dma_dyn)

# DMA inside dynamic-trip-count fori
def case_dma_fori():
    C = 8
    xs = jnp.arange(C * 128, dtype=jnp.int32).reshape(C, 128)
    n = jnp.array([3, 8], dtype=jnp.int32)
    def k(n_ref, x_ref, o_ref, sem):
        def body(i, _):
            cp = pltpu.make_async_copy(x_ref, o_ref.at[pl.ds(n_ref[1] + i * C, C), :], sem)
            cp.start(); cp.wait()
            return 0
        jax.lax.fori_loop(0, n_ref[0], body, 0, unroll=False)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((C * 8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(n, xs)
    o = np.asarray(out)
    return all(np.array_equal(o[8 + i * C: 8 + (i+1) * C], np.asarray(xs)) for i in range(3))
try_case("DMA in dynamic fori", case_dma_fori)

# DMA with dynamic SRC offset (VMEM src sliced dynamically)
def case_dma_dynsrc():
    xs = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    ofs = jnp.array([24], dtype=jnp.int32)
    def k(s_ref, x_ref, o_ref, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(s_ref[0], 8), :], o_ref.at[pl.ds(0, 8), :], sem)
        cp.start(); cp.wait()
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(ofs, xs)
    return np.array_equal(np.asarray(out), np.asarray(xs)[24:32])
try_case("DMA dynamic src offset", case_dma_dynsrc)

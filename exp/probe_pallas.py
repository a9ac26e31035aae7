"""Probe Pallas TPU capabilities: in-kernel gather, dynamic-offset DMA."""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print([n for n in dir(pltpu) if 'gather' in n.lower() or 'roll' in n.lower() or 'dyn' in n.lower()])

# --- 1. take_along_axis along sublanes inside a kernel ---
def k_gather_sub(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

S, L = 256, 128
x = jnp.arange(S * L, dtype=jnp.int32).reshape(S, L)
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.permuted(np.broadcast_to(np.arange(S)[:, None], (S, L)), axis=0).astype(np.int32))
try:
    out = pl.pallas_call(
        k_gather_sub,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ok = np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), 0))
    print("take_along_axis axis=0 (sublane) S=256: OK", ok)
except Exception as e:
    print("take_along_axis axis=0 FAILED:", str(e)[:300])

# --- 2. along lanes ---
def k_gather_lane(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
idx1 = jnp.asarray(rng.permuted(np.broadcast_to(np.arange(L)[None, :], (S, L)), axis=1).astype(np.int32))
try:
    out = pl.pallas_call(
        k_gather_lane,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx1)
    ok = np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx1), 1))
    print("take_along_axis axis=1 (lane): OK", ok)
except Exception as e:
    print("take_along_axis axis=1 FAILED:", str(e)[:300])

# --- 3. full flat gather via x.reshape? one-hot-free arbitrary gather: x[idx] 1D in kernel ---
def k_gather_flat(x_ref, i_ref, o_ref):
    o_ref[:] = x_ref[i_ref[:]]
try:
    xf = jnp.arange(S * L, dtype=jnp.int32).reshape(S, L)
    idxf = jnp.asarray(rng.permutation(S * L).reshape(S, L).astype(np.int32))
    def k(x_ref, i_ref, o_ref):
        flat = x_ref[:].reshape(-1)
        o_ref[:] = flat[i_ref[:].reshape(-1)].reshape(S, L)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(xf, idxf)
    ok = np.array_equal(np.asarray(out).ravel(), np.asarray(xf).ravel()[np.asarray(idxf).ravel()])
    print("flat arbitrary gather: OK", ok)
except Exception as e:
    print("flat arbitrary gather FAILED:", str(e)[:300])

# --- 4. DMA VMEM->HBM(ANY) with dynamic dst offset, static size; dynamic fori trip count ---
def k_dma(n_ref, x_ref, o_ref, sem):
    # write x (C elems) at dynamic offset ofs, n times back to back
    C = 8 * 128
    def body(i, _):
        ofs = n_ref[0] + i * C
        cp = pltpu.make_async_copy(x_ref, o_ref.at[pl.ds(ofs, C)], sem)
        cp.start()
        cp.wait()
        return 0
    jax.lax.fori_loop(0, n_ref[1], body, 0)
try:
    C = 8 * 128
    xs = jnp.arange(C, dtype=jnp.int32)
    nofs = jnp.array([C // 2, 3], dtype=jnp.int32)  # dynamic offset 512, 3 copies
    out = pl.pallas_call(
        k_dma,
        out_shape=jax.ShapeDtypeStruct((C * 8,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(nofs, xs)
    o = np.asarray(out)
    ok = all(np.array_equal(o[C//2 + i*C : C//2 + (i+1)*C], np.arange(C)) for i in range(3))
    print("dynamic-offset DMA + dynamic fori: OK", ok)
except Exception as e:
    print("dynamic DMA FAILED:", str(e)[:300])

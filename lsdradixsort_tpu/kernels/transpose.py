"""Matrix transpose.

The reference needs TransposeSMEMKernel (LSDRadixSort.cu:512-544) to reorder
per-block histograms digit-major before the global scan (cu:877-895), with a
hand-tiled shared-memory kernel and an axis-swap mode to dodge CUDA grid
limits. On TPU this is a non-problem: XLA lowers transposes to relayout
copies that run at HBM bandwidth, so the idiomatic implementation is
jnp.transpose (SURVEY.md C6). A Pallas tiled variant is provided for parity
with the reference's benchmark suite and as a template for fused layouts.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.jit
def transpose(a: jax.Array) -> jax.Array:
    """Transpose a 2-D array (Transpose golden: LSDRadixSort.cu:483-494)."""
    return a.T


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _tr_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def transpose_tiled(a: jax.Array, tile: int = 256,
                    interpret: bool | None = None) -> jax.Array:
    """Pallas tiled transpose (TransposeSMEMKernel equiv, cu:512-544).

    Requires both dims divisible by `tile`. Exists to benchmark against the
    XLA transpose; XLA wins or ties, which is the point (SURVEY.md C6).
    """
    if interpret is None:
        interpret = _interpret_default()
    rows, cols = a.shape
    if rows % tile or cols % tile:
        raise ValueError(f"dims {a.shape} must be divisible by tile={tile}")
    return pl.pallas_call(
        _tr_kernel,
        grid=(rows // tile, cols // tile),
        in_specs=[pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cols, rows), a.dtype),
        interpret=interpret,
    )(a)

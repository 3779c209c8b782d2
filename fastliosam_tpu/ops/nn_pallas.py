"""Pallas TPU kernel: fused brute-force nearest neighbors.

The XLA path (`loop/icp.nearest_neighbors`) materializes an (N, chunk)
distance block in HBM per chunk and reduces it with separate min/argmin
ops. This kernel keeps everything in VMEM: for each source tile it loops
the destination chunks on the grid, computes the dot-product block on the
MXU, forms squared distances, and maintains the running (min, argmin) in
the revisited output block — the N×M distance matrix never exists.

Memory layout is TPU-native: points are passed transposed (3, N) so the
point axis is the 128-lane dimension; the (TM, TN) distance block has both
axes MXU/VPU aligned.

Used by loop-closure ICP (50 NN rounds per verification,
`loop_closure.cpp:69-92` budget); falls back to the XLA path off-TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e12


def pallas_supported() -> bool:
    return jax.default_backend() == "tpu"


def _nn_kernel(src_ref, dst_ref, dmask_ref, d2_ref, idx_ref):
    """Grid = (src_tiles, dst_chunks); dst-minor iteration revisits the
    output block of the current source tile."""
    j = pl.program_id(1)
    tm = dst_ref.shape[1]

    s = src_ref[...]  # (3, TN)
    d = dst_ref[...]  # (3, TM)
    mask = dmask_ref[...]  # (1, TM) float32 (1 valid / 0 pad)

    # squared distances: |d|^2 - 2 d·s + |s|^2 (drop |s|^2 — constant per
    # column, irrelevant to argmin; add it back at the end? not needed:
    # only relative order matters per source point, but the returned d2
    # must be real — so keep it)
    s2 = jnp.sum(s * s, axis=0, keepdims=True)  # (1, TN)
    d2c = jnp.sum(d * d, axis=0, keepdims=True)  # (1, TM)
    dot = jax.lax.dot_general(
        d, s, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, TN)
    dist = d2c.T + s2 - 2.0 * dot  # (TM, TN)
    dist = jnp.where(mask.T > 0.0, dist, _BIG)

    tn = d2_ref.shape[1]
    cmin = jnp.broadcast_to(jnp.min(dist, axis=0, keepdims=True), (8, tn))
    carg = jnp.broadcast_to(
        jnp.argmin(dist, axis=0).astype(jnp.int32).reshape(1, -1) + j * tm,
        (8, tn),
    )

    @pl.when(j == 0)
    def _():
        d2_ref[...] = cmin
        idx_ref[...] = carg

    @pl.when(j > 0)
    def _():
        better = cmin < d2_ref[...]
        d2_ref[...] = jnp.where(better, cmin, d2_ref[...])
        idx_ref[...] = jnp.where(better, carg, idx_ref[...])


@partial(jax.jit, static_argnames=("tn", "tm", "interpret"))
def nearest_neighbors_pallas(src, dst, dst_mask, tn: int = 256, tm: int = 2048,
                             interpret: bool = False):
    """For each src point (N, 3): index + squared distance of the nearest
    valid dst point (M, 3). Pads N to ``tn`` and M to ``tm`` multiples."""
    n = src.shape[0]
    m = dst.shape[0]
    n_pad = (-n) % tn
    m_pad = (-m) % tm
    srcp = jnp.concatenate(
        [src, jnp.full((n_pad, 3), 1e6, src.dtype)], axis=0
    ) if n_pad else src
    dstp = jnp.concatenate(
        [dst, jnp.full((m_pad, 3), 1e6, dst.dtype)], axis=0
    ) if m_pad else dst
    maskp = jnp.concatenate(
        [dst_mask, jnp.zeros((m_pad,), bool)], axis=0
    ) if m_pad else dst_mask

    st = srcp.T  # (3, Np)
    dt = dstp.T  # (3, Mp)
    mrow = maskp.astype(jnp.float32).reshape(1, -1)
    n_tiles = st.shape[1] // tn
    m_chunks = dt.shape[1] // tm

    d2, idx = pl.pallas_call(
        _nn_kernel,
        grid=(n_tiles, m_chunks),
        in_specs=[
            pl.BlockSpec((3, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_tiles * tn), jnp.float32),
            jax.ShapeDtypeStruct((8, n_tiles * tn), jnp.int32),
        ],
        interpret=interpret,
    )(st, dt, mrow)

    d2 = jnp.maximum(d2[0, :n], 0.0)
    idx = idx[0, :n]
    return idx, d2

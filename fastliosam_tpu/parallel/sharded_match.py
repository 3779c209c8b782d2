"""Point-axis (tensor-parallel) sharding for scan matching.

For huge scans (HDL-64 ~130k points) the residual/Jacobian/Gram work of the
iEKF update shards along the point axis: each device holds a point shard,
computes its (N_local, 6) Jacobian block, reduces the 6x6 Gram + rhs
locally, and a single `psum` combines them — the collective payload is 42
floats regardless of scan size.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sharded_gram(A, w, r, mesh: Mesh, axis: str = "pt"):
    """``A (N,6)``, weights ``w (N,)``, residuals ``r (N,)`` sharded on the
    leading dim -> replicated ``(G (6,6), b (6,), n_valid)``."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def f(Al, wl, rl):
        Aw = Al * wl[:, None]
        G = jax.lax.psum(Al.T @ Aw, axis)
        b = jax.lax.psum(Aw.T @ rl, axis)
        n = jax.lax.psum(jnp.sum((wl > 0).astype(jnp.int32)), axis)
        return G, b, n

    return f(A, w, r)

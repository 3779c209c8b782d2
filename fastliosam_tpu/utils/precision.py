"""Geometry-precision policy.

TPU MXU matmuls default to bf16 passes for f32 inputs, which silently
degrades SE(3) geometry: pose composition, point transforms, residuals and
Gram accumulation all lose ~2⁻⁸ relative precision — measured on the
odometry bench as ATE 0.19 m vs 0.051 m (~4x) for only ~10% throughput,
and as a pose-graph "optimum" cost of 79.8 on an exactly-consistent graph
whose true optimum is 0. Geometry code therefore runs under
``jax.default_matmul_precision("highest")`` (f32-accurate everywhere); the
deliberately-bf16-tolerant kernels (none currently) must opt out locally.
"""
from __future__ import annotations

import functools

import jax


def geometry_precision(fn):
    """Decorator: trace ``fn`` with highest (f32-accurate) matmul
    precision. Applied at pipeline entry points so every nested SE(3)/
    residual/Gram matmul inherits it."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped

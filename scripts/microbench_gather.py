#!/usr/bin/env python
"""Microbenchmark: narrow per-slot gathers vs bucketed wide-row gathers.

Hypothesis (DESIGN.md 2c): the odometry step is random-access-latency bound
on the voxel hash table. The current layout pays, per merged3 query round,
3 coords x (4 fingerprint probe gathers + 1 moment gather) = 15 narrow
gathers of N rows. A 4-slot bucketed layout pays 3 gathers of (N, 44B)
rows. If wide-row gathers cost about the same as narrow ones (latency, not
bandwidth, bound), the bucketed layout is ~5x fewer transactions.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

C = 1 << 19          # slots
B = C // 4           # buckets
N = 8192             # queries per pass
REPS = 50

rng = np.random.default_rng(0)
fp = jnp.asarray(rng.integers(1, 1 << 30, size=(C,), dtype=np.int32))
moments = jnp.asarray(rng.normal(size=(C, 10)).astype(np.float32))
# fused bucket table: (B, 4, 11) f32, [...,0] = fp bitcast
tbl = jnp.concatenate(
    [
        jax.lax.bitcast_convert_type(fp, jnp.float32).reshape(B, 4, 1),
        moments.reshape(B, 4, 10),
    ],
    axis=-1,
)
idx = jnp.asarray(rng.integers(0, C, size=(N,), dtype=np.int32))
bid = idx >> 2


@jax.jit
def narrow(fp, moments, h0):
    """Current scheme: one merged3 query round = 3 coords x (4 fp probes +
    1 moment gather)."""
    acc = jnp.zeros((N, 10), jnp.float32)
    tot = jnp.zeros((N,), jnp.int32)
    for c in range(3):
        h = (h0 + c * 977) & (C - 1)
        slots = jnp.full((N,), -1, jnp.int32)
        for p in range(4):
            cand = (h + p) & (C - 1)
            match = fp[cand] > (p + 1) * (1 << 27)  # arbitrary predicate
            slots = jnp.where((slots < 0) & match, cand, slots)
        sl = jnp.clip(slots, 0, C - 1)
        acc = acc + moments[sl] * (slots >= 0).astype(jnp.float32)[:, None]
        tot = tot + slots
    return acc.sum(), tot.sum()


@jax.jit
def bucketed(tbl, b0):
    """Bucketed scheme: 3 coords x 1 wide-row gather (fp+moments fused)."""
    acc = jnp.zeros((N, 10), jnp.float32)
    tot = jnp.zeros((N,), jnp.int32)
    for c in range(3):
        b = (b0 + c * 977) & (B - 1)
        row = tbl[b]  # (N, 4, 11) one gather
        fpl = jax.lax.bitcast_convert_type(row[..., 0], jnp.int32)
        match = fpl > (c + 1) * (1 << 27)
        lane = jnp.argmax(match, axis=-1)
        found = jnp.any(match, axis=-1)
        mom = jnp.take_along_axis(
            row[..., 1:], lane[:, None, None], axis=1
        )[:, 0, :]
        acc = acc + mom * found.astype(jnp.float32)[:, None]
        tot = tot + lane
    return acc.sum(), tot.sum()


@jax.jit
def narrow_scatter(moments, h0, upd):
    return moments.at[h0].add(upd)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3


print("backend:", jax.default_backend())
t_n = timeit(narrow, fp, moments, idx)
t_b = timeit(bucketed, tbl, bid)
upd = jnp.ones((N, 10), jnp.float32)
t_s = timeit(narrow_scatter, moments, idx, upd)
print(f"narrow 3x(4 fp + 1 mom) gathers : {t_n:8.3f} ms")
print(f"bucketed 3x wide-row gathers    : {t_b:8.3f} ms   ({t_n / t_b:.2f}x)")
print(f"one (8k,10) scatter-add         : {t_s:8.3f} ms")

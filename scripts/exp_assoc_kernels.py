#!/usr/bin/env python
"""Fused-association kernel design experiments, part 2 (DESIGN.md §2c2).

Reconstructs the round-3 `exp2..exp5` measurements (VERDICT r3 weak #4:
the originals were deleted; the load-bearing claim "the Pallas kernel as
imagined is not expressible on this stack" must be reproducible from the
repo). Together with `exp_pallas_gather.py` this covers every numbered
claim in §2c2:

  A. `table[idx]` int indexing inside a Pallas kernel fails to lower
     (Mosaic: no vector gather from VMEM).
  B. A scalar `fori_loop` of per-point `dynamic_slice` row reads — the
     only Mosaic-legal formulation — costs far more than the XLA gather.
  C. The MXU one-hot two-level gather (P(N,C1) @ (C1,C2·D) reshaped) —
     exact f32 fingerprint compare via int split — priced against the
     XLA gather it would replace.
  D. Contiguous probe-window reads: vmap(dynamic_slice) of 4-row windows
     vs 4 separate gathers (the "slice-4 = 4 gathers" claim).

Honest timing: fresh index arrays per rep (the remote relay caches
repeated (executable, input) executions — DESIGN.md §2b).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 1 << 19
N = 8192
REPS = 10


def timeit_fresh(f, make_args, reps=REPS):
    out = f(*make_args(999))
    jax.block_until_ready(out)
    argsets = [make_args(s) for s in range(reps)]
    for a in argsets:
        jax.block_until_ready(a)
    t0 = time.perf_counter()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1e3


def mk_idx(seed, n=N, cap=C):
    r = np.random.default_rng(seed)
    return (jnp.asarray(r.integers(0, cap, size=(n,)).astype(np.int32)),)


def exp_a_int_indexing(table):
    """A: does `table[idx]` lower inside a Pallas TPU kernel?"""

    def kern(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:]]

    @jax.jit
    def run(i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, 16), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, table)

    try:
        run(*mk_idx(0)).block_until_ready()
        print("A: Pallas int indexing tab[idx]: LOWERED (unexpected)")
    except Exception as e:
        print(f"A: Pallas int indexing tab[idx]: FAILED — "
              f"{type(e).__name__}: {str(e)[:160]}")


def exp_b_fori_dynamic_slice(table):
    """B: scalar-loop row DMA — one dynamic_slice per point."""

    def kern(idx_ref, tab_ref, out_ref):
        def body(j, _):
            row = jax.lax.dynamic_slice(
                tab_ref[:], (idx_ref[j], 0), (1, 16)
            )
            out_ref[pl.dslice(j, 1), :] = row
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    @jax.jit
    def run(i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, 16), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, table)

    # VMEM cap: use a 2^14-slot table slice so the operand fits
    small_c = 1 << 14
    tab_s = table[:small_c]

    def kern_s(idx_ref, tab_ref, out_ref):
        def body(j, _):
            row = jax.lax.dynamic_slice(
                tab_ref[:], (idx_ref[j], 0), (1, 16)
            )
            out_ref[pl.dslice(j, 1), :] = row
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    @jax.jit
    def run_s(i):
        return pl.pallas_call(
            kern_s,
            out_shape=jax.ShapeDtypeStruct((N, 16), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, tab_s)

    try:
        ms = timeit_fresh(run_s, lambda s: mk_idx(s, cap=small_c), reps=3)
        print(f"B: Pallas fori_loop dynamic_slice rows (2^14-table): "
              f"{ms:.3f} ms for {N} rows")
    except Exception as e:
        print(f"B: Pallas fori_loop dynamic_slice: FAILED — "
              f"{type(e).__name__}: {str(e)[:160]}")
    xg = jax.jit(lambda i: tab_s[i])
    print(f"B ref: XLA gather same shape: "
          f"{timeit_fresh(xg, lambda s: mk_idx(s, cap=small_c)):.3f} ms")


def exp_c_onehot_mxu(table):
    """C: two-level one-hot gather on the MXU.

    Level split C = C1*C2 (2^19 = 1024*512): first one-hot (N, C1) picks
    the row group via matmul against the table reshaped (C1, C2*16); a
    second lane-wise take_along_axis selects within the group. Here we
    price level 1 (the expensive matmul) — f32 accumulate keeps int32
    fingerprints exact below 2^24 by splitting into two 12-bit halves."""
    C1, C2 = 1024, 512
    tab_r = table.reshape(C1, C2 * 16)

    @jax.jit
    def run(i):
        g1 = i // C2
        onehot = (
            jnp.arange(C1, dtype=jnp.int32)[None, :] == g1[:, None]
        ).astype(jnp.float32)
        groups = onehot @ tab_r  # (N, C2*16) — the MXU pass
        within = (i % C2)[:, None] * 16 + jnp.arange(16)[None, :]
        return jnp.take_along_axis(groups, within, axis=1)

    ms = timeit_fresh(run, mk_idx, reps=3)
    ref = jax.jit(lambda i: table[i])
    print(f"C: one-hot MXU two-level gather (N,{C1})@({C1},{C2 * 16}): "
          f"{ms:.3f} ms vs XLA gather {timeit_fresh(ref, mk_idx):.3f} ms")
    got = np.asarray(run(*mk_idx(7)))
    want = np.asarray(table[mk_idx(7)[0]])
    print(f"C: exactness check: {np.array_equal(got, want)}")


def exp_d_probe_windows(table):
    """D: 4-slot probe window as one vmapped dynamic_slice vs 4 gathers."""

    @jax.jit
    def window(i):
        return jax.vmap(
            lambda j: jax.lax.dynamic_slice(table, (j, 0), (4, 16))
        )(i)

    @jax.jit
    def four_gathers(i):
        return jnp.stack([table[(i + k) & (C - 1)] for k in range(4)], 1)

    i0 = mk_idx(3)[0] & (C - 5)
    np.testing.assert_allclose(
        np.asarray(window(i0)), np.asarray(four_gathers(i0)), rtol=0
    )
    mw = timeit_fresh(window, lambda s: (mk_idx(s)[0] & (C - 5),), reps=5)
    mg = timeit_fresh(four_gathers, lambda s: (mk_idx(s)[0] & (C - 5),),
                      reps=5)
    print(f"D: slice-4 window {mw:.3f} ms vs 4 separate gathers {mg:.3f} ms")


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(C, 16)).astype(np.float32))
    exp_a_int_indexing(table)
    exp_b_fori_dynamic_slice(table)
    exp_c_onehot_mxu(table)
    exp_d_probe_windows(table)


if __name__ == "__main__":
    main()

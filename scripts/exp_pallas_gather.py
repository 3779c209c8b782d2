#!/usr/bin/env python
"""Design experiment for the fused association kernel (VERDICT r2 #2).

Honest timing: FRESH index arrays per rep (the remote relay caches repeated
(executable, input) executions — DESIGN.md §2b).

Questions:
  1. What does an XLA gather of 8192 rows from the (2^19, D) moment table
     actually cost on this chip (fresh inputs)?
  2. Does Mosaic support any vectorized gather inside a Pallas kernel
     ("Only 2D gather is supported" suggests a 2D form exists)?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 1 << 19
N = 8192
REPS = 12


def timeit_fresh(f, make_args, reps=REPS):
    args0 = make_args(999)
    out = f(*args0)
    jax.block_until_ready(out)
    argsets = [make_args(s) for s in range(reps)]
    for a in argsets:
        jax.block_until_ready(a)
    t0 = time.perf_counter()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    table16 = jnp.asarray(rng.normal(size=(C, 16)).astype(np.float32))
    table10 = jnp.asarray(rng.normal(size=(C, 10)).astype(np.float32))
    table128 = jnp.asarray(rng.normal(size=(C, 128)).astype(np.float32))
    table1d = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    def mk_idx(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.integers(0, C, size=(N,)).astype(np.int32)),)

    g = jax.jit(lambda i: table16[i])
    print(f"XLA gather (C,16)[{N}] fresh-idx: {timeit_fresh(g, mk_idx):.3f} ms")
    g10 = jax.jit(lambda i: table10[i])
    print(f"XLA gather (C,10)[{N}] fresh-idx: {timeit_fresh(g10, mk_idx):.3f} ms")
    g128 = jax.jit(lambda i: table128[i])
    print(f"XLA gather (C,128)[{N}] fresh-idx: {timeit_fresh(g128, mk_idx):.3f} ms")
    g1 = jax.jit(lambda i: table1d[i])
    print(f"XLA gather (C,)[{N}] fresh-idx:   {timeit_fresh(g1, mk_idx):.3f} ms")

    # chain of 15 dependent gathers — mimics one association's probe chain
    def chain(i):
        x = i
        for k in range(15):
            x = (table1d[x].astype(jnp.int32) ^ (x + k)) & (C - 1)
        return x

    gc = jax.jit(chain)
    print(f"XLA 15-chained (C,)[{N}] gathers:  {timeit_fresh(gc, mk_idx):.3f} ms")

    # scatter-add (insert path analog)
    def scat(i):
        return jnp.zeros((C, 16), jnp.float32).at[i].add(table16[:N])

    gs = jax.jit(scat)
    print(f"XLA scatter-add (C,16)[{N}]:       {timeit_fresh(gs, mk_idx):.3f} ms")

    # --- Pallas 2D gather forms ---
    # take_along_axis on 2D operands (Mosaic "2D gather")
    def k_tal(idx_ref, tab_ref, out_ref):
        # gather along sublanes: tab (C', 128) idx (N', 128)
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    C2, N2 = 4096, 64  # operand (4096,128), idx (64,128)
    tab2 = jnp.asarray(rng.normal(size=(C2, 128)).astype(np.float32))

    def mk_idx2(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.integers(0, C2, size=(N2, 128)).astype(np.int32)),)

    @jax.jit
    def pallas_tal(i):
        return pl.pallas_call(
            k_tal,
            out_shape=jax.ShapeDtypeStruct((N2, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, tab2)

    try:
        got = pallas_tal(*mk_idx2(0))
        want = jnp.take_along_axis(tab2, mk_idx2(0)[0], axis=0)
        ok = np.allclose(np.asarray(got), np.asarray(want))
        print(f"Pallas take_along_axis axis=0 (4096,128) idx(64,128): OK={ok} "
              f"{timeit_fresh(pallas_tal, mk_idx2):.3f} ms")
    except Exception as e:
        print(f"Pallas take_along_axis axis=0: FAILED — {type(e).__name__}: "
              f"{str(e)[:200]}")

    # axis=1 form: gather within lanes
    def k_tal1(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    tab3 = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32))

    def mk_idx3(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.integers(0, 512, size=(8, 512)).astype(np.int32)),)

    @jax.jit
    def pallas_tal1(i):
        return pl.pallas_call(
            k_tal1,
            out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, tab3)

    try:
        got = pallas_tal1(*mk_idx3(0))
        want = jnp.take_along_axis(tab3, mk_idx3(0)[0], axis=1)
        ok = np.allclose(np.asarray(got), np.asarray(want))
        print(f"Pallas take_along_axis axis=1 (8,512): OK={ok} "
              f"{timeit_fresh(pallas_tal1, mk_idx3):.3f} ms")
    except Exception as e:
        print(f"Pallas take_along_axis axis=1: FAILED — {type(e).__name__}: "
              f"{str(e)[:200]}")

    # big sublane gather: full-table-width gather along axis 0 with a
    # (N,128) index — the shape the association kernel would actually use
    def mk_idxBig(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(
            r.integers(0, C, size=(N, 128)).astype(np.int32)),)

    def k_big(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def pallas_big(i):
        return pl.pallas_call(
            k_big,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, table128)

    try:
        got = pallas_big(*mk_idxBig(0))
        want = jnp.take_along_axis(table128, mk_idxBig(0)[0], axis=0)
        ok = np.allclose(np.asarray(got), np.asarray(want))
        print(f"Pallas take_along_axis axis=0 (2^19,128) idx({N},128): OK={ok} "
              f"{timeit_fresh(pallas_big, mk_idxBig):.3f} ms")
    except Exception as e:
        print(f"Pallas take_along_axis big: FAILED — {type(e).__name__}: "
              f"{str(e)[:200]}")


if __name__ == "__main__":
    main()

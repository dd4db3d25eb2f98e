"""Experiment: in-VMEM dynamic row gather rates on TPU.

Question (PERF.md round-1 item 3): XLA's HBM random-row gather tops out
at ~50M rows/s (per-row descriptor overhead).  If a Pallas kernel can
gather rows from a VMEM-resident block substantially faster, the
locality-bucketed design (DMA a plane region once, select within VMEM)
can break the gather wall.  This measures the candidate in-VMEM select
primitives:

  A. XLA baseline: jnp.take of N random rows from an HBM table.
  B. Pallas equal-shape take_along_axis: block [T, C] in VMEM,
     indices [T, C] int32 -> out [T, C].  (Mosaic dynamic-gather
     requires index shape == data shape.)
  C. Pallas fori_loop of dynamic-slice row reads from VMEM.
  D. Pallas one-hot matmul select (MXU): [T, T] @ [T, C].

Usage: python tools/exp_vmem_gather.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_probe = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def sync(x):
    return float(_probe(x))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


# --- A: XLA HBM gather baseline -------------------------------------------

@jax.jit
def xla_gather(table, idx):
    return jnp.take(table, idx, axis=0)


# --- B: pallas equal-shape take_along_axis --------------------------------

def _taa_kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)


@functools.partial(jax.jit, static_argnames=("grid",))
def pallas_taa(table, idx, grid: int):
    """table [T, C]; idx [G*T, C] -> out [G*T, C]; grid over idx blocks,
    table resident across steps."""
    T, C = table.shape
    return pl.pallas_call(
        _taa_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, table.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, table)


# --- C: pallas row-loop dynamic slice -------------------------------------

def _loop_kernel(idx_ref, table_ref, out_ref):
    n = out_ref.shape[0]

    def body(i, _):
        out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i, 0], 1), :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("grid",))
def pallas_loop(table, idx, grid: int):
    T, C = table.shape
    B = idx.shape[0] // grid
    return pl.pallas_call(
        _loop_kernel,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], C), table.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, table)


# --- D: one-hot matmul select ---------------------------------------------

def _onehot_kernel(idx_ref, table_ref, out_ref):
    B = out_ref.shape[0]
    T = table_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    onehot = (rows == idx_ref[:, :1]).astype(table_ref.dtype)
    out_ref[:] = jnp.dot(onehot, table_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("grid",))
def pallas_onehot(table, idx, grid: int):
    T, C = table.shape
    B = idx.shape[0] // grid
    return pl.pallas_call(
        _onehot_kernel,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], C), table.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, table)


def main():
    key = jax.random.PRNGKey(0)
    C = 256
    N = 512 * 1024

    # A: HBM table, 640k rows (the real HR packed-table size)
    table_hbm = jax.random.normal(key, (640 * 1024, C), jnp.bfloat16)
    idx = jax.random.randint(key, (N,), 0, table_hbm.shape[0], jnp.int32)
    t = timeit(xla_gather, table_hbm, idx)
    print(f"A xla HBM gather 640k-table: {t*1e3:.2f} ms  "
          f"{N/t/1e6:.0f}M rows/s")

    for T in (2048, 4096, 8192):
        tbl = jax.random.normal(key, (T, C), jnp.bfloat16)
        grid = N // T
        idx2 = jax.random.randint(key, (N, C), 0, T, jnp.int32)
        try:
            t = timeit(pallas_taa, tbl, idx2, grid)
            print(f"B pallas taa T={T}: {t*1e3:.2f} ms  {N/t/1e6:.0f}M rows/s")
        except Exception as e:
            print(f"B pallas taa T={T}: FAIL {str(e)[:200]}")

    for T in (4096,):
        tbl = jax.random.normal(key, (T, C), jnp.bfloat16)
        idx1 = jax.random.randint(key, (N, 1), 0, T, jnp.int32)
        for grid in (128,):
            try:
                t = timeit(pallas_loop, tbl, idx1, grid)
                print(f"C pallas loop T={T} grid={grid}: {t*1e3:.2f} ms  "
                      f"{N/t/1e6:.0f}M rows/s")
            except Exception as e:
                print(f"C pallas loop T={T}: FAIL {str(e)[:200]}")

    for T in (512, 1024):
        tbl = jax.random.normal(key, (T, C), jnp.bfloat16)
        idxp = jax.random.randint(key, (N, 128), 0, T, jnp.int32)
        for grid in (N // 1024,):
            try:
                t = timeit(pallas_onehot, tbl, idxp, grid)
                print(f"D pallas onehot T={T} B={N//grid}: {t*1e3:.2f} ms  "
                      f"{N/t/1e6:.0f}M rows/s")
            except Exception as e:
                print(f"D pallas onehot T={T}: FAIL {str(e)[:200]}")

    # correctness spot-check for B (if it compiled)
    T = 2048
    tbl = jnp.arange(T, dtype=jnp.bfloat16)[:, None] * jnp.ones((1, C),
                                                                jnp.bfloat16)
    idx2 = jax.random.randint(key, (T, C), 0, T, jnp.int32)
    try:
        out = pallas_taa(tbl, idx2, 1)
        ref = jnp.take_along_axis(tbl, idx2, axis=0)
        print("B correctness:", bool(jnp.all(out == ref)))
    except Exception as e:
        print("B correctness: FAIL", str(e)[:120])


if __name__ == "__main__":
    main()

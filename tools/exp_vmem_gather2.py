"""Experiment 2: tune the in-VMEM matmul-select primitive.

Follow-up to exp_vmem_gather.py (one-hot matmul select = 203M rows/s at
T=512, XLA HBM gather = 60M): find the throughput-optimal (B, T, C) and
measure the bilinear WEIGHT-matrix variant (4 nonzeros per row carrying
the interpolation weights), which samples the RAW [T, C=64] plane
region instead of the packed [T, 256] tap table.

Also probes Mosaic dynamic-gather along the lane axis (axis=-1) for
f32/i32, in case a native shuffle primitive exists at some shape.

Usage: python tools/exp_vmem_gather2.py
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


# --- one-hot select, parameterized ----------------------------------------

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


# --- bilinear weight-matrix select ----------------------------------------
# Region is a [Th, Tw] cell grid flattened to T = Th*Tw rows of C feats.
# Each point has continuous local coords (y, x); taps (y0..y1, x0..x1).
# W[b, t] = wy(b, rowof(t)) * wx(b, colof(t)) where wy/wx are the 1-D
# hat weights — built with two iota compares, no gather at all.

def _bilin_kernel(yx_ref, table_ref, out_ref, *, Th, Tw):
    B = out_ref.shape[0]
    y = yx_ref[:, 0][:, None]                      # [B,1] continuous
    x = yx_ref[:, 1][:, None]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, Th), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, Tw), 1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rows - y))  # [B,Th] hat weights
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(cols - x))  # [B,Tw]
    w = (wy[:, :, None] * wx[:, None, :]).reshape(B, Th * Tw)
    out_ref[:] = jnp.dot(w.astype(table_ref.dtype), table_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("grid", "Th", "Tw"))
def pallas_bilin(table, yx, grid: int, Th: int, Tw: int):
    T, C = table.shape
    B = yx.shape[0] // grid
    return pl.pallas_call(
        functools.partial(_bilin_kernel, Th=Th, Tw=Tw),
        out_shape=jax.ShapeDtypeStruct((yx.shape[0], C), table.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(yx, table)


# --- Mosaic lane-axis dynamic gather probes -------------------------------

def _lane_taa_kernel(idx_ref, data_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(data_ref[:], idx_ref[:], axis=1)


@functools.partial(jax.jit, static_argnames=())
def pallas_lane_taa(data, idx):
    return pl.pallas_call(
        _lane_taa_kernel,
        out_shape=jax.ShapeDtypeStruct(data.shape, data.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, data)


def main():
    key = jax.random.PRNGKey(0)
    N = 512 * 1024

    print("== one-hot select sweep (bf16, C=256 packed row) ==")
    for T, B in ((256, 1024), (512, 1024), (512, 2048), (1024, 2048)):
        tbl = jax.random.normal(key, (T, 256), jnp.bfloat16)
        idxp = jax.random.randint(key, (N, 128), 0, T, jnp.int32)
        t = timeit(pallas_onehot, tbl, idxp, N // B)
        print(f"  T={T} B={B}: {t*1e3:.2f} ms  {N/t/1e6:.0f}M rows/s")

    print("== one-hot select sweep (bf16, C=64 raw plane) ==")
    for T, B in ((256, 1024), (512, 1024), (512, 2048), (1024, 2048)):
        tbl = jax.random.normal(key, (T, 64), jnp.bfloat16)
        idxp = jax.random.randint(key, (N, 128), 0, T, jnp.int32)
        t = timeit(pallas_onehot, tbl, idxp, N // B)
        print(f"  T={T} B={B}: {t*1e3:.2f} ms  {N/t/1e6:.0f}M rows/s")

    print("== bilinear weight-matrix select (bf16, C=64 raw) ==")
    for Th, Tw, B in ((16, 32, 1024), (32, 32, 1024), (32, 32, 2048),
                      (16, 32, 2048), (32, 64, 2048), (8, 128, 2048)):
        T = Th * Tw
        tbl = jax.random.normal(key, (T, 64), jnp.bfloat16)
        yx = jax.random.uniform(key, (N, 128), jnp.float32) \
            * jnp.asarray([Th - 2.0, Tw - 2.0] * 64)
        try:
            t = timeit(pallas_bilin, tbl, yx, N // B, Th, Tw)
            print(f"  {Th}x{Tw} B={B}: {t*1e3:.2f} ms  {N/t/1e6:.0f}M pts/s")
        except Exception as e:
            print(f"  {Th}x{Tw} B={B}: FAIL {str(e)[:160]}")

    print("== lane-axis take_along_axis probes ==")
    for shape, dt in (((8, 128), jnp.float32), ((256, 128), jnp.float32),
                      ((8, 512), jnp.float32), ((256, 256), jnp.float32)):
        data = jax.random.normal(key, shape, dt)
        idx = jax.random.randint(key, shape, 0, shape[1], jnp.int32)
        try:
            out = pallas_lane_taa(data, idx)
            ok = bool(jnp.allclose(out, jnp.take_along_axis(data, idx,
                                                            axis=1)))
            print(f"  {shape} {dt.__name__}: compiles, correct={ok}")
        except Exception as e:
            print(f"  {shape} {dt.__name__}: FAIL {str(e)[:120]}")

    # correctness of bilinear weight-matrix vs reference interpolation
    Th, Tw, C = 16, 32, 64
    tbl = jax.random.normal(key, (Th * Tw, C), jnp.bfloat16)
    yx = jnp.concatenate([
        jax.random.uniform(key, (256, 1)) * (Th - 2),
        jax.random.uniform(jax.random.PRNGKey(1), (256, 1)) * (Tw - 2)],
        axis=1)
    yx_pad = jnp.pad(yx, ((0, 0), (0, 126)))
    out = pallas_bilin(tbl, yx_pad, 1, Th, Tw)[:, :C]
    g = tbl.astype(jnp.float32).reshape(Th, Tw, C)
    y0 = jnp.floor(yx[:, 0]).astype(jnp.int32)
    x0 = jnp.floor(yx[:, 1]).astype(jnp.int32)
    ty = (yx[:, 0] - y0)[:, None]
    tx = (yx[:, 1] - x0)[:, None]
    ref = ((g[y0, x0] * (1 - ty) + g[y0 + 1, x0] * ty) * (1 - tx)
           + (g[y0, x0 + 1] * (1 - ty) + g[y0 + 1, x0 + 1] * ty) * tx)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"bilinear-matmul max err vs f32 reference: {err:.4f} "
          f"(bf16 table quantization expected ~1e-2)")


if __name__ == "__main__":
    main()

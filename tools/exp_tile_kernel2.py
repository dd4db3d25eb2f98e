"""Prototype v2: double-buffered locality-bucketed plane sampler.

Improvements over exp_tile_kernel.py (which measured 95-128M rows/s,
DMA serialization suspected):
  A. cross-step double buffering: chunk i+1's region DMAs are issued
     before chunk i's compute, so fetch and matmul overlap;
  B. a 2-D table layout [H, W*128] where the whole region is ONE
     tile-aligned 2-D DMA (16 descriptors -> 1), requiring an in-kernel
     [Th, Tw*128] -> [Th*Tw, 128] unmerge-reshape (Mosaic support TBD).

Usage: python tools/exp_tile_kernel2.py
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


# --- variant A: flat table, Th row-DMAs, double buffered ------------------

def _kernel_a(base_ref, fidx_ref, table_ref, out_ref, region, sem, *,
              Th, Tw, W):
    T = Th * Tw
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, chunk, r):
        base = pl.multiple_of(base_ref[chunk], 16)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(base + r * W, Tw), :],
            region.at[slot, pl.ds(r * Tw, Tw), :],
            sem.at[slot, r])

    @pl.when(i == 0)
    def _():
        for r in range(Th):
            dma(0, 0, r).start()

    @pl.when(i + 1 < n)
    def _():
        for r in range(Th):
            dma((i + 1) % 2, i + 1, r).start()

    B = out_ref.shape[0]
    fidx = fidx_ref[:, :1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1).astype(jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cols - fidx)).astype(jnp.bfloat16)

    slot = i % 2
    for r in range(Th):
        dma(slot, i, r).wait()
    out_ref[:] = jnp.dot(w, region[slot],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("Th", "Tw", "W", "B"))
def tile_gather_a(table, bases, fidx, *, Th, Tw, W, B):
    nchunks = bases.shape[0]
    T = Th * Tw
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, 128), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, T, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, Th)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_a, Th=Th, Tw=Tw, W=W),
        out_shape=jax.ShapeDtypeStruct((nchunks * B, 128), jnp.float32),
        grid_spec=grid_spec,
    )(bases, fidx, table)


# --- variant B: 2-D table, one region DMA, in-kernel unmerge reshape ------

def _kernel_b(oy_ref, ox_ref, fidx_ref, table_ref, out_ref, region, sem, *,
              Th, Tw):
    T = Th * Tw
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, chunk):
        oy = pl.multiple_of(oy_ref[chunk], 8)
        ox = pl.multiple_of(ox_ref[chunk] * 128, 128)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(oy, Th), pl.ds(ox, Tw * 128)],
            region.at[slot],
            sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma((i + 1) % 2, i + 1).start()

    B = out_ref.shape[0]
    fidx = fidx_ref[:, :1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1).astype(jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cols - fidx)).astype(jnp.bfloat16)

    slot = i % 2
    dma(slot, i).wait()
    flat = region[slot].reshape(T, 128)
    out_ref[:] = jnp.dot(w, flat, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("Th", "Tw", "B"))
def tile_gather_b(table2d, oy, ox, fidx, *, Th, Tw, B):
    nchunks = oy.shape[0]
    T = Th * Tw
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda i, y, x: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, 128), lambda i, y, x: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Th, Tw * 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_b, Th=Th, Tw=Tw),
        out_shape=jax.ShapeDtypeStruct((nchunks * B, 128), jnp.float32),
        grid_spec=grid_spec,
    )(oy, ox, fidx, table2d)


def main():
    key = jax.random.PRNGKey(0)
    W = H = 800
    table = jax.random.normal(key, (H * W, 128), jnp.bfloat16)
    table2d = table.reshape(H, W * 128)
    N = 512 * 1024

    for Th, Tw, B in ((16, 32, 512), (16, 32, 1024), (16, 16, 512),
                      (8, 32, 512), (8, 64, 512), (16, 16, 256),
                      (16, 64, 1024), (8, 32, 256)):
        nchunks = N // B
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(Th * Tw + B), 3)
        oy = jax.random.randint(k1, (nchunks,), 0, (H - Th - 1) // 16,
                                jnp.int32) * 16
        ox = jax.random.randint(k2, (nchunks,), 0, (W - Tw - 1) // 16,
                                jnp.int32) * 16
        bases = oy * W + ox
        yl = jax.random.randint(k3, (N, 1), 0, Th - 1, jnp.int32)
        xl = jax.random.uniform(k3, (N, 1), jnp.float32) * (Tw - 1.01)
        fidx = yl.astype(jnp.float32) * Tw + xl
        line = f"{Th}x{Tw} B={B}:"
        try:
            fa = functools.partial(tile_gather_a, Th=Th, Tw=Tw, W=W, B=B)
            t = timeit(fa, table, bases, fidx)
            line += f"  A {t*1e3:.2f}ms {N/t/1e6:.0f}M/s"
        except Exception as e:
            line += f"  A FAIL({str(e)[:60]})"
        try:
            fb = functools.partial(tile_gather_b, Th=Th, Tw=Tw, B=B)
            t = timeit(fb, table2d, oy, ox, fidx)
            line += f"  B {t*1e3:.2f}ms {N/t/1e6:.0f}M/s"
        except Exception as e:
            line += f"  B FAIL({str(e)[:60]})"
        print(line)

    # correctness for both variants
    Th, Tw, B = 16, 32, 256
    nchunks = 4
    Nc = nchunks * B
    k1, k2, k3, k4 = jax.random.split(key, 4)
    oy = jax.random.randint(k1, (nchunks,), 0, (H - Th - 1) // 16,
                            jnp.int32) * 16
    ox = jax.random.randint(k2, (nchunks,), 0, (W - Tw - 1) // 16,
                            jnp.int32) * 16
    bases = oy * W + ox
    yl = jax.random.randint(k3, (Nc, 1), 0, Th - 1, jnp.int32)
    xl = jax.random.uniform(k4, (Nc, 1), jnp.float32) * (Tw - 1.01)
    fidx = yl.astype(jnp.float32) * Tw + xl

    tab = np.asarray(table, np.float32)
    yl_n, xl_n = np.asarray(yl)[:, 0], np.asarray(xl)[:, 0]
    x0 = np.floor(xl_n).astype(np.int32)
    tx = (xl_n - x0)[:, None]
    chunk = np.repeat(np.arange(nchunks), B)
    r0 = np.asarray(bases)[chunk] + yl_n * W + x0
    # bf16 weights: quantize tx the same way for the reference
    txq = np.asarray(jnp.asarray(1 - tx, jnp.bfloat16), np.float32)
    txq2 = np.asarray(jnp.asarray(tx, jnp.bfloat16), np.float32)
    ref = tab[r0] * txq + tab[r0 + 1] * txq2

    for name, fn, args in (
            ("A", tile_gather_a, (table, bases, fidx)),
            ("B", tile_gather_b, (table2d, oy, ox, fidx))):
        try:
            kw = dict(Th=Th, Tw=Tw, B=B)
            if name == "A":
                kw["W"] = W
            out = np.asarray(fn(*args, **kw))
            err = np.max(np.abs(out - ref))
            print(f"correctness {name}: max err {err:.6f}")
        except Exception as e:
            print(f"correctness {name}: FAIL {str(e)[:100]}")


if __name__ == "__main__":
    main()

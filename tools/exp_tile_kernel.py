"""Prototype: locality-bucketed plane-sample kernel (the gather-wall
breaker).

Design (from exp_vmem_gather2.py measurements):
  * Table: vertical-pair packed plane [H*W, 128] bf16 — row for cell
    (y, x) holds channels of (y, x) in lanes [0, 64) and (y+1, x) in
    lanes [64, 128) (48 real channels + pad).  Edge-padded in y.
  * Chunk: B points sharing a [Th, Tw]-cell region (origin per chunk,
    int row base = oy*W + ox, precomputed by an XLA pre-pass along with
    each point's local continuous flat coordinate
    fidx = (y0 - oy)*Tw + (x - ox)).
  * Kernel: DMA the region's Th row-ranges from HBM; build the 1-D hat
    weight matrix w[b, t] = relu(1 - |t - fidx_b|) (its two nonzeros
    are the x-taps with bilinear x-weights); one MXU matmul
    [B, T] @ [T, 128] x-interpolates BOTH vertical taps at once.
  * Epilogue (XLA): out = lerp(rows[:, :64], rows[:, 64:], ty).

This file measures the kernel standalone: correctness vs the direct
formula and rows/s vs the XLA gather baseline (60M rows/s).

Usage: python tools/exp_tile_kernel.py
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


def _kernel(base_ref, fidx_ref, table_ref, out_ref, region, sem, *,
            Th, Tw, W):
    T = Th * Tw
    base = pl.multiple_of(base_ref[pl.program_id(0)], 16)

    for i in range(Th):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(base + i * W, Tw), :],
            region.at[pl.ds(i * Tw, Tw), :],
            sem.at[i],
        ).start()

    B = out_ref.shape[0]
    fidx = fidx_ref[:, :1]                                   # [B, 1] f32
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1).astype(jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cols - fidx))

    for i in range(Th):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(base + i * W, Tw), :],
            region.at[pl.ds(i * Tw, Tw), :],
            sem.at[i],
        ).wait()

    out_ref[:] = jnp.dot(w.astype(jnp.bfloat16), region[:],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("Th", "Tw", "W", "B"))
def tile_gather(table, bases, fidx, *, Th, Tw, W, B):
    """table [HW, 128] bf16; bases [nchunks] i32; fidx [nchunks*B, 1] f32
    -> [nchunks*B, 128] f32 x-interpolated vertical pairs."""
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
            pltpu.VMEM((T, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((Th,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, Th=Th, Tw=Tw, W=W),
        out_shape=jax.ShapeDtypeStruct((nchunks * B, 128), jnp.float32),
        grid_spec=grid_spec,
    )(bases, fidx, table)


def main():
    key = jax.random.PRNGKey(0)
    W = H = 800
    table = jax.random.normal(key, (H * W, 128), jnp.bfloat16)

    for Th, Tw, B in ((16, 32, 512), (16, 32, 1024), (16, 48, 512),
                      (32, 32, 1024), (16, 16, 256), (16, 16, 512),
                      (8, 32, 256)):
        N = 512 * 1024
        nchunks = N // B
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(Th * Tw + B), 3)
        oy = jax.random.randint(k1, (nchunks,), 0, (H - Th - 1) // 16,
                                jnp.int32) * 16
        ox = jax.random.randint(k2, (nchunks,), 0, (W - Tw - 1) // 16,
                                jnp.int32) * 16
        bases = oy * W + ox
        # local continuous coords uniform inside the region interior
        yl = jax.random.randint(k3, (N, 1), 0, Th - 1, jnp.int32)
        xl = jax.random.uniform(k3, (N, 1), jnp.float32) * (Tw - 1.01)
        fidx = yl.astype(jnp.float32) * Tw + xl
        try:
            fn = functools.partial(tile_gather, Th=Th, Tw=Tw, W=W, B=B)
            t = timeit(fn, table, bases, fidx)
            print(f"tile {Th}x{Tw} B={B}: {t*1e3:.2f} ms  "
                  f"{N/t/1e6:.0f}M rows/s")
        except Exception as e:
            print(f"tile {Th}x{Tw} B={B}: FAIL {str(e)[:200]}")
            continue

    # correctness: small case vs direct formula
    Th, Tw, B = 16, 32, 256
    nchunks = 4
    N = nchunks * B
    k1, k2, k3, k4 = jax.random.split(key, 4)
    oy = jax.random.randint(k1, (nchunks,), 0, (H - Th - 1) // 16,
                            jnp.int32) * 16
    ox = jax.random.randint(k2, (nchunks,), 0, (W - Tw - 1) // 16,
                            jnp.int32) * 16
    bases = oy * W + ox
    yl = jax.random.randint(k3, (N, 1), 0, Th - 1, jnp.int32)
    xl = jax.random.uniform(k4, (N, 1), jnp.float32) * (Tw - 1.01)
    fidx = yl.astype(jnp.float32) * Tw + xl
    out = tile_gather(table, bases, fidx, Th=Th, Tw=Tw, W=W, B=B)

    tab = np.asarray(table, np.float32)
    bases_n = np.asarray(bases)
    yl_n, xl_n = np.asarray(yl)[:, 0], np.asarray(xl)[:, 0]
    x0 = np.floor(xl_n).astype(np.int32)
    tx = (xl_n - x0)[:, None]
    chunk = np.repeat(np.arange(nchunks), B)
    r0 = bases_n[chunk] + yl_n * W + x0
    ref = tab[r0] * (1 - tx) + tab[r0 + 1] * tx
    err = np.max(np.abs(np.asarray(out) - ref))
    print(f"correctness max err: {err:.5f} (bf16 w quantization ~1e-2)")


if __name__ == "__main__":
    main()

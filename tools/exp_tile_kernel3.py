"""Prototype v3: G regions per grid step to amortize the ~2.5us/step
floor seen in v2 (140-160M rows/s).  Per step: G sub-chunks, each with
its own [Th, Tw] region (one 2-D DMA each, double-buffered across
steps) and its own [B, T] @ [T, 128] hat matmul.

Usage: python tools/exp_tile_kernel3.py
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


def _kernel(oy_ref, ox_ref, fidx_ref, table_ref, out_ref, region, sem, *,
            Th, Tw, G, B):
    T = Th * Tw
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, step, g):
        oy = pl.multiple_of(oy_ref[step * G + g], 8)
        ox = pl.multiple_of(ox_ref[step * G + g] * 128, 128)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(oy, Th), pl.ds(ox, Tw * 128)],
            region.at[slot, g],
            sem.at[slot, g])

    @pl.when(i == 0)
    def _():
        for g in range(G):
            dma(0, 0, g).start()

    @pl.when(i + 1 < n)
    def _():
        for g in range(G):
            dma((i + 1) % 2, i + 1, g).start()

    slot = i % 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1).astype(jnp.float32)
    for g in range(G):
        fidx = fidx_ref[pl.ds(g * B, B), :1]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(cols - fidx)).astype(jnp.bfloat16)
        dma(slot, i, g).wait()
        flat = region[slot, g].reshape(T, 128)
        out_ref[pl.ds(g * B, B), :] = jnp.dot(
            w, flat, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("Th", "Tw", "G", "B"))
def tile_gather_g(table2d, oy, ox, fidx, *, Th, Tw, G, B):
    nchunks = oy.shape[0]
    nsteps = nchunks // G
    T = Th * Tw
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((G * B, 1), lambda i, y, x: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((G * B, 128), lambda i, y, x: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, G, Th, Tw * 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, Th=Th, Tw=Tw, G=G, B=B),
        out_shape=jax.ShapeDtypeStruct((nchunks * B, 128), jnp.float32),
        grid_spec=grid_spec,
    )(oy, ox, fidx, table2d)


def main():
    key = jax.random.PRNGKey(0)
    W = H = 800
    table2d = jax.random.normal(key, (H, W * 128), jnp.bfloat16)
    N = 512 * 1024

    for Th, Tw, B, G in ((16, 16, 512, 4), (16, 16, 512, 8),
                         (8, 32, 512, 8), (16, 32, 512, 4),
                         (16, 32, 512, 8), (16, 16, 256, 8),
                         (16, 16, 256, 16), (8, 32, 256, 16),
                         (16, 32, 1024, 4), (8, 16, 256, 16)):
        nchunks = N // B
        if nchunks % G:
            continue
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(Th * Tw + B + G), 3)
        oy = jax.random.randint(k1, (nchunks,), 0, (H - Th - 1) // 16,
                                jnp.int32) * 16
        ox = jax.random.randint(k2, (nchunks,), 0, (W - Tw - 1) // 16,
                                jnp.int32) * 16
        yl = jax.random.randint(k3, (N, 1), 0, Th - 1, jnp.int32)
        xl = jax.random.uniform(k3, (N, 1), jnp.float32) * (Tw - 1.01)
        fidx = yl.astype(jnp.float32) * Tw + xl
        try:
            fn = functools.partial(tile_gather_g, Th=Th, Tw=Tw, G=G, B=B)
            t = timeit(fn, table2d, oy, ox, fidx)
            print(f"{Th}x{Tw} B={B} G={G}: {t*1e3:.2f}ms {N/t/1e6:.0f}M/s")
        except Exception as e:
            print(f"{Th}x{Tw} B={B} G={G}: FAIL {str(e)[:100]}")

    # correctness
    Th, Tw, B, G = 16, 32, 256, 4
    nchunks, Nc = 8, 8 * 256
    k1, k2, k3, k4 = jax.random.split(key, 4)
    oy = jax.random.randint(k1, (nchunks,), 0, (H - Th - 1) // 16,
                            jnp.int32) * 16
    ox = jax.random.randint(k2, (nchunks,), 0, (W - Tw - 1) // 16,
                            jnp.int32) * 16
    yl = jax.random.randint(k3, (Nc, 1), 0, Th - 1, jnp.int32)
    xl = jax.random.uniform(k4, (Nc, 1), jnp.float32) * (Tw - 1.01)
    fidx = yl.astype(jnp.float32) * Tw + xl
    out = np.asarray(tile_gather_g(table2d, oy, ox, fidx,
                                   Th=Th, Tw=Tw, G=G, B=B))
    tab = np.asarray(table2d, np.float32).reshape(H * W, 128)
    yl_n, xl_n = np.asarray(yl)[:, 0], np.asarray(xl)[:, 0]
    x0 = np.floor(xl_n).astype(np.int32)
    tx = (xl_n - x0)[:, None]
    chunk = np.repeat(np.arange(nchunks), B)
    r0 = (np.asarray(oy)[chunk] + yl_n) * W + np.asarray(ox)[chunk] + x0
    txq = np.asarray(jnp.asarray(1 - tx, jnp.bfloat16), np.float32)
    txq2 = np.asarray(jnp.asarray(tx, jnp.bfloat16), np.float32)
    ref = tab[r0] * txq + tab[r0 + 1] * txq2
    print(f"correctness: max err {np.max(np.abs(out - ref)):.6f}")


if __name__ == "__main__":
    main()

"""Isolate the tiled-sampler call at bench-block shapes: pre-pass +
kernel + epilogue, vs the kernel alone, vs the XLA packed gather path.

Usage: python tools/exp_tiled_e2e.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nvsr_tpu.ops.pallas.tile_sampler import (TileSamplerConfig,
                                              build_pair_tables,
                                              tiled_plane_sample)
from nvsr_tpu.ops.grid_sample import multi_plane_sample_packed

_probe = jax.jit(lambda x: jnp.sum(jax.tree.leaves(x)[0]
                                   .astype(jnp.float32)))


def sync(x):
    return float(_probe(x))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def clustered_grids(key, P, R, S, cfg, extent=0.02):
    ntiles, nslabs = R // cfg.tile_rays, S // cfg.slab
    kc, kj = jax.random.split(key)
    centers = jax.random.uniform(kc, (P, ntiles, 1, nslabs, 1, 2),
                                 minval=-0.9, maxval=0.9)
    jit_ = jax.random.uniform(
        kj, (P, ntiles, cfg.tile_rays, nslabs, cfg.slab, 2),
        minval=-extent, maxval=extent)
    g = centers + jit_
    return g.reshape(P, R, S, 2)


def main():
    P, C, HW = 3, 48, 800
    R, S = 8192, 64
    cfg = TileSamplerConfig()
    key = jax.random.PRNGKey(0)
    planes = 0.03 * jax.random.normal(key, (P, C, HW, HW))
    grids = clustered_grids(key, P, R, S, cfg)
    tables = build_pair_tables(planes, cfg)
    sync(tables[0])

    full = jax.jit(functools.partial(tiled_plane_sample, config=cfg))

    @jax.jit
    def with_tables(planes, grids, tables):
        return tiled_plane_sample(planes, grids, cfg, tables=tables)

    t = timeit(with_tables, planes, grids, tables)
    n = P * R * S
    print(f"tiled full (prebuilt tables): {t*1e3:.1f} ms "
          f"{n/t/1e6:.0f}M rows/s  [block {R}x{S}]")
    out, ov = with_tables(planes, grids, tables)
    print(f"overflow frac: {float(ov):.4f}")

    # XLA packed path at the same shapes
    @jax.jit
    def xla_path(planes, grids):
        return multi_plane_sample_packed(planes, grids.reshape(P, -1, 2),
                                         table_dtype=jnp.bfloat16)

    t = timeit(xla_path, planes, grids)
    print(f"xla packed path: {t*1e3:.1f} ms {n/t/1e6:.0f}M rows/s")

    # pre/post only: swap the pallas call for a zeros stub
    import nvsr_tpu.ops.pallas.tile_sampler as ts
    real = ts._tile_gather
    ts._tile_gather = lambda table, oy, ox, fidx, **kw: jnp.zeros(
        (fidx.shape[0], 128), jnp.float32)
    try:
        @jax.jit
        def prepost(planes, grids, tables):
            return tiled_plane_sample(planes, grids, cfg, tables=tables)
        t = timeit(prepost, planes, grids, tables)
        print(f"pre+post only (stub kernel): {t*1e3:.1f} ms")
    finally:
        ts._tile_gather = real

    # table build alone
    tb = jax.jit(lambda p: build_pair_tables(p, cfg)[0])
    t = timeit(tb, planes)
    print(f"table build alone: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()

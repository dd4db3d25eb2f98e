"""Decompose the per-block cost of the render pipeline at tiny-plane
(gather-free) settings: where does the non-gather floor go?

Usage: python tools/exp_block_floor.py
"""

import dataclasses
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.models import TriplaneConfig, init_decoder_params
from nvsr_tpu.render import (RenderConfig, make_ray_bundle,
                             make_triplane_point_fn, render_rays)
from nvsr_tpu.ops.geometry import get_ray_bundle

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


def main():
    R = 8192
    cfg = TriplaneConfig(proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         skip_connect_every=3,
                         gather_table_dtype="bfloat16",
                         compute_dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    dec_c = init_decoder_params(key, cfg)
    dec_f = init_decoder_params(jax.random.PRNGKey(1), cfg)
    planes = 0.03 * jax.random.normal(key, (3, 48, 64, 64))
    pv = 0.03 * jax.random.normal(key, (48, 32, 32))
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32); c2w[:3, 3] = [3.8, 0.5, 0.7]
    ro, rd = get_ray_bundle(64, 128, 600.0, jnp.asarray(c2w))
    rays = make_ray_bundle(ro.reshape(-1, 3), rd.reshape(-1, 3), 2.0, 6.0,
                           use_viewdirs=True)

    def run(label, **over):
        kw = dict(num_coarse=32, num_fine=32, perturb=False,
                  radiance_field_noise_std=0.0)
        kw.update(over)
        rcfg = RenderConfig(**kw)
        pf_c = make_triplane_point_fn(dec_c, cfg, planes, pv, box)
        pf_f = make_triplane_point_fn(dec_f, cfg, planes, pv, box)
        f = jax.jit(lambda rays, k: render_rays(pf_c, pf_f, rays, k, rcfg))
        t = timeit(f, rays, jax.random.PRNGKey(2))
        print(f"{label}: {t*1e3:.2f} ms/block ({R/t/1e3:.0f}k rays/s)",
              flush=True)

    run("full block 32+32")
    run("coarse only (num_fine=0)", num_fine=0)
    run("full block 16+16", num_coarse=16, num_fine=16)

    # decoder-less: point fn returns zeros (keeps sampling machinery)
    rcfg = RenderConfig(num_coarse=32, num_fine=32, perturb=False,
                        radiance_field_noise_std=0.0)

    def zero_pf(pts, rays_b, z):
        r, s = z.shape[:2]
        s = z.shape[1]
        return jnp.zeros((r, s, 4)) + pts.sum() * 0
    f = jax.jit(lambda rays, k: render_rays(zero_pf, zero_pf, rays, k, rcfg))
    t = timeit(f, rays, jax.random.PRNGKey(2))
    print(f"sampling machinery only: {t*1e3:.2f} ms/block", flush=True)

    # decoder alone at block point count
    from nvsr_tpu.models.triplane import decode_projections
    N = R * 64
    projs = 0.1 * jax.random.normal(key, (3, N, 48))
    view = 0.1 * jax.random.normal(key, (N, 48))
    f = jax.jit(lambda p, v: decode_projections(dec_f, cfg, p, v))
    t = timeit(f, projs, view)
    print(f"decoder alone ({N/1e6:.1f}M pts): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

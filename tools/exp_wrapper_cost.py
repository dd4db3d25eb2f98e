"""Attribute the fine-pass WRAPPER cost (round 4, batch 8).

The v2 in-frame attribution (PERF.md round 4 batch 5) leaves 79 ms of
fine-pass cost OUTSIDE the pallas call (STUB=fine 224 ms kernel vs
zero_fine 144 ms frame) — unchanged from v1's 81 ms even though v2
removed the [N,1] descriptor materialization, so the round-4
"descriptor write" theory of the wrapper is dead. This tool times the
wrapper's actual pieces standalone at flagship fine dims (640k rays,
S=32 merged samples, 800^2 planes, 16x16 tiles, slab adapted):

  prepare    prepare_ray_chunks (component-wise chunk pre-pass)
  view64     the [R,cv] -> [N,64] bf16 pad+broadcast+reshape
  unpack     the packout [nsteps,B,16,8] -> [N,8] moveaxis
  unchunk    from_chunks on [N,4] (chunk-major -> ray-major)
  finez      sample_pdf_2 + sorted merge (fine z production)
  reshapes   fidx/ty [3,NC,B] -> [3*nsteps*group, B] kernel views

If the sum lands well under 79 ms, the overhead is integration-level
(XLA layout coercions at the pallas custom-call boundary or fusion
breaks between producers), not the pieces themselves.

Usage: python tools/exp_wrapper_cost.py
Env: RES (default 800), TILE (16), S_COARSE/S_FINE (16/16).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nvsr_tpu.ops.pallas.tile_sampler import (TileSamplerConfig,
                                              build_pair_tables,
                                              choose_region_dims,
                                              choose_slab, from_chunks,
                                              prepare_ray_chunks)
from nvsr_tpu.models.triplane import make_rot_mats
from nvsr_tpu.ops.pallas import fused_decoder

_probe = jax.jit(lambda x: jnp.sum(jax.tree.leaves(x)[0]
                                   .astype(jnp.float32)))


def sync(x):
    return float(_probe(x))


def timeit(fn, reps=6):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    RES = int(os.environ.get("RES", 800))
    TILE = int(os.environ.get("TILE", 16))
    Sc = int(os.environ.get("S_COARSE", 16))
    Sf = int(os.environ.get("S_FINE", 16))
    S = Sc + Sf                     # merged fine-pass sample count
    H = W = RES
    R = H * W
    tr = TILE * TILE
    cfg = TileSamplerConfig(tile_rays=tr)
    slab = choose_slab(S, RES, cfg)
    while tr * slab > 512 and slab > 1 and S % (slab // 2) == 0:
        slab //= 2
    th, tw = choose_region_dims(S, RES, slab, tr, cfg)
    import dataclasses
    cfg = dataclasses.replace(cfg, slab=slab, th=th, tw=tw,
                              group=cfg.group * (cfg.slab // slab))
    nt, ns = R // tr, S // slab
    NC, B = nt * ns, tr * slab
    print(f"R={R} S={S} slab={slab} th/tw={th}/{tw} NC={NC} B={B}",
          flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    origins = jnp.zeros((R, 3), jnp.float32) + jnp.asarray([3.0, 0.5, 0.7])
    d = jax.random.normal(k1, (R, 3), jnp.float32)
    directions = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near = jnp.full((R,), 2.0, jnp.float32)
    far = jnp.full((R,), 4.5, jnp.float32)
    t = jnp.linspace(0.0, 1.0, S, dtype=jnp.float32)
    z_vals = near[:, None] + (far - near)[:, None] * t[None]
    box3 = np.asarray([[-4, -4, -4], [4, 4, 4]], np.float32)
    rot = make_rot_mats(3)
    planes = 0.03 * jax.random.normal(k2, (3, 48, RES, RES),
                                      jnp.float32)
    tcfg = TileSamplerConfig(tile_rays=tr, slab=slab, th=th, tw=tw)
    table, Hp, Wp = build_pair_tables(planes.astype(jnp.bfloat16), tcfg)
    vp_ray = 0.03 * jax.random.normal(k3, (R, 27), jnp.float32)
    N = R * S

    @jax.jit
    def f_prepare(origins, directions, z_vals):
        return prepare_ray_chunks(origins, directions, z_vals, box3,
                                  rot, (RES, RES), Hp, tcfg, Wp=Wp)

    t_prep = timeit(lambda: f_prepare(origins, directions, z_vals))
    print(f"prepare    {t_prep * 1e3:7.2f} ms", flush=True)

    HALF = fused_decoder.HALF

    @jax.jit
    def f_view(vp_ray):
        cv = vp_ray.shape[-1]
        return jnp.broadcast_to(
            jnp.pad(vp_ray, ((0, 0), (0, HALF - cv))
                    ).astype(jnp.bfloat16).reshape(nt, 1, tr, 1, HALF),
            (nt, ns, tr, slab, HALF)).reshape(N, HALF)

    t_view = timeit(lambda: f_view(vp_ray))
    print(f"view64     {t_view * 1e3:7.2f} ms", flush=True)

    group = 8
    nsteps = NC // group

    @jax.jit
    def f_unpack(packed):
        out = packed.reshape(nsteps, B, 16, 8)
        out = jnp.moveaxis(out, 2, 1)[:, :group, :, :8]
        return out.reshape(nsteps * group * B, 8)

    packed = jnp.zeros((nsteps * B, 128), jnp.float32)
    t_unpack = timeit(lambda: f_unpack(packed))
    print(f"unpack     {t_unpack * 1e3:7.2f} ms", flush=True)

    @jax.jit
    def f_unchunk(out4):
        return from_chunks(out4.reshape(NC, B, 4), nt, tr, ns, slab
                           ).reshape(R, S, 4)

    out4 = jnp.zeros((N, 4), jnp.float32)
    t_unchunk = timeit(lambda: f_unchunk(out4))
    print(f"unchunk    {t_unchunk * 1e3:7.2f} ms", flush=True)

    from nvsr_tpu.ops.sampling import merge_sorted, sample_pdf

    @jax.jit
    def f_finez(zc, weights, key):
        mids = 0.5 * (zc[..., 1:] + zc[..., :-1])
        zf = sample_pdf(key, mids, weights[..., 1:-1], Sf, det=True)
        return merge_sorted(zc, zf)

    zc = near[:, None] + (far - near)[:, None] * jnp.linspace(
        0.0, 1.0, Sc, dtype=jnp.float32)[None]
    weights = jax.random.uniform(k1, (R, Sc), jnp.float32)
    t_finez = timeit(lambda: f_finez(zc, weights, key))
    print(f"finez      {t_finez * 1e3:7.2f} ms", flush=True)

    @jax.jit
    def f_reshape(fidx, ty):
        return (fidx.reshape(3 * nsteps * group, B) * 2.0,
                ty.reshape(3 * nsteps * group, B) * 2.0)

    fidx = jnp.zeros((3, NC, B), jnp.float32)
    ty = jnp.zeros((3, NC, B), jnp.float32)
    t_rs = timeit(lambda: f_reshape(fidx, ty))
    print(f"reshapes   {t_rs * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

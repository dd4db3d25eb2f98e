"""Quantify the megakernel's IN-PROGRAM penalty: kernel-on-device-
resident-operands (243M rows/s, tools/exp_mega_rate.py) vs the full
production path (pre-pass + kernel fused in one jit, as
triplane.apply_triplane_rays_from_z runs it inside the frame).

Same chunk shape/count as exp_mega_rate full size: 65536 rays in 16x16
tiles, S=32, slab 2 -> NC=4096 chunks of B=512, group 9.

  fused      apply_triplane_rays_from_z (pre-pass + megakernel, 1 jit)
  prepass    the pre-pass alone (kernel replaced by a cheap reduce)

Usage: python tools/exp_mega_prepass.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.models.triplane import (TriplaneConfig,
                                      apply_triplane_rays_from_z,
                                      init_decoder_params, make_rot_mats,
                                      project_to_planes)
from nvsr_tpu.ops.geometry import get_ray_bundle
from nvsr_tpu.ops.pallas.tile_sampler import (TileSamplerConfig,
                                              build_pair_tables)
from nvsr_tpu.render import make_ray_bundle, tighten_bundle, tile_ray_maps

_probe = jax.jit(lambda x: jnp.sum(jax.tree.leaves(x)[0]
                                   .astype(jnp.float32)))


def _camera(eye):
    eye = np.asarray(eye, dtype=np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]).astype(np.float32)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


def timed(fn, *args, reps=6):
    out = fn(*args)
    float(_probe(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(_probe(out))
    return (time.perf_counter() - t0) / reps


def main():
    H = W = 256                      # 65536 rays = 256 16x16 tiles
    S = 32
    res = int(os.environ.get("RES", 800))
    cfg = TriplaneConfig(proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         skip_connect_every=3, compute_dtype="bfloat16",
                         gather_table_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = 0.03 * jax.random.normal(jax.random.PRNGKey(1),
                                      (3, 48, res, res))
    plane_view = 0.03 * jax.random.normal(jax.random.PRNGKey(2),
                                          (48, 32, 32))
    box = jnp.asarray(np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                                [4, 4, 4, np.pi, np.pi / 2]]
                               ).astype(np.float32))
    tile_cfg = TileSamplerConfig(tile_rays=256, slab=2, group=16)
    tables = build_pair_tables(planes, tile_cfg)

    ro, rd = get_ray_bundle(H, W, 0.5 * 800 / np.tan(0.3),
                            jnp.asarray(_camera([3.8, 0.5, 0.7])))
    ro = tile_ray_maps(ro, 16)
    rd = tile_ray_maps(rd, 16)
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    rays = tighten_bundle(rays, jnp.asarray(
        [[-1.4, -1.1, -1.1], [1.5, 1.3, 1.2]], jnp.float32))
    rays0 = rays
    t = jnp.linspace(0.0, 1.0, S)[None]
    z_vals = rays.near + (rays.far - rays.near) * t       # [R, S]
    rows = H * W * S * 3

    if os.environ.get("FUSED", "1") != "0":
        fused = jax.jit(lambda pl_, tb_, ro_, rd_, vd_, z: \
            apply_triplane_rays_from_z(
                params, cfg, pl_, plane_view, box, ro_, rd_, vd_,
                z_vals=z, tile_cfg=tile_cfg, tile_tables=tb_)[0])
        dt = timed(fused, planes, tables, rays.origins, rays.directions,
                   rays.viewdirs, z_vals)
        print(f"res={res} fused   {dt * 1e3:7.2f} ms  "
              f"{rows / dt / 1e6:6.0f}M rows/s", flush=True)

    # pre-pass alone: same math up to the kernel inputs, cheap reduce out
    from nvsr_tpu.ops.geometry import normalize_coords

    def prepass(ro_, rd_, z, STAGE="full"):
        rays = rays0._replace(origins=ro_, directions=rd_)
        r, s = z.shape
        tr, sl = tile_cfg.tile_rays, tile_cfg.slab
        nt, ns = r // tr, s // sl
        from nvsr_tpu.ops.pallas.tile_sampler import to_chunks, _unnormalize
        z_c = to_chunks(z[..., None], nt, tr, ns, sl)
        o_c = jnp.broadcast_to(
            rays.origins.reshape(nt, 1, tr, 1, 3),
            (nt, ns, tr, sl, 3)).reshape(nt * ns, tr * sl, 3)
        d_c = jnp.broadcast_to(
            rays.directions.reshape(nt, 1, tr, 1, 3),
            (nt, ns, tr, sl, 3)).reshape(nt * ns, tr * sl, 3)
        pts_c = o_c + d_c * z_c
        if STAGE == "pts":
            return jnp.sum(pts_c)
        xyz = normalize_coords(pts_c.reshape(-1, 3), box[:, :3])
        grids = project_to_planes(xyz, make_rot_mats(3))
        if STAGE == "grids":
            return jnp.sum(grids)
        gc = grids.reshape(3, nt * ns, tr * sl, 2)
        xp = jnp.clip(_unnormalize(gc[..., 0], res, True), 0.0, res - 1.0)
        yp = jnp.clip(_unnormalize(gc[..., 1], res, True), 0.0, res - 1.0)
        y0 = jnp.clip(jnp.floor(yp).astype(jnp.int32), 0, res - 1)
        ty = yp - y0.astype(yp.dtype)
        x0 = jnp.clip(jnp.floor(xp).astype(jnp.int32), 0, res - 1)
        oy = (jnp.min(y0, -1) // 8) * 8
        ox = jnp.clip(jnp.min(x0, -1), 0, res - 1)
        yl = jnp.clip(y0 - oy[..., None], 0, tile_cfg.th - 1
                      ).astype(jnp.float32)
        xl = jnp.clip(xp - ox[..., None].astype(xp.dtype), 0.0,
                      tile_cfg.tw - 1.0)
        fidx = yl * tile_cfg.tw + xl
        if STAGE == "fidx":
            return jnp.sum(fidx) + jnp.sum(ty) + oy.sum() + ox.sum()
        ft = jnp.concatenate(
            [jnp.moveaxis(fidx, 0, -1),
             jnp.zeros_like(fidx[:1]).reshape(nt * ns, tr * sl, 1),
             jnp.moveaxis(ty, 0, -1),
             jnp.zeros_like(ty[:1]).reshape(nt * ns, tr * sl, 1)],
            axis=-1)
        return jnp.sum(ft, axis=(1, 2)) + oy.sum() + ox.sum()

    import functools
    for stage in ("pts", "grids", "fidx", "full"):
        pp = jax.jit(functools.partial(prepass, STAGE=stage))
        dt = timed(pp, rays.origins, rays.directions, z_vals)
        print(f"res={res} prepass-{stage:5s} {dt * 1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()

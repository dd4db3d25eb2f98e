"""Fine-pass chunk extent envelopes across viewpoints (host-side).

Measures the worst-case aligned-row / x-cell footprints of fine-pass
chunks at candidate (tile, slab) shapes over 6 bench-geometry
viewpoints — the quantities the region dims (th, tw) must cover. This
study drove three round-3 findings (PERF.md "Per-tile union occupancy
tightening"): per-ray occupancy intervals diverge at box silhouettes
(226-row footprints), the f32 two-product lerp breaks merge_sorted at
degenerate intervals, and per-TILE UNION tightening bounds every
envelope (16x16 x slab2 -> 23 rows / 17 cols; B=1024 shapes need
>= 2.1x the gather work, settling the chunk-size question at B=512).

Usage: python tools/exp_fine_slab4.py  (pure host+CPU math; force
jax_platforms=cpu in-process when the axon backend is registered)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from nvsr_tpu.models.triplane import make_rot_mats
from nvsr_tpu.ops.geometry import get_ray_bundle
from nvsr_tpu.ops.pallas.tile_sampler import (YALIGN, TileSamplerConfig,
                                              _round_up, _unnormalize)
from nvsr_tpu.render import (make_ray_bundle, tighten_bundle,
                             tile_ray_maps)
from nvsr_tpu.ops.sampling import hierarchical_z_vals, stratified_z_vals


def chunk_extents(origins, directions, z_vals, box3, rot, plane_hw,
                  tile_rays, slab, align_corners=True):
    """Max aligned-row / x-cell extents per chunk across the 3 planes
    (the quantities th/tw must cover), pure host-side numpy."""
    H, W = plane_hw
    R, S = z_vals.shape
    nt, ns = R // tile_rays, S // slab
    NC, B = nt * ns, tile_rays * slab
    o = np.asarray(origins)[:, None, :]
    d = np.asarray(directions)[:, None, :]
    z = np.asarray(z_vals)[..., None]
    pts = (o + d * z).reshape(nt, tile_rays, ns, slab, 3)
    pts = np.moveaxis(pts, 2, 1).reshape(NC, B, 3)
    box3 = np.asarray(box3)
    n = 2 * (pts - box3[0]) / (box3[1] - box3[0]) - 1
    rows_max, cols_max = 0, 0
    ovf = 0
    for p in range(rot.shape[0]):
        g = n @ rot[p][:, 1:3]                          # [NC, B, 2]
        xp = np.clip(_unnormalize(g[..., 0], W, align_corners), 0, W - 1)
        yp = np.clip(_unnormalize(g[..., 1], H, align_corners), 0, H - 1)
        y0 = np.floor(yp).astype(np.int64)
        x0 = np.floor(xp).astype(np.int64)
        oy = (y0.min(-1) // YALIGN) * YALIGN
        rows = y0.max(-1) - oy + 1                      # aligned rows
        cols = x0.max(-1) - x0.min(-1) + 2              # cells incl. tap
        rows_max = max(rows_max, int(rows.max()))
        cols_max = max(cols_max, int(cols.max()))
    return rows_max, cols_max


def main():
    H = W = 800
    plane_res = 800
    rot = np.asarray(make_rot_mats(3))
    box3 = np.stack([[-4, -4, -4], [4, 4, 4]]).astype(np.float32)
    occ = np.asarray([[-1.4, -1.1, -1.1], [1.5, 1.3, 1.2]], np.float32)
    eyes = [[3.8, 0.5, 0.7], [0.5, 3.8, -0.7], [-2.6, -2.6, 1.2],
            [2.2, -2.9, -1.4], [0.1, -3.7, 1.0], [-3.7, 0.3, -0.9]]
    key = jax.random.PRNGKey(0)
    for tile in ((16, 16), (16, 32), (32, 32)):
        tr = tile[0] * tile[1]
        for slab in (2, 4):
            rows_w, cols_w = 0, 0
            for eye in eyes:
                ro, rd = get_ray_bundle(
                    H, W, 0.5 * W / np.tan(0.3),
                    jnp.asarray(bench._camera(eye)))
                ro = tile_ray_maps(ro, tile)
                rd = tile_ray_maps(rd, tile)
                rays = make_ray_bundle(ro, rd, 2.0, 6.0,
                                       use_viewdirs=True)
                rays = tighten_bundle(rays, jnp.asarray(occ), tile_rays=tr)
                # deterministic eval sampling, coarse 16 + fine 16
                zc = stratified_z_vals(key, rays.near, rays.far, 16,
                                       lindisp=False, perturb=False)
                w = jnp.ones((zc.shape[0], 16))  # uniform pdf worst-ish
                zf = hierarchical_z_vals(key, zc, w, 16, det=True)
                rows_m, cols_m = chunk_extents(
                    rays.origins, rays.directions, np.asarray(zf),
                    box3, rot, (plane_res, plane_res), tr, slab)
                rows_w = max(rows_w, rows_m)
                cols_w = max(cols_w, cols_m)
            th_need = _round_up(rows_w, 8)
            print(f"tile {tile[0]}x{tile[1]} slab {slab} B={tr * slab}: "
                  f"rows<={rows_w} cols<={cols_w} -> th>={th_need} "
                  f"tw>={cols_w} T={th_need * cols_w}", flush=True)


if __name__ == "__main__":
    main()

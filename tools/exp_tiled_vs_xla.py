"""Hardware numerics gate: render ONE bench frame through the tiled
Pallas path and the exact XLA path on identical inputs and report the
pixelwise PSNR between them.

This is the cheap per-change gate for kernel numerics edits (the full
trained-scene gate lives in tools/val_occupancy.py variants T/U/V); a
kernel-path change that degrades numerics shows up here directly as a
drop in agreement PSNR. Round-2 record: >= 50 dB agreement on the
bench geometry.

Usage: python tools/exp_tiled_vs_xla.py  [BENCH_* env knobs apply]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    imgs = {}
    for tiled in (True, False):
        imgs[tiled] = _render_frame(tiled)
    a, b = imgs[True], imgs[False]
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    print(f"tiled-vs-xla agreement: mse={mse:.3e} psnr={psnr:.2f} dB "
          f"max|d|={float(np.max(np.abs(a - b))):.4f}")


def _render_frame(tiled):
    import jax
    import jax.numpy as jnp
    from nvsr_tpu.models import TriplaneConfig, init_decoder_params
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import (RenderConfig, make_ray_bundle,
                                 make_triplane_point_fn,
                                 render_rays_chunked, tighten_bundle,
                                 tile_ray_maps, untile_ray_maps)

    H = W = int(os.environ.get("BENCH_SIZE", 400))
    plane_res = int(os.environ.get("BENCH_PLANE_RES", 800))
    model_cfg = TriplaneConfig(
        proj_combination="avg", viewdir_proj_combination="concat_pos",
        skip_connect_every=3, gather_table_dtype="bfloat16",
        compute_dtype="bfloat16")
    lr_res = plane_res // 4
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    decoder_c = init_decoder_params(k1, model_cfg)
    decoder_f = init_decoder_params(k4, model_cfg)
    planes_lr = 0.3 * jax.random.normal(
        k2, (3, model_cfg.num_plane_channels, lr_res, lr_res))
    planes_sr = 0.3 * jax.random.normal(
        k5, (3, model_cfg.num_plane_channels, plane_res, plane_res))
    plane_view = 0.3 * jax.random.normal(
        k3, (model_cfg.viewdir_channels, 32, 32))
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)
    ro, rd = get_ray_bundle(H, W, 0.5 * W / np.tan(0.3),
                            jnp.asarray(bench._camera([3.8, 0.5, 0.7])))
    # BOTH frames ride tile-major rays with per-TILE UNION tightening
    # (the production tiled configuration, PERF.md round-3 silhouette
    # study) so they sample IDENTICAL z intervals — the only difference
    # between the frames is the gather/decode path, which is exactly
    # what this gate measures. Per-ray tightening on the tiled frame
    # would add region-clamp noise; different tightening between the
    # frames would add legitimate-but-irrelevant sampling differences.
    from nvsr_tpu.ops.pallas.tile_sampler import TileSamplerConfig
    spec = os.environ.get("BENCH_TILE", "16x16")
    th_, _, tw_ = spec.partition("x")
    tile = (int(th_), int(tw_ or th_))
    tile_cfg = TileSamplerConfig(tile_rays=tile[0] * tile[1]) \
        if tiled else None
    ro = tile_ray_maps(ro, tile)
    rd = tile_ray_maps(rd, tile)
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    occ_aabb = jnp.asarray([[-1.4, -1.1, -1.1], [1.5, 1.3, 1.2]],
                           dtype=jnp.float32)
    rays = tighten_bundle(rays, occ_aabb, tile_rays=tile[0] * tile[1])
    rcfg = RenderConfig(num_coarse=16, num_fine=16, perturb=False,
                        radiance_field_noise_std=0.0, ray_block=8192)

    # big arrays MUST be jit arguments, not closure constants: baked-in
    # constants ship inside the remote-compile request body and blow the
    # tunnel's HTTP size limit (413) at production plane sizes
    def render(decoder_c, decoder_f, planes_lr, planes_sr, plane_view,
               rays, key):
        pf_c = make_triplane_point_fn(decoder_c, model_cfg, planes_lr,
                                      plane_view, box, tile_cfg=tile_cfg)
        pf_f = make_triplane_point_fn(decoder_f, model_cfg, planes_sr,
                                      plane_view, box, tile_cfg=tile_cfg)
        out = render_rays_chunked(pf_c, pf_f, rays, key, rcfg)
        ovf = (out.aux or {}).get("overflow_frac", jnp.float32(0.0))
        return out.fine.rgb, ovf

    rgb, ovf = jax.jit(render)(
        decoder_c, decoder_f, planes_lr, planes_sr, plane_view,
        rays, jax.random.PRNGKey(1))
    rgb = np.asarray(rgb, dtype=np.float32)
    if float(ovf) > 0.0:
        # region clamping would invalidate the numerics comparison
        print(f"WARNING: overflow_frac={float(ovf):.4f} (tiled={tiled})"
              " — agreement PSNR includes clamping artifacts")
    rgb = np.asarray(untile_ray_maps(
        jnp.asarray(rgb).reshape(H * W, 3), H, W, tile))
    return rgb.reshape(H, W, 3)


if __name__ == "__main__":
    main()

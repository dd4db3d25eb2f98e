"""First-signal TPU smoke test for every shipped Pallas kernel form.

Runs each Pallas entry at TINY shapes on the real chip so Mosaic
lowering verdicts arrive in minutes (the measurement batches take
hours). Exercises:
  1. bilinear megakernel (per-chunk decode default, adaptive region dims)
  2. bicubic megakernel (6-region cubic form)
  3. non-fused bilinear + bicubic samplers (_tile_gather linear/cubic)
  4. trainable sampler VJP (forward kernel + XLA backward)

Prints one OK/FAIL line per form; exits nonzero if any fails.
Usage: python tools/tpu_smoke.py
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    failures = []

    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          init_decoder_params)
    from nvsr_tpu.ops.pallas.tile_sampler import (
        TileSamplerConfig, tiled_plane_sample_prechunked,
        tiled_plane_sample_prechunked_bicubic,
        tiled_plane_sample_trainable)

    def check(name, fn):
        try:
            fn()
            print(f"OK   {name}", flush=True)
        except Exception as e:  # noqa: BLE001 - report all verdicts
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
            traceback.print_exc(limit=3)

    # shared tiny model + rays (flagship decoder width so the fused
    # megakernel engages: fused_decoder.supports needs the real config)
    cfg = TriplaneConfig(proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         skip_connect_every=3, compute_dtype="bfloat16")
    cfg_cubic = TriplaneConfig(proj_combination="avg",
                               viewdir_proj_combination="concat_pos",
                               skip_connect_every=3,
                               plane_interp="bicubic",
                               compute_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(0.1 * rng.standard_normal(
        (3, cfg.num_plane_channels, 64, 64)).astype(np.float32))
    pv = jnp.asarray(0.1 * rng.standard_normal(
        (cfg.viewdir_channels, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    tc = TileSamplerConfig(tile_rays=64)

    # production from-z entry (prepare_ray_chunks + fused megakernel),
    # exactly what Experiment.render_eval_image and bench.py run
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import (RenderConfig, make_triplane_point_fn,
                                 render_image)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.8
    H = W = 16
    ro, rd = get_ray_bundle(H, W, 0.5 * W / np.tan(0.3), jnp.asarray(c2w))
    rcfg = RenderConfig(num_coarse=8, num_fine=8, perturb=False,
                        radiance_field_noise_std=0.0, ray_block=256)

    def mega(model_cfg):
        pf = [make_triplane_point_fn(params, model_cfg, planes, pv, box,
                                     tile_cfg=tc) for _ in range(2)]
        out = render_image(pf[0], pf[1], ro, rd, jax.random.PRNGKey(1),
                           rcfg, near=0.8, far=3.2, tile=8)
        rgb = np.asarray(out.fine.rgb)
        assert rgb.shape == (H, W, 3) and np.isfinite(rgb).all()
        print(f"      overflow={float(out.aux['overflow_frac']):.4f}",
              flush=True)

    def mega_bilinear():
        mega(cfg)

    def mega_bicubic():
        mega(cfg_cubic)

    def mega_bilinear_v1():
        os.environ["NVSR_MEGA_V1"] = "1"
        try:
            mega(cfg)
        finally:
            os.environ.pop("NVSR_MEGA_V1", None)

    def mega_bilinear_v2_nopack():
        os.environ["NVSR_MEGA_PACKOUT"] = "0"
        try:
            mega(cfg)
        finally:
            os.environ.pop("NVSR_MEGA_PACKOUT", None)

    def mega_bicubic_v1():
        os.environ["NVSR_MEGA_V1"] = "1"
        try:
            mega(cfg_cubic)
        finally:
            os.environ.pop("NVSR_MEGA_V1", None)

    def mega_bilinear_wbuild_mxu():
        # MXU-assisted hat build: rank-2 dot_general ([2, T] x [2, 6B])
        # + relu(min(..)) — new Mosaic forms: sublane-2 operands,
        # lane-dim iota at T, where() on a lane iota (round 5)
        os.environ["NVSR_MEGA_WBUILD"] = "mxu"
        try:
            mega(cfg)
        finally:
            os.environ.pop("NVSR_MEGA_WBUILD", None)

    def mega_bilinear_sigma_only():
        # sigma-only coarse decode (rgb branch + view stream skipped
        # in-kernel) combined with a full fine pass — the round-5
        # fine-image render fast path
        pf_c = make_triplane_point_fn(params, cfg, planes, pv, box,
                                      tile_cfg=tc, sigma_only=True)
        pf_f = make_triplane_point_fn(params, cfg, planes, pv, box,
                                      tile_cfg=tc)
        out = render_image(pf_c, pf_f, ro, rd, jax.random.PRNGKey(1),
                           rcfg, near=0.8, far=3.2, tile=8)
        rgb = np.asarray(out.fine.rgb)
        assert rgb.shape == (H, W, 3) and np.isfinite(rgb).all()
        print(f"      overflow={float(out.aux['overflow_frac']):.4f}",
              flush=True)

    def mega_compact_ladder_step():
        # the eval ladder's compact step shape: 8x16-ray slab-1 B=128
        # chunks, full regions, repair enabled, sigma-only coarse —
        # the smallest v2-eligible slab-1 form (round 5)
        import dataclasses as _dc
        tcc = _dc.replace(tc, tile_rays=128, slab=1,
                          adaptive_region=False, repair_frac=0.125)
        pf_c = make_triplane_point_fn(params, cfg, planes, pv, box,
                                      tile_cfg=tcc, sigma_only=True)
        pf_f = make_triplane_point_fn(params, cfg, planes, pv, box,
                                      tile_cfg=tcc)
        out = render_image(pf_c, pf_f, ro, rd, jax.random.PRNGKey(1),
                           rcfg, near=0.8, far=3.2, tile=(8, 16),
                           tighten_tile_union=False)
        rgb = np.asarray(out.fine.rgb)
        assert rgb.shape == (H, W, 3) and np.isfinite(rgb).all()
        print(f"      overflow={float(out.aux['overflow_frac']):.4f}",
              flush=True)

    def mega_bilinear_noviewtile():
        # per-point [N, 64] view stream (the pre-round-4 form)
        os.environ["NVSR_MEGA_VIEWTILE"] = "0"
        try:
            mega(cfg)
        finally:
            os.environ.pop("NVSR_MEGA_VIEWTILE", None)

    def mega_bilinear_nopackray():
        # chunk-major packout output + from_chunks (packray off)
        os.environ["NVSR_MEGA_PACKRAY"] = "0"
        try:
            mega(cfg)
        finally:
            os.environ.pop("NVSR_MEGA_PACKRAY", None)

    def mega_bilinear_packray_multicell():
        # packray with S*4 > 128: each grid step fills one 128-lane
        # CELL of its tile's out rows ((i//k, i%k) out index map) —
        # the 64+64 / 32+32 reference-semantics fine-pass form
        tc2 = TileSamplerConfig(tile_rays=64, slab=4)
        rcfg2 = RenderConfig(num_coarse=32, num_fine=32, perturb=False,
                             radiance_field_noise_std=0.0, ray_block=256)
        pf = [make_triplane_point_fn(params, cfg, planes, pv, box,
                                     tile_cfg=tc2) for _ in range(2)]
        out = render_image(pf[0], pf[1], ro, rd, jax.random.PRNGKey(1),
                           rcfg2, near=0.8, far=3.2, tile=8)
        rgb = np.asarray(out.fine.rgb)
        assert rgb.shape == (H, W, 3) and np.isfinite(rgb).all()
        print(f"      overflow={float(out.aux['overflow_frac']):.4f}",
              flush=True)

    def mega_bilinear_packray_k2():
        # packray with ns > group: the out block is revisited k=2
        # consecutive grid steps and accumulated in-kernel (the
        # flagship fine-pass form: S=32, slab=2, ns=16, group=8)
        tc2 = TileSamplerConfig(tile_rays=64, slab=2)
        rcfg2 = RenderConfig(num_coarse=16, num_fine=16, perturb=False,
                             radiance_field_noise_std=0.0, ray_block=256)
        pf = [make_triplane_point_fn(params, cfg, planes, pv, box,
                                     tile_cfg=tc2) for _ in range(2)]
        out = render_image(pf[0], pf[1], ro, rd, jax.random.PRNGKey(1),
                           rcfg2, near=0.8, far=3.2, tile=8)
        rgb = np.asarray(out.fine.rgb)
        assert rgb.shape == (H, W, 3) and np.isfinite(rgb).all()
        print(f"      overflow={float(out.aux['overflow_frac']):.4f}",
              flush=True)

    # chunk-ordered grids for the raw sampler entries
    gg = rng.uniform(-0.05, 0.05, size=(3, 4, 512, 2)).astype(np.float32)
    g_c = jnp.asarray(gg + rng.uniform(-0.6, 0.6, size=(3, 4, 1, 2)))
    small = TileSamplerConfig(tile_rays=256, slab=2, th=24, tw=16, group=2)

    # interpret only off-TPU (CPU dry-runs of this script); the real
    # smoke signal is interpret=False Mosaic lowering on the chip
    interp = jax.default_backend() != "tpu"

    def sampler_bilinear():
        out, ovf = tiled_plane_sample_prechunked(planes, g_c, small,
                                                 interpret=interp)
        assert np.isfinite(np.asarray(out)).all()

    def sampler_bicubic():
        out, ovf = tiled_plane_sample_prechunked_bicubic(
            planes, g_c, small, interpret=interp)
        assert np.isfinite(np.asarray(out)).all()

    def trainable_vjp():
        def loss(p):
            out, _ = tiled_plane_sample_trainable(p, g_c, small, True,
                                                  interp)
            return jnp.sum(out ** 2)
        gr = jax.grad(loss)(planes)
        assert np.isfinite(np.asarray(gr)).all()

    check("megakernel bilinear (v2 + viewtile + packray)", mega_bilinear)
    check("megakernel bilinear (wbuild=mxu rank-2 hat build)",
          mega_bilinear_wbuild_mxu)
    check("megakernel bilinear (sigma-only coarse decode)",
          mega_bilinear_sigma_only)
    check("megakernel compact ladder step (8x16 slab-1 B=128 + repair)",
          mega_compact_ladder_step)
    check("megakernel bilinear (v2, per-point view stream)",
          mega_bilinear_noviewtile)
    check("megakernel bilinear (v2 + packout, packray off)",
          mega_bilinear_nopackray)
    check("megakernel bilinear (packray k=2 revisit)",
          mega_bilinear_packray_k2)
    check("megakernel bilinear (packray multi-cell, S*4=128*k)",
          mega_bilinear_packray_multicell)
    check("megakernel bilinear (v2, packout off)", mega_bilinear_v2_nopack)
    check("megakernel bicubic (v2, 6-region)", mega_bicubic)
    check("megakernel bilinear (v1, [N,1] descriptors)", mega_bilinear_v1)
    check("megakernel bicubic (v1)", mega_bicubic_v1)
    check("sampler bilinear", sampler_bilinear)
    check("sampler bicubic", sampler_bicubic)
    check("trainable VJP", trainable_vjp)

    if failures:
        print("SMOKE FAILED:", failures, flush=True)
        sys.exit(1)
    print("SMOKE ALL OK", flush=True)


if __name__ == "__main__":
    main()

"""Attribute the production HR/SR training step's 0.91 s (BENCH_r02).

Times `train_step` at TrainModels dims with pieces swapped out:
  full        the bench configuration (EDSR 256x32, 64+64 samples)
  tiny_sr     EDSR 16x1 (isolates the SR-conv cost)
  few_samples 8+8 samples (isolates the sample-proportional cost:
              gathers fwd+bwd + decoder fwd+bwd)
  lr_step     sr_iter=False (the 0.133 s LR step, for reference)
  no_planes   train_planes=False (isolates the plane-scatter backward:
              frozen planes never receive the gather transpose)

Usage: python tools/exp_train_budget.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.models import (PlaneSRConfig, TriplaneConfig,
                             init_decoder_params, init_plane_sr_params)
from nvsr_tpu.ops.geometry import get_ray_bundle
from nvsr_tpu.render import RenderConfig, make_ray_bundle
from nvsr_tpu.train import StepFlags, train_step

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


def main():
    reps = int(os.environ.get("REPS", 3))
    cfg = TriplaneConfig(proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         skip_connect_every=3,
                         gather_table_dtype="bfloat16")
    dc = init_decoder_params(jax.random.PRNGKey(0), cfg)
    df = init_decoder_params(jax.random.PRNGKey(1), cfg)
    planes = {"pos": 0.03 * jax.random.normal(jax.random.PRNGKey(3),
                                              (3, 48, 200, 200)),
              "view": 0.03 * jax.random.normal(jax.random.PRNGKey(4),
                                               (48, 32, 32))}
    box = jnp.asarray(np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                                [4, 4, 4, np.pi, np.pi / 2]]
                               ).astype(np.float32))
    ro, rd = get_ray_bundle(64, 64, 80.0,
                            jnp.asarray(_camera([3.8, 0.5, 0.7])))
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    target = jnp.full((4096, 3), 0.5)

    def run(label, *, sr_hidden=256, sr_blocks=32, samples=64,
            sr_iter=True, train_planes=True, tile=0, occ=False,
            remat=True, remat_every=1, train_batch=False):
        step_rays = rays
        if occ:
            # occupancy-tightened sampling (the validated production
            # configuration, PERF.md round 2 / tools/val_occupancy.py):
            # per-ray [near, far] shrunk to an occupied-AABB band —
            # THE source of the tile sampler's depth locality
            step_rays = step_rays._replace(
                near=jnp.full_like(step_rays.near, 3.2),
                far=jnp.full_like(step_rays.far, 4.6))
        tile_cfg = None
        if tile:
            # tile-coherent batch (nerf.train.tiled_gather semantics):
            # 4096/tile^2 random (tile x tile)-pixel tiles of a
            # FLAGSHIP-SIZED 800x800 view (train.choose_tile_pixels),
            # riding the custom-VJP sampler. Tile angular extent — and
            # hence the on-plane footprint the region capacity must
            # cover — matches production training, unlike a tiling of
            # the 64x64 debug ray map (whose 16x16 tiles span a quarter
            # of the image and overflow every region).
            # NOTE: since the coarse-only fix (train.py), tile_cfg tiles
            # the COARSE pass only — the fine pass's inverse-CDF z ranks
            # misalign across rays on unconverged fields (99-100% region
            # overflow measured here at every tiled variant), so it
            # keeps the exact XLA gather.
            from nvsr_tpu.ops.geometry import get_rays_at
            from nvsr_tpu.ops.pallas.tile_sampler import TileSamplerConfig
            from nvsr_tpu.render import make_ray_bundle as _mrb
            rng = np.random.default_rng(7)
            n_tiles = 4096 // (tile * tile)
            oy = rng.integers(0, 800 - tile, size=n_tiles)
            ox = rng.integers(0, 800 - tile, size=n_tiles)
            rows = (oy[:, None, None] + np.arange(tile)[None, :, None])
            cols = (ox[:, None, None] + np.arange(tile)[None, None, :])
            rows = np.broadcast_to(rows, (n_tiles, tile, tile)).reshape(-1)
            cols = np.broadcast_to(cols, (n_tiles, tile, tile)).reshape(-1)
            tro, trd = get_rays_at(jnp.asarray(rows), jnp.asarray(cols),
                                   800, 800, 1000.0,
                                   jnp.asarray(_camera([3.8, 0.5, 0.7])))
            step_rays = _mrb(tro, trd,
                             3.2 if occ else 2.0, 4.6 if occ else 6.0,
                             use_viewdirs=True)
            tile_cfg = TileSamplerConfig(tile_rays=tile * tile)
        sr_cfg = None
        sr = None
        if sr_iter:
            sr_cfg = PlaneSRConfig(scale_factor=4, hidden_size=sr_hidden,
                                   n_blocks=sr_blocks,
                                   compute_dtype="bfloat16", remat=remat,
                                   remat_every=remat_every,
                                   train_batch=train_batch)
            sr = init_plane_sr_params(jax.random.PRNGKey(2), sr_cfg)
        rcfg = RenderConfig(num_coarse=samples, num_fine=samples,
                            perturb=True, radiance_field_noise_std=0.2)
        flags = StepFlags(sr_iter=sr_iter, train_planes=train_planes,
                          tile_cfg=tile_cfg)
        out = train_step(dc, df, sr, planes, box, step_rays, target,
                         jax.random.PRNGKey(9), model_cfg=cfg,
                         sr_cfg=sr_cfg, rcfg=rcfg, flags=flags)
        assert np.isfinite(float(_probe(out[0]["loss"])))
        if tile:
            print(f"  overflow_frac={float(out[0]['overflow_frac']):.4f}")
        t0 = time.perf_counter()
        for i in range(reps):
            out = train_step(dc, df, sr, planes, box, step_rays, target,
                             jax.random.PRNGKey(10 + i), model_cfg=cfg,
                             sr_cfg=sr_cfg, rcfg=rcfg, flags=flags)
        float(_probe(out[0]["loss"]))
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:14s} {dt:7.3f} s/step", flush=True)
        return dt

    only = os.environ.get("ONLY", "").split(",") if "ONLY" in os.environ \
        else None

    def maybe(label, **kw):
        if only is None or label in only:
            run(label, **kw)

    maybe("full")
    maybe("full_noremat", remat=False)
    maybe("full_occ16_noremat", samples=16, occ=True, remat=False)
    maybe("full_tiled8", tile=8)
    maybe("full_tiled16", tile=16)
    maybe("tiny_sr", sr_hidden=16, sr_blocks=1)
    maybe("few_samples", samples=8)
    maybe("no_planes", train_planes=False)
    maybe("lr_step", sr_iter=False)
    maybe("lr_tiled8", sr_iter=False, tile=8)
    maybe("lr_tiled16", sr_iter=False, tile=16)
    maybe("lr_few", sr_iter=False, samples=8)
    maybe("lr_no_planes", sr_iter=False, train_planes=False)
    # occupancy-tightened 16+16 (the validated production budget,
    # val_occupancy.py) — the configuration tiled TRAINING targets
    maybe("lr_occ16", sr_iter=False, samples=16, occ=True)
    maybe("lr_occ16_t8", sr_iter=False, samples=16, occ=True, tile=8)
    maybe("lr_occ16_t16", sr_iter=False, samples=16, occ=True, tile=16)
    maybe("full_occ16", samples=16, occ=True)
    # SR schedule knobs (PlaneSRConfig.remat_every / .train_batch) at
    # the full train-step level — the production-adoption A/B for the
    # exp_sr_budget standalone winners
    maybe("full_occ16_remat4", samples=16, occ=True, remat_every=4)
    maybe("full_occ16_batch", samples=16, occ=True, train_batch=True)
    maybe("full_occ16_batch_r4", samples=16, occ=True, train_batch=True,
          remat_every=4)
    maybe("full_occ16_t16", samples=16, occ=True, tile=16)
    maybe("full_occ16_t8", samples=16, occ=True, tile=8)
    maybe("full_occ16_t16", samples=16, occ=True, tile=16)


if __name__ == "__main__":
    main()

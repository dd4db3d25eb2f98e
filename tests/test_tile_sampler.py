"""Tests for the locality-bucketed Pallas plane sampler
(nvsr_tpu/ops/pallas/tile_sampler.py), run in interpreter mode on CPU.

Numerics contract: matches the bilinear/border grid_sample path with
bfloat16 tap values and bfloat16 interpolation weights -> tolerance
~1e-2 on unit-scale features.
"""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvsr_tpu.ops.grid_sample import multi_plane_sample
from nvsr_tpu.ops.pallas.tile_sampler import (TileSamplerConfig,
                                              tiled_plane_sample)


def _clustered_grids(rng, P, R, S, cfg, spread=0.08):
    """Tile-coherent grids: each (tile, slab) chunk clusters around a
    random center, mimicking rays through an image tile."""
    ntiles = R // cfg.tile_rays
    nslabs = S // cfg.slab
    centers = rng.uniform(-0.8, 0.8, size=(P, ntiles, nslabs, 2))
    # [P, ntiles, tile_rays, nslabs, slab, 2] ray-major layout
    g = np.repeat(np.repeat(centers[:, :, None, :, None, :], cfg.tile_rays,
                            axis=2), cfg.slab, axis=4)
    g = g + rng.uniform(-spread, spread, size=g.shape)
    return jnp.asarray(g.reshape(P, R, S, 2).astype(np.float32))


@pytest.mark.parametrize("align_corners", [True, False])
def test_tiled_matches_reference_bilinear(rng, align_corners):
    P, C, H, W = 3, 8, 64, 64
    cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16, group=2)
    R, S = 32, 8
    planes = jnp.asarray(rng.standard_normal((P, C, H, W)).astype(np.float32))
    grids = _clustered_grids(rng, P, R, S, cfg)

    out, overflow = tiled_plane_sample(planes, grids, cfg,
                                       align_corners=align_corners,
                                       interpret=True)
    assert out.shape == (P, R, S, C)
    assert float(overflow) == 0.0

    ref = multi_plane_sample(planes, grids.reshape(P, R * S, 2),
                             mode="bilinear", align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref).reshape(P, R, S, C),
                               atol=3e-2, rtol=0)
    # agreement should be much tighter than feature scale on average
    err = np.abs(np.asarray(out) - np.asarray(ref).reshape(P, R, S, C))
    assert err.mean() < 3e-3


def test_overflow_reported_for_scattered_points(rng):
    P, C, H, W = 3, 8, 64, 64
    cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16, group=2)
    R, S = 32, 8
    planes = jnp.asarray(rng.standard_normal((P, C, H, W)).astype(np.float32))
    # fully random points: chunks cannot fit a 16x16 region
    grids = jnp.asarray(rng.uniform(-0.95, 0.95,
                                    size=(P, R, S, 2)).astype(np.float32))
    _, overflow = tiled_plane_sample(planes, grids, cfg, interpret=True)
    assert float(overflow) > 0.5


def test_border_clamp_matches(rng):
    """Points beyond the plane edge clamp exactly like padding='border'."""
    P, C, H, W = 3, 4, 32, 32
    cfg = TileSamplerConfig(tile_rays=8, slab=2, th=32, tw=16, group=1)
    R, S = 8, 2
    planes = jnp.asarray(rng.standard_normal((P, C, H, W)).astype(np.float32))
    grids = jnp.asarray(
        np.stack([np.full((P, R, S), 1.2), np.full((P, R, S), -1.3)],
                 axis=-1).astype(np.float32))
    out, _ = tiled_plane_sample(planes, grids, cfg, interpret=True)
    ref = multi_plane_sample(planes, grids.reshape(P, R * S, 2),
                             mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref).reshape(P, R, S, C),
                               atol=3e-2, rtol=0)


def test_apply_triplane_rays_tiled_matches(rng):
    """Full model forward through the tiled sampler == XLA gather path."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays,
                                          init_decoder_params)
    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=8,
                         dec_density_layers=2, dec_rgb_layers=2,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.5 * rng.standard_normal((3, 8, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.5 * rng.standard_normal((8, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    tile_cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16, group=2)

    R, S = 16, 8
    # rays of one "image tile": nearby origins, nearly parallel dirs
    origin = np.array([0.0, 0.0, 1.8])
    dirs = np.stack(np.meshgrid(np.linspace(-.05, .05, 4),
                                np.linspace(-.05, .05, 4)), -1).reshape(-1, 2)
    d = np.concatenate([dirs, -np.ones((R, 1))], -1).astype(np.float32)
    z = np.linspace(0.8, 3.2, S).astype(np.float32)
    pts = jnp.asarray(origin + d[:, None, :] * z[None, :, None])
    viewdirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    out_ref = apply_triplane_rays(params, cfg, planes, plane_view, box,
                                  pts, viewdirs)
    out_tiled = apply_triplane_rays(params, cfg, planes, plane_view, box,
                                    pts, viewdirs, tile_cfg=tile_cfg)
    np.testing.assert_allclose(np.asarray(out_tiled), np.asarray(out_ref),
                               atol=5e-2, rtol=0)
    err = np.abs(np.asarray(out_tiled) - np.asarray(out_ref))
    assert err.mean() < 5e-3


def test_experiment_tiled_eval_matches(tmp_path):
    """nerf.validation.tiled_gather: the production eval render through
    the Pallas tile sampler matches the XLA gather path."""
    import sys
    sys.path.insert(0, "tests")
    from helpers_synth import write_blender_scene
    from test_experiment import _mini_cfg
    from nvsr_tpu.experiment import Experiment

    write_blender_scene(str(tmp_path / "synt"), "lego", size=32)
    cfg = _mini_cfg(tmp_path, logdir="logs/tiled",
                    train_groups={"4,8,8": ["lego"]}, sr=False,
                    what=("LR_planes", "decoder"), iters=2)
    for mode in ("train", "validation"):
        cfg.nerf[mode]["num_coarse"] = 8
        cfg.nerf[mode]["num_fine"] = 8
    exp = Experiment(cfg, root_path=str(tmp_path))
    exp.planes_buffer.draw_scenes()
    exp.image_sampler.update_active(exp.planes_buffer.cur_scenes)
    for i in range(2):
        exp.train_iteration(i)
    scene = exp.training_scenes[0]
    img_idx = exp.i_val[list(exp.i_val.keys())[0]][0]

    out_plain, _ = exp.render_eval_image(scene, img_idx)
    cfg.nerf.validation["tiled_gather"] = True
    exp._eval_pf_cache = {}
    assert exp.eval_tile_cfg(scene) is not None
    out_tiled, _ = exp.render_eval_image(scene, img_idx)

    a = np.asarray(out_plain.fine.rgb)
    b = np.asarray(out_tiled.fine.rgb)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, atol=5e-2, rtol=0)
    assert np.abs(b - a).mean() < 5e-3


def test_bicubic_tiled_matches_reference(rng):
    """tiled_plane_sample_prechunked_bicubic == grid_sample bicubic
    (torch-oracled) incl. borders and out-of-range coords."""
    from nvsr_tpu.ops.grid_sample import multi_plane_sample
    from nvsr_tpu.ops.pallas.tile_sampler import (
        tiled_plane_sample_prechunked_bicubic, to_chunks)
    P, C, H, W = 3, 8, 64, 64
    cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16, group=2)
    R, S = 32, 8
    planes = jnp.asarray(
        rng.standard_normal((P, C, H, W)).astype(np.float32))
    centers = rng.uniform(-1.05, 1.05, size=(P, R // 16, 1, S // 4, 1, 2))
    offs = rng.uniform(-0.02, 0.02, size=(P, R // 16, 16, S // 4, 4, 2))
    grids = jnp.asarray(np.clip(centers + offs, -1.3, 1.3)
                        .astype(np.float32).reshape(P, R, S, 2))
    g_c = to_chunks(grids, R // 16, 16, S // 4, 4)
    for ac in (True, False):
        out, ovf = tiled_plane_sample_prechunked_bicubic(
            planes, g_c, cfg, align_corners=ac, interpret=True)
        ref = multi_plane_sample(planes, g_c.reshape(P, -1, 2),
                                 mode="bicubic", align_corners=ac)
        err = np.abs(np.asarray(out) - np.asarray(ref))
        assert float(ovf) == 0.0
        assert err.max() < 5e-2 and err.mean() < 5e-3


def test_bicubic_capacity_boundary_chunk_exact(rng):
    """A chunk whose 4-tap x span EXACTLY fills the region (max tap at
    column tw-1) is in-capacity per the overflow predicate — its
    boundary points (local fx in [tw-3, tw-2)) must interpolate
    exactly, not get silently shifted one cell left by the fx clamp.

    Regression for the clamp/predicate mismatch (round-3 review): the
    clamp upper bound was tw-3-1e-3 while the predicate admits
    fx < tw-2, corrupting capacity-boundary chunks with
    overflow_frac == 0 (max feature error ~0.67 vs ~0.005 noise)."""
    from nvsr_tpu.ops.grid_sample import multi_plane_sample
    from nvsr_tpu.ops.pallas.tile_sampler import (
        tiled_plane_sample_prechunked_bicubic)
    P, C, H, W = 3, 8, 64, 64
    cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16, group=1)
    B = cfg.tile_rays * cfg.slab
    # source x spans exactly tw-4 = 12 cells: c0 = floor(x)+1 runs
    # 21..33, ox = 21, max tap col 33+3 = 36 -> 36-21 = tw-1 (the last
    # region column). The top of the range (x in [32, 33)) lands in the
    # previously-clamped fx zone [tw-3, tw-2).
    xs = np.concatenate([np.linspace(20.05, 31.9, B - 8),
                         np.linspace(32.0, 32.98, 8)])
    ys = np.full(B, 30.3)
    g = np.stack([2.0 * xs / (W - 1) - 1.0,
                  2.0 * ys / (H - 1) - 1.0], axis=-1).astype(np.float32)
    g_c = jnp.asarray(np.broadcast_to(g, (P, 1, B, 2)))
    planes = jnp.asarray(
        rng.standard_normal((P, C, H, W)).astype(np.float32))
    out, ovf = tiled_plane_sample_prechunked_bicubic(
        planes, g_c, cfg, align_corners=True, interpret=True)
    ref = multi_plane_sample(planes, g_c.reshape(P, -1, 2),
                             mode="bicubic", align_corners=True)
    assert float(ovf) == 0.0
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 5e-2 and err.mean() < 5e-3


def test_tiled_fuzz_nonoverflow_chunks_exact(rng):
    """Property: for RANDOM plane sizes / region dims / chunk spreads,
    every chunk the overflow predicate declares IN-CAPACITY must match
    the XLA grid_sample oracle — the clamp bounds and the predicate
    must agree exactly, for both interps (the bicubic capacity-boundary
    bug was exactly such a disagreement). Overflowing chunks are
    allowed to clamp (they are reported); non-overflowing ones are not
    allowed to deviate beyond bf16 tap/weight noise."""
    from nvsr_tpu.ops.grid_sample import multi_plane_sample
    from nvsr_tpu.ops.pallas.tile_sampler import (
        tiled_plane_sample_prechunked,
        tiled_plane_sample_prechunked_bicubic)
    P, C = 3, 8
    for trial in range(10):
        H = int(rng.integers(2, 12)) * 8
        W = int(rng.integers(16, 97))
        th = int(rng.choice([8, 16, 24, 32]))
        tw = int(rng.choice([8, 14, 16, 18]))
        B = int(rng.choice([32, 64]))
        NC = 6
        spread = float(rng.uniform(0.01, 0.35))
        cfg = TileSamplerConfig(tile_rays=B // 2, slab=2, th=th, tw=tw,
                                group=2)
        planes = jnp.asarray(
            rng.standard_normal((P, C, H, W)).astype(np.float32))
        centers = rng.uniform(-1.1, 1.1, size=(P, NC, 1, 2))
        g_c = jnp.asarray(np.clip(
            centers + rng.uniform(-spread, spread, size=(P, NC, B, 2)),
            -1.4, 1.4).astype(np.float32))
        for interp, fn in (("bilinear", tiled_plane_sample_prechunked),
                           ("bicubic",
                            tiled_plane_sample_prechunked_bicubic)):
            out, ovf = fn(planes, g_c, cfg, align_corners=True,
                          interpret=True)
            ref = multi_plane_sample(planes, g_c.reshape(P, -1, 2),
                                     mode=interp, align_corners=True)
            # recompute the per-chunk overflow mask the sampler used
            if interp == "bilinear":
                from nvsr_tpu.ops.pallas.tile_sampler import (
                    YALIGN, _grid_chunk_descriptors, _round_up)
                Hp = max(_round_up(H, YALIGN), th)
                xp = np.clip((np.asarray(g_c[..., 0]) + 1) / 2 * (W - 1),
                             0, W - 1)
                yp = np.clip((np.asarray(g_c[..., 1]) + 1) / 2 * (H - 1),
                             0, H - 1)
                x0 = np.floor(xp).astype(np.int64)
                y0 = np.floor(yp).astype(np.int64)
                oy = np.clip(y0.min(-1) // YALIGN * YALIGN, 0, Hp - th)
                ox = np.clip(x0.min(-1), 0, W - 1)
                over = ((y0.max(-1) - oy > th - 1)
                        | (x0.max(-1) + 1 - ox > tw - 1))   # [P, NC]
            else:
                from nvsr_tpu.ops.pallas.tile_sampler import (
                    YALIGN, _round_up)
                Hp = max(_round_up(H + 2, YALIGN), th)
                Wp = W + 5 + tw
                xs = np.clip((np.asarray(g_c[..., 0]) + 1) / 2 * (W - 1),
                             -1.0, W)
                ys = np.clip((np.asarray(g_c[..., 1]) + 1) / 2 * (H - 1),
                             -1.0, H)
                r = np.floor(ys).astype(np.int64) + 1
                c0 = np.floor(xs).astype(np.int64) + 1
                oy = np.clip(r.min(-1) // YALIGN * YALIGN, 0, Hp - th)
                ox = np.clip(c0.min(-1), 0, Wp - tw)
                over = ((r.max(-1) - oy > th - 1)
                        | (c0.max(-1) + 3 - ox > tw - 1))
            got_frac = float(np.mean(over))
            assert abs(got_frac - float(ovf)) < 1e-6, \
                (trial, interp, got_frac, float(ovf))
            ok = ~np.repeat(over.reshape(P, NC), B, axis=1)  # [P, NC*B]
            err = np.abs(np.asarray(out) - np.asarray(ref))
            bad = err[ok].max() if ok.any() else 0.0
            assert bad < 5e-2, (trial, interp, H, W, th, tw, bad,
                                got_frac)


def test_bicubic_model_forward_tiled_matches(rng):
    """Full triplane forward with plane_interp='bicubic' through the
    tiled path == the XLA gather path (VERDICT r2 missing #4)."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays,
                                          init_decoder_params)
    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=8,
                         dec_density_layers=2, dec_rgb_layers=2,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         plane_interp="bicubic")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.5 * rng.standard_normal((3, 8, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.5 * rng.standard_normal((8, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    tile_cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16,
                                 group=2)
    R, S = 16, 8
    origin = np.array([0.0, 0.0, 1.8])
    dirs = np.stack(np.meshgrid(np.linspace(-.05, .05, 4),
                                np.linspace(-.05, .05, 4)),
                    -1).reshape(-1, 2)
    d = np.concatenate([dirs, -np.ones((R, 1))], -1).astype(np.float32)
    z = np.linspace(0.8, 3.2, S).astype(np.float32)
    pts = jnp.asarray(origin + d[:, None, :] * z[None, :, None])
    viewdirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    out_ref = apply_triplane_rays(params, cfg, planes, plane_view, box,
                                  pts, viewdirs)
    out_tiled = apply_triplane_rays(params, cfg, planes, plane_view, box,
                                    pts, viewdirs, tile_cfg=tile_cfg)
    np.testing.assert_allclose(np.asarray(out_tiled), np.asarray(out_ref),
                               atol=5e-2, rtol=0)
    assert np.abs(np.asarray(out_tiled) - np.asarray(out_ref)).mean() < 5e-3


def test_bicubic_megakernel_matches_xla(rng):
    """Flagship-width bicubic through the FUSED megakernel (from-z ray
    entry; fused_decoder.supports holds) == the XLA bicubic path."""
    import jax
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          init_decoder_params)
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import (RenderConfig, make_triplane_point_fn,
                                 render_image)
    cfg = TriplaneConfig(proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         skip_connect_every=3, plane_interp="bicubic",
                         compute_dtype="bfloat16")
    from nvsr_tpu.ops.pallas import fused_decoder
    assert fused_decoder.supports(cfg)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(0.1 * rng.standard_normal(
        (3, cfg.num_plane_channels, 64, 64)).astype(np.float32))
    pv = jnp.asarray(0.1 * rng.standard_normal(
        (cfg.viewdir_channels, 16, 16)).astype(np.float32))
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.5
    H = W = 16
    ro, rd = get_ray_bundle(H, W, 0.5 * W / np.tan(0.3), jnp.asarray(c2w))
    rcfg = RenderConfig(num_coarse=8, num_fine=8, perturb=False,
                        radiance_field_noise_std=0.0, ray_block=256)
    tc = TileSamplerConfig(tile_rays=64)
    pf_t = [make_triplane_point_fn(params, cfg, planes, pv, box,
                                   tile_cfg=tc) for _ in range(2)]
    out_t = render_image(pf_t[0], pf_t[1], ro, rd, jax.random.PRNGKey(1),
                         rcfg, near=2.0, far=6.0, tile=8)
    pf_x = [make_triplane_point_fn(params, cfg, planes, pv, box)
            for _ in range(2)]
    out_x = render_image(pf_x[0], pf_x[1], ro, rd, jax.random.PRNGKey(1),
                         rcfg, near=2.0, far=6.0)
    a = np.asarray(out_x.fine.rgb)
    b = np.asarray(out_t.fine.rgb)
    assert float(out_t.aux["overflow_frac"]) == 0.0
    np.testing.assert_allclose(b, a, atol=5e-2, rtol=0)
    assert np.abs(b - a).mean() < 5e-3


def test_experiment_overflow_falls_back_to_xla(tmp_path):
    """When a tiled eval render clamps (overflow_frac > 0), the
    production eval escalates down the ladder (compact tiles, then the
    exact XLA path), tags the step that served in aux, and caches the
    per-scene plan — the safety net VERDICT r2 demanded, made a ladder
    in round 4 (tools/exp_gate_overflow.py)."""
    import sys
    sys.path.insert(0, "tests")
    from helpers_synth import write_blender_scene
    from test_experiment import _mini_cfg
    from nvsr_tpu.experiment import Experiment

    write_blender_scene(str(tmp_path / "synt"), "lego", size=32)
    cfg = _mini_cfg(tmp_path, logdir="logs/ovf",
                    train_groups={"4,64,8": ["lego"]}, sr=False,
                    what=("LR_planes", "decoder"), iters=2)
    for mode in ("train", "validation"):
        cfg.nerf[mode]["num_coarse"] = 8
        cfg.nerf[mode]["num_fine"] = 8
    # 16x16-pixel tiles on a 32px image: each tile spans a quarter of
    # the frame, so chunk footprints exceed any region capacity
    cfg.nerf.validation["tiled_gather"] = True
    cfg.nerf.validation["tile_shape"] = "16x16"
    exp = Experiment(cfg, root_path=str(tmp_path))
    exp.planes_buffer.draw_scenes()
    exp.image_sampler.update_active(exp.planes_buffer.cur_scenes)
    for i in range(2):
        exp.train_iteration(i)
    scene = exp.training_scenes[0]
    img_idx = exp.i_val[list(exp.i_val.keys())[0]][0]
    assert exp.eval_tile_cfg(scene) is not None
    out, _ = exp.render_eval_image(scene, img_idx)
    aux = out.aux or {}
    assert float(aux.get("overflow_frac", 0.0)) > 0.0
    compact = float(aux.get("tiled_compact", 0.0))
    fallback = float(aux.get("tiled_fallback", 0.0))
    assert compact == 1.0 or fallback == 1.0
    # the serving step is cached per scene for the next view
    assert exp._tiled_eval_plan[scene] == (1 if compact else 2)
    # and the served output equals a straight XLA render (exactly for
    # the XLA fallback; to tiled bf16 tolerance for the compact step)
    cfg.nerf.validation["tiled_gather"] = False
    exp._eval_pf_cache = {}
    out_x, _ = exp.render_eval_image(scene, img_idx)
    a, b = np.asarray(out.fine.rgb), np.asarray(out_x.fine.rgb)
    if fallback:
        np.testing.assert_allclose(a, b, atol=1e-4)
    else:
        np.testing.assert_allclose(a, b, atol=5e-2, rtol=0)
        assert np.abs(a - b).mean() < 5e-3


def test_experiment_bicubic_tiled_eval_matches(tmp_path):
    """plane_interp 'bicubic' through the production tiled eval path
    (nerf.validation.tiled_gather) matches the XLA bicubic path."""
    import sys
    sys.path.insert(0, "tests")
    from helpers_synth import write_blender_scene
    from test_experiment import _mini_cfg
    from nvsr_tpu.experiment import Experiment

    write_blender_scene(str(tmp_path / "synt"), "lego", size=32)
    cfg = _mini_cfg(tmp_path, logdir="logs/bicubic",
                    train_groups={"4,8,8": ["lego"]}, sr=False,
                    what=("LR_planes", "decoder"), iters=2)
    cfg.models.coarse["plane_interp"] = "bicubic"
    for mode in ("train", "validation"):
        cfg.nerf[mode]["num_coarse"] = 8
        cfg.nerf[mode]["num_fine"] = 8
    exp = Experiment(cfg, root_path=str(tmp_path))
    exp.planes_buffer.draw_scenes()
    exp.image_sampler.update_active(exp.planes_buffer.cur_scenes)
    for i in range(2):
        exp.train_iteration(i)
    scene = exp.training_scenes[0]
    img_idx = exp.i_val[list(exp.i_val.keys())[0]][0]

    out_plain, _ = exp.render_eval_image(scene, img_idx)
    cfg.nerf.validation["tiled_gather"] = True
    exp._eval_pf_cache = {}
    assert exp.eval_tile_cfg(scene) is not None
    out_tiled, _ = exp.render_eval_image(scene, img_idx)

    a = np.asarray(out_plain.fine.rgb)
    b = np.asarray(out_tiled.fine.rgb)
    np.testing.assert_allclose(b, a, atol=5e-2, rtol=0)
    assert np.abs(b - a).mean() < 5e-3


def test_render_image_tiled_pad_non_multiple(rng):
    """render_image(tile=8) at an image size that is NOT a tile multiple
    (the LLFF case, e.g. 378x504) edge-pads to the tile grid, renders
    through the Pallas tile sampler, crops on the way out, and matches
    the untiled XLA path (VERDICT r2 #2 done-criteria)."""
    import jax
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          init_decoder_params)
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import (RenderConfig, make_triplane_point_fn,
                                 render_image)

    cfg = TriplaneConfig(proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         skip_connect_every=3, compute_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.1 * rng.standard_normal(
            (3, cfg.num_plane_channels, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.1 * rng.standard_normal(
            (cfg.viewdir_channels, 16, 16)).astype(np.float32))
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)
    H, W = 20, 28                       # neither divisible by 8
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.5
    ro, rd = get_ray_bundle(H, W, 0.5 * W / np.tan(0.3), jnp.asarray(c2w))
    rcfg = RenderConfig(num_coarse=8, num_fine=8, perturb=False,
                        radiance_field_noise_std=0.0, ray_block=512)
    tile_cfg = TileSamplerConfig(tile_rays=64)

    pf_c = make_triplane_point_fn(params, cfg, planes, plane_view, box,
                                  tile_cfg=tile_cfg)
    pf_f = make_triplane_point_fn(params, cfg, planes, plane_view, box,
                                  tile_cfg=tile_cfg)
    out_t = render_image(pf_c, pf_f, ro, rd, jax.random.PRNGKey(1), rcfg,
                         near=2.0, far=6.0, tile=8)
    pf_c2 = make_triplane_point_fn(params, cfg, planes, plane_view, box)
    pf_f2 = make_triplane_point_fn(params, cfg, planes, plane_view, box)
    out_x = render_image(pf_c2, pf_f2, ro, rd, jax.random.PRNGKey(1), rcfg,
                         near=2.0, far=6.0)
    a = np.asarray(out_x.fine.rgb)
    b = np.asarray(out_t.fine.rgb)
    assert a.shape == b.shape == (H, W, 3)
    assert float(out_t.aux["overflow_frac"]) == 0.0
    np.testing.assert_allclose(b, a, atol=5e-2, rtol=0)
    assert np.abs(b - a).mean() < 5e-3


def test_fused_decoder_matches_decode_projections(rng):
    """ops/pallas/fused_decoder == decode_projections (bf16 compute) on
    raw tap pairs, including the y-lerp."""
    import jax
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          decode_projections,
                                          init_decoder_params)
    from nvsr_tpu.ops.pallas import fused_decoder

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    assert fused_decoder.supports(cfg)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    N, C = 256, 48
    H = fused_decoder.HALF
    tops = rng.standard_normal((3, N, H)).astype(np.float32) * 0.3
    bots = rng.standard_normal((3, N, H)).astype(np.float32) * 0.3
    tops[..., C:] = 0.0
    bots[..., C:] = 0.0
    ty = rng.uniform(size=(3, N, 1)).astype(np.float32)
    view = rng.standard_normal((N, C)).astype(np.float32) * 0.3

    rows = jnp.concatenate(
        [jnp.asarray(tops), jnp.asarray(bots)], axis=-1
    ).reshape(3 * N, 2 * H).astype(jnp.bfloat16)
    wpack, bpack, plan_info = fused_decoder.pack_decoder_weights(
        params, cfg, 0)
    view64 = jnp.pad(jnp.asarray(view), ((0, 0), (0, H - C)))
    out = fused_decoder.fused_decode(
        rows, jnp.asarray(ty).reshape(-1, 1), view64, wpack, bpack,
        cfg=cfg, plan_info=plan_info, B=N, interpret=True)

    # reference: y-lerp the bf16 pairs, then the XLA decoder
    t = np.asarray(jnp.asarray(tops, jnp.bfloat16), np.float32)
    b = np.asarray(jnp.asarray(bots, jnp.bfloat16), np.float32)
    feats = t * (1 - ty) + b * ty
    ref = decode_projections(params, cfg,
                             jnp.asarray(feats[..., :C]),
                             jnp.asarray(view))
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(ref),
                               atol=2e-2, rtol=0)


def test_adaptive_slab_no_overflow_on_flagship_geometry():
    """The slab chosen by the tiled path for (S, plane_res) must keep
    every chunk inside the region capacity on flagship-like geometry —
    the 16+16 configuration once silently clamped 67% of fine-pass
    chunks (PERF.md round 2)."""
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import make_ray_bundle, tighten_bundle, \
        tile_ray_maps
    from nvsr_tpu.models.triplane import make_rot_mats, project_to_planes
    from nvsr_tpu.ops.pallas.tile_sampler import (TileSamplerConfig,
                                                  YALIGN, choose_slab)

    H = W = 64
    cfgT = TileSamplerConfig()
    eye = np.array([3.8, 0.5, 0.7], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1] = right, np.cross(right, fwd)
    c2w[:3, 2], c2w[:3, 3] = -fwd, eye
    ro, rd = get_ray_bundle(H, W, 0.5 * 800 / np.tan(0.3),
                            jnp.asarray(c2w))
    ro = np.asarray(tile_ray_maps(ro)); rd = np.asarray(tile_ray_maps(rd))
    rays = make_ray_bundle(jnp.asarray(ro), jnp.asarray(rd), 2.0, 6.0,
                           use_viewdirs=True)
    rays = tighten_bundle(rays, jnp.asarray(
        [[-1.4, -1.1, -1.1], [1.5, 1.3, 1.2]], jnp.float32))
    near, far = np.asarray(rays.near), np.asarray(rays.far)
    box = np.stack([[-4, -4, -4], [4, 4, 4]]).astype(np.float32)
    rot = make_rot_mats(3)

    def overflow_frac(S, res, slab):
        R = H * W
        t = np.linspace(0, 1, S)[None]
        z = near + (far - near) * t
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        xyz = 2 * (pts.reshape(-1, 3) - box[0]) / (box[1] - box[0]) - 1
        g = np.asarray(project_to_planes(
            jnp.asarray(xyz.astype(np.float32)), rot))
        px = np.clip((g[..., 0] + 1) * 0.5 * (res - 1), 0, res - 1)
        py = np.clip((g[..., 1] + 1) * 0.5 * (res - 1), 0, res - 1)

        def ch(v):
            v = v.reshape(3, R // cfgT.tile_rays, cfgT.tile_rays,
                          S // slab, slab)
            return np.moveaxis(v, 3, 2).reshape(
                3, -1, cfgT.tile_rays * slab)
        x0, y0 = np.floor(ch(px)), np.floor(ch(py))
        oy = (y0.min(-1) // YALIGN) * YALIGN
        return float(((y0.max(-1) - oy > cfgT.th - 1)
                      | (x0.max(-1) + 1 - x0.min(-1) > cfgT.tw - 1)
                      ).mean())

    for S, res in ((32, 800), (16, 200), (64, 800), (32, 200)):
        slab = choose_slab(S, res, cfgT)
        assert overflow_frac(S, res, slab) == 0.0, (S, res, slab)
    # and the old failure mode really does overflow
    assert overflow_frac(32, 800, 4) > 0.3


def _flagship_overflow(tile, S, slab, res, th, tw):
    """Measured chunk overflow fraction on flagship-class geometry for
    a given (tile, slab, plane_res) and region dims (th, tw)."""
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import make_ray_bundle, tighten_bundle, \
        tile_ray_maps
    from nvsr_tpu.models.triplane import make_rot_mats, project_to_planes
    from nvsr_tpu.ops.pallas.tile_sampler import YALIGN

    H = W = 64
    eye = np.array([3.8, 0.5, 0.7], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1] = right, np.cross(right, fwd)
    c2w[:3, 2], c2w[:3, 3] = -fwd, eye
    ro0, rd0 = get_ray_bundle(H, W, 0.5 * 800 / np.tan(0.3),
                              jnp.asarray(c2w))
    box = np.stack([[-4, -4, -4], [4, 4, 4]]).astype(np.float32)
    rot = make_rot_mats(3)
    tr = tile[0] * tile[1]
    ro = np.asarray(tile_ray_maps(ro0, tile))
    rd = np.asarray(tile_ray_maps(rd0, tile))
    rays = make_ray_bundle(jnp.asarray(ro), jnp.asarray(rd), 2.0, 6.0,
                           use_viewdirs=True)
    rays = tighten_bundle(rays, jnp.asarray(
        [[-1.4, -1.1, -1.1], [1.5, 1.3, 1.2]], jnp.float32))
    near, far = np.asarray(rays.near), np.asarray(rays.far)
    R = H * W
    t = np.linspace(0, 1, S)[None]
    z = near + (far - near) * t
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    xyz = 2 * (pts.reshape(-1, 3) - box[0]) / (box[1] - box[0]) - 1
    g = np.asarray(project_to_planes(jnp.asarray(xyz.astype(np.float32)),
                                     rot))
    px = np.clip((g[..., 0] + 1) * 0.5 * (res - 1), 0, res - 1)
    py = np.clip((g[..., 1] + 1) * 0.5 * (res - 1), 0, res - 1)

    def ch(v):
        v = v.reshape(3, R // tr, tr, S // slab, slab)
        return np.moveaxis(v, 3, 2).reshape(3, -1, tr * slab)

    x0, y0 = np.floor(ch(px)), np.floor(ch(py))
    oy = (y0.min(-1) // YALIGN) * YALIGN
    return float(((y0.max(-1) - oy > th - 1)
                  | (x0.max(-1) + 1 - x0.min(-1) > tw - 1)).mean())


def test_adaptive_region_dims_no_overflow():
    """choose_region_dims shrinks (th, tw) per pass — the gather
    matmul's contraction dim — and must keep zero overflow on every
    production (S, plane_res) combination at the default 16x16 tile
    (flagship 16+16+occ, the 32+32 and 64+64 matrix configs)."""
    from nvsr_tpu.ops.pallas.tile_sampler import (TileSamplerConfig,
                                                  choose_region_dims,
                                                  choose_slab)
    cfgT = TileSamplerConfig(tile_rays=256)
    for S, res in ((32, 800), (16, 200),     # 16+16: fine, coarse
                   (64, 800), (32, 200),     # 32+32
                   (128, 800), (64, 200)):   # 64+64
        slab = choose_slab(S, res, cfgT)
        while cfgT.tile_rays * slab > 512 and slab > 1 \
                and S % (slab // 2) == 0:
            slab //= 2
        th, tw = choose_region_dims(S, res, slab, cfgT.tile_rays, cfgT)
        ovf = _flagship_overflow((16, 16), S, slab, res, th, tw)
        assert ovf == 0.0, (S, res, slab, th, tw, ovf)
    # the shrink actually engages on the flagship passes
    assert choose_region_dims(16, 200, 2, 256, cfgT) == (16, 10)
    # fine tw 16 covers the union-tightened bench-eye footprint
    # (14 x-cells incl. tap; PERF.md round-3 silhouette study)
    assert choose_region_dims(32, 800, 2, 256, cfgT) == (24, 16)


def test_megakernel_full_forward_matches(rng):
    """apply_triplane_rays with tile_cfg + flagship decoder dims routes
    through the gather+decode megakernel (tiled_render_chunked) and
    matches the XLA path."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays,
                                          init_decoder_params)
    from nvsr_tpu.ops.pallas import fused_decoder

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    assert fused_decoder.supports(cfg)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.3 * rng.standard_normal((3, 48, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.3 * rng.standard_normal((48, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    tile_cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16,
                                 group=2)

    R, S = 16, 8
    origin = np.array([0.0, 0.0, 1.8])
    dirs = np.stack(np.meshgrid(np.linspace(-.05, .05, 4),
                                np.linspace(-.05, .05, 4)),
                    -1).reshape(-1, 2)
    d = np.concatenate([dirs, -np.ones((R, 1))], -1).astype(np.float32)
    z = np.linspace(0.8, 3.2, S).astype(np.float32)
    pts = jnp.asarray(origin + d[:, None, :] * z[None, :, None])
    viewdirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    out_ref = apply_triplane_rays(params, cfg, planes, plane_view, box,
                                  pts, viewdirs)
    out_mega = apply_triplane_rays(params, cfg, planes, plane_view, box,
                                   pts, viewdirs, tile_cfg=tile_cfg)
    np.testing.assert_allclose(np.asarray(out_mega), np.asarray(out_ref),
                               atol=6e-2, rtol=0)
    assert np.abs(np.asarray(out_mega) - np.asarray(out_ref)).mean() < 6e-3


def test_ray_entry_megakernel_matches(rng):
    """apply_triplane_rays_from_z (component-wise pre-pass +
    plane-major megakernel inputs, the production eval entry) matches
    the XLA gather path and reports zero overflow on coherent rays."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays,
                                          apply_triplane_rays_from_z,
                                          init_decoder_params)
    from nvsr_tpu.ops.pallas import fused_decoder

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    assert fused_decoder.supports(cfg)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.3 * rng.standard_normal((3, 48, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.3 * rng.standard_normal((48, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    tile_cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16,
                                 group=2, adaptive_region=False)

    R, S = 16, 8
    origin = np.array([0.0, 0.0, 1.8], np.float32)
    dirs = np.stack(np.meshgrid(np.linspace(-.05, .05, 4),
                                np.linspace(-.05, .05, 4)),
                    -1).reshape(-1, 2)
    d = np.concatenate([dirs, -np.ones((R, 1))], -1).astype(np.float32)
    z = np.broadcast_to(np.linspace(0.8, 3.2, S,
                                    dtype=np.float32), (R, S))
    origins = jnp.asarray(np.broadcast_to(origin, (R, 3)))
    directions = jnp.asarray(d)
    viewdirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    pts = jnp.asarray(origin + d[:, None, :] * z[..., None])

    out_ref = apply_triplane_rays(params, cfg, planes, plane_view, box,
                                  pts, viewdirs)
    out_ray, aux = apply_triplane_rays_from_z(
        params, cfg, planes, plane_view, box, origins, directions,
        viewdirs, jnp.asarray(z), tile_cfg=tile_cfg)
    assert float(aux["overflow_frac"]) == 0.0
    np.testing.assert_allclose(np.asarray(out_ray), np.asarray(out_ref),
                               atol=6e-2, rtol=0)
    assert np.abs(np.asarray(out_ray) - np.asarray(out_ref)).mean() < 6e-3


def test_viewtile_matches_per_point_stream(rng, monkeypatch):
    """The viewtile megakernel form (per-RAY [R, 128] view rows,
    broadcast to points in VMEM) is numerically identical to the
    per-point [N, 64] view stream — same values enter decode_body, only
    the transport differs (round 4, PERF.md batch 8)."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays_from_z,
                                          init_decoder_params)
    from nvsr_tpu.ops.pallas.tile_sampler import viewtile_ok

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.3 * rng.standard_normal((3, 48, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.3 * rng.standard_normal((48, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    tile_cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16,
                                 group=2, adaptive_region=False)
    R, S = 16, 8
    assert viewtile_ok(S, tile_cfg)     # ns=2, 8 % 2 == 0 -> vt=4
    origin = np.array([0.0, 0.0, 1.8], np.float32)
    dirs = np.stack(np.meshgrid(np.linspace(-.05, .05, 4),
                                np.linspace(-.05, .05, 4)),
                    -1).reshape(-1, 2)
    d = np.concatenate([dirs, -np.ones((R, 1))], -1).astype(np.float32)
    z = np.broadcast_to(np.linspace(0.8, 3.2, S,
                                    dtype=np.float32), (R, S))
    args = (params, cfg, planes, plane_view, box,
            jnp.asarray(np.broadcast_to(origin, (R, 3))), jnp.asarray(d),
            jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
            jnp.asarray(z))

    out_vt, aux_vt = apply_triplane_rays_from_z(*args, tile_cfg=tile_cfg)
    monkeypatch.setenv("NVSR_MEGA_VIEWTILE", "0")
    out_pp, aux_pp = apply_triplane_rays_from_z(*args, tile_cfg=tile_cfg)
    assert float(aux_vt["overflow_frac"]) == 0.0
    np.testing.assert_allclose(np.asarray(out_vt), np.asarray(out_pp),
                               atol=1e-6, rtol=0)


@pytest.mark.parametrize("tr,sl,S,label", [
    (16, 4, 8, "vt4"),    # ns=2  -> 4 whole tiles per grid step
    (16, 2, 32, "k2"),    # ns=16 -> out block revisited k=2 steps
    (8, 4, 64, "cells2"),  # S*4=256 -> one 128-lane cell per step
])
def test_packray_matches_per_point_stream(rng, monkeypatch, tr, sl, S,
                                          label):
    """The packray megakernel form (ray-major [R, S*4] output written
    by static 4-lane rolls, out block revisited/accumulated across the
    k grid steps of a tile) is numerically identical to the chunk-major
    packout + from_chunks path — same decode, only the output transport
    differs (round 4, PERF.md batch 10)."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays_from_z,
                                          init_decoder_params)
    from nvsr_tpu.ops.pallas.tile_sampler import packray_ok

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.3 * rng.standard_normal((3, 48, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.3 * rng.standard_normal((48, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    tile_cfg = TileSamplerConfig(tile_rays=tr, slab=sl, th=32, tw=16,
                                 group=2, adaptive_region=False)
    assert packray_ok(S, tile_cfg), (tr, sl, S)
    R = tr * 4                           # 4 image tiles
    origin = np.array([0.0, 0.0, 1.8], np.float32)
    dirs = np.stack(np.meshgrid(np.linspace(-.05, .05, 8),
                                np.linspace(-.05, .05, R // 8)),
                    -1).reshape(-1, 2)
    d = np.concatenate([dirs, -np.ones((R, 1))], -1).astype(np.float32)
    z = np.broadcast_to(np.linspace(0.8, 3.2, S,
                                    dtype=np.float32), (R, S))
    args = (params, cfg, planes, plane_view, box,
            jnp.asarray(np.broadcast_to(origin, (R, 3))), jnp.asarray(d),
            jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
            jnp.asarray(z))

    out_pr, aux_pr = apply_triplane_rays_from_z(*args, tile_cfg=tile_cfg)
    monkeypatch.setenv("NVSR_MEGA_PACKRAY", "0")
    out_pp, aux_pp = apply_triplane_rays_from_z(*args, tile_cfg=tile_cfg)
    assert float(aux_pr["overflow_frac"]) == 0.0
    np.testing.assert_allclose(np.asarray(out_pr), np.asarray(out_pp),
                               atol=1e-6, rtol=0)


def test_packray_viewtile_fuzz(rng, monkeypatch):
    """Randomized (tile_rays, slab, S, ntiles, group-env) sweep: for
    every eligible combination the viewtile/packray transports must
    match the per-point stream exactly; ineligible combinations must
    fall back cleanly (gating predicates). Guards the vt/k/padding
    alignment math across regimes the fixed-case tests don't hit —
    including phantom-tile padding (ntiles not a multiple of vt)."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays_from_z,
                                          init_decoder_params)

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3, proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.3 * rng.standard_normal((3, 48, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.3 * rng.standard_normal((48, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    cases = [  # (tile_rays, slab, S, ntiles, mega_group)
        (16, 1, 16, 3, "8"),    # ns=16, k=2; 3 tiles pad to group mult
        (32, 2, 8, 5, "8"),     # ns=4 -> vt=2; 5 tiles pad to vt mult
        (8, 4, 16, 2, "16"),    # ns=4 -> vt=4 at group 16
        (16, 2, 16, 3, "8"),    # ns=8 = group, k=1, odd tile count
    ]
    origin = np.array([0.0, 0.0, 1.8], np.float32)
    for tr, sl, S, nt, grp in cases:
        tile_cfg = TileSamplerConfig(tile_rays=tr, slab=sl, th=32,
                                     tw=16, group=2,
                                     adaptive_region=False)
        R = tr * nt
        dirs = rng.uniform(-.06, .06, size=(R, 2))
        d = np.concatenate([dirs, -np.ones((R, 1))],
                           -1).astype(np.float32)
        z = np.broadcast_to(
            np.linspace(0.8, 3.2, S, dtype=np.float32), (R, S))
        args = (params, cfg, planes, plane_view, box,
                jnp.asarray(np.broadcast_to(origin, (R, 3))),
                jnp.asarray(d),
                jnp.asarray(d / np.linalg.norm(d, axis=-1,
                                               keepdims=True)),
                jnp.asarray(z))
        monkeypatch.setenv("NVSR_MEGA_GROUP", grp)
        out_fast, _ = apply_triplane_rays_from_z(*args,
                                                 tile_cfg=tile_cfg)
        monkeypatch.setenv("NVSR_MEGA_VIEWTILE", "0")
        monkeypatch.setenv("NVSR_MEGA_PACKRAY", "0")
        out_pp, _ = apply_triplane_rays_from_z(*args, tile_cfg=tile_cfg)
        monkeypatch.delenv("NVSR_MEGA_VIEWTILE")
        monkeypatch.delenv("NVSR_MEGA_PACKRAY")
        monkeypatch.delenv("NVSR_MEGA_GROUP")
        np.testing.assert_allclose(
            np.asarray(out_fast), np.asarray(out_pp), atol=1e-6, rtol=0,
            err_msg=f"tr={tr} sl={sl} S={S} nt={nt} group={grp}")


def test_hybrid_overflow_repair_exact(rng):
    """repair_frac > 0: clamped chunks are re-evaluated through the
    exact XLA point path and scattered over the kernel output — with a
    full budget the render matches the XLA path even when (nearly)
    every chunk exceeds the region envelope, and the returned overflow
    is the RESIDUAL (0 when everything was repaired). A starved budget
    leaves a nonzero residual (the ladder's escalation signal)."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays,
                                          apply_triplane_rays_from_z,
                                          init_decoder_params)
    from nvsr_tpu.ops.pallas import fused_decoder

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    assert fused_decoder.supports(cfg)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.3 * rng.standard_normal((3, 48, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.3 * rng.standard_normal((48, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    # tiny regions: most chunks clamp; full repair budget fixes all
    tile_cfg = TileSamplerConfig(tile_rays=16, slab=4, th=8, tw=6,
                                 group=2, adaptive_region=False,
                                 repair_frac=1.0)

    R, S = 16, 8
    origin = np.array([0.0, 0.0, 1.8], np.float32)
    dirs = np.stack(np.meshgrid(np.linspace(-.4, .4, 4),
                                np.linspace(-.4, .4, 4)),
                    -1).reshape(-1, 2)
    d = np.concatenate([dirs, -np.ones((R, 1))], -1).astype(np.float32)
    z = np.broadcast_to(np.linspace(0.8, 3.2, S,
                                    dtype=np.float32), (R, S))
    origins = jnp.asarray(np.broadcast_to(origin, (R, 3)))
    directions = jnp.asarray(d)
    viewdirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    pts = jnp.asarray(origin + d[:, None, :] * z[..., None])

    out_ref = apply_triplane_rays(params, cfg, planes, plane_view, box,
                                  pts, viewdirs)
    # sanity: without repair these wide rays do clamp
    import dataclasses
    out_raw, aux_raw = apply_triplane_rays_from_z(
        params, cfg, planes, plane_view, box, origins, directions,
        viewdirs, jnp.asarray(z),
        tile_cfg=dataclasses.replace(tile_cfg, repair_frac=0.0))
    assert float(aux_raw["overflow_frac"]) > 0.2
    raw_max = np.abs(np.asarray(out_raw) - np.asarray(out_ref)).max()
    assert raw_max > 1e-3

    # a starved budget (1 chunk of NC=2) leaves a residual — and
    # confirms BOTH chunks overflow on this geometry
    out_res, aux_res = apply_triplane_rays_from_z(
        params, cfg, planes, plane_view, box, origins, directions,
        viewdirs, jnp.asarray(z),
        tile_cfg=dataclasses.replace(tile_cfg, repair_frac=1e-6))
    np.testing.assert_allclose(float(aux_res["overflow_frac"]), 0.5)

    # full budget: every chunk re-evaluated through the SAME XLA point
    # path the reference render uses — agreement down to bf16 rounding
    # (the two calls batch points differently), far beyond the kernel's
    # clamp error, and zero residual
    out_rep, aux = apply_triplane_rays_from_z(
        params, cfg, planes, plane_view, box, origins, directions,
        viewdirs, jnp.asarray(z), tile_cfg=tile_cfg)
    assert float(aux["overflow_frac"]) == 0.0
    rep_max = np.abs(np.asarray(out_rep) - np.asarray(out_ref)).max()
    assert rep_max < 5e-4, (rep_max, raw_max)
    assert rep_max < raw_max / 4


def test_megakernel_v2_matches_v1(rng, monkeypatch):
    """The descriptor-transposed megakernel (v2, default) agrees with
    the v1 [N,1]-descriptor kernel on both interps: same taps and
    weights, only the bf16 rounding site differs (v1 rounds gathered
    rows, v2 rounds the ty-scaled weights)."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays_from_z,
                                          init_decoder_params)

    for interp in ("bilinear", "bicubic"):
        cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                             dec_density_layers=4, dec_rgb_layers=4,
                             skip_connect_every=3, proj_combination="avg",
                             viewdir_proj_combination="concat_pos",
                             plane_interp=interp, compute_dtype="bfloat16")
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        planes = jnp.asarray(
            0.3 * rng.standard_normal((3, 48, 64, 64)).astype(np.float32))
        plane_view = jnp.asarray(
            0.3 * rng.standard_normal((48, 16, 16)).astype(np.float32))
        box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                        [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
        tile_cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=18,
                                     group=2, adaptive_region=False)
        R, S = 16, 8
        origin = np.array([0.0, 0.0, 1.8], np.float32)
        dirs = np.stack(np.meshgrid(np.linspace(-.05, .05, 4),
                                    np.linspace(-.05, .05, 4)),
                        -1).reshape(-1, 2)
        d = np.concatenate([dirs, -np.ones((R, 1))], -1).astype(np.float32)
        z = np.broadcast_to(np.linspace(0.8, 3.2, S, dtype=np.float32),
                            (R, S))
        args = (params, cfg, planes, plane_view, box,
                jnp.asarray(np.broadcast_to(origin, (R, 3))),
                jnp.asarray(d),
                jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
                jnp.asarray(z))

        monkeypatch.delenv("NVSR_MEGA_V1", raising=False)
        out_v2, aux2 = apply_triplane_rays_from_z(*args, tile_cfg=tile_cfg)
        monkeypatch.setenv("NVSR_MEGA_V1", "1")
        out_v1, aux1 = apply_triplane_rays_from_z(*args, tile_cfg=tile_cfg)
        monkeypatch.delenv("NVSR_MEGA_V1", raising=False)
        assert float(aux1["overflow_frac"]) == float(aux2["overflow_frac"])
        np.testing.assert_allclose(np.asarray(out_v2), np.asarray(out_v1),
                                   atol=2e-2, rtol=0)
        mean_err = np.abs(np.asarray(out_v2) - np.asarray(out_v1)).mean()
        assert mean_err < 2e-3, (interp, mean_err)


def test_megakernel_wbuild_mxu_matches_vpu(rng):
    """The MXU-assisted hat build (NVSR_MEGA_WBUILD=mxu: one rank-2
    dot_general producing [d+1 | 1-d] for all 3 planes, then
    relu(min(.))) agrees with the VPU build (max(0, 1-|d|)) up to f32
    addition order before the shared bf16 cast — ULP-level, not
    bit-exact (PERF.md R5 batch 5)."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          apply_triplane_rays_from_z,
                                          init_decoder_params)

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3, proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        0.3 * rng.standard_normal((3, 48, 64, 64)).astype(np.float32))
    plane_view = jnp.asarray(
        0.3 * rng.standard_normal((48, 16, 16)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    # B = tile_rays * slab must be a 128-multiple or the call falls
    # back to the v1 kernel (which has no wbuild path) and the A/B is
    # vacuous — the nonzero-diff guard below pins this
    tile_cfg = TileSamplerConfig(tile_rays=32, slab=4, th=32, tw=18,
                                 group=8, adaptive_region=False)
    R, S = 32, 8
    origin = np.array([0.0, 0.0, 1.8], np.float32)
    dirs = np.stack(np.meshgrid(np.linspace(-.07, .07, 8),
                                np.linspace(-.05, .05, 4)),
                    -1).reshape(-1, 2)
    d = np.concatenate([dirs, -np.ones((R, 1))], -1).astype(np.float32)
    z = np.broadcast_to(np.linspace(0.8, 3.2, S, dtype=np.float32),
                        (R, S))
    args = (params, cfg, planes, plane_view, box,
            jnp.asarray(np.broadcast_to(origin, (R, 3))),
            jnp.asarray(d),
            jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
            jnp.asarray(z))

    # wbuild is a TileSamplerConfig field (a REAL jit static, not an
    # env knob — the env-only in-process A/B is vacuous under an outer
    # cached trace, the CLAUDE.md round-4 footgun). Non-vacuity is
    # pinned below on the direct kernel call instead of output deltas:
    # the two builds agree to the last bit on this scene (diffs can
    # only appear at bf16 rounding midpoints of the f32 hat weights).
    out_vpu, aux_v = apply_triplane_rays_from_z(*args, tile_cfg=tile_cfg)
    out_mxu, aux_m = apply_triplane_rays_from_z(
        *args, tile_cfg=dataclasses.replace(tile_cfg, wbuild="mxu"))
    assert float(aux_v["overflow_frac"]) == float(aux_m["overflow_frac"])
    np.testing.assert_allclose(np.asarray(out_mxu), np.asarray(out_vpu),
                               atol=1e-4, rtol=0)


def test_megakernel_wbuild_direct_call(rng):
    """Direct _mega_call_v2 A/B of the two hat-build lowerings: exact
    output equality on random descriptors, and DIFFERENT lowered
    programs (proves the static actually switched kernels — guards the
    vacuous-A/B footgun)."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          init_decoder_params)
    from nvsr_tpu.ops.pallas import fused_decoder as fd
    from nvsr_tpu.ops.pallas import tile_sampler as ts

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3, proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    wpack, bpack, plan_info = fd.pack_decoder_weights(params, cfg)
    B, group, th, tw = 128, 8, 24, 14
    nsteps, T = 2, 24 * 14
    NC, Wp = nsteps * 8, 20
    table = jnp.asarray(rng.standard_normal((2880, Wp * 128))
                        .astype(np.float32)).astype(jnp.bfloat16)
    # +3 pad rows: _mega_call_v2 derives nsteps = org.shape[0] - 3
    # (the four slots=4 org views)
    org = np.zeros((nsteps + 3, group, 3, 2), np.int32)
    org[..., 0] = rng.integers(0, 8, size=(nsteps + 3, group, 3)) * 8
    org[..., 1] = rng.integers(0, Wp - tw, size=(nsteps + 3, group, 3))
    fidx = (rng.random((3 * NC, B)) * (T - 2)).astype(np.float32)
    ty = rng.random((3 * NC, B)).astype(np.float32)
    view = jnp.asarray(rng.standard_normal((NC * B, 64))
                       .astype(np.float32)).astype(jnp.bfloat16)
    sub = jnp.zeros((nsteps, group, 3, 2), jnp.int32)
    args = (table, jnp.asarray(org), sub, jnp.asarray(fidx),
            jnp.asarray(ty), view, wpack, bpack)
    kw = dict(th=th, tw=tw, group=group, B=B, cfg=cfg,
              plan_info=plan_info, interp="linear", interpret=True,
              single=True, decm=8, packout=True)
    o_vpu = ts._mega_call_v2(*args, **kw, wbuild="vpu")
    o_mxu = ts._mega_call_v2(*args, **kw, wbuild="mxu")
    np.testing.assert_array_equal(np.asarray(o_vpu), np.asarray(o_mxu))
    # slots=4 (3-step DMA lead) is pure pipelining — bit-exact
    o_s4 = ts._mega_call_v2(*args, **kw, wbuild="vpu", slots=4)
    np.testing.assert_array_equal(np.asarray(o_vpu), np.asarray(o_s4))
    lo_v = jax.jit(ts._mega_call_v2.__wrapped__,
                   static_argnames=tuple(kw) + ("wbuild",)).lower(
        *args, **kw, wbuild="vpu").as_text()
    lo_m = jax.jit(ts._mega_call_v2.__wrapped__,
                   static_argnames=tuple(kw) + ("wbuild",)).lower(
        *args, **kw, wbuild="mxu").as_text()
    assert lo_v != lo_m, "wbuild static did not change the lowering"


def test_rect_tiles_no_overflow_on_flagship_geometry():
    """The bench's 8x16-ray tiles (tile_rays=128) keep zero overflow on
    both passes at both orientations (BENCH_TILE default)."""
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import make_ray_bundle, tighten_bundle, \
        tile_ray_maps
    from nvsr_tpu.models.triplane import make_rot_mats, project_to_planes
    from nvsr_tpu.ops.pallas.tile_sampler import TileSamplerConfig, YALIGN

    H = W = 64
    cfgT = TileSamplerConfig(tile_rays=128)
    eye = np.array([3.8, 0.5, 0.7], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1] = right, np.cross(right, fwd)
    c2w[:3, 2], c2w[:3, 3] = -fwd, eye
    ro0, rd0 = get_ray_bundle(H, W, 0.5 * 800 / np.tan(0.3),
                              jnp.asarray(c2w))
    box = np.stack([[-4, -4, -4], [4, 4, 4]]).astype(np.float32)
    rot = make_rot_mats(3)

    for tile in ((8, 16), (16, 8), (16, 16)):
        tr_cfg = tile[0] * tile[1]
        ro = np.asarray(tile_ray_maps(ro0, tile))
        rd = np.asarray(tile_ray_maps(rd0, tile))
        rays = make_ray_bundle(jnp.asarray(ro), jnp.asarray(rd), 2.0,
                               6.0, use_viewdirs=True)
        rays = tighten_bundle(rays, jnp.asarray(
            [[-1.4, -1.1, -1.1], [1.5, 1.3, 1.2]], jnp.float32))
        near, far = np.asarray(rays.near), np.asarray(rays.far)
        # slabs as the production path picks them: resolution-adapted,
        # then shortened so chunks stay at <= 512 points
        cases = [(16, min(4, max(1, 512 // tr_cfg)), 200),
                 (32, min(2, max(1, 512 // tr_cfg)), 800)]
        for S, slab, res in cases:
            t = np.linspace(0, 1, S)[None]
            z = near + (far - near) * t
            pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
            xyz = 2 * (pts.reshape(-1, 3) - box[0]) / (box[1] - box[0]) - 1
            g = np.asarray(project_to_planes(
                jnp.asarray(xyz.astype(np.float32)), rot))
            px = np.clip((g[..., 0] + 1) * 0.5 * (res - 1), 0, res - 1)
            py = np.clip((g[..., 1] + 1) * 0.5 * (res - 1), 0, res - 1)
            tr = tr_cfg
            R = H * W

            def ch(v):
                v = v.reshape(3, R // tr, tr, S // slab, slab)
                return np.moveaxis(v, 3, 2).reshape(3, -1, tr * slab)
            x0, y0 = np.floor(ch(px)), np.floor(ch(py))
            oy = (y0.min(-1) // YALIGN) * YALIGN
            ovf = ((y0.max(-1) - oy > cfgT.th - 1)
                   | (x0.max(-1) + 1 - x0.min(-1) > cfgT.tw - 1))
            assert ovf.mean() == 0.0, (tile, S, res)


# ---------------------------------------------------------------------------
# Trainable tiled sampler (custom VJP)
# ---------------------------------------------------------------------------

def _chunked_grids_and_cfg(rng, P=3, C=8, H=64, W=64):
    cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16, group=2)
    R, S = 32, 8
    planes = jnp.asarray(rng.standard_normal((P, C, H, W)).astype(np.float32))
    grids = _clustered_grids(rng, P, R, S, cfg)
    from nvsr_tpu.ops.pallas.tile_sampler import to_chunks
    g_c = to_chunks(grids, R // cfg.tile_rays, cfg.tile_rays,
                    S // cfg.slab, cfg.slab)
    return planes, grids, g_c, cfg, R, S


def test_trainable_forward_matches_prechunked(rng):
    from nvsr_tpu.ops.pallas.tile_sampler import (
        tiled_plane_sample_prechunked, tiled_plane_sample_trainable)
    planes, _, g_c, cfg, _, _ = _chunked_grids_and_cfg(rng)
    out, ov = tiled_plane_sample_trainable(planes, g_c, cfg, True, True)
    ref, ov_ref = tiled_plane_sample_prechunked(planes, g_c, cfg,
                                                interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert float(ov) == float(ov_ref) == 0.0


def test_trainable_grad_matches_xla_oracle(rng):
    """d loss/d planes of the tiled sampler == the differentiable XLA
    bilinear path (reference semantics: grid_sample autograd, reference
    models.py:303-309 reached by train_nerf.py:903), up to the bf16
    table/backward rounding the forward also carries."""
    from nvsr_tpu.ops.pallas.tile_sampler import tiled_plane_sample_trainable
    planes, grids, g_c, cfg, R, S = _chunked_grids_and_cfg(rng)
    P, C, H, W = planes.shape
    # random cotangent, fixed: loss = <cot, out>
    cot = jnp.asarray(rng.standard_normal(
        (P, g_c.shape[1] * g_c.shape[2], C)).astype(np.float32))

    def loss_tiled(p):
        out, _ = tiled_plane_sample_trainable(p, g_c, cfg, True, True)
        return jnp.vdot(cot, out)

    from nvsr_tpu.ops.pallas.tile_sampler import to_chunks

    def loss_ref(p):
        ref = multi_plane_sample(p, grids.reshape(P, R * S, 2),
                                 mode="bilinear", align_corners=True)
        ref_c = to_chunks(ref.reshape(P, R, S, C), R // cfg.tile_rays,
                          cfg.tile_rays, S // cfg.slab, cfg.slab)
        return jnp.vdot(cot, ref_c.reshape(P, -1, C))

    g_tiled = jax.grad(loss_tiled)(planes)
    g_ref = jax.grad(loss_ref)(planes)
    assert np.all(np.isfinite(np.asarray(g_tiled)))
    err = np.abs(np.asarray(g_tiled) - np.asarray(g_ref))
    scale = np.abs(np.asarray(g_ref)).mean() + 1e-6
    assert err.max() < 0.35 * (np.abs(np.asarray(g_ref)).max() + 1e-6)
    assert err.mean() < 2e-2 * scale


def test_trainable_grad_zero_for_grids_and_finite_on_overflow(rng):
    from nvsr_tpu.ops.pallas.tile_sampler import tiled_plane_sample_trainable
    P, C, H, W = 3, 8, 64, 64
    cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16, group=2)
    planes = jnp.asarray(rng.standard_normal((P, C, H, W)).astype(np.float32))
    # scattered points: most chunks overflow and clamp
    g = jnp.asarray(rng.uniform(-0.95, 0.95,
                                size=(P, 2, 64, 2)).astype(np.float32))

    def loss(p, gg):
        out, _ = tiled_plane_sample_trainable(p, gg, cfg, True, True)
        return jnp.sum(out ** 2)

    gp, gg = jax.grad(loss, argnums=(0, 1))(planes, g)
    assert np.all(np.isfinite(np.asarray(gp)))
    assert float(jnp.abs(gg).max()) == 0.0


def test_train_step_tiled_grads_match(rng):
    """Opt-in tiled training (flags.tile_cfg): one fused train_step
    through the custom-VJP tile sampler produces the same loss and
    gradients as the XLA gather path on the same tile-coherent rays
    (reference backward through grid_sample, train_nerf.py:903), up to
    the bf16 tap-table rounding the forward carries."""
    from nvsr_tpu.models import TriplaneConfig, init_decoder_params
    from nvsr_tpu.render import RenderConfig, make_ray_bundle
    from nvsr_tpu.train import StepFlags, train_step

    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=8,
                         dec_density_layers=2, dec_rgb_layers=2,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    params["members"][0]["fc_alpha"]["b"] = (
        params["members"][0]["fc_alpha"]["b"] + 2.0)
    planes = {"pos": jnp.asarray(
        0.5 * rng.standard_normal((3, 8, 64, 64)).astype(np.float32)),
        "view": jnp.asarray(
        0.5 * rng.standard_normal((8, 16, 16)).astype(np.float32))}
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    tile_cfg = TileSamplerConfig(tile_rays=16, slab=4, th=32, tw=16,
                                 group=2)

    R = 32  # two 4x4-ray tiles
    origin = np.array([0.0, 0.0, 1.8])
    d = []
    for cx in (-0.3, 0.25):
        dirs = np.stack(np.meshgrid(np.linspace(cx - .05, cx + .05, 4),
                                    np.linspace(-.05, .05, 4)),
                        -1).reshape(-1, 2)
        d.append(np.concatenate([dirs, -np.ones((16, 1))], -1))
    d = np.concatenate(d).astype(np.float32)
    ro = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (R, 3))
    rays = make_ray_bundle(ro, jnp.asarray(d), 0.8, 3.2,
                           use_viewdirs=True)
    target = jnp.asarray(rng.uniform(size=(R, 3)).astype(np.float32))
    rcfg = RenderConfig(num_coarse=8, num_fine=8, perturb=False,
                        radiance_field_noise_std=0.0)
    skey = jax.random.PRNGKey(5)

    def run(tc):
        flags = StepFlags(share_coarse_fine=True, train_sr=False,
                          tile_cfg=tc)
        metrics, grads = train_step(params, None, None, planes,
                                    jnp.asarray(box), rays, target, skey,
                                    model_cfg=cfg, sr_cfg=None, rcfg=rcfg,
                                    flags=flags)
        return metrics, grads

    m_ref, g_ref = run(None)
    m_tl, g_tl = run(tile_cfg)
    assert float(m_tl.get("overflow_frac", 0.0)) == 0.0
    assert abs(float(m_tl["loss"]) - float(m_ref["loss"])) < 3e-3

    for name, gr, gt in [
            ("planes", g_ref["planes"]["pos"], g_tl["planes"]["pos"]),
            ("decoder", g_ref["dc"]["members"][0]["fc_alpha"]["w"],
             g_tl["dc"]["members"][0]["fc_alpha"]["w"])]:
        gr, gt = np.asarray(gr), np.asarray(gt)
        assert np.all(np.isfinite(gt)), name
        scale = np.abs(gr).max() + 1e-8
        assert np.abs(gt - gr).max() < 0.05 * scale, name


def test_experiment_tiled_train_runs(tmp_path):
    """nerf.train.tiled_gather: the production training iteration runs
    through the trainable tile sampler (tile-coherent batches + custom
    VJP) with finite loss, zero region overflow, and planes that
    actually move."""
    import sys
    sys.path.insert(0, "tests")
    from helpers_synth import write_blender_scene
    from test_experiment import _mini_cfg
    from nvsr_tpu.experiment import Experiment

    write_blender_scene(str(tmp_path / "synt"), "lego", size=32)
    cfg = _mini_cfg(tmp_path, logdir="logs/tiledtrain",
                    train_groups={"4,8,8": ["lego"]}, sr=False,
                    what=("LR_planes", "decoder"), iters=4)
    for mode in ("train", "validation"):
        cfg.nerf[mode]["num_coarse"] = 8
        cfg.nerf[mode]["num_fine"] = 8
    cfg.nerf.train["tiled_gather"] = True
    cfg.nerf.train["tile_shape"] = "4x4"
    cfg.nerf.train["num_random_rays"] = 64
    exp = Experiment(cfg, root_path=str(tmp_path))
    exp.planes_buffer.draw_scenes()
    exp.image_sampler.update_active(exp.planes_buffer.cur_scenes)
    scene = exp.training_scenes[0]
    assert exp.train_tile_cfg(scene, 64) is not None
    before = np.asarray(exp.planes_buffer.get(scene).params()["pos"]).copy()
    for i in range(4):
        exp.train_iteration(i)
    after = np.asarray(exp.planes_buffer.get(scene).params()["pos"])
    assert not np.allclose(before, after)


def test_megakernel_dmapair_matches_and_flags(rng, monkeypatch):
    """Pair-shared region fetches (NVSR_MEGA_DMAPAIR=1): chunks whose
    pair-origin delta fits the (th+8, tw+4) union slack gather
    BIT-IDENTICALLY to the per-chunk-fetch kernel; a pair beyond the
    slack is clamped and flagged in the returned pair mask (feeding
    the repair/ladder path). PERF.md R5 batch 12."""
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          init_decoder_params)
    from nvsr_tpu.ops.pallas import fused_decoder as fd
    from nvsr_tpu.ops.pallas import tile_sampler as ts

    cfg = TriplaneConfig(dec_channels=128, num_plane_channels=48,
                         dec_density_layers=4, dec_rgb_layers=4,
                         skip_connect_every=3, proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         compute_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    wpack, bpack, plan_info = fd.pack_decoder_weights(params, cfg)
    B, group, th, tw = 128, 8, 24, 14
    T = th * tw
    NC, Wp = 32, 24
    table = jnp.asarray(rng.standard_normal((1600, Wp * 128))
                        .astype(np.float32)).astype(jnp.bfloat16)
    org = np.zeros((NC, 3, 2), np.int32)
    for j in range(NC // 2):
        for p in range(3):
            oy = int(rng.integers(0, (1600 - th - 16) // 8)) * 8
            ox = int(rng.integers(0, Wp - tw - 6))
            dy, dx = int(rng.integers(0, 2)) * 8, int(rng.integers(0, 5))
            org[2 * j, p] = (oy, ox)
            org[2 * j + 1, p] = (oy + dy, ox + dx)
    # pair 3: origin delta 16 rows > the 8-row union slack -> clamp
    org[7, 0, 0] = org[6, 0, 0] + 16
    fidx = (rng.random((3, NC, B)) * (T - 2)).astype(np.float32)
    ty = rng.random((3, NC, B)).astype(np.float32)
    view = jnp.asarray(rng.standard_normal((NC * B, 64))
                       .astype(np.float32)).astype(jnp.bfloat16)
    args = (table, jnp.asarray(org), jnp.asarray(fidx), jnp.asarray(ty),
            view, wpack, bpack, jnp.float32(0.0))
    kw = dict(th=th, tw=tw, group=group, B=B, cfg=cfg,
              plan_info=plan_info, interpret=True)

    monkeypatch.delenv("NVSR_MEGA_DMAPAIR", raising=False)
    out0, ovf0, m0 = ts._mega_finish(*args, **kw)
    assert m0 is None
    monkeypatch.setenv("NVSR_MEGA_DMAPAIR", "1")
    out1, ovf1, m1 = ts._mega_finish(*args, **kw)
    monkeypatch.delenv("NVSR_MEGA_DMAPAIR", raising=False)

    m1 = np.asarray(m1)
    assert m1.shape == (NC,)
    # exactly the chunk(s) of the over-slack pair are flagged
    assert m1[7] and not m1[6], m1
    assert m1.sum() == 1, m1
    assert float(ovf1) > float(ovf0)
    a, b = np.asarray(out0), np.asarray(out1)
    point_ok = ~np.repeat(m1, B)
    np.testing.assert_array_equal(a[point_ok], b[point_ok])
    # the clamped chunk gathers from shifted rows — it must differ
    # (this also proves the pair path actually engaged)
    assert np.abs(a[~point_ok] - b[~point_ok]).max() > 0.0

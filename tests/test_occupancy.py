"""Tests for occupancy-guided sampling-bound tightening."""

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.ops.occupancy import estimate_occupied_box, tighten_near_far


def test_estimate_box_finds_blob():
    box = np.stack([-2 * np.ones(3), 2 * np.ones(3)]).astype(np.float32)

    def density(pts):  # occupied ball at (0.5, 0, -0.5), radius ~0.4
        d = jnp.sum((pts - jnp.asarray([0.5, 0.0, -0.5])) ** 2, -1)
        return jnp.where(d < 0.16, 5.0, -5.0)

    aabb = np.asarray(estimate_occupied_box(density, box, grid=32))
    assert np.all(aabb[0] <= [0.1, -0.4, -0.9])
    assert np.all(aabb[1] >= [0.9, 0.4, -0.1])
    # much tighter than the scene box
    assert np.all(aabb[0] > box[0] + 0.5)
    assert np.all(aabb[1] < box[1] - 0.5)


def test_estimate_box_empty_falls_back():
    box = np.stack([-np.ones(3), np.ones(3)]).astype(np.float32)
    aabb = np.asarray(estimate_occupied_box(
        lambda p: -jnp.ones(p.shape[0]), box, grid=8))
    np.testing.assert_allclose(aabb, box, atol=1e-6)


def test_tighten_near_far_hit_and_miss():
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    ro = jnp.asarray([[-5.0, 0.0, 0.0],   # hits: t in [4, 6]
                      [-5.0, 3.0, 0.0]])  # misses
    rd = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    near = jnp.full((2, 1), 2.0)
    far = jnp.full((2, 1), 10.0)
    n2, f2, hit = tighten_near_far(ro, rd, near, far, aabb)
    assert bool(hit[0, 0]) and not bool(hit[1, 0])
    np.testing.assert_allclose(np.asarray(n2[0]), [4.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2[0]), [6.0], atol=1e-5)
    # miss: DEGENERATE interval at the clipped slab midpoint (the ray
    # composites to exact background; see tighten_near_far docstring)
    assert float(n2[1, 0]) == float(f2[1, 0])
    assert 2.0 <= float(n2[1, 0]) <= 10.0


def test_miss_rays_composite_to_exact_background():
    """Occupancy-miss rays (degenerate z span) render pure background
    regardless of the field — the 1e10 tail interval is silenced."""
    from nvsr_tpu.ops.rendering import volume_render
    R, S = 4, 8
    rf = jnp.full((R, S, 4), 5.0)            # junk density + color
    z_hit = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (R, S))
    z_miss = jnp.full((R, S), 4.2)           # degenerate span
    d = jnp.asarray([[0.0, 0.0, 1.0]] * R)
    out_hit = volume_render(rf, z_hit, d, white_background=True)
    out_miss = volume_render(rf, z_miss, d, white_background=True)
    assert float(out_hit.acc[0]) > 0.9       # the junk field renders
    np.testing.assert_allclose(np.asarray(out_miss.acc), 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(out_miss.rgb), 1.0, atol=0)


def test_tile_union_tightening():
    """tighten_bundle(tile_rays=N): every ray of a tile shares the
    UNION of the tile's hit intervals (rank alignment for the tiled
    sampler); all-miss tiles stay per-ray degenerate."""
    from nvsr_tpu.render import make_ray_bundle, tighten_bundle
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    # tile 1: one central + one grazing + one miss ray + one central;
    # tile 2: all miss
    ro = jnp.asarray([[-5.0, 0.0, 0.0], [-5.0, 0.99, 0.0],
                      [-5.0, 3.0, 0.0], [-5.0, 0.5, 0.0],
                      [-5.0, 3.0, 0.0], [-5.0, 4.0, 0.0],
                      [-5.0, 5.0, 0.0], [-5.0, 6.0, 0.0]])
    rd = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (8, 1))
    rays = make_ray_bundle(ro, rd, 2.0, 10.0, use_viewdirs=True)
    t = tighten_bundle(rays, aabb, tile_rays=4)
    n, f = np.asarray(t.near)[:, 0], np.asarray(t.far)[:, 0]
    # tile 1: shared union interval [4, 6] on every ray incl. the miss
    np.testing.assert_allclose(n[:4], 4.0, atol=1e-4)
    np.testing.assert_allclose(f[:4], 6.0, atol=1e-4)
    # tile 2: all miss -> degenerate per ray
    np.testing.assert_array_equal(n[4:], f[4:])


def test_tighten_respects_original_bounds():
    aabb = jnp.asarray([[-10.0, -10.0, -10.0], [10.0, 10.0, 10.0]])
    ro = jnp.zeros((1, 3))
    rd = jnp.asarray([[1.0, 0.0, 0.0]])
    near = jnp.full((1, 1), 2.0)
    far = jnp.full((1, 1), 6.0)
    n2, f2, _ = tighten_near_far(ro, rd, near, far, aabb)
    assert float(n2[0, 0]) >= 2.0 and float(f2[0, 0]) <= 6.0


def test_density_fn_and_bundle_tightening(rng):
    from nvsr_tpu.models.triplane import (TriplaneConfig,
                                          init_decoder_params,
                                          make_density_fn)
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import make_ray_bundle, tighten_bundle

    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=4,
                         dec_density_layers=2, dec_rgb_layers=2)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(rng.standard_normal((3, 4, 8, 8)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    dfn = make_density_fn(params, cfg, planes, box)
    sigma = dfn(jnp.zeros((5, 3)))
    assert sigma.shape == (5,)
    aabb = estimate_occupied_box(dfn, box, grid=8)
    c2w = np.eye(4, dtype=np.float32); c2w[:3, 3] = [0, 0, 4]
    ro, rd = get_ray_bundle(4, 4, 5.0, jnp.asarray(c2w))
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    tightened = tighten_bundle(rays, aabb)
    assert bool(jnp.all(tightened.near >= rays.near))
    assert bool(jnp.all(tightened.far <= rays.far))


def test_experiment_occupancy_workflow(tmp_path):
    """nerf.train.occupancy: the AABB is estimated during training,
    persisted with the planes, and applied at eval."""
    import sys
    sys.path.insert(0, "tests")
    from helpers_synth import write_blender_scene
    from test_experiment import _mini_cfg
    from nvsr_tpu.experiment import Experiment

    write_blender_scene(str(tmp_path / "synt"), "lego", size=32)
    cfg = _mini_cfg(tmp_path, logdir="logs/occ",
                    train_groups={"4,8,8": ["lego"]}, sr=False,
                    what=("LR_planes", "decoder"), iters=4)
    cfg.nerf.train["occupancy"] = {
        "enabled": True, "grid": 16, "warmup_iters": 1, "update_every": 2}
    exp = Experiment(cfg, root_path=str(tmp_path))
    exp.planes_buffer.draw_scenes()
    exp.image_sampler.update_active(exp.planes_buffer.cur_scenes)
    scene = exp.training_scenes[0]
    assert exp.planes_buffer.get(scene).occ_aabb is None
    for i in range(4):
        exp.train_iteration(i)
    losses, _ = exp.flush_train_metrics()
    assert np.isfinite(losses).all()
    aabb = exp.planes_buffer.get(scene).occ_aabb
    assert aabb is not None and aabb.shape == (2, 3)
    box = exp.planes_buffer.get(scene).box
    assert (aabb[0] >= box[0, :3] - 1e-5).all()
    assert (aabb[1] <= box[1, :3] + 1e-5).all()

    # persists through the store round-trip
    exp.planes_buffer.save_params()
    planes2, _ = exp.store.load(scene)
    np.testing.assert_allclose(planes2.occ_aabb, aabb)

    # eval renders with the tightened bounds (finite output)
    img_idx = exp.i_val[list(exp.i_val.keys())[0]][0]
    out, _ = exp.render_eval_image(scene, img_idx)
    assert np.isfinite(np.asarray(out.fine.rgb)).all()

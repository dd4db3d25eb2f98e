"""Tests for the fused render pipeline (coarse->resample->fine)."""

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.models.nerf_mlp import NeRFMLPConfig, init_nerf_mlp_params
from nvsr_tpu.models.triplane import TriplaneConfig, init_decoder_params
from nvsr_tpu.ops.geometry import get_ray_bundle
from nvsr_tpu.render import (
    RayBundle,
    RenderConfig,
    make_baseline_point_fn,
    make_ray_bundle,
    make_triplane_point_fn,
    render_image,
    render_rays,
    render_rays_chunked,
)


def _camera(eye):
    eye = np.asarray(eye, dtype=np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]).astype(np.float32)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


def _triplane_setup(rng, n_rays=64):
    cfg = TriplaneConfig(dec_channels=32, num_plane_channels=8)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(
        rng.standard_normal((3, 8, 16, 16)).astype(np.float32))
    pv = jnp.asarray(rng.standard_normal((8, 8, 8)).astype(np.float32))
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)
    ro, rd = get_ray_bundle(8, 8, 10.0, jnp.asarray(_camera([3.0, 0, 0])))
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    point_fn = make_triplane_point_fn(params, cfg, planes, pv, box)
    return point_fn, rays, (params, cfg, planes, pv, box)


def test_triplane_pipeline_shapes(rng):
    point_fn, rays, _ = _triplane_setup(rng)
    rcfg = RenderConfig(num_coarse=8, num_fine=8, perturb=False,
                        radiance_field_noise_std=0.0)
    out = render_rays(point_fn, point_fn, rays, jax.random.PRNGKey(1), rcfg)
    assert out.coarse.rgb.shape == (64, 3)
    assert out.fine.rgb.shape == (64, 3)
    assert out.coarse.weights.shape == (64, 8)
    assert out.fine.weights.shape == (64, 16)  # merged coarse+fine depths
    assert bool(jnp.isfinite(out.fine.rgb).all())


def test_chunked_matches_unchunked(rng):
    point_fn, rays, _ = _triplane_setup(rng)
    rcfg = RenderConfig(num_coarse=8, num_fine=8, perturb=False,
                        radiance_field_noise_std=0.0, ray_block=17)
    key = jax.random.PRNGKey(2)
    full = render_rays(point_fn, point_fn, rays, key, rcfg)
    chunked = render_rays_chunked(point_fn, point_fn, rays, key, rcfg)
    np.testing.assert_allclose(np.asarray(chunked.coarse.rgb),
                               np.asarray(full.coarse.rgb), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(chunked.fine.rgb),
                               np.asarray(full.fine.rgb), rtol=1e-4,
                               atol=1e-5)


def test_render_image_shapes(rng):
    point_fn, _, _ = _triplane_setup(rng)
    ro, rd = get_ray_bundle(9, 7, 10.0, jnp.asarray(_camera([3.0, 0, 0])))
    rcfg = RenderConfig(num_coarse=8, num_fine=8, perturb=False,
                        ray_block=16)
    out = render_image(point_fn, point_fn, ro, rd, jax.random.PRNGKey(0),
                       rcfg, near=2.0, far=6.0)
    assert out.fine.rgb.shape == (9, 7, 3)
    assert out.coarse.disp.shape == (9, 7)


def test_no_fine_pass(rng):
    point_fn, rays, _ = _triplane_setup(rng)
    rcfg = RenderConfig(num_coarse=8, num_fine=0, perturb=False)
    out = render_rays(point_fn, None, rays, jax.random.PRNGKey(0), rcfg)
    assert out.fine is None
    assert out.coarse.rgb.shape == (64, 3)


def test_stop_coarse_grad_blocks_gradients(rng):
    """stop_coarse_grad reproduces the reference's optional_no_grad on
    the frozen-coarse path (train_nerf.py:560)."""
    _, rays, (params, cfg, planes, pv, box) = _triplane_setup(rng)
    rcfg_stop = RenderConfig(num_coarse=4, num_fine=4, perturb=False,
                             stop_coarse_grad=True)

    def coarse_loss(planes_):
        pf = make_triplane_point_fn(params, cfg, planes_, pv, box)
        out = render_rays(pf, pf, rays, jax.random.PRNGKey(0), rcfg_stop)
        return jnp.sum(out.coarse.rgb ** 2)

    g = jax.grad(coarse_loss)(planes)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)

    def fine_loss(planes_):
        pf = make_triplane_point_fn(params, cfg, planes_, pv, box)
        out = render_rays(pf, pf, rays, jax.random.PRNGKey(0), rcfg_stop)
        return jnp.sum(out.fine.rgb ** 2)

    g = jax.grad(fine_loss)(planes)
    assert float(jnp.abs(g).sum()) > 0  # fine pass still differentiable


def test_baseline_pe_pipeline(rng):
    mlp_cfg = NeRFMLPConfig(hidden_size=32)
    params = init_nerf_mlp_params(jax.random.PRNGKey(0), mlp_cfg)
    point_fn = make_baseline_point_fn(params, mlp_cfg)
    ro, rd = get_ray_bundle(6, 6, 10.0, jnp.asarray(_camera([0, 3.0, 0])))
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    rcfg = RenderConfig(num_coarse=8, num_fine=8, perturb=True,
                        radiance_field_noise_std=0.2)
    out = render_rays(point_fn, point_fn, rays, jax.random.PRNGKey(3), rcfg)
    assert out.fine.rgb.shape == (36, 3)
    assert bool(jnp.isfinite(out.fine.rgb).all())


def test_mip_pipeline(rng):
    """Mip path: num_coarse+1 z edges, IPE input dim, interval weights."""
    multires = 10
    mlp_cfg = NeRFMLPConfig(hidden_size=32,
                            input_dim_xyz=3 * 2 * (multires - 1),
                            input_dim_dir=3 + 2 * 3 * 4)
    params = init_nerf_mlp_params(jax.random.PRNGKey(0), mlp_cfg)
    point_fn = make_baseline_point_fn(params, mlp_cfg, mip=True, ds_factor=2,
                                      ipe_multires=multires)
    ro, rd = get_ray_bundle(5, 5, 10.0, jnp.asarray(_camera([3.0, 0, 0])))
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    rcfg = RenderConfig(num_coarse=8, num_fine=8, perturb=False, mip=True)
    out = render_rays(point_fn, point_fn, rays, jax.random.PRNGKey(1), rcfg)
    # mip: 9 edges -> 8 coarse intervals; fine merge = 9+9 edges -> 17 ints
    assert out.coarse.weights.shape == (25, 8)
    assert out.fine.weights.shape == (25, 17)
    assert bool(jnp.isfinite(out.fine.rgb).all())


def test_ndc_bundle():
    ro, rd = get_ray_bundle(8, 8, 10.0, jnp.asarray(_camera([0.5, 0.5, 3.0])))
    rays = make_ray_bundle(ro, rd, 0.0, 1.0, use_viewdirs=True, no_ndc=False,
                           hwf=(8, 8, 10.0))
    assert isinstance(rays, RayBundle)
    # viewdirs computed pre-NDC must be unit
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(rays.viewdirs, axis=-1)), 1.0, atol=1e-5)


def test_sigma_only_coarse_fine_image_bit_exact(rng):
    """A sigma_only coarse point fn (CDF-only decode: rgb branch +
    view-plane gathers skipped) leaves the FINE image and the coarse
    WEIGHTS bit-identical on both the tiled megakernel path and the
    XLA path — the round-5 render fast path (the hierarchical CDF
    consumes coarse sigma only; reference train_utils.py:131-156)."""
    from nvsr_tpu.models.triplane import TriplaneConfig, init_decoder_params
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.ops.pallas.tile_sampler import TileSamplerConfig
    from nvsr_tpu.render import make_triplane_point_fn, render_image

    H = W = 32
    cfg = TriplaneConfig(proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         skip_connect_every=3,
                         gather_table_dtype="bfloat16",
                         compute_dtype="bfloat16")

    def alive(d):
        d["members"][0]["fc_alpha"]["b"] = \
            d["members"][0]["fc_alpha"]["b"] + 1.5
        return d

    dec_c = alive(init_decoder_params(jax.random.PRNGKey(1), cfg))
    dec_f = alive(init_decoder_params(jax.random.PRNGKey(2), cfg))
    planes = jnp.asarray(0.05 * rng.standard_normal((3, 48, 128, 128))
                         .astype(np.float32))
    pview = jnp.asarray(0.05 * rng.standard_normal((48, 32, 32))
                        .astype(np.float32))
    box = jnp.asarray(np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                                [4, 4, 4, np.pi, np.pi / 2]]), jnp.float32)
    eye = np.asarray([3.5, 0.4, 0.6], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]).astype(np.float32)
    right /= np.linalg.norm(right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
        right, np.cross(right, fwd), -fwd, eye)
    ro, rd = get_ray_bundle(H, W, 35.0, np.asarray(c2w))
    rcfg = RenderConfig(num_coarse=16, num_fine=16, perturb=False,
                        white_background=True)
    for tile_cfg, tile in ((TileSamplerConfig(tile_rays=256), 16),
                           (None, None)):
        mk = lambda dec, so=False: make_triplane_point_fn(
            dec, cfg, planes, pview, box, tile_cfg=tile_cfg,
            sigma_only=so)
        full = render_image(mk(dec_c), mk(dec_f), ro, rd,
                            jax.random.PRNGKey(7), rcfg,
                            near=2.0, far=6.0, tile=tile)
        so = render_image(mk(dec_c, True), mk(dec_f), ro, rd,
                          jax.random.PRNGKey(7), rcfg,
                          near=2.0, far=6.0, tile=tile)
        np.testing.assert_array_equal(np.asarray(full.fine.rgb),
                                      np.asarray(so.fine.rgb))
        np.testing.assert_array_equal(np.asarray(full.coarse.weights),
                                      np.asarray(so.coarse.weights))

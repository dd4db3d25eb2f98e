"""Host-loop overhaul tests: on-device sampled rays, torch-parity
plateau scheduler, point_coords_noise wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvsr_tpu.ops.geometry import get_ray_bundle, get_rays_at
from nvsr_tpu.render import RenderConfig, build_sampled_rays, make_ray_bundle
from nvsr_tpu.train import (PlateauScheduler, StepFlags,
                            choose_random_pixels, train_step)


def _camera(eye):
    eye = np.asarray(eye, dtype=np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]).astype(np.float32)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


@pytest.mark.parametrize("offset", [0.0, 0.375])
def test_get_rays_at_matches_full_bundle(offset):
    h, w, focal = 12, 17, 20.0
    c2w = jnp.asarray(_camera([3.0, 1.0, 0.5]))
    ro_full, rd_full = get_ray_bundle(h, w, focal, c2w,
                                      downsampling_offset=offset)
    rng = np.random.default_rng(0)
    rows = rng.integers(0, h, size=25)
    cols = rng.integers(0, w, size=25)
    ro, rd = get_rays_at(jnp.asarray(rows), jnp.asarray(cols),
                         float(h), float(w), focal, c2w,
                         downsampling_offset=offset)
    np.testing.assert_allclose(np.asarray(ro),
                               np.asarray(ro_full)[rows, cols], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rd),
                               np.asarray(rd_full)[rows, cols], rtol=1e-6,
                               atol=1e-6)


@pytest.mark.parametrize("no_ndc", [True, False])
def test_build_sampled_rays_matches_bundle_subset(no_ndc):
    h, w, focal = 10, 14, 18.0
    near, far = 2.0, 6.0 if no_ndc else 1.0
    c2w = jnp.asarray(_camera([0.3, 0.2, 4.0]))
    ro_full, rd_full = get_ray_bundle(h, w, focal, c2w)
    bundle_full = make_ray_bundle(ro_full, rd_full, near, far,
                                  use_viewdirs=True, no_ndc=no_ndc,
                                  hwf=(h, w, focal))
    rng = np.random.default_rng(1)
    idx = rng.choice(h * w, size=20, replace=False)
    rows, cols = idx // w, idx % w
    sampled = build_sampled_rays(c2w, jnp.asarray(rows), jnp.asarray(cols),
                                 float(h), float(w), focal, 0.0, near, far,
                                 use_viewdirs=True, no_ndc=no_ndc)
    flat = idx  # make_ray_bundle flattens row-major
    for name in ("origins", "directions", "near", "far", "viewdirs"):
        np.testing.assert_allclose(
            np.asarray(getattr(sampled, name)),
            np.asarray(getattr(bundle_full, name))[flat],
            rtol=1e-5, atol=1e-6, err_msg=name)


def test_choose_random_pixels_targets():
    rng = np.random.default_rng(2)
    img = np.arange(6 * 7 * 3, dtype=np.float32).reshape(6, 7, 3)
    rows, cols, target = choose_random_pixels(rng, img, 10)
    np.testing.assert_array_equal(target, img[rows, cols])
    assert len(set(zip(rows.tolist(), cols.tolist()))) == 10  # no repeats


def test_plateau_scheduler_matches_torch():
    torch = pytest.importorskip("torch")
    lr0, patience, factor = 1e-2, 2, 0.5
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, patience=patience, factor=factor)
    ours = PlateauScheduler(lr=lr0, patience=patience, factor=factor)
    rng = np.random.default_rng(3)
    losses = [1.0]
    # a mix of improvements, sub-threshold improvements, and plateaus
    for _ in range(60):
        losses.append(float(losses[-1]
                            * rng.choice([1.0, 1.0, 0.99999, 0.9, 1.05])))
    for loss in losses:
        tsched.step(loss)
        ours_lr = ours.step(loss)
        assert ours_lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-9)


def test_point_coords_noise_oracle():
    """Noise path == manually jittered clean path with the reference's
    std = c * 2 / (1 + plane_res) (reference models.py:291-293), applied
    to the NORMALIZED coords."""
    from nvsr_tpu.models import TriplaneConfig, init_decoder_params
    from nvsr_tpu.models.triplane import apply_triplane_points

    c, res = 0.25, 40
    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=4,
                         dec_density_layers=2, dec_rgb_layers=2,
                         use_viewdirs=False, proj_combination="avg",
                         point_coords_noise=c)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_decoder_params(k1, cfg)
    planes = 0.1 * jax.random.normal(k2, (3, 4, 16, 16))
    # identity box -> normalize_coords is the identity, so the clean
    # path on pre-jittered coords must match the noise path exactly
    box = np.array([[-1.0, -1, -1], [1.0, 1, 1]], np.float32)
    xyz = jax.random.uniform(k3, (50, 3), minval=-0.9, maxval=0.9)

    nkey = jax.random.PRNGKey(7)
    noisy = apply_triplane_points(params, cfg, planes, box, xyz, None,
                                  noise_key=nkey, plane_resolution=res)
    std = c * 2.0 / (1 + res)
    xyz_jit = xyz + std * jax.random.normal(nkey, xyz.shape, xyz.dtype)
    clean_cfg = TriplaneConfig(**{**cfg.__dict__, "point_coords_noise": 0.0})
    manual = apply_triplane_points(params, clean_cfg, planes, box, xyz_jit,
                                   None)
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(manual),
                               rtol=1e-5, atol=1e-6)


def test_train_step_point_noise_wired():
    """train_step with point_coords_noise + plane_resolution produces a
    different (still finite) loss than without — the knob is live."""
    from nvsr_tpu.models import TriplaneConfig, init_decoder_params

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    cfg_on = TriplaneConfig(dec_channels=16, num_plane_channels=4,
                            dec_density_layers=2, dec_rgb_layers=2,
                            proj_combination="avg",
                            viewdir_proj_combination="concat_pos",
                            point_coords_noise=0.5)
    cfg_off = TriplaneConfig(**{**cfg_on.__dict__,
                                "point_coords_noise": 0.0})
    decoder = init_decoder_params(k1, cfg_on)
    # bias the density head positive so rays actually composite (a
    # fresh random decoder can land all-negative -> dead-ReLU sigma,
    # making both runs trivially identical)
    decoder["members"][0]["fc_alpha"]["b"] = (
        decoder["members"][0]["fc_alpha"]["b"] + 2.0)
    planes = {"pos": 1.5 * jax.random.normal(k2, (3, 4, 12, 12)),
              "view": 0.5 * jax.random.normal(
                  k3, (cfg_on.viewdir_channels, 8, 8))}
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)
    h = 4
    c2w = jnp.asarray(_camera([3.5, 0.5, 0.5]))
    ro, rd = get_ray_bundle(h, h, 5.0, c2w)
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    target = jnp.full((h * h, 3), 0.5)
    rcfg = RenderConfig(num_coarse=4, num_fine=4, perturb=False,
                        radiance_field_noise_std=0.0)
    skey = jax.random.PRNGKey(5)

    def run(cfg, res):
        flags = StepFlags(share_coarse_fine=True, train_decoder=False,
                          train_sr=False, plane_resolution=res)
        metrics, grads = train_step(decoder, None, None, planes,
                                    jnp.asarray(box), rays, target, skey,
                                    model_cfg=cfg, sr_cfg=None, rcfg=rcfg,
                                    flags=flags)
        return float(metrics["loss"]), np.asarray(grads["planes"]["pos"])

    loss_off, g_off = run(cfg_off, None)
    loss_on, g_on = run(cfg_on, 12)
    assert np.isfinite(loss_on) and np.isfinite(loss_off)
    assert not np.allclose(g_on, g_off)

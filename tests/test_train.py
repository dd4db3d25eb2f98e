"""Tests for the fused train step: gradient gating, consistency path,
and the PSNR-improves integration check (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.models.plane_sr import PlaneSRConfig, init_plane_sr_params
from nvsr_tpu.models.triplane import TriplaneConfig, init_decoder_params
from nvsr_tpu.ops.geometry import get_ray_bundle
from nvsr_tpu.render import RenderConfig, make_ray_bundle
from nvsr_tpu.train import (
    ModuleOptimizer,
    StepFlags,
    select_patch_rays,
    select_random_rays,
    train_step,
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


def _setup(rng, sr=False):
    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=4,
                         dec_density_layers=2, dec_rgb_layers=2)
    dc = init_decoder_params(jax.random.PRNGKey(0), cfg)
    df = init_decoder_params(jax.random.PRNGKey(1), cfg)
    sr_cfg = sr_params = None
    if sr:
        sr_cfg = PlaneSRConfig(in_channels=4, out_channels=4, hidden_size=8,
                               n_blocks=1, scale_factor=2)
        sr_params = init_plane_sr_params(jax.random.PRNGKey(2), sr_cfg)
    planes = {
        "pos": jnp.asarray(
            0.1 * rng.standard_normal((3, 4, 12, 12)).astype(np.float32)),
        "view": jnp.asarray(
            0.1 * rng.standard_normal((4, 6, 6)).astype(np.float32)),
    }
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)
    ro, rd = get_ray_bundle(8, 8, 10.0, jnp.asarray(_camera([3.0, 0, 0])))
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    target = jnp.asarray(rng.random((64, 3)).astype(np.float32))
    rcfg = RenderConfig(num_coarse=6, num_fine=6, perturb=False)
    return cfg, dc, df, sr_cfg, sr_params, planes, box, rays, target, rcfg


def test_train_step_returns_all_grads(rng):
    cfg, dc, df, sr_cfg, sr_params, planes, box, rays, target, rcfg = \
        _setup(rng, sr=True)
    flags = StepFlags(sr_iter=True)
    metrics, grads = train_step(dc, df, sr_params, planes, box, rays, target,
                                jax.random.PRNGKey(0), model_cfg=cfg,
                                sr_cfg=sr_cfg, rcfg=rcfg, flags=flags)
    assert set(grads) == {"planes", "dc", "df", "sr"}
    assert float(metrics["loss"]) > 0
    for name in ("dc", "df", "sr"):
        assert float(jax.tree.reduce(
            lambda a, b: a + float(jnp.abs(b).sum()), grads[name], 0.0)) > 0
    assert float(jnp.abs(grads["planes"]["pos"]).sum()) > 0


def test_share_coarse_fine_single_decoder(rng):
    cfg, dc, df, _, _, planes, box, rays, target, rcfg = _setup(rng)
    flags = StepFlags(share_coarse_fine=True)
    _, grads = train_step(dc, None, None, planes, box, rays, target,
                          jax.random.PRNGKey(0), model_cfg=cfg, sr_cfg=None,
                          rcfg=rcfg, flags=flags)
    assert "df" not in grads


def test_detach_lr_planes_blocks_plane_grads(rng):
    """With detach + fine-only loss, LR planes receive no gradient
    (reference detach_LR_planes semantics, models.py:272)."""
    cfg, dc, df, sr_cfg, sr_params, planes, box, rays, target, rcfg = \
        _setup(rng, sr=True)
    flags = StepFlags(sr_iter=True, detach_lr_planes=True,
                      compute_coarse_loss=False)
    _, grads = train_step(dc, df, sr_params, planes, box, rays, target,
                          jax.random.PRNGKey(0), model_cfg=cfg,
                          sr_cfg=sr_cfg, rcfg=rcfg, flags=flags)
    np.testing.assert_allclose(np.asarray(grads["planes"]["pos"]), 0.0,
                               atol=1e-8)
    # but the viewdir plane (not SR'd) still learns
    assert float(jnp.abs(grads["planes"]["view"]).sum()) > 0
    # and the SR net itself learns
    assert float(jax.tree.reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), grads["sr"], 0.0)) > 0


def test_consistency_iter_patch_shapes(rng):
    cfg, dc, df, _, _, planes, box, _, _, rcfg = _setup(rng)
    ds = 2
    ro, rd = get_ray_bundle(8, 8, 10.0, jnp.asarray(_camera([3.0, 0, 0])))
    lr_image = rng.random((4, 4, 3)).astype(np.float32)
    host_rng = np.random.default_rng(0)
    ro_s, rd_s, target = select_patch_rays(host_rng, lr_image, ro, rd,
                                           num_rays=16, ds_factor=ds)
    assert ro_s.shape == (16, 3) and target.shape == (4, 3)
    rays = make_ray_bundle(jnp.asarray(ro_s), jnp.asarray(rd_s), 2.0, 6.0,
                           use_viewdirs=True)
    flags = StepFlags(consistency_iter=True, ds_factor=ds,
                      im_inconsistency_loss_w=1.0)
    metrics, grads = train_step(dc, df, None, planes, box, rays,
                                jnp.asarray(target), jax.random.PRNGKey(0),
                                model_cfg=cfg, sr_cfg=None, rcfg=rcfg,
                                flags=flags)
    assert np.isfinite(float(metrics["loss"]))
    assert float(jnp.abs(grads["planes"]["pos"]).sum()) > 0


def test_select_patch_rays_patch_major_order(rng):
    """Ray order must be patch-major so avg_downsample groups correctly."""
    h = w = 4
    ds = 2
    ro = np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3)
    lr_image = rng.random((2, 2, 3)).astype(np.float32)
    host_rng = np.random.default_rng(1)
    ro_s, _, _ = select_patch_rays(host_rng, lr_image, ro, ro, num_rays=16,
                                   ds_factor=ds)
    # each consecutive group of ds*ds rays is one contiguous 2x2 patch
    g = ro_s.reshape(-1, ds * ds, 3)[..., 0]  # flat index channel 0
    for patch in g:
        r0, c0 = divmod(int(patch[0]) // 3, w)
        expect = [(r0 * w + c0), (r0 * w + c0 + 1),
                  ((r0 + 1) * w + c0), ((r0 + 1) * w + c0 + 1)]
        np.testing.assert_allclose(patch, [e * 3 for e in expect])


def test_planes_only_training_improves(rng):
    """Integration: planes-only fit on a fixed target lowers the loss
    (the Feature_Planes_Only stage in miniature, SURVEY.md §4)."""
    cfg, dc, df, _, _, planes, box, rays, _, rcfg = _setup(rng)
    target = jnp.full((64, 3), 0.8, dtype=jnp.float32)  # fittable target
    flags = StepFlags()
    import optax
    opt = optax.adam(5e-2)
    state = opt.init(planes)
    losses = []
    for i in range(40):
        metrics, grads = train_step(dc, df, None, planes, box, rays, target,
                                    jax.random.PRNGKey(i), model_cfg=cfg,
                                    sr_cfg=None, rcfg=rcfg, flags=flags)
        updates, state = opt.update(grads["planes"], state, planes)
        planes = optax.apply_updates(planes, updates)
        losses.append(float(metrics["loss"]))
    # two independent random decoders share one plane set, so the joint
    # floor is high; assert a solid monotone-ish decrease
    assert losses[-1] < 0.75 * losses[0], losses[::10]
    assert losses[-1] == min(losses[-5:]) or losses[-1] < losses[0] * 0.75


def test_module_optimizer_virtual_batch(rng):
    params = {"w": jnp.ones((3,))}
    mo = ModuleOptimizer(params, lr=0.1)
    g = {"w": jnp.ones((3,))}
    mo.accumulate(g)
    mo.accumulate(g)
    mo.step()
    assert float(mo.params["w"][0]) < 1.0
    assert mo._accum is None
    mo.step()  # no accumulated grads -> no-op
    after = float(mo.params["w"][0])
    mo.step()
    assert float(mo.params["w"][0]) == after


def test_select_random_rays(rng):
    image = rng.random((8, 8, 4)).astype(np.float32)
    ro = np.arange(8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    host_rng = np.random.default_rng(0)
    ro_s, rd_s, t = select_random_rays(host_rng, image, ro, ro, 16)
    assert ro_s.shape == (16, 3) and t.shape == (16, 4)
    # rays match their pixels
    flat_idx = ro_s[:, 0] / 3
    rows, cols = (flat_idx // 8).astype(int), (flat_idx % 8).astype(int)
    np.testing.assert_allclose(t, image[rows, cols])

"""Parity tests for the plane-SR stack against torch re-derivations of
the reference EDSR/PlanesSR/SRResNet (models.py:769-926, 1021-1145)."""

import math

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from nvsr_tpu.models.plane_sr import (
    PlaneSRConfig,
    apply_edsr,
    apply_plane_sr,
    apply_srresnet,
    edsr_layer_plan,
    init_plane_sr_params,
    pixel_shuffle,
    sr_scale_factor,
)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 16, 5, 7)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_edsr_layer_plan_full_config():
    """TrainModels.yml geometry: 32 blocks, scale 4 -> pad 67.75."""
    plan = edsr_layer_plan(32, 4)
    assert plan["required_padding_raw"] == 1 + 64 + 1 + 1 + 0.5 + 0.25
    cfg = PlaneSRConfig(n_blocks=32, scale_factor=4)
    assert cfg.required_padding == 68
    assert cfg.hr_overpadding == 68 * 4 - int(67.75 * 4)  # == 1


def test_edsr_receptive_field_bound():
    plan = edsr_layer_plan(4, 2, receptive_field_bound=9)
    # after the bound is reached, layers become 1x1
    assert plan["conv_input"] == 3
    assert 1 in plan["blocks"] or plan["conv_output"] == 1


def _torch_edsr_forward(params, plan, x):
    """Re-derivation of reference EDSR.forward with VALID convs
    (models.py:769-822)."""
    t = torch.from_numpy(x)

    def conv(w, x):
        return torch.nn.functional.conv2d(x, torch.from_numpy(np.asarray(w)))

    out = conv(params["conv_input"]["w"], t)
    h = out
    for blk in params["blocks"]:
        k = np.asarray(blk["conv1"]["w"]).shape[-1]
        identity = h if k == 1 else h[..., 2:-2, 2:-2]
        y = conv(blk["conv2"]["w"], torch.relu(conv(blk["conv1"]["w"], h)))
        h = identity + 0.1 * y
    h = conv(params["conv_mid"]["w"], h)
    for up in params["upscale"]:
        h = torch.nn.functional.pixel_shuffle(conv(up["w"], h), 2)
    return conv(params["conv_output"]["w"], h).numpy()


@pytest.mark.parametrize("scale", [2, 4])
def test_edsr_matches_torch(rng, scale):
    cfg = PlaneSRConfig(in_channels=4, out_channels=4, hidden_size=8,
                        n_blocks=2, scale_factor=scale)
    params = init_plane_sr_params(jax.random.PRNGKey(0), cfg)
    pad = cfg.required_padding
    x = rng.standard_normal((1, 4, 10 + 2 * pad, 10 + 2 * pad)).astype(
        np.float32)
    ours = np.asarray(apply_edsr(params["inner"], cfg, jnp.asarray(x)))
    plan = edsr_layer_plan(cfg.n_blocks, cfg.scale_factor)
    ref = _torch_edsr_forward(params["inner"], plan, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scale", [2, 4])
def test_full_plane_sr_shape_and_residual(rng, scale):
    """SR output is exactly R*scale and reduces to the bilinear upsample
    when the conv stack outputs ~zero (fresh init is ~1e-3 scale)."""
    cfg = PlaneSRConfig(in_channels=4, out_channels=4, hidden_size=8,
                        n_blocks=2, scale_factor=scale)
    params = init_plane_sr_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(rng.standard_normal((3, 4, 12, 12)).astype(np.float32))
    out = apply_plane_sr(params, cfg, planes)
    assert out.shape == (3, 4, 12 * scale, 12 * scale)
    from nvsr_tpu.ops.resize import upsample_plane
    residual = upsample_plane(planes, scale)
    # Kaiming/10 init => the learned difference is small
    assert float(jnp.abs(out - residual).max()) < 1.0
    assert float(jnp.abs(out - residual).max()) > 0  # but not exactly zero


def _torch_srresnet_forward(params, x, no_bn):
    """Re-derivation of reference SRResNet._forward_impl
    (models.py:1111-1124) in eval mode."""
    t = torch.from_numpy(x)

    def conv(p, x, pad):
        w = torch.from_numpy(np.asarray(p["w"]))
        b = torch.from_numpy(np.asarray(p["b"])) if "b" in p else None
        return torch.nn.functional.conv2d(x, w, b, padding=pad)

    def prelu(a, x):
        return torch.nn.functional.prelu(x, torch.tensor([float(a)]))

    def bn(p, x):
        return torch.nn.functional.batch_norm(
            x, torch.from_numpy(np.asarray(p["mean"])),
            torch.from_numpy(np.asarray(p["var"])),
            torch.from_numpy(np.asarray(p["scale"])),
            torch.from_numpy(np.asarray(p["bias"])), training=False, eps=1e-5)

    h1 = prelu(params["prelu1"], conv(params["conv1"], t, 4))
    h = h1
    for blk in params["blocks"]:
        y = conv(blk["conv1"], h, 1)
        if not no_bn:
            y = bn(blk["bn1"], y)
        y = prelu(blk["prelu"], y)
        y = conv(blk["conv2"], y, 1)
        if not no_bn:
            y = bn(blk["bn2"], y)
        h = h + y
    h2 = conv(params["conv2"], h, 1)
    if not no_bn:
        h2 = bn(params["bn2"], h2)
    h = h1 + h2
    for up in params["upscale"]:
        h = prelu(up["prelu"],
                  torch.nn.functional.pixel_shuffle(conv(up["conv"], h, 1), 2))
    return conv(params["conv3"], h, 4).numpy()


@pytest.mark.parametrize("no_bn", [True, False])
def test_srresnet_matches_torch(rng, no_bn):
    cfg = PlaneSRConfig(arch="SRResNet", in_channels=4, out_channels=4,
                        hidden_size=8, n_blocks=2, scale_factor=2,
                        no_batch_norm=no_bn)
    params = init_plane_sr_params(jax.random.PRNGKey(1), cfg)
    x = rng.standard_normal((1, 4, 12, 12)).astype(np.float32)
    ours = np.asarray(apply_srresnet(params["inner"], cfg, jnp.asarray(x),
                                     train=False))
    ref = _torch_srresnet_forward(params["inner"], x, no_bn)
    assert ours.shape == (1, 4, 24, 24)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_input_normalization_applied(rng):
    cfg = PlaneSRConfig(in_channels=4, out_channels=4, hidden_size=8,
                        n_blocks=1, scale_factor=2, input_normalization=True)
    params = init_plane_sr_params(jax.random.PRNGKey(0), cfg)
    params["norm"]["mean"] = jnp.zeros(4)
    params["norm"]["std"] = jnp.ones(4)
    planes = jnp.asarray(rng.standard_normal((1, 4, 8, 8)).astype(np.float32))
    out = apply_plane_sr(params, cfg, planes)
    assert bool(jnp.isfinite(out).all())


def test_sr_scale_factor():
    assert sr_scale_factor("linear", 4) == 4
    assert sr_scale_factor("sqrt", 4) == 2
    assert sr_scale_factor(8, 4) == 8


def test_gradients_flow_through_sr(rng):
    cfg = PlaneSRConfig(in_channels=2, out_channels=2, hidden_size=4,
                        n_blocks=1, scale_factor=2)
    params = init_plane_sr_params(jax.random.PRNGKey(0), cfg)
    planes = jnp.asarray(rng.standard_normal((1, 2, 8, 8)).astype(np.float32))

    def loss(p, pl):
        return jnp.sum(apply_plane_sr(p, cfg, pl) ** 2)

    gp, gpl = jax.grad(loss, argnums=(0, 1))(params, planes)
    assert float(jnp.abs(gp["inner"]["conv_input"]["w"]).sum()) > 0
    assert float(jnp.abs(gpl).sum()) > 0


def test_bf16_compute_path(rng):
    """bfloat16 conv path: close to f32 and differentiable."""
    cfg32 = PlaneSRConfig(in_channels=4, out_channels=4, hidden_size=8,
                          n_blocks=2, scale_factor=2)
    cfg16 = PlaneSRConfig(in_channels=4, out_channels=4, hidden_size=8,
                          n_blocks=2, scale_factor=2,
                          compute_dtype="bfloat16")
    params = init_plane_sr_params(jax.random.PRNGKey(0), cfg32)
    planes = jnp.asarray(rng.standard_normal((2, 4, 10, 10)).astype(
        np.float32))
    o32 = np.asarray(apply_plane_sr(params, cfg32, planes))
    o16 = np.asarray(apply_plane_sr(params, cfg16, planes))
    assert o16.dtype == np.float32  # residual add restores f32
    np.testing.assert_allclose(o16, o32, atol=2e-2)
    g = jax.grad(lambda p: jnp.sum(
        apply_plane_sr(p, cfg16, planes, train=True) ** 2))(params)
    assert float(jnp.abs(g["inner"]["conv_input"]["w"]).sum()) > 0


def test_tiled_edsr_matches_full_plane():
    """tile_size path == full-plane path exactly (VALID convs make
    tiling with a required_padding halo lossless), including non-tile-
    multiple plane sizes and gradients."""
    import jax

    cfg_full = PlaneSRConfig(in_channels=3, out_channels=3, hidden_size=8,
                             n_blocks=2, scale_factor=2)
    cfg_tile = PlaneSRConfig(**{**cfg_full.__dict__, "tile_size": 7})
    key = jax.random.PRNGKey(0)
    params = init_plane_sr_params(key, cfg_full)
    lr = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 19, 23))

    full = apply_plane_sr(params, cfg_full, lr)
    tiled = apply_plane_sr(params, cfg_tile, lr)
    assert tiled.shape == full.shape == (2, 3, 38, 46)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               rtol=2e-5, atol=2e-6)

    def loss_full(p):
        return jnp.sum(apply_plane_sr(p, cfg_full, lr) ** 2)

    def loss_tile(p):
        return jnp.sum(apply_plane_sr(p, cfg_tile, lr) ** 2)

    g_full = jax.grad(loss_full)(params)
    g_tile = jax.grad(loss_tile)(params)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_tile)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_remat_every_and_train_batch_equal_base(rng):
    """remat_every segments and train_batch are schedule knobs only:
    values AND grads must equal the per-block-remat lax.map base path
    (they re-run the same convs in a different order/grouping)."""
    base_cfg = PlaneSRConfig(in_channels=4, out_channels=4, hidden_size=8,
                             n_blocks=4, scale_factor=2)
    params = init_plane_sr_params(jax.random.PRNGKey(0), base_cfg)
    x = jnp.asarray(rng.standard_normal((3, 4, 6, 5)).astype(np.float32))

    def loss_fn(cfg):
        def loss(params):
            y = apply_plane_sr(params, cfg, x, train=True)
            return jnp.mean(y ** 2)
        return jax.value_and_grad(loss)

    v0, g0 = loss_fn(base_cfg)(params)
    for variant in (
        PlaneSRConfig(**{**base_cfg.__dict__, "remat_every": 3}),
        PlaneSRConfig(**{**base_cfg.__dict__, "remat": False}),
        PlaneSRConfig(**{**base_cfg.__dict__, "train_batch": True}),
        PlaneSRConfig(**{**base_cfg.__dict__, "train_batch": True,
                         "remat_every": 2}),
    ):
        v, g = loss_fn(variant)(params)
        np.testing.assert_allclose(float(v), float(v0), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

def test_conv_impl_mm_matches_xla(rng):
    """conv_impl='mm' (k^2 shifted dot_generals, round 4) matches the
    XLA conv lowering in values AND grads on both architectures —
    f32 exactly (both accumulate in f32), bf16 to one-rounding
    tolerance."""
    for arch, kw in (("EDSR", dict(n_blocks=3)),
                     ("SRResNet", dict(n_blocks=2))):
        base_cfg = PlaneSRConfig(arch=arch, in_channels=4, out_channels=4,
                                 hidden_size=8, scale_factor=2, **kw)
        params = init_plane_sr_params(jax.random.PRNGKey(0), base_cfg)
        x = jnp.asarray(rng.standard_normal((2, 4, 7, 6)).astype(np.float32))

        def loss_fn(cfg):
            def loss(params):
                y = apply_plane_sr(params, cfg, x, train=True)
                return jnp.mean(y ** 2)
            return jax.value_and_grad(loss)

        v0, g0 = loss_fn(base_cfg)(params)
        mm_cfg = PlaneSRConfig(**{**base_cfg.__dict__, "conv_impl": "mm"})
        v, g = loss_fn(mm_cfg)(params)
        np.testing.assert_allclose(float(v), float(v0), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)

        bf_xla = PlaneSRConfig(**{**base_cfg.__dict__,
                                  "compute_dtype": "bfloat16"})
        bf_mm = PlaneSRConfig(**{**bf_xla.__dict__, "conv_impl": "mm"})
        ya = apply_plane_sr(params, bf_xla, x)
        yb = apply_plane_sr(params, bf_mm, x)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                                   atol=3e-2, rtol=0)

"""Conversion tests: build reference-layout torch models, convert, and
check forward parity through our implementations."""

import numpy as np
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from nvsr_tpu.convert import (
    convert_nerf_mlp,
    convert_par_file,
    convert_plane_sr,
    convert_triplane_decoder,
)
from nvsr_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp
from nvsr_tpu.models.plane_sr import PlaneSRConfig, apply_plane_sr
from nvsr_tpu.models.triplane import TriplaneConfig, apply_triplane


def _build_reference_decoder_sd(cfg: TriplaneConfig, ensemble=True, seed=0):
    """Construct a state_dict with the reference's key layout
    (models.py:169-195)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(prefix, i, o):
        sd[prefix + ".weight"] = torch.randn(o, i, generator=g) * 0.2
        sd[prefix + ".bias"] = torch.randn(o, generator=g) * 0.1

    for m in range(1):
        pref = f".{m}" if ensemble else ""
        lin(f"density_dec{pref}.0", cfg.density_in_channels,
            cfg.dec_channels)
        for ln in range(cfg.dec_density_layers - 1):
            lin(f"density_dec{pref}.{ln + 1}", cfg.dec_channels,
                cfg.dec_channels)
        lin(f"fc_alpha{pref}", cfg.dec_channels, 1)
        lin(f"rgb_dec{pref}.0", cfg.rgb_in_channels, cfg.dec_channels)
        for ln in range(cfg.dec_rgb_layers - 1):
            lin(f"rgb_dec{pref}.{ln + 1}", cfg.dec_channels,
                cfg.dec_channels)
        lin(f"fc_rgb{pref}", cfg.dec_channels, 3)
    if not ensemble:
        sd = {k.replace(".0.", ".", 1) if False else k: v
              for k, v in sd.items()}
    base = torch.eye(3)
    for d, mat in enumerate([base, base[:, [1, 0, 2]], base[:, [2, 0, 1]]]):
        sd[f"coord_projector.rot_mats_NON_LEARNED.{d}"] = mat
    return sd


def test_decoder_conversion_forward_parity(rng):
    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=4,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos")
    sd = _build_reference_decoder_sd(cfg)
    params, rot = convert_triplane_decoder(sd)
    assert rot.shape == (3, 3, 3)
    params = jax.tree.map(jnp.asarray, params)
    planes = jnp.asarray(rng.standard_normal((3, 4, 8, 8)).astype(np.float32))
    pv = jnp.asarray(rng.standard_normal((4, 4, 4)).astype(np.float32))
    box = np.stack([[-2, -2, -2, -np.pi, -np.pi / 2],
                    [2, 2, 2, np.pi, np.pi / 2]]).astype(np.float32)
    pts = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    dirs = rng.standard_normal((16, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    x = jnp.asarray(np.concatenate([pts, dirs], -1))
    out = apply_triplane(params, cfg, planes, pv, box, x,
                         rot_mats=np.asarray(rot))
    assert out.shape == (16, 4)
    assert bool(jnp.isfinite(out).all())
    # weight orientation: our w is the transpose of torch's
    w_torch = np.asarray(sd["density_dec.0.0.weight"])
    np.testing.assert_allclose(
        np.asarray(params["members"][0]["density"][0]["w"]), w_torch.T)


def test_legacy_decoder_layout_migrated():
    cfg = TriplaneConfig(dec_channels=8, num_plane_channels=4)
    sd = _build_reference_decoder_sd(cfg)
    legacy = {k.replace(".0.", ".", 1) if "NON_LEARNED" not in k else k: v
              for k, v in sd.items()}
    params, _ = convert_triplane_decoder(legacy)
    assert len(params["members"]) == 1
    assert len(params["members"][0]["density"]) == cfg.dec_density_layers


def test_nerf_mlp_conversion_parity(rng):
    cfg = NeRFMLPConfig(num_layers=4, hidden_size=16,
                        num_encoding_fn_xyz=2, num_encoding_fn_dir=1)
    g = torch.Generator().manual_seed(1)
    sd = {}

    def lin(prefix, i, o):
        sd[prefix + ".weight"] = torch.randn(o, i, generator=g) * 0.2
        sd[prefix + ".bias"] = torch.randn(o, generator=g) * 0.1

    lin("layer1", cfg.dim_xyz, 16)
    for i in range(3):
        lin(f"layers_xyz.{i}", 16, 16)
    lin("layers_dir.0", cfg.dim_dir + 16, 8)
    lin("fc_alpha", 16, 1)
    lin("fc_rgb", 8, 3)
    lin("fc_feat", 16, 16)
    params = jax.tree.map(jnp.asarray, convert_nerf_mlp(sd))
    x = jnp.asarray(rng.standard_normal(
        (8, cfg.dim_xyz + cfg.dim_dir)).astype(np.float32))
    out = apply_nerf_mlp(params, cfg, x)
    assert out.shape == (8, 4) and bool(jnp.isfinite(out).all())


def test_plane_sr_conversion_forward_parity(rng):
    cfg = PlaneSRConfig(in_channels=4, out_channels=4, hidden_size=8,
                        n_blocks=2, scale_factor=2)
    g = torch.Generator().manual_seed(2)

    def conv(o, i, k):
        return torch.randn(o, i, k, k, generator=g) * 0.05

    sd = {
        "inner_model.conv_input.weight": conv(8, 4, 3),
        "inner_model.conv_mid.weight": conv(8, 8, 3),
        "inner_model.upscale.0.weight": conv(32, 8, 3),
        "inner_model.conv_output.weight": conv(4, 8, 3),
    }
    for i in range(2):
        sd[f"inner_model.residual.{i}.conv1.weight"] = conv(8, 8, 3)
        sd[f"inner_model.residual.{i}.conv2.weight"] = conv(8, 8, 3)
    params = jax.tree.map(jnp.asarray, convert_plane_sr(sd))
    planes = jnp.asarray(rng.standard_normal((1, 4, 10, 10)).astype(
        np.float32))
    out = apply_plane_sr(params, cfg, planes)
    assert out.shape == (1, 4, 20, 20)
    assert bool(jnp.isfinite(out).all())
    # legacy layout without inner_model prefix converts identically
    legacy = {k.replace("inner_model.", ""): v for k, v in sd.items()}
    params2 = jax.tree.map(jnp.asarray, convert_plane_sr(legacy))
    out2 = apply_plane_sr(params2, cfg, planes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_par_conversion(rng):
    par = {
        "params": {
            "sclego_DS8_PlRes16_8_D0": torch.randn(1, 4, 16, 16),
            "sclego_DS8_PlRes16_8_D1": torch.randn(1, 4, 16, 16),
            "sclego_DS8_PlRes16_8_D2": torch.randn(1, 4, 16, 16),
            "sclego_DS8_PlRes16_8_D3": torch.randn(1, 4, 8, 8),
        },
        "opt_states": [
            {"step": torch.tensor(5), "exp_avg": torch.randn(1, 4, 16, 16),
             "exp_avg_sq": torch.rand(1, 4, 16, 16)} for _ in range(3)
        ] + [{"step": torch.tensor(5), "exp_avg": torch.randn(1, 4, 8, 8),
              "exp_avg_sq": torch.rand(1, 4, 8, 8)}],
        "coords_normalization": torch.randn(2, 5),
    }
    planes, box, moments = convert_par_file(par)
    assert planes["pos"].shape == (3, 4, 16, 16)
    assert planes["view"].shape == (4, 8, 8)
    assert box.shape == (2, 5)
    assert moments["count"] == 5
    assert moments["mu"]["pos"].shape == (3, 4, 16, 16)
    assert moments["nu"]["view"].shape == (4, 8, 8)

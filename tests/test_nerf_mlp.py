"""Parity test for the baseline NeRF MLP against a torch re-derivation
of the reference FlexibleNeRFModel (models.py:14-108)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from nvsr_tpu.models.nerf_mlp import (
    NeRFMLPConfig,
    apply_nerf_mlp,
    init_nerf_mlp_params,
)


def _lin(p, x):
    return x @ torch.from_numpy(np.asarray(p["w"])) + torch.from_numpy(
        np.asarray(p["b"]))


def _torch_forward(params, cfg, x):
    t = torch.from_numpy(x)
    xyz = t[..., : cfg.dim_xyz]
    h = _lin(params["layer1"], xyz)
    for i, p in enumerate(params["layers_xyz"]):
        if i % cfg.skip_connect_every == 0 and i > 0:
            h = torch.cat([h, xyz], -1)
        h = torch.relu(_lin(p, h))
    if cfg.use_viewdirs:
        view = t[..., cfg.dim_xyz:]
        feat = torch.relu(_lin(params["fc_feat"], h))
        alpha = _lin(params["fc_alpha"], h)
        h = torch.cat([feat, view], -1)
        if cfg.xyz_input_2_dir:
            h = torch.cat([xyz, h], -1)
        for p in params["layers_dir"]:
            h = torch.relu(_lin(p, h))
        rgb = _lin(params["fc_rgb"], h)
        return torch.cat([rgb, alpha], -1).numpy()
    return _lin(params["fc_out"], h).numpy()


CONFIGS = [
    NeRFMLPConfig(),
    NeRFMLPConfig(num_layers=8, skip_connect_every=4, hidden_size=64),
    NeRFMLPConfig(use_viewdirs=False),
    NeRFMLPConfig(xyz_input_2_dir=True),
    # mip path: explicit input dims, no raw xyz
    NeRFMLPConfig(input_dim_xyz=54, input_dim_dir=27, include_input_xyz=False),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_forward_matches_torch(rng, cfg):
    params = init_nerf_mlp_params(jax.random.PRNGKey(0), cfg)
    x = rng.standard_normal((32, cfg.dim_xyz + cfg.dim_dir)).astype(np.float32)
    ours = np.asarray(apply_nerf_mlp(params, cfg, jnp.asarray(x)))
    ref = _torch_forward(params, cfg, x)
    assert ours.shape == (32, 4)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)


def test_dims_match_reference_defaults():
    cfg = NeRFMLPConfig()
    assert cfg.dim_xyz == 3 + 2 * 3 * 6
    assert cfg.dim_dir == 3 + 2 * 3 * 4
    cfg = NeRFMLPConfig(use_viewdirs=False, input_dim_xyz=54, input_dim_dir=27)
    assert cfg.dim_xyz == 81  # dirs folded into xyz (reference models.py:43)

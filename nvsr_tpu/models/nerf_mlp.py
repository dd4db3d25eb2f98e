"""Baseline NeRF MLP (vanilla + Mip-NeRF paths).

Functional re-design of the reference's `FlexibleNeRFModel`
(reference models.py:14-108): an xyz trunk with optional skip concats,
a viewdir head producing rgb, and a density head. Used by the
MipNeRF_baseline.yml workflow (SURVEY.md §3.4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NeRFMLPConfig:
    num_layers: int = 4
    num_layers_dir: int = 1
    dirs_hidden_width_ratio: int = 2
    hidden_size: int = 128
    skip_connect_every: int = 4
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    use_viewdirs: bool = True
    # explicit input dims (used for the mip path where the encoding
    # output dim is not derivable from include_input; reference
    # models.py:38-43)
    input_dim_xyz: Optional[int] = None
    input_dim_dir: Optional[int] = None
    xyz_input_2_dir: bool = False

    @property
    def dim_xyz(self) -> int:
        if self.input_dim_xyz is not None:
            if not self.use_viewdirs and self.input_dim_dir is not None:
                return self.input_dim_xyz + self.input_dim_dir
            return self.input_dim_xyz
        inc = 3 if self.include_input_xyz else 0
        return inc + 2 * 3 * self.num_encoding_fn_xyz

    @property
    def dim_dir(self) -> int:
        if not self.use_viewdirs:
            return 0
        if self.input_dim_xyz is not None:
            return self.input_dim_dir or 0
        inc = 3 if self.include_input_dir else 0
        return inc + 2 * 3 * self.num_encoding_fn_dir


def _init_linear(key, in_dim, out_dim, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def _linear(p, x):
    return x @ p["w"] + p["b"]


def init_nerf_mlp_params(key, cfg: NeRFMLPConfig, dtype=jnp.float32):
    """Parameter pytree mirroring the reference layer plan
    (models.py:51-79)."""
    params = {}
    key, sub = jax.random.split(key)
    params["layer1"] = _init_linear(sub, cfg.dim_xyz, cfg.hidden_size, dtype)
    layers = []
    for i in range(cfg.num_layers - 1):
        key, sub = jax.random.split(key)
        if (i % cfg.skip_connect_every == 0 and i > 0
                and i != cfg.num_layers - 1):
            layers.append(_init_linear(sub, cfg.dim_xyz + cfg.hidden_size,
                                       cfg.hidden_size, dtype))
        else:
            layers.append(_init_linear(sub, cfg.hidden_size, cfg.hidden_size,
                                       dtype))
    params["layers_xyz"] = layers

    if cfg.use_viewdirs:
        dir_hidden = cfg.hidden_size // cfg.dirs_hidden_width_ratio
        layers_dir = []
        key, sub = jax.random.split(key)
        in_dim = (cfg.dim_dir + cfg.hidden_size
                  + (cfg.dim_xyz if cfg.xyz_input_2_dir else 0))
        layers_dir.append(_init_linear(sub, in_dim, dir_hidden, dtype))
        for _ in range(cfg.num_layers_dir - 1):
            key, sub = jax.random.split(key)
            layers_dir.append(_init_linear(sub, dir_hidden, dir_hidden, dtype))
        params["layers_dir"] = layers_dir
        key, k1, k2, k3 = jax.random.split(key, 4)
        params["fc_alpha"] = _init_linear(k1, cfg.hidden_size, 1, dtype)
        params["fc_rgb"] = _init_linear(k2, dir_hidden, 3, dtype)
        params["fc_feat"] = _init_linear(k3, cfg.hidden_size, cfg.hidden_size,
                                         dtype)
    else:
        key, sub = jax.random.split(key)
        params["fc_out"] = _init_linear(sub, cfg.hidden_size, 4, dtype)
    return params


def apply_nerf_mlp(params, cfg: NeRFMLPConfig, x):
    """[N, dim_xyz(+dim_dir)] encoded input -> [N, 4] (rgb, sigma).

    Matches reference models.py:83-108 including the skip-concat
    schedule quirk (the trunk loop tests `i != len(layers_xyz)`, which
    is always true, so the final trunk layer can also receive a skip).
    """
    relu = jax.nn.relu
    xyz = x[..., : cfg.dim_xyz]
    h = _linear(params["layer1"], xyz)
    n = len(params["layers_xyz"])
    for i in range(n):
        if i % cfg.skip_connect_every == 0 and i > 0:
            h = jnp.concatenate([h, xyz], axis=-1)
        h = relu(_linear(params["layers_xyz"][i], h))
    if cfg.use_viewdirs:
        view = x[..., cfg.dim_xyz:]
        feat = relu(_linear(params["fc_feat"], h))
        alpha = _linear(params["fc_alpha"], h)
        h = jnp.concatenate([feat, view], axis=-1)
        if cfg.xyz_input_2_dir:
            h = jnp.concatenate([xyz, h], axis=-1)
        for p in params["layers_dir"]:
            h = relu(_linear(p, h))
        rgb = _linear(params["fc_rgb"], h)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return _linear(params["fc_out"], h)

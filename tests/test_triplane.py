"""Parity tests for the triplane model against a torch re-derivation of
the reference TwoDimPlanesModel forward (models.py:381-421)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from nvsr_tpu.models.triplane import (
    TriplaneConfig,
    apply_triplane,
    combine_all_planes,
    combine_pos_planes,
    init_decoder_params,
    make_rot_mats,
    project_to_planes,
)


def _torch_forward(params_np, cfg, planes_pos, plane_view, box, x):
    """Independent torch re-derivation of the reference forward pass."""
    t = {k: torch.from_numpy(v) if isinstance(v, np.ndarray) else v
         for k, v in params_np.items()}
    x = torch.from_numpy(x)
    box_t = torch.from_numpy(box)
    if cfg.use_viewdirs:
        d = x[..., 3:]
        el = torch.atan2(d[..., 2], torch.sqrt((d[..., :2] ** 2).sum(-1)))
        az = torch.atan2(d[..., 1], d[..., 0])
        x = torch.cat([x[..., :3], torch.stack([az, el], -1)], -1)
    else:
        x = x[..., :3]
    x = 2 * (x - box_t[:1]) / (box_t[1:] - box_t[:1]) - 1

    rot = torch.from_numpy(np.asarray(make_rot_mats(cfg.num_planes)))
    projs = []
    for dpl in range(cfg.num_planes):
        grid = (x[..., :3] @ rot[dpl][:, 1:]).reshape(1, -1, 1, 2)
        plane = torch.from_numpy(planes_pos[dpl])[None]
        s = torch.nn.functional.grid_sample(
            plane, grid, mode=cfg.plane_interp, padding_mode="border",
            align_corners=cfg.align_corners)
        projs.append(s.squeeze(0).squeeze(-1).permute(1, 0))
    if cfg.use_viewdirs:
        grid = x[..., 3:].reshape(1, -1, 1, 2)
        pv = torch.from_numpy(plane_view)[None]
        view = torch.nn.functional.grid_sample(
            pv, grid, mode=cfg.plane_interp, padding_mode="border",
            align_corners=cfg.align_corners).squeeze(0).squeeze(-1).permute(1, 0)

    def combine_pos(tensors):
        if cfg.proj_combination == "sum":
            return torch.stack(tensors, 0).sum(0)
        if cfg.proj_combination == "avg":
            return torch.stack(tensors, 0).mean(0)
        return torch.cat(tensors, 1)

    def combine_all(pos_list, viewdir):
        comb = cfg.viewdir_combination
        if comb != "concat_pos":
            pos = combine_pos(pos_list)
            pos_shape = pos.shape
            v = viewdir
            if comb != "concat" and pos.shape[1] > v.shape[1]:
                pos = pos.reshape(pos_shape[0], v.shape[1], -1)
                v = v.unsqueeze(-1)
        if comb == "sum":
            return (pos + v).reshape(pos_shape)
        if comb == "avg":
            return ((pos + v) / 2).reshape(pos_shape)
        if comb == "mult":
            return (pos * (1 + v)).reshape(pos_shape)
        if comb == "concat":
            return torch.cat([pos, v], 1)
        return torch.cat(pos_list + [viewdir], 1)

    def is_skip(ln):
        if cfg.skip_connect_every is None:
            return False
        return ln % cfg.skip_connect_every == 0 and ln > 0

    projected_xyz = combine_pos(projs)
    h = projected_xyz
    for ln, (w, b) in enumerate(t["density"]):
        if is_skip(ln - 1):
            h = torch.cat([h, projected_xyz], -1)
        h = torch.relu(h @ torch.from_numpy(w) + torch.from_numpy(b))
    alpha = h @ torch.from_numpy(t["fc_alpha"][0]) + torch.from_numpy(
        t["fc_alpha"][1])

    x_rgb = projs
    if cfg.use_viewdirs:
        x_rgb = combine_all(x_rgb, view)
    else:
        x_rgb = combine_pos(x_rgb)
    h = x_rgb
    for ln, (w, b) in enumerate(t["rgb"]):
        if is_skip(ln - 1):
            h = torch.cat([h, x_rgb], -1)
        h = torch.relu(h @ torch.from_numpy(w) + torch.from_numpy(b))
    rgb = h @ torch.from_numpy(t["fc_rgb"][0]) + torch.from_numpy(
        t["fc_rgb"][1])
    return torch.cat([rgb, alpha], -1).numpy()


def _params_to_np(params, member=0):
    m = params["members"][member]
    return {
        "density": [(np.asarray(p["w"]), np.asarray(p["b"]))
                    for p in m["density"]],
        "fc_alpha": (np.asarray(m["fc_alpha"]["w"]),
                     np.asarray(m["fc_alpha"]["b"])),
        "rgb": [(np.asarray(p["w"]), np.asarray(p["b"])) for p in m["rgb"]],
        "fc_rgb": (np.asarray(m["fc_rgb"]["w"]), np.asarray(m["fc_rgb"]["b"])),
    }


def _make_inputs(rng, cfg, res=16, vres=8, n=64):
    planes = rng.standard_normal(
        (cfg.num_planes, cfg.num_plane_channels, res, res)).astype(np.float32)
    pv = rng.standard_normal(
        (cfg.viewdir_channels, vres, vres)).astype(np.float32) \
        if cfg.use_viewdirs else None
    dims = 3 + 2 * cfg.use_viewdirs
    box = np.stack([-2 * np.ones(dims), 2 * np.ones(dims)]).astype(np.float32)
    if cfg.use_viewdirs:
        box[:, 3] = [-np.pi, np.pi]
        box[:, 4] = [-np.pi / 2, np.pi / 2]
    pts = rng.uniform(-1.8, 1.8, (n, 3)).astype(np.float32)
    if cfg.use_viewdirs:
        dirs = rng.standard_normal((n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        pts = np.concatenate([pts, dirs], -1)
    return planes, pv, box, pts


CONFIGS = [
    TriplaneConfig(),                                     # defaults: sum
    TriplaneConfig(proj_combination="avg",
                   viewdir_proj_combination="concat_pos",
                   skip_connect_every=3,
                   dec_rgb_layers=4),                     # TrainModels.yml
    TriplaneConfig(proj_combination="concat",
                   viewdir_proj_combination="concat"),    # full concat
    TriplaneConfig(viewdir_proj_combination="mult"),
    TriplaneConfig(use_viewdirs=False,
                   viewdir_proj_combination=None),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_forward_matches_torch(rng, cfg):
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes, pv, box, pts = _make_inputs(rng, cfg)
    ours = np.asarray(apply_triplane(
        params, cfg, jnp.asarray(planes),
        None if pv is None else jnp.asarray(pv), box, jnp.asarray(pts)))
    ref = _torch_forward(_params_to_np(params), cfg, planes, pv, box, pts)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_rot_mats_projection_convention():
    """d=0 -> (y,z), d=1 -> (x,z), d=2 -> (x,y)."""
    rot = make_rot_mats(3)
    coords = jnp.asarray(np.array([[1.0, 2.0, 3.0]], np.float32))
    g = np.asarray(project_to_planes(coords, rot))
    np.testing.assert_allclose(g[0, 0], [2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(g[1, 0], [1.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(g[2, 0], [1.0, 2.0], atol=1e-6)


def test_rot_mats_many_planes_orthonormal():
    rot = make_rot_mats(5)
    assert rot.shape == (5, 3, 3)
    for m in rot:
        np.testing.assert_allclose(m.T @ m, np.eye(3), atol=1e-5)


def test_combine_shapes():
    projs = jnp.ones((3, 10, 48))
    assert combine_pos_planes(projs, "sum").shape == (10, 48)
    assert combine_pos_planes(projs, "concat").shape == (10, 144)
    view = jnp.ones((10, 48))
    cfg = TriplaneConfig(viewdir_proj_combination="concat_pos")
    assert combine_all_planes(projs, view, cfg).shape == (10, 192)


def test_ensemble_members_differ(rng):
    cfg = TriplaneConfig(ensemble_size=2)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes, pv, box, pts = _make_inputs(rng, cfg, n=16)
    out0 = apply_triplane(params, cfg, jnp.asarray(planes), jnp.asarray(pv),
                          box, jnp.asarray(pts), member=0)
    out1 = apply_triplane(params, cfg, jnp.asarray(planes), jnp.asarray(pv),
                          box, jnp.asarray(pts), member=1)
    assert float(jnp.abs(out0 - out1).max()) > 1e-4


def test_gradients_reach_planes_and_decoder(rng):
    cfg = TriplaneConfig()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    planes, pv, box, pts = _make_inputs(rng, cfg, n=32)

    def loss(planes_, params_):
        out = apply_triplane(params_, cfg, planes_, jnp.asarray(pv), box,
                             jnp.asarray(pts))
        return jnp.sum(out ** 2)

    gp, gd = jax.grad(loss, argnums=(0, 1))(jnp.asarray(planes), params)
    assert float(jnp.abs(gp).sum()) > 0
    assert float(jnp.abs(gd["members"][0]["density"][0]["w"]).sum()) > 0

"""Tests for ray/coordinate geometry against numpy/torch re-derivations."""

import numpy as np
import torch
import jax.numpy as jnp

from nvsr_tpu.ops.geometry import (
    calc_scene_box,
    cart2az_el,
    get_ray_bundle,
    ndc_rays,
    normalize_coords,
)


def _lookat_pose(eye):
    """Simple c2w: camera at `eye` looking at the origin, up = +z."""
    eye = np.asarray(eye, dtype=np.float32)
    forward = -eye / np.linalg.norm(eye)
    right = np.cross(forward, np.array([0.0, 0.0, 1.0], dtype=np.float32))
    right = right / np.linalg.norm(right)
    up = np.cross(right, forward)
    c2w = np.eye(4, dtype=np.float32)
    # camera -z looks forward (OpenGL convention used by Blender data)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = eye
    return c2w


def _torch_ray_bundle(height, width, focal, c2w, offset=0.0):
    """Independent torch re-derivation of the reference ray bundle."""
    t1 = torch.arange(width, dtype=torch.float32) + offset
    t2 = torch.arange(height, dtype=torch.float32) + offset
    ii, jj = torch.meshgrid(t1, t2, indexing="ij")
    ii, jj = ii.transpose(-1, -2), jj.transpose(-1, -2)
    directions = torch.stack(
        [(ii - width * 0.5) / focal, -(jj - height * 0.5) / focal,
         -torch.ones_like(ii)], dim=-1)
    c2w_t = torch.from_numpy(c2w)
    rd = torch.sum(directions[..., None, :] * c2w_t[:3, :3], dim=-1)
    ro = c2w_t[:3, -1].expand(rd.shape)
    return ro.numpy(), rd.numpy()


def test_ray_bundle_matches_torch_rederivation():
    c2w = _lookat_pose([4.0, 0.0, 0.0])
    ro, rd = get_ray_bundle(11, 13, 20.0, jnp.asarray(c2w),
                            downsampling_offset=0.4375)
    ro_t, rd_t = _torch_ray_bundle(11, 13, 20.0, c2w, offset=0.4375)
    np.testing.assert_allclose(np.asarray(ro), ro_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), rd_t, rtol=1e-5, atol=1e-5)


def test_ray_bundle_center_ray_points_at_origin():
    c2w = _lookat_pose([0.0, -3.0, 0.0])
    H = W = 9
    ro, rd = get_ray_bundle(H, W, 50.0, jnp.asarray(c2w))
    center = np.asarray(rd[H // 2, W // 2])
    center = center / np.linalg.norm(center)
    expected = -np.asarray(c2w[:3, 3]) / np.linalg.norm(c2w[:3, 3])
    np.testing.assert_allclose(center, expected, atol=0.2)


def test_ndc_rays_reference_formula(rng):
    H, W, focal = 24, 32, 30.0
    ro = rng.standard_normal((10, 3)).astype(np.float32)
    rd = rng.standard_normal((10, 3)).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5  # rays looking down -z
    ro[:, 2] = np.abs(ro[:, 2]) + 2.0
    o, d = ndc_rays(H, W, focal, 1.0, jnp.asarray(ro), jnp.asarray(rd))

    t = -(1.0 + ro[:, 2]) / rd[:, 2]
    ro2 = ro + t[:, None] * rd
    o_ref = np.stack([
        -1.0 / (W / (2 * focal)) * ro2[:, 0] / ro2[:, 2],
        -1.0 / (H / (2 * focal)) * ro2[:, 1] / ro2[:, 2],
        1.0 + 2.0 / ro2[:, 2]], -1)
    np.testing.assert_allclose(np.asarray(o), o_ref, rtol=1e-4, atol=1e-5)
    assert d.shape == (10, 3)


def test_cart2az_el():
    dirs = np.array([
        [1.0, 0.0, 0.0],   # az=0, el=0
        [0.0, 1.0, 0.0],   # az=pi/2, el=0
        [0.0, 0.0, 1.0],   # el=pi/2
        [-1.0, 0.0, 0.0],  # az=pi
    ], dtype=np.float32)
    out = np.asarray(cart2az_el(jnp.asarray(dirs)))
    expected = np.array([[0, 0], [np.pi / 2, 0], [0, np.pi / 2], [np.pi, 0]],
                        dtype=np.float32)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_normalize_coords_maps_box_to_unit():
    box = np.array([[0.0, -2.0, 5.0], [4.0, 2.0, 9.0]], dtype=np.float32)
    pts = np.stack([box[0], box[1], (box[0] + box[1]) / 2])
    out = np.asarray(normalize_coords(jnp.asarray(pts), box))
    expected = np.stack([-np.ones(3), np.ones(3), np.zeros(3)])
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_calc_scene_box_contains_frustum_points():
    poses = np.stack([_lookat_pose([4.0, 0, 0])[:3], _lookat_pose([0, 4.0, 0])[:3]])
    geom = {
        "camera_poses": poses,
        "near": 2.0, "far": 6.0,
        "H": [10, 10], "W": [10, 10], "f": [12.0, 12.0],
    }
    box = calc_scene_box(geom, including_dirs=True, no_ndc=True)
    assert box.shape == (2, 5)
    assert np.all(box[1, :3] > box[0, :3])
    # default dir bounds
    np.testing.assert_allclose(box[:, 3], [-np.pi, np.pi], atol=1e-6)
    np.testing.assert_allclose(box[:, 4], [-np.pi / 2, np.pi / 2], atol=1e-6)
    # near/far points on the optical axis must be inside
    assert box[0, 0] <= 4.0 - 6.0 and box[1, 0] >= 4.0 - 2.0

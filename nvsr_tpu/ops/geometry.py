"""Ray and coordinate geometry (pure jnp, jit-safe).

Re-derives the reference's ray/geometry math with identical numerics:
  * ray bundles with sub-pixel downsampling offsets
    (reference: nerf_helpers.py:507-549, train_nerf.py:610)
  * NDC reparameterization for forward-facing LLFF scenes
    (reference: nerf_helpers.py:578-605)
  * cartesian -> (azimuth, elevation) for view-direction planes
    (reference: nerf_helpers.py:492-496)
  * per-scene bounding-box computation for coordinate normalization
    (reference: nerf_helpers.py:440-490) — host-side numpy, runs once
    per scene at dataset build.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _focal_x(focal):
    """Focal used for the x (width) direction.

    The reference divides the x term by `get_focal(focal,'H')` which is
    `focal[1]` for anisotropic (list) focals (nerf_helpers.py:432-437,539).
    We preserve that convention.
    """
    if isinstance(focal, (tuple, list)):
        return focal[1]
    return focal


def _focal_y(focal):
    if isinstance(focal, (tuple, list)):
        return focal[0]
    return focal


def pixel_grid(height: int, width: int, downsampling_offset: float = 0.0,
               padding_size: int = 0, dtype=jnp.float32):
    """Pixel-center coordinate maps (x_map, y_map) of shape [H+2p, W+2p].

    x varies along the last axis. Matches reference meshgrid_xy
    (nerf_helpers.py:396-406) + offset handling (nerf_helpers.py:530-536).
    """
    xs = jnp.arange(width + 2 * padding_size, dtype=dtype) + downsampling_offset
    ys = jnp.arange(height + 2 * padding_size, dtype=dtype) + downsampling_offset
    if padding_size > 0:
        xs = xs - padding_size
        ys = ys - padding_size
    x_map, y_map = jnp.meshgrid(xs, ys, indexing="xy")
    return x_map, y_map


def get_ray_bundle(height: int, width: int, focal, c2w,
                   padding_size: int = 0, downsampling_offset: float = 0.0):
    """Per-pixel ray origins and directions.

    Args:
      height, width: image size in pixels (static).
      focal: scalar focal length in pixels, or [fx-like, fy-like] pair.
      c2w: [4,4] or [3,4] camera-to-world transform.
      downsampling_offset: sub-pixel offset (d-1)/(2d) matching the
        image-downsampling convention (reference train_nerf.py:610).

    Returns:
      (ray_origins [H,W,3], ray_directions [H,W,3]); directions are NOT
      normalized (matching the reference).
    """
    c2w = jnp.asarray(c2w)
    x_map, y_map = pixel_grid(height, width, downsampling_offset, padding_size,
                              dtype=c2w.dtype)
    directions = jnp.stack(
        [
            (x_map - width * 0.5) / _focal_x(focal),
            -(y_map - height * 0.5) / _focal_y(focal),
            -jnp.ones_like(x_map),
        ],
        axis=-1,
    )
    # Rotate camera-frame dirs into world frame: sum over the camera axis.
    ray_directions = jnp.sum(directions[..., None, :] * c2w[:3, :3], axis=-1)
    ray_origins = jnp.broadcast_to(c2w[:3, -1], ray_directions.shape)
    return ray_origins, ray_directions


def get_rays_at(rows, cols, height, width, focal, c2w,
                downsampling_offset=0.0):
    """Ray origins/directions for SELECTED pixels only (jit-safe).

    Computes the same rays as `get_ray_bundle(...)[rows, cols]`
    (reference nerf_helpers.py:507-549 composed with the driver's random
    ray subset, train_nerf.py:838-845) without materializing — or
    transferring — the full H x W ray maps: the training loop only ever
    consumes `num_random_rays` of them. height/width/focal/offset may be
    traced scalars so one compilation serves every image size.

    Returns (ray_origins [N,3], ray_directions [N,3]).
    """
    c2w = jnp.asarray(c2w)
    dt = c2w.dtype
    x = cols.astype(dt) + downsampling_offset
    y = rows.astype(dt) + downsampling_offset
    directions = jnp.stack(
        [
            (x - width * 0.5) / _focal_x(focal),
            -(y - height * 0.5) / _focal_y(focal),
            -jnp.ones_like(x),
        ],
        axis=-1,
    )
    ray_directions = jnp.sum(directions[..., None, :] * c2w[:3, :3], axis=-1)
    ray_origins = jnp.broadcast_to(c2w[:3, -1], ray_directions.shape)
    return ray_origins, ray_directions


def ndc_rays(height, width, focal, near, rays_o, rays_d):
    """Shift ray origins to the near plane and project to NDC space.

    Matches reference nerf_helpers.py:578-605 exactly.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (width / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (height / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = (-1.0 / (width / (2.0 * focal))
          * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]))
    d1 = (-1.0 / (height / (2.0 * focal))
          * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]))
    d2 = -2.0 * near / rays_o[..., 2]

    return (jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1))


def cart2az_el(dirs):
    """Unit direction -> (azimuth, elevation).

    el = atan2(z, |xy|); az = atan2(y, x). Matches reference
    nerf_helpers.py:492-496 (output stacked [az, el]).
    """
    el = jnp.arctan2(dirs[..., 2], jnp.sqrt(jnp.sum(dirs[..., :2] ** 2, -1)))
    az = jnp.arctan2(dirs[..., 1], dirs[..., 0])
    return jnp.stack([az, el], -1)


def normalize_coords(coords, box):
    """Map coords into [-1, 1] with a per-scene box.

    Args:
      coords: [..., D] raw coordinates (xyz or xyz+az/el).
      box: [2, D] rows = (min, max), from `calc_scene_box`.

    Matches reference models.py:261-268.
    """
    box = jnp.asarray(box, dtype=coords.dtype)
    return 2.0 * (coords - box[:1]) / (box[1:] - box[:1]) - 1.0


# ---------------------------------------------------------------------------
# Host-side scene-box computation (numpy; runs once per scene at build time).
# ---------------------------------------------------------------------------

def _cart2az_el_np(d):
    el = np.arctan2(d[2], np.sqrt(d[0] ** 2 + d[1] ** 2))
    az = np.arctan2(d[1], d[0])
    return np.array([az, el])


def calc_scene_box(scene_geometry: dict, including_dirs: bool, no_ndc: bool,
                   adjust_az_range=False, adjust_elevation_range=False,
                   exhaustive_check: int = 10) -> np.ndarray:
    """Axis-aligned bound of all frustum sample points at near/far.

    Args:
      scene_geometry: {'camera_poses': [F,3,4] (or [F,4,4]), 'near', 'far',
        'H': [F], 'W': [F], 'f': [F] (scalar or [fx,fy] per frame)}.
      including_dirs: also bound (az, el); default az range is [-pi, pi]
        and el range [-pi/2, pi/2] unless adjustment is requested.

    Returns:
      [2, 3(+2)] array, rows = (min, max). Matches reference
      nerf_helpers.py:440-490 (including its 12-point-per-edge pixel
      subsampling with EXHAUSTIVE_CHECK=10).
    """
    def list2pix(end_pixels):
        if exhaustive_check:
            if exhaustive_check == -1:
                return list(range(end_pixels[0], end_pixels[1]))
            return np.unique(
                np.round(np.linspace(end_pixels[0], end_pixels[1],
                                     2 + exhaustive_check)).astype(int))
        return end_pixels

    poses = np.asarray(scene_geometry["camera_poses"])
    num_frames = len(poses)
    dims = 3 + 2 * int(including_dirs)
    box = [[np.finfo(np.float64).max, np.finfo(np.float64).min]
           for _ in range(dims)]
    for f_num in range(num_frames):
        pose = poses[f_num]
        origin_ = pose[:3, -1]
        H = scene_geometry["H"][f_num]
        W = scene_geometry["W"][f_num]
        focal = scene_geometry["f"][f_num]
        for col in list2pix([0, W - 1]):
            for row in list2pix([0, H - 1]):
                coord = np.array([
                    (col - W / 2) / _focal_x(focal),
                    -(row - H / 2) / _focal_y(focal),
                    -1.0,
                ])
                direction = np.sum(coord * pose[:3, :3], axis=-1)
                normed_dir = direction / np.linalg.norm(direction)
                if no_ndc:
                    origin = origin_.copy()
                    dir_ = direction
                else:
                    assert not isinstance(focal, (list, tuple)), \
                        "anisotropic focal not supported with NDC"
                    o, d = ndc_rays(H, W, focal, 1.0,
                                    jnp.asarray(origin_), jnp.asarray(direction))
                    origin, dir_ = np.asarray(o), np.asarray(d)
                for dist in (scene_geometry["near"], scene_geometry["far"]):
                    point = origin + dist * dir_
                    for d3 in range(3):
                        box[d3][0] = min(box[d3][0], point[d3])
                        box[d3][1] = max(box[d3][1], point[d3])
                if including_dirs and (adjust_az_range or adjust_elevation_range):
                    az_el = _cart2az_el_np(normed_dir)
                    for d2 in range(int(not adjust_az_range), 2):
                        box[3 + d2][0] = min(box[3 + d2][0], az_el[d2])
                        box[3 + d2][1] = max(box[3 + d2][1], az_el[d2])
    if including_dirs:
        if not adjust_az_range:
            box[3] = [-np.pi, np.pi]
        if not adjust_elevation_range:
            box[4] = [-np.pi / 2, np.pi / 2]
        else:
            center = np.mean(box[4])
            box[4] = list(adjust_elevation_range * (np.array(box[4]) - center)
                          + center)
    return np.array(box, dtype=np.float32).transpose(1, 0)

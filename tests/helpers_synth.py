"""Synthetic dataset generators for tests: tiny Blender-style and
LLFF-style scene directories created on the fly."""

import json
import os

import imageio.v2 as imageio
import numpy as np


def make_camera(eye):
    eye = np.asarray(eye, dtype=np.float32)
    fwd = -eye / np.linalg.norm(eye)
    ref_up = np.array([0, 0, 1.0], np.float32)
    if abs(np.dot(fwd, ref_up)) > 0.99:
        ref_up = np.array([0, 1.0, 0], np.float32)
    right = np.cross(fwd, ref_up).astype(np.float32)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


def render_gradient_image(size, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                         indexing="ij")
    img = np.stack([xx, yy, 0.3 + 0.4 * xx * yy], -1)
    img += 0.05 * rng.standard_normal(img.shape)
    return np.clip(img, 0, 1)


def write_blender_scene(root, name, n_train=3, n_val=2, n_test=2, size=32,
                        camera_angle_x=0.8):
    """Write transforms_{train,val,test}.json + PNGs like a NeRF-synthetic
    scene folder."""
    scene_dir = os.path.join(root, name)
    os.makedirs(scene_dir, exist_ok=True)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    angles = np.linspace(0, 2 * np.pi, sum(counts.values()), endpoint=False)
    idx = 0
    for split, n in counts.items():
        os.makedirs(os.path.join(scene_dir, split), exist_ok=True)
        frames = []
        for i in range(n):
            a = angles[idx]
            eye = 4.0 * np.array([np.cos(a), np.sin(a), 0.5])
            c2w = make_camera(eye)
            img = render_gradient_image(size, seed=idx)
            rgba = np.concatenate(
                [img, np.ones_like(img[..., :1])], -1)
            fpath = f"{split}/r_{i}"
            imageio.imwrite(os.path.join(scene_dir, fpath + ".png"),
                            (255 * rgba).astype(np.uint8))
            frames.append({"file_path": fpath,
                           "transform_matrix": c2w.tolist()})
            idx += 1
        with open(os.path.join(scene_dir, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames},
                      f)
    return scene_dir


def write_llff_scene(root, name, n_images=6, size=40, focal=35.0):
    """Write images/ + poses_bounds.npy like an LLFF scene folder."""
    scene_dir = os.path.join(root, name)
    img_dir = os.path.join(scene_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for i in range(n_images):
        t = i / n_images
        eye = np.array([0.3 * np.cos(2 * np.pi * t),
                        0.3 * np.sin(2 * np.pi * t), 4.0])
        c2w = make_camera(eye)
        # LLFF poses store [down, right, back] convention; build 3x5
        # [-y, x, z] relative to the OpenGL c2w we construct
        m = np.stack([-c2w[:3, 1], c2w[:3, 0], c2w[:3, 2]], axis=1)
        pose35 = np.concatenate(
            [np.concatenate([m, c2w[:3, 3:4]], 1),
             np.array([[size], [size], [focal]])], 1)
        rows.append(np.concatenate([pose35.reshape(-1), [2.0, 8.0]]))
        img = render_gradient_image(size, seed=i)
        imageio.imwrite(os.path.join(img_dir, f"im_{i:03d}.png"),
                        (255 * img).astype(np.uint8))
    np.save(os.path.join(scene_dir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    return scene_dir

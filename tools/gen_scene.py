"""Analytic multi-view-consistent scene generator (Blender format).

Ray-marches an analytic volume (two colored Gaussian blobs) and writes
`transforms_{train,val,test}.json` + RGBA PNGs exactly like a
NeRF-synthetic scene folder, so BOTH this repo's loader
(nvsr_tpu/data/blender.py) and the reference loader
(/root/reference/load_blender.py:232-332) can consume it. Used by the
reference-parity harness (tools/parity_check.py) and by perf
experiments: the analytic field gives every view pixel-exact ground
truth without external datasets.
"""

import json
import os
import sys

import imageio.v2 as imageio
import numpy as np


def camera(eye):
    eye = np.asarray(eye, np.float32)
    fwd = -eye / np.linalg.norm(eye)
    up0 = np.array([0, 0, 1.0], np.float32)
    if abs(fwd @ up0) > 0.99:
        up0 = np.array([0, 1.0, 0], np.float32)
    r = np.cross(fwd, up0)
    r /= np.linalg.norm(r)
    u = np.cross(r, fwd)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = r, u, -fwd, eye
    return m


def density_rgb(p):
    """Analytic field: red blob at (0.5,0,0), blue at (-0.5,0.3,0.2)."""
    d1 = np.exp(-np.sum((p - np.array([0.5, 0, 0])) ** 2, -1) / 0.15)
    d2 = np.exp(-np.sum((p - np.array([-0.5, 0.3, 0.2])) ** 2, -1) / 0.1)
    sigma = 14 * d1 + 18 * d2
    w1 = d1 / (d1 + d2 + 1e-9)
    w2 = d2 / (d1 + d2 + 1e-9)
    rgb = (w1[..., None] * np.array([0.9, 0.25, 0.2])
           + w2[..., None] * np.array([0.2, 0.35, 0.95]))
    return sigma, rgb


def density_rgb_ring(p):
    """Second scene family (occupancy validation, VERDICT r2 #7):
    an off-center horizontal torus plus an elongated diagonal bar —
    much wider x/y occupancy, thin in z, strongly anisotropic; nothing
    the moments estimator's defaults were tuned on (the blob family is
    two compact isotropic Gaussians near the origin)."""
    q = p - np.array([0.2, -0.1, 0.3])
    ring_r = np.sqrt(q[..., 0] ** 2 + q[..., 1] ** 2) - 1.2
    d1 = np.exp(-(ring_r ** 2 + q[..., 2] ** 2) / 0.06)
    b = p - np.array([-0.3, 0.2, -0.4])
    u = (b[..., 0] + b[..., 1]) / np.sqrt(2)      # bar axis (diagonal)
    v = (b[..., 0] - b[..., 1]) / np.sqrt(2)
    d2 = np.exp(-(u ** 2 / 1.1 + v ** 2 / 0.05 + b[..., 2] ** 2 / 0.05))
    sigma = 16 * d1 + 20 * d2
    w1 = d1 / (d1 + d2 + 1e-9)
    w2 = d2 / (d1 + d2 + 1e-9)
    rgb = (w1[..., None] * np.array([0.95, 0.7, 0.15])
           + w2[..., None] * np.array([0.25, 0.8, 0.45]))
    return sigma, rgb


FIELDS = {"blob": density_rgb, "ring": density_rgb_ring}


def render_view(c2w, size, focal, n_steps=96, near=2.0, far=6.0,
                field=density_rgb):
    ys, xs = np.meshgrid(np.arange(size) + 0.5, np.arange(size) + 0.5,
                         indexing="ij")
    dirs = np.stack([(xs - size / 2) / focal, -(ys - size / 2) / focal,
                     -np.ones_like(xs)], -1)
    rd = dirs @ c2w[:3, :3].T
    ro = c2w[:3, 3]
    t = np.linspace(near, far, n_steps)
    pts = ro + rd[..., None, :] * t[:, None]
    sigma, rgb = field(pts)
    dt = t[1] - t[0]
    alpha = 1 - np.exp(-sigma * dt * np.linalg.norm(rd, axis=-1)[..., None])
    trans = np.cumprod(1 - alpha + 1e-10, axis=-1)
    trans = np.concatenate([np.ones_like(trans[..., :1]), trans[..., :-1]],
                           -1)
    w = alpha * trans
    img = np.sum(w[..., None] * rgb, axis=-2) + (1 - w.sum(-1))[..., None]
    return np.clip(img, 0, 1)


def write_scene(root, name, size, n_train=24, n_val=4, n_test=4,
                camera_angle_x=0.8, field="blob"):
    """Write a Blender-format scene dir; returns its path."""
    field_fn = FIELDS[field]
    scene = os.path.join(root, name)
    os.makedirs(scene, exist_ok=True)
    focal_over_w = 0.5 / np.tan(camera_angle_x / 2)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    idx = 0
    total = sum(counts.values())
    for split, n in counts.items():
        os.makedirs(os.path.join(scene, split), exist_ok=True)
        frames = []
        for i in range(n):
            a = 2 * np.pi * idx / total
            el = 0.35 + 0.25 * np.sin(3 * a)
            eye = 4.0 * np.array([np.cos(a) * np.cos(el),
                                  np.sin(a) * np.cos(el), np.sin(el)])
            c2w = camera(eye)
            img = render_view(c2w, size, focal_over_w * size,
                              field=field_fn)
            rgba = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            fp = f"{split}/r_{i}"
            imageio.imwrite(os.path.join(scene, fp + ".png"),
                            (255 * rgba).astype(np.uint8))
            frames.append({"file_path": fp,
                           "transform_matrix": c2w.tolist()})
            idx += 1
        with open(os.path.join(scene, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames},
                      f)
    return scene


if __name__ == "__main__":
    # usage: gen_scene.py root name size [n_train n_val n_test [field]]
    ints = [int(a) for a in sys.argv[4:7]]
    field = sys.argv[7] if len(sys.argv) > 7 else "blob"
    write_scene(sys.argv[1], sys.argv[2], int(sys.argv[3]), *ints,
                field=field)
    print("scene written")

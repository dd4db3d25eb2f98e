"""Tests for the data layer: degradation resize, Blender/LLFF loaders,
and the multi-scene dataset assembly."""

import numpy as np
import pytest

from helpers_synth import write_blender_scene, write_llff_scene
from nvsr_tpu.data.blender import load_blender_data, spherical_render_poses
from nvsr_tpu.data.dataset import MultiSceneDataset, parse_scene_suffix
from nvsr_tpu.data.imresize import (
    calc_resize_crop_margins,
    cubic_kernel,
    gaussian_2d,
    im_resize,
    imresize_down,
)
from nvsr_tpu.data.llff import load_llff_data, minify
from nvsr_tpu.utils.config import CfgNode


# --- imresize -------------------------------------------------------------

def test_cubic_kernel_properties():
    k = cubic_kernel(4)
    assert k.shape[0] == k.shape[1]
    np.testing.assert_allclose(k.sum(), 16.0, rtol=1e-3)  # sf^2 energy


def test_gaussian_2d_normalized():
    g = gaussian_2d(1.5)
    assert g.shape[0] % 2 == 1
    np.testing.assert_allclose(g.sum(), 1.0, rtol=1e-6)


def test_imresize_down_constant_preserved(rng):
    im = np.full((32, 32, 3), 0.7, dtype=np.float32)
    out = imresize_down(im, 4)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out, 0.7, atol=1e-4)


def test_imresize_down_blur_smooths(rng):
    im = rng.random((32, 32)).astype(np.float32)
    sharp = imresize_down(im, 4)
    blurred = imresize_down(im, 4, blur_sigma=2.0)
    assert np.var(blurred) < np.var(sharp)
    np.testing.assert_allclose(blurred.mean(), sharp.mean(), atol=0.02)


def test_im_resize_degradations(rng, tmp_path):
    im = rng.random((32, 32, 3)).astype(np.float32)
    plain = im_resize(im, 4)
    assert plain.shape == (8, 8, 3)
    blur = im_resize(im, 4, degradation={"type": "blur", "base_factor": 2,
                                         "STD": 1.0})
    assert blur.shape == (8, 8, 3)
    deg = {"type": "noise", "base_factor": 2, "STD": 10.0,
           "path": str(tmp_path / "deg")}
    noisy1 = im_resize(im, 4, degradation=deg, fname="img0")
    noisy2 = im_resize(im, 4, degradation=deg, fname="img0")
    np.testing.assert_array_equal(noisy1, noisy2)  # cached noise


def test_calc_resize_crop_margins():
    assert calc_resize_crop_margins((32, 32), 4) is None
    m = calc_resize_crop_margins((34, 36), 4)
    assert (34 - 2 * m[0]) % 4 == 0 and m[1] == 0
    # an odd dimension can never crop to a multiple of an even factor;
    # the reference asserts there (nerf_helpers.py:320)
    with pytest.raises(AssertionError):
        calc_resize_crop_margins((34, 33), 4)


# --- blender --------------------------------------------------------------

def test_load_blender_scene(tmp_path):
    scene = write_blender_scene(str(tmp_path), "lego", size=32)
    images, poses, render_poses, hwfd, i_split = load_blender_data(
        scene, testskip=1, downsampling_factor=2)
    assert len(images) == 5  # 3 train + 2 val
    assert images[0].shape == (16, 16, 3)
    assert poses.shape == (5, 4, 4)
    assert render_poses.shape == (40, 4, 4)
    assert hwfd[0][0] == 16 and hwfd[3][0] == 2
    assert list(i_split[0]) == [0, 1, 2] and list(i_split[1]) == [3, 4]
    # focal scales with downsampling
    np.testing.assert_allclose(hwfd[2][0],
                               0.5 / np.tan(0.4) * 16, rtol=1e-5)


def test_spherical_render_poses_orbit():
    poses = spherical_render_poses(8, radius=4.0)
    dists = np.linalg.norm(poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(dists, 4.0, rtol=1e-5)


# --- llff -----------------------------------------------------------------

def test_load_llff_scene(tmp_path):
    scene = write_llff_scene(str(tmp_path), "fern", n_images=6, size=40)
    imgs, poses, bds, render_poses, i_test, params = load_llff_data(
        scene, factor=2)
    assert imgs.shape == (6, 20, 20, 3)
    assert poses.shape == (6, 3, 5)
    assert render_poses.shape[0] == 120
    assert 0 <= i_test < 6
    # bd rescale: min bound = 1/0.75
    np.testing.assert_allclose(bds.min(), 1 / 0.75, rtol=1e-5)
    # hwf updated for the factor
    assert poses[0, 0, 4] == 20 and poses[0, 1, 4] == 20


def test_llff_minify(tmp_path):
    import os
    scene = write_llff_scene(str(tmp_path), "fern", n_images=3, size=40)
    minify(scene, factors=[2])
    assert os.path.isdir(os.path.join(scene, "images_2"))
    import imageio.v2 as imageio
    im = imageio.imread(os.path.join(scene, "images_2", "im_000.png"))
    assert im.shape[:2] == (20, 20)


def test_llff_min_eval_frames(tmp_path):
    scene = write_llff_scene(str(tmp_path), "fern", n_images=5, size=40)
    imgs, poses, bds, _, _, _ = load_llff_data(
        scene, factor=2, load_imgs=False, min_eval_frames=12)
    assert poses.shape[0] >= 12
    # real frames interleaved with interpolated (None) frames
    assert imgs[0] is not None and None in imgs


# --- dataset --------------------------------------------------------------

def test_parse_scene_suffix():
    clean, deg = parse_scene_suffix("lego##1", 2, "/tmp")
    assert clean == "lego" and deg is None
    clean, deg = parse_scene_suffix("lego##Gauss1.5", 2, "/tmp")
    assert clean == "lego"
    assert deg["type"] == "blur" and deg["STD"] == 1.5
    clean, deg = parse_scene_suffix("lego##Noise25", 4, "/tmp")
    assert deg["type"] == "noise" and deg["STD"] == 25.0
    clean, deg = parse_scene_suffix("lego", 2, "/tmp")
    assert clean == "lego" and deg is None


def _dataset_config(tmp_path, train_groups, val_groups):
    return CfgNode({
        "root_path": str(tmp_path),
        "synt": {"root": "synt", "near": 2, "far": 6, "no_ndc": True},
        "llff": {"root": "llff", "near": 0, "far": 1, "no_ndc": False},
        "testskip": 1,
        "llffhold": 2,
        "dir": {"train": train_groups, "val": val_groups},
    })


def test_multiscene_dataset_basic(tmp_path):
    synt_root = tmp_path / "synt"
    write_blender_scene(str(synt_root), "lego", size=32)
    write_blender_scene(str(synt_root), "ship", size=32)
    cfg = _dataset_config(tmp_path, {"2,16,8": ["lego", "ship"]},
                          {"2,16,8": []} if False else {})
    nerf_cfg = CfgNode({"use_viewdirs": True})
    ds = MultiSceneDataset(cfg, scene_norm_coords=nerf_cfg)
    assert ds.scenes_set == {"lego_DS2_PlRes16_8", "ship_DS2_PlRes16_8"}
    assert len(ds.i_train["lego_DS2_PlRes16_8"]) == 3
    assert len(ds.i_val["lego_DS2_PlRes16_8"]) == 2
    img, pose, h, w, focal, dsf = ds.item(0)
    assert img.shape == (16, 16, 3) and pose.shape == (4, 4)
    box = ds.coords_normalization["lego_DS2_PlRes16_8"]
    assert box.shape == (2, 5)
    assert np.all(box[1, :3] > box[0, :3])


def test_multiscene_dataset_lr_hr_and_valonly(tmp_path):
    synt_root = tmp_path / "synt"
    write_blender_scene(str(synt_root), "lego", size=32)
    cfg = _dataset_config(tmp_path, {"4,8,8": ["lego"]},
                          {"2,16,8": ["lego"]})
    ds = MultiSceneDataset(cfg, scene_norm_coords=CfgNode(
        {"use_viewdirs": True}))
    assert "lego_DS2_PlRes16_8" in ds.val_only_scene_ids
    assert "lego_DS4_PlRes8_8" in ds.i_train
    # HR val-only scene only loads its val split
    assert "lego_DS2_PlRes16_8" not in ds.i_train
    assert len(ds.i_val["lego_DS2_PlRes16_8"]) == 2
    # LR image is downsampled by 4
    img, *_ = ds.item(ds.i_train["lego_DS4_PlRes8_8"][0])
    assert img.shape == (8, 8, 3)


def test_multiscene_dataset_llff(tmp_path):
    llff_root = tmp_path / "llff"
    write_llff_scene(str(llff_root), "fern", n_images=6, size=40)
    cfg = _dataset_config(tmp_path, {"2,16,8,'llff'": ["fern"]}, {})
    ds = MultiSceneDataset(cfg, scene_norm_coords=CfgNode(
        {"use_viewdirs": True}))
    sid = "fern_DS2_PlRes16_8"
    assert ds.scene_types[sid] == "llff"
    assert len(ds.i_train[sid]) == 6       # llff trains on all images
    assert len(ds.i_val[sid]) == 2         # llffhold
    img, pose, h, w, focal, dsf = ds.item(0)
    assert img.shape == (20, 20, 3) and (h, w) == (20, 20)


def test_multiscene_dataset_eval_mode(tmp_path):
    synt_root = tmp_path / "synt"
    write_blender_scene(str(synt_root), "lego", size=32)
    cfg = _dataset_config(tmp_path, {}, {"2,16,8": ["lego"]})
    ds = MultiSceneDataset(cfg, eval_mode=True)
    sid = "lego_DS2_PlRes16_8"
    # eval mode loads the test split
    assert len(ds.i_val[sid]) == 2
    assert sid in ds.val_only_scene_ids

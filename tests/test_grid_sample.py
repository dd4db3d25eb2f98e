"""Golden tests for grid_sample_2d against torch.nn.functional.grid_sample.

Torch (CPU) is used purely as a numerical oracle for the semantics the
reference relies on (models.py:303-309: border padding, align_corners
configurable, bilinear/bicubic).
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from nvsr_tpu.ops.grid_sample import grid_sample_2d, multi_plane_sample


def _torch_reference(plane, grid, mode, align_corners):
    # plane [C,H,W], grid [N,2] -> [N,C]
    t_plane = torch.from_numpy(plane)[None]          # [1,C,H,W]
    t_grid = torch.from_numpy(grid)[None, :, None]   # [1,N,1,2]
    out = torch.nn.functional.grid_sample(
        t_plane, t_grid, mode=mode, padding_mode="border",
        align_corners=align_corners)
    return out.squeeze(0).squeeze(-1).permute(1, 0).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_matches_torch_inside(rng, mode, align_corners):
    plane = rng.standard_normal((5, 17, 23)).astype(np.float32)
    grid = rng.uniform(-0.98, 0.98, size=(301, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(grid),
                                     mode=mode, align_corners=align_corners))
    ref = _torch_reference(plane, grid, mode, align_corners)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_matches_torch_border(rng, mode, align_corners):
    """Out-of-range coords must clamp like padding_mode='border'."""
    plane = rng.standard_normal((3, 9, 11)).astype(np.float32)
    grid = rng.uniform(-1.7, 1.7, size=(257, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(grid),
                                     mode=mode, align_corners=align_corners))
    ref = _torch_reference(plane, grid, mode, align_corners)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_exact_grid_points_bilinear(rng):
    """Sampling exactly at pixel centers returns the pixel values."""
    C, H, W = 4, 8, 8
    plane = rng.standard_normal((C, H, W)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # align_corners=True: pixel i is at normalized 2*i/(size-1) - 1
    gx = 2 * xs.ravel() / (W - 1) - 1
    gy = 2 * ys.ravel() / (H - 1) - 1
    grid = np.stack([gx, gy], -1).astype(np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(grid),
                                    mode="bilinear", align_corners=True))
    expected = plane.reshape(C, -1).T
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=5e-6)


def test_leading_shape_and_multi_plane(rng):
    plane = rng.standard_normal((6, 12, 12)).astype(np.float32)
    grid = rng.uniform(-1, 1, size=(7, 13, 2)).astype(np.float32)
    out = grid_sample_2d(jnp.asarray(plane), jnp.asarray(grid))
    assert out.shape == (7, 13, 6)

    planes = rng.standard_normal((3, 6, 12, 12)).astype(np.float32)
    grids = rng.uniform(-1, 1, size=(3, 50, 2)).astype(np.float32)
    out = np.asarray(multi_plane_sample(jnp.asarray(planes), jnp.asarray(grids)))
    assert out.shape == (3, 50, 6)
    for p in range(3):
        ref = _torch_reference(planes[p], grids[p], "bilinear", True)
        np.testing.assert_allclose(out[p], ref, rtol=1e-5, atol=1e-5)


def test_gradients_flow_to_plane(rng):
    """The autodiff transpose must scatter gradients into the plane."""
    import jax

    plane = jnp.asarray(rng.standard_normal((2, 8, 8)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(64, 2)).astype(np.float32))

    def loss(p):
        return jnp.sum(grid_sample_2d(p, grid) ** 2)

    g = jax.grad(loss)(plane)
    assert g.shape == plane.shape
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_packed_bilinear_matches_grid_sample(rng):
    """The packed single-gather fast path must be numerically identical
    to the generic 4-tap bilinear sampler (border padding included)."""
    from nvsr_tpu.ops.grid_sample import (
        multi_plane_sample_packed,
        pack_plane_bilinear,
        packed_bilinear_sample,
    )

    plane = rng.standard_normal((5, 13, 17)).astype(np.float32)
    grid = rng.uniform(-1.6, 1.6, size=(333, 2)).astype(np.float32)
    for ac in (True, False):
        ref = grid_sample_2d(jnp.asarray(plane), jnp.asarray(grid),
                             mode="bilinear", align_corners=ac)
        packed = pack_plane_bilinear(jnp.asarray(plane))
        assert packed.shape == (13 * 17, 128)  # 4*5 -> padded to 128
        got = packed_bilinear_sample(packed, 13, 17, 5, jnp.asarray(grid),
                                     align_corners=ac)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=5e-6)

    planes = rng.standard_normal((3, 5, 13, 17)).astype(np.float32)
    grids = rng.uniform(-1, 1, size=(3, 64, 2)).astype(np.float32)
    got = multi_plane_sample_packed(jnp.asarray(planes), jnp.asarray(grids))
    for p in range(3):
        ref = grid_sample_2d(jnp.asarray(planes[p]), jnp.asarray(grids[p]))
        np.testing.assert_allclose(np.asarray(got[p]), np.asarray(ref),
                                   rtol=1e-4, atol=5e-6)


def test_packed_bilinear_gradients(rng):
    """Gradients flow back through the packing to the raw plane and
    match the generic sampler's gradients."""
    import jax
    from nvsr_tpu.ops.grid_sample import (
        pack_plane_bilinear,
        packed_bilinear_sample,
    )

    plane = jnp.asarray(rng.standard_normal((2, 8, 8)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(50, 2)).astype(np.float32))

    def loss_ref(p):
        return jnp.sum(grid_sample_2d(p, grid) ** 2)

    def loss_packed(p):
        pk = pack_plane_bilinear(p)
        return jnp.sum(packed_bilinear_sample(pk, 8, 8, 2, grid) ** 2)

    g_ref = jax.grad(loss_ref)(plane)
    g_packed = jax.grad(loss_packed)(plane)
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_dense_bilinear_matches_grid_sample(rng):
    """The small-plane dense hat-matmul sampler (the tiled eval path's
    view-plane sample) matches the generic bilinear sampler to bf16
    weight/tap precision, border clamping included."""
    from nvsr_tpu.ops.grid_sample import dense_bilinear_sample

    plane = rng.standard_normal((7, 16, 32)).astype(np.float32)
    grid = rng.uniform(-1.7, 1.7, size=(257, 2)).astype(np.float32)
    for ac in (True, False):
        ref = grid_sample_2d(jnp.asarray(plane), jnp.asarray(grid),
                             mode="bilinear", align_corners=ac)
        got = dense_bilinear_sample(jnp.asarray(plane), jnp.asarray(grid),
                                    align_corners=ac)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)
        exact = dense_bilinear_sample(jnp.asarray(plane),
                                      jnp.asarray(grid), align_corners=ac,
                                      compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(exact), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

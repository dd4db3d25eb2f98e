"""Occupancy-guided sampling-bound tightening (TPU-native extension).

The reference samples every ray uniformly over the global [near, far]
(train_utils.py:95-100), spending most samples — and therefore most
plane gathers, the TPU bottleneck (PERF.md) — in empty space. This
module estimates the scene's occupied axis-aligned box by decoding the
density field on a coarse grid once per plane set, then tightens each
ray's [near, far] to its slab intersection with that box. Shapes stay
static (same sample count, concentrated where density lives); rays that
miss the box keep their original bounds. Opt-in: this is a sampling
improvement over the reference, not a parity behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def estimate_occupied_box(density_fn, box, *, grid: int = 64,
                          threshold: float = 0.0, margin: float = 1.0):
    """Occupied AABB of a density field.

    Args:
      density_fn: [N,3] world points -> [N] raw density logits (the
        triplane density branch; viewdirs are not needed for sigma).
      box: [2, D] scene normalization box (world xyz bounds in
        box[:, :3]).
      grid: grid resolution per axis.
      threshold: occupancy = sigma_logit > threshold (relu'd density
        positive).
      margin: extra voxels of dilation around the occupied region.

    Returns:
      [2, 3] occupied world-space AABB (falls back to the scene box when
      nothing exceeds the threshold).
    """
    lo = jnp.asarray(box[0, :3], dtype=jnp.float32)
    hi = jnp.asarray(box[1, :3], dtype=jnp.float32)
    axes = [jnp.linspace(lo[d], hi[d], grid) for d in range(3)]
    xx, yy, zz = jnp.meshgrid(*axes, indexing="ij")
    pts = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    sigma = density_fn(pts).reshape(grid, grid, grid)
    occ = sigma > threshold

    voxel = (hi - lo) / (grid - 1)
    idx = jnp.stack(jnp.meshgrid(*[jnp.arange(grid)] * 3, indexing="ij"),
                    axis=-1)

    def axis_bounds(d):
        coords = jnp.where(occ, idx[..., d], grid)
        mn = jnp.min(coords)
        coords = jnp.where(occ, idx[..., d], -1)
        mx = jnp.max(coords)
        return mn, mx

    mins, maxs = [], []
    for d in range(3):
        mn, mx = axis_bounds(d)
        mins.append(mn)
        maxs.append(mx)
    mins = jnp.stack(mins).astype(jnp.float32) - margin
    maxs = jnp.stack(maxs).astype(jnp.float32) + margin
    any_occ = jnp.any(occ)
    world_lo = jnp.where(any_occ, lo + mins * voxel, lo)
    world_hi = jnp.where(any_occ, lo + maxs * voxel, hi)
    world_lo = jnp.maximum(world_lo, lo)
    world_hi = jnp.minimum(world_hi, hi)
    return jnp.stack([world_lo, world_hi], axis=0)


def tighten_near_far(ray_origins, ray_directions, near, far, aabb):
    """Clamp each ray's [near, far] to its slab intersection with `aabb`.

    Args:
      ray_origins/ray_directions: [R, 3] (directions need not be unit).
      near, far: [R, 1] current bounds (distances along the direction).
      aabb: [2, 3] world box.

    Returns:
      (near', far', hit) with near <= near' <= far' <= far and hit the
      [R, 1] bool intersection mask; rays that miss the box get a
      DEGENERATE interval (near' == far', see below) and composite to
      exact background (ops/rendering.py zero-span guard).
    """
    eps = 1e-9
    inv = 1.0 / jnp.where(jnp.abs(ray_directions) < eps,
                          jnp.where(ray_directions >= 0, eps, -eps),
                          ray_directions)
    t0 = (aabb[0] - ray_origins) * inv
    t1 = (aabb[1] - ray_origins) * inv
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)
    hit = t_exit > jnp.maximum(t_enter, 0.0)
    new_near = jnp.clip(t_enter, near, far)
    new_far = jnp.clip(t_exit, near, far)
    valid = hit & (new_far > new_near)
    # Rays that MISS the box get a DEGENERATE interval at the clipped
    # slab midpoint instead of their original bounds: zero-length
    # sample intervals make every alpha 0 (rendering.py dists), so the
    # ray composites exactly to background — which is what the
    # occupancy premise says it renders anyway (no mass outside the
    # box). The midpoint is continuous across the hit/miss silhouette,
    # so image TILES mixing hit and miss rays keep rank-aligned sample
    # depths — without this, silhouette chunks span the whole [near,
    # far] band on the planes and overflow the tile sampler's regions
    # (measured: 226-row footprints vs the 17-row envelope,
    # tools/exp_fine_slab4.py).
    mid = jnp.clip(0.5 * (t_enter + t_exit), near, far)
    return (jnp.where(valid, new_near, mid),
            jnp.where(valid, new_far, mid), valid)

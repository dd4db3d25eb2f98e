"""2-D feature-plane sampling (the hot gather of the whole pipeline).

TPU-native replacement for the reference's cuDNN `grid_sample`
(reference models.py:303-309,320-326: bilinear/bicubic interpolation,
`padding_mode='border'`, configurable `align_corners`). The reference
invokes it once per plane per point batch; here it is a pure jnp function
whose autodiff transpose yields the scatter-add needed for plane training.

Numerics are validated against torch.nn.functional.grid_sample in
tests/test_grid_sample.py (torch used as an oracle only).

Layout note: planes are stored [C, H, W]; sample points come as
grid [..., 2] in [-1, 1] where grid[..., 0] = x (indexes W) and
grid[..., 1] = y (indexes H), matching the torch convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _bilinear(plane, gx, gy, align_corners: bool):
    """plane [C,H,W]; gx/gy [N] in [-1,1] -> [N,C]."""
    C, H, W = plane.shape
    x = _unnormalize(gx, W, align_corners)
    y = _unnormalize(gy, H, align_corners)
    # border padding: clip the source coordinate before computing weights
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    flat = plane.reshape(C, H * W)

    def gather(yi, xi):
        return jnp.take(flat, yi * W + xi, axis=1)  # [C, N]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    top = v00 * (1.0 - tx) + v01 * tx
    bot = v10 * (1.0 - tx) + v11 * tx
    out = top * (1.0 - ty) + bot * ty
    return out.T  # [N, C]


def _cubic_coeffs(t, A: float = -0.75):
    """Torch's upsampling cubic coefficients (t = fractional offset)."""
    # coefficients for taps at offsets [-1, 0, 1, 2]
    def poly1(x):  # |x| in [1, 2)
        return ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A

    def poly0(x):  # |x| in [0, 1)
        return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0

    w0 = poly1(t + 1.0)
    w1 = poly0(t)
    w2 = poly0(1.0 - t)
    w3 = poly1(2.0 - t)
    return w0, w1, w2, w3


def _bicubic(plane, gx, gy, align_corners: bool):
    """Bicubic sampling with border padding (clip tap indices)."""
    C, H, W = plane.shape
    x = _unnormalize(gx, W, align_corners)
    y = _unnormalize(gy, H, align_corners)
    # Unlike bilinear, torch bicubic does NOT clip the source coordinate
    # for border padding; only the 4x4 tap indices are clamped
    # (ATen grid_sampler: unnormalize + get_value_bounded).

    x1 = jnp.floor(x)
    y1 = jnp.floor(y)
    tx = x - x1
    ty = y - y1
    wx = _cubic_coeffs(tx)
    wy = _cubic_coeffs(ty)

    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    flat = plane.reshape(C, H * W)

    out = 0.0
    for j in range(4):
        yi = jnp.clip(y1i + (j - 1), 0, H - 1)
        row = 0.0
        for i in range(4):
            xi = jnp.clip(x1i + (i - 1), 0, W - 1)
            row = row + wx[i] * jnp.take(flat, yi * W + xi, axis=1)
        out = out + wy[j] * row
    return out.T  # [N, C]


@partial(jax.jit, static_argnames=("mode", "align_corners"))
def grid_sample_2d(plane, grid, mode: str = "bilinear",
                   align_corners: bool = True):
    """Sample a feature plane at continuous locations.

    Args:
      plane: [C, H, W] feature plane.
      grid: [..., 2] normalized coords in [-1, 1]; last-dim order (x, y).
      mode: 'bilinear' | 'bicubic'.
      align_corners: torch semantics.

    Returns:
      [..., C] sampled features.
    """
    lead_shape = grid.shape[:-1]
    g = grid.reshape(-1, 2)
    if mode == "bilinear":
        out = _bilinear(plane, g[:, 0], g[:, 1], align_corners)
    elif mode == "bicubic":
        out = _bicubic(plane, g[:, 0], g[:, 1], align_corners)
    else:
        raise ValueError(f"unknown interpolation mode: {mode}")
    return out.reshape(*lead_shape, plane.shape[0])


# ---------------------------------------------------------------------------
# Packed-tap bilinear sampling (the TPU fast path)
# ---------------------------------------------------------------------------
#
# XLA's row-gather on TPU is dominated by per-row overhead (~tens of ns
# per fetched row), so fetching the 4 bilinear taps as 4 separate
# gathers wastes 4x the row budget. Instead we pre-pack, for every pixel
# (y, x), the 2x2 neighborhood [(y,x),(y,x+1),(y+1,x),(y+1,x+1)] into
# ONE lane-aligned row of a [H*W, pad128(4C)] table (edge-padded, which
# reproduces border clamping exactly). Bilinear sampling then costs a
# single row gather per point. The packing itself is dense
# pad/slice/concat work that XLA streams at full HBM bandwidth, and its
# autodiff transpose scatters gradients back to the raw plane.

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_plane_bilinear(plane, table_dtype=None):
    """[C, H, W] -> [H*W, round_up(4C, 128)] packed 2x2-tap table.

    table_dtype: optionally store the table in a lower precision
    (bfloat16) — interpolation weights stay f32 and the output upcasts,
    so only the tap values quantize.
    """
    C, H, W = plane.shape
    p = jnp.pad(plane, ((0, 0), (0, 1), (0, 1)), mode="edge")
    taps = jnp.concatenate(
        [p[:, :H, :W], p[:, :H, 1:W + 1],
         p[:, 1:H + 1, :W], p[:, 1:H + 1, 1:W + 1]], axis=0)  # [4C,H,W]
    packed = taps.transpose(1, 2, 0).reshape(H * W, 4 * C)
    pad = _round_up(4 * C, 128) - 4 * C
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    if table_dtype is not None:
        packed = packed.astype(table_dtype)
    return packed


def packed_bilinear_sample(packed, height: int, width: int, channels: int,
                           grid, align_corners: bool = True):
    """Sample a packed plane at [..., 2] (x, y) coords in [-1, 1].

    Numerically identical to grid_sample_2d(..., mode='bilinear',
    padding_mode='border') — verified in tests/test_grid_sample.py.
    Returns [..., channels].
    """
    lead = grid.shape[:-1]
    g = grid.reshape(-1, 2)
    x = _unnormalize(g[:, 0], width, align_corners)
    y = _unnormalize(g[:, 1], height, align_corners)
    x = jnp.clip(x, 0.0, width - 1.0)
    y = jnp.clip(y, 0.0, height - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = (x - x0f)[:, None]
    ty = (y - y0f)[:, None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, width - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, height - 1)
    rows = jnp.take(packed, y0 * width + x0, axis=0).astype(tx.dtype)
    c = channels
    v00 = rows[:, 0 * c:1 * c]
    v01 = rows[:, 1 * c:2 * c]
    v10 = rows[:, 2 * c:3 * c]
    v11 = rows[:, 3 * c:4 * c]
    top = v00 * (1.0 - tx) + v01 * tx
    bot = v10 * (1.0 - tx) + v11 * tx
    out = top * (1.0 - ty) + bot * ty
    return out.reshape(*lead, c)


def dense_bilinear_sample(plane, grid, align_corners: bool = True,
                          compute_dtype=jnp.bfloat16):
    """Small-plane bilinear sampling as ONE dense hat-weight matmul.

    plane [C, H, W], grid [..., 2] (x, y) in [-1, 1] -> [..., C].
    Border-clamped bilinear (reference grid_sample semantics,
    models.py:383 view-plane sample) expressed as
        out[n] = (hat_y[n] x hat_x[n]) @ cells        [N, HW] @ [HW, C]
    with hat(u) = relu(1 - |u|) carrying both taps per axis. XLA's
    per-row gather engine costs ~16 ns/row regardless of table size
    (PERF.md), so for SMALL planes — the 32^2 view plane sampled once
    per ray per pass, ~21 ms/frame at 800^2 — the dense matmul
    (~63 GFLOP/frame, ~2 ms) wins outright. Weights and taps compute in
    `compute_dtype` (bf16: same precision class as the tiled eval
    path's gather); accumulation is f32.
    """
    C, H, W = plane.shape
    lead = grid.shape[:-1]
    g = grid.reshape(-1, 2)
    x = jnp.clip(_unnormalize(g[:, 0], W, align_corners), 0.0, W - 1.0)
    y = jnp.clip(_unnormalize(g[:, 1], H, align_corners), 0.0, H - 1.0)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(
        jnp.arange(H, dtype=y.dtype)[None, :] - y[:, None]))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(
        jnp.arange(W, dtype=x.dtype)[None, :] - x[:, None]))
    w = (wy[:, :, None] * wx[:, None, :]).reshape(-1, H * W)
    cells = plane.transpose(1, 2, 0).reshape(H * W, C)
    out = jnp.matmul(w.astype(compute_dtype), cells.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(*lead, C)


def multi_plane_sample_packed(planes, grids, align_corners: bool = True,
                              table_dtype=None):
    """[P,C,H,W] planes at [P,N,2] grids -> [P,N,C] via packed gathers."""
    _, C, H, W = planes.shape
    packed = jax.vmap(
        lambda p: pack_plane_bilinear(p, table_dtype=table_dtype))(planes)
    return jax.vmap(
        lambda pk, g: packed_bilinear_sample(pk, H, W, C, g,
                                             align_corners=align_corners)
    )(packed, grids)


def multi_plane_sample(planes, grids, mode: str = "bilinear",
                       align_corners: bool = True):
    """Sample a stack of planes at per-plane grids and return the list.

    Args:
      planes: [P, C, H, W] stacked planes (same resolution).
      grids: [P, N, 2] per-plane sample grids.

    Returns:
      [P, N, C]. Used for the triplane positional gather where all
      positional planes of a scene share one resolution.
    """
    return jax.vmap(lambda p, g: grid_sample_2d(p, g, mode=mode,
                                                align_corners=align_corners)
                    )(planes, grids)

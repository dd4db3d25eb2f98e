"""Triplane scene model: per-scene 2-D feature planes + shared decoders.

TPU-native re-design of the reference's `TwoDimPlanesModel`
(reference models.py:118-434). Differences in architecture, identical math:

  * The decoder is a functional params-pytree; feature planes and the
    per-scene coordinate box are explicit arguments to `apply` — nothing
    is module state, so the whole render jits end-to-end and planes can
    be swapped/sharded outside the graph.
  * Plane projection rotations are fixed (non-learned) [P,3,3] matrices
    generated host-side once (reference CoordProjector, models.py:471-497).
  * The `ensemble_size` decoder-copies mechanism (reference models.py:169,
    393) is a leading list of member param-trees; the member index is
    chosen host-side per training step.

Numerics validated against a torch re-derivation in tests/test_triplane.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.ops.geometry import cart2az_el, normalize_coords
from nvsr_tpu.ops.grid_sample import grid_sample_2d


@dataclasses.dataclass(frozen=True)
class TriplaneConfig:
    """Static model hyperparameters (hashable: safe as a jit static arg).

    Field semantics mirror the reference constructor kwargs
    (models.py:119-139) and the `models.coarse.*` config keys.
    """
    use_viewdirs: bool = True
    dec_density_layers: int = 4
    dec_rgb_layers: int = 4
    dec_channels: int = 128
    skip_connect_every: Optional[int] = None
    num_plane_channels: int = 48
    num_viewdir_plane_channels: Optional[int] = None
    rgb_dec_input: str = "projections"          # projections|features|projections_features
    proj_combination: str = "sum"               # sum|avg|concat
    plane_interp: str = "bilinear"              # bilinear|bicubic
    align_corners: bool = True
    viewdir_proj_combination: Optional[str] = None  # sum|avg|mult|concat|concat_pos
    num_planes: int = 3
    ensemble_size: int = 1
    point_coords_noise: float = 0.0
    # store the packed gather table in this dtype ('bfloat16' trades a
    # tap-value quantization for gather bandwidth); None = plane dtype
    gather_table_dtype: Optional[str] = None
    # run decoder matmuls in this dtype with f32 accumulation
    # ('bfloat16' uses the MXU at full rate); None = input dtype
    compute_dtype: Optional[str] = None

    def __post_init__(self):
        assert self.rgb_dec_input in (
            "projections", "features", "projections_features")
        assert self.proj_combination in ("sum", "concat", "avg")
        vc = self.viewdir_proj_combination or self.proj_combination
        assert vc in ("sum", "concat", "avg", "mult", "concat_pos")
        if self.viewdir_channels != self.num_plane_channels:
            assert self.use_viewdirs is False or "concat" in vc

    @property
    def viewdir_channels(self) -> int:
        if self.num_viewdir_plane_channels is not None:
            return self.num_viewdir_plane_channels
        return self.num_plane_channels if self.use_viewdirs else 0

    @property
    def viewdir_combination(self) -> str:
        return self.viewdir_proj_combination or self.proj_combination

    @property
    def density_in_channels(self) -> int:
        mult = self.num_planes if self.proj_combination == "concat" else 1
        return self.num_plane_channels * mult

    @property
    def rgb_in_channels(self) -> int:
        """RGB-branch input width, derived from the forward semantics.

        Matches the reference layer plan (models.py:186-189) for every
        combination the reference can actually run; for combinations
        where the reference's plan disagrees with its own forward pass
        (e.g. concat + sum, or use_viewdirs=False — dead paths that
        would crash there), this follows the forward pass.
        """
        src_planes = 1 if "features" in self.rgb_dec_input else self.num_planes
        pos_ch = self.num_plane_channels * (
            src_planes if self.proj_combination == "concat" else 1)
        if not self.use_viewdirs:
            return pos_ch
        comb = self.viewdir_combination
        if comb == "concat_pos":
            return self.num_plane_channels * src_planes + self.viewdir_channels
        if comb == "concat":
            return pos_ch + self.viewdir_channels
        return pos_ch  # sum/avg/mult preserve the positional shape

    def is_skip_layer(self, layer_num: int) -> bool:
        """Reference models.py:203-207."""
        if self.skip_connect_every is None:
            return False
        return layer_num % self.skip_connect_every == 0 and layer_num > 0

    @classmethod
    def from_cfg(cls, model_cfg, nerf_cfg) -> "TriplaneConfig":
        """Build from the reference-style YAML sections
        (train_nerf.py:317-335 constructor wiring)."""
        g = model_cfg.get
        return cls(
            use_viewdirs=nerf_cfg.get("use_viewdirs", True),
            dec_density_layers=g("dec_density_layers", 4),
            dec_rgb_layers=g("dec_rgb_layers", 4),
            dec_channels=g("dec_channels", 128),
            skip_connect_every=g("skip_connect_every", None),
            num_plane_channels=g("num_plane_channels", 48),
            num_viewdir_plane_channels=g("num_viewdir_plane_channels", None),
            rgb_dec_input=g("rgb_dec_input", "projections"),
            proj_combination=g("proj_combination", "sum"),
            plane_interp=g("plane_interp", "bilinear"),
            align_corners=g("align_corners", True),
            viewdir_proj_combination=g("viewdir_proj_combination", None),
            num_planes=g("num_planes", 3),
            ensemble_size=g("ensemble_size", 1),
            point_coords_noise=nerf_cfg.get_path("train.point_coords_noise", 0)
            if hasattr(nerf_cfg, "get_path") else 0,
            gather_table_dtype=g("gather_table_dtype", None),
            compute_dtype=g("compute_dtype", None),
        )


# ---------------------------------------------------------------------------
# Plane-projection rotations (host-side, fixed)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def make_rot_mats(num_planes: int, seed: int = 0) -> np.ndarray:
    """[P,3,3] orthonormal projection bases.

    For P<=3: standard-basis column permutations (identity, swap xy,
    cycle) matching reference models.py:476-478 so plane d projects
    coords onto columns 1:3 of rot_mats[d]:
      d=0 -> (y,z); d=1 -> (x,z); d=2 -> (x,y).
    For P>3: farthest-point-sampled random unit normals completed to an
    orthonormal basis by QR (reference models.py:480-490).
    """
    if num_planes <= 3:
        base = np.eye(3, dtype=np.float32)
        mats = [base, base[:, [1, 0, 2]], base[:, [2, 0, 1]]]
        return np.stack(mats[:num_planes])

    n_trials = 10000
    rng = np.random.default_rng(seed)
    axes = rng.uniform(-1, 1, size=[n_trials, num_planes, 3])
    axes /= np.sqrt(np.sum(axes ** 2, 2, keepdims=True))
    axes = np.concatenate([axes, -axes], 1)
    # pick the trial maximizing the summed nearest-neighbor separation
    d2 = np.sum((axes[..., None, :] - np.expand_dims(axes, 1)) ** 2, -1)
    score = np.sum(np.sort(d2, 1)[:, 1, ...], -1)
    chosen = axes[np.argmax(score)][:num_planes]
    mats = []
    for norm in chosen:
        rank = 0
        while rank != 3:
            mat = np.concatenate([norm[:, None], rng.uniform(size=[3, 2])], 1)
            rank = np.linalg.matrix_rank(mat)
        mats.append(np.linalg.qr(mat)[0])
    return np.stack(mats).astype(np.float32)


def project_to_planes(coords, rot_mats):
    """[N,3] coords -> [P,N,2] per-plane 2-D projections.

    grid[..., 0] indexes plane width, grid[..., 1] height — matching the
    reference's grid_sample grid layout (models.py:295,303-309).
    Projection uses columns 1:3 of each rotation (models.py:495-497);
    gradients do not flow through the rotation (it is non-learned).
    """
    rot = jax.lax.stop_gradient(jnp.asarray(rot_mats, dtype=coords.dtype))
    return jnp.einsum("nc,pck->pnk", coords, rot[:, :, 1:])


# ---------------------------------------------------------------------------
# Decoder parameters
# ---------------------------------------------------------------------------

def _init_linear(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def _linear(p, x, compute_dtype=None):
    if compute_dtype is None:
        return x @ p["w"] + p["b"]
    y = jax.lax.dot_general(
        x.astype(compute_dtype), p["w"].astype(compute_dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y + p["b"]


def init_decoder_params(key, cfg: TriplaneConfig, dtype=jnp.float32):
    """Parameter pytree for one scene-shared decoder.

    Layout:
      {'members': [  # ensemble copies (reference models.py:169-195)
          {'density': [lin...], 'fc_alpha': lin, 'fc_feat': lin?,
           'rgb': [lin...], 'fc_rgb': lin}, ...]}
    """
    members = []
    for _ in range(cfg.ensemble_size):
        key, *ks = jax.random.split(key, 6)
        m: dict[str, Any] = {}
        # density branch
        layers = []
        k = ks[0]
        in_ch = cfg.density_in_channels
        k, sub = jax.random.split(k)
        layers.append(_init_linear(sub, in_ch, cfg.dec_channels, dtype))
        for layer_num in range(cfg.dec_density_layers - 1):
            k, sub = jax.random.split(k)
            if cfg.is_skip_layer(layer_num):
                layers.append(_init_linear(sub, in_ch + cfg.dec_channels,
                                           cfg.dec_channels, dtype))
            else:
                layers.append(_init_linear(sub, cfg.dec_channels,
                                           cfg.dec_channels, dtype))
        m["density"] = layers
        m["fc_alpha"] = _init_linear(ks[1], cfg.dec_channels, 1, dtype)
        if "features" in cfg.rgb_dec_input:
            m["fc_feat"] = _init_linear(ks[2], cfg.dec_channels,
                                        cfg.num_plane_channels, dtype)
        # rgb branch
        layers = []
        k = ks[3]
        in_ch = cfg.rgb_in_channels
        k, sub = jax.random.split(k)
        layers.append(_init_linear(sub, in_ch, cfg.dec_channels, dtype))
        for layer_num in range(cfg.dec_rgb_layers - 1):
            k, sub = jax.random.split(k)
            if cfg.is_skip_layer(layer_num):
                layers.append(_init_linear(sub, in_ch + cfg.dec_channels,
                                           cfg.dec_channels, dtype))
            else:
                layers.append(_init_linear(sub, cfg.dec_channels,
                                           cfg.dec_channels, dtype))
        m["rgb"] = layers
        m["fc_rgb"] = _init_linear(ks[4], cfg.dec_channels, 3, dtype)
        members.append(m)
    return {"members": members}


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------

def combine_pos_planes(projs, combination: str):
    """[P,N,C] -> combined features (reference models.py:355-361)."""
    if combination == "sum":
        return jnp.sum(projs, axis=0)
    if combination == "avg":
        return jnp.mean(projs, axis=0)
    if combination == "concat":
        # cat([p0, p1, ...], channel): plane-major channel grouping
        p, n, c = projs.shape
        return jnp.transpose(projs, (1, 0, 2)).reshape(n, p * c)
    raise ValueError(combination)


def combine_all_planes(pos_projs, viewdir_proj, cfg: TriplaneConfig):
    """Merge positional and view-direction features
    (reference models.py:363-379)."""
    comb = cfg.viewdir_combination
    if comb == "concat_pos":
        p, n, c = pos_projs.shape
        flat = jnp.transpose(pos_projs, (1, 0, 2)).reshape(n, p * c)
        return jnp.concatenate([flat, viewdir_proj], axis=-1)

    pos = combine_pos_planes(pos_projs, cfg.proj_combination)
    pos_shape = pos.shape
    view = viewdir_proj
    if comb != "concat" and pos.shape[1] > view.shape[1]:
        # broadcast the (smaller) viewdir features over channel groups
        pos = pos.reshape(pos_shape[0], view.shape[1], -1)
        view = view[..., None]
    if comb == "sum":
        return (pos + view).reshape(pos_shape)
    if comb == "avg":
        return ((pos + view) / 2).reshape(pos_shape)
    if comb == "mult":
        return (pos * (1 + view)).reshape(pos_shape)
    if comb == "concat":
        return jnp.concatenate([pos, view], axis=-1)
    raise ValueError(comb)


def _mlp_branch(layers, fc_out, x_in, cfg: TriplaneConfig):
    """Shared density/rgb branch structure (reference models.py:395-419):
    relu after every hidden layer, skip-concat of the branch input when
    is_skip_layer(layer_num-1), linear head."""
    x = x_in
    for layer_num, p in enumerate(layers):
        if cfg.is_skip_layer(layer_num - 1):
            x = jnp.concatenate([x, x_in], axis=-1)
        x = jax.nn.relu(_linear(p, x, cfg.compute_dtype))
    return x, _linear(fc_out, x, cfg.compute_dtype)


def sample_planes(planes_pos, grids, cfg: TriplaneConfig):
    """Gather per-plane features: [P,C,R,R] planes at [P,N,2] -> [P,N,C].

    Bilinear uses the packed single-gather fast path
    (ops/grid_sample.py packed-tap table); bicubic falls back to the
    generic 16-tap sampler.
    """
    if cfg.plane_interp == "bilinear":
        from nvsr_tpu.ops.grid_sample import multi_plane_sample_packed
        return multi_plane_sample_packed(planes_pos, grids,
                                         align_corners=cfg.align_corners,
                                         table_dtype=cfg.gather_table_dtype)
    return jax.vmap(
        lambda pl, g: grid_sample_2d(pl, g, mode=cfg.plane_interp,
                                     align_corners=cfg.align_corners)
    )(planes_pos, grids)


def sample_viewdir_plane(plane_view, viewdirs, box, cfg: TriplaneConfig,
                         dense: bool = False):
    """Unit viewdirs [N,3] -> view-plane features [N,Cv]
    (cart2az_el + az/el box normalization + plane sample;
    reference models.py:312-326,383).

    dense=True (tiled eval path): sample via ONE hat-weight matmul
    against the whole small view plane (grid_sample.
    dense_bilinear_sample) instead of per-row gathers — bf16 weights,
    same precision class as the tiled gather."""
    azel = cart2az_el(viewdirs)
    azel_n = normalize_coords(azel, box[:, 3:])
    if (dense and cfg.plane_interp == "bilinear"
            and plane_view.shape[-2] * plane_view.shape[-1] <= 4096):
        from nvsr_tpu.ops.grid_sample import dense_bilinear_sample
        return dense_bilinear_sample(plane_view, azel_n,
                                     align_corners=cfg.align_corners)
    if cfg.plane_interp == "bilinear":
        # packed 2x2-tap table: ONE row gather per direction instead of
        # four (same fast path as the positional planes; at 640k rays x
        # 2 passes the 4x row count is ~60 ms/frame of gather budget)
        from nvsr_tpu.ops.grid_sample import (pack_plane_bilinear,
                                              packed_bilinear_sample)
        cv, hv, wv = plane_view.shape
        packed = pack_plane_bilinear(plane_view)
        return packed_bilinear_sample(packed, hv, wv, cv, azel_n,
                                      align_corners=cfg.align_corners)
    return grid_sample_2d(plane_view, azel_n, mode=cfg.plane_interp,
                          align_corners=cfg.align_corners)


def apply_triplane_points(params, cfg: TriplaneConfig, planes_pos, box,
                          xyz_raw, view_proj, *, member: int = 0,
                          noise_key=None,
                          plane_resolution: Optional[int] = None,
                          rot_mats=None, sigma_only: bool = False):
    """Core forward on raw xyz with PRE-SAMPLED viewdir features.

    xyz_raw: [N,3] world points; view_proj: [N,Cv] or None.
    Mirrors reference models.py:381-421 with the view-plane sampling
    factored out (callers with per-ray constant viewdirs sample it once
    per ray and broadcast — identical math, 1/num_samples the gathers).
    """
    xyz = normalize_coords(xyz_raw, box[:, :3])
    if noise_key is not None and cfg.point_coords_noise:
        assert plane_resolution is not None
        std = cfg.point_coords_noise * 2.0 / (1 + plane_resolution)
        xyz = xyz + std * jax.random.normal(noise_key, xyz.shape, xyz.dtype)

    rot = rot_mats if rot_mats is not None else make_rot_mats(cfg.num_planes)
    grids = project_to_planes(xyz, rot)                # [P,N,2]
    pos_projs = sample_planes(planes_pos, grids, cfg)  # [P,N,C]
    return decode_projections(params, cfg, pos_projs, view_proj,
                              member=member, sigma_only=sigma_only)


def decode_projections(params, cfg: TriplaneConfig, pos_projs, view_proj,
                       *, member: int = 0, sigma_only: bool = False):
    """Decoder forward on pre-sampled plane features.

    pos_projs: [P, N, C] per-plane features; view_proj: [N, Cv] or None.
    The tail of the reference forward (models.py:395-421) after the
    grid_sample calls — shared by the XLA gather path and the Pallas
    tile-sampler path.

    sigma_only: skip the view-conditioned rgb branch — sigma is
    bit-identical, rgb lanes hold the constant fc_rgb bias (matching
    the fused kernel's sigma_only output). The eval coarse pass only
    feeds the hierarchical CDF; see ops/pallas/fused_decoder.py."""
    m = params["members"][member]
    projected_xyz = combine_pos_planes(pos_projs, cfg.proj_combination)
    h, alpha = _mlp_branch(m["density"], m["fc_alpha"], projected_xyz, cfg)
    if sigma_only:
        rgb = jnp.broadcast_to(m["fc_rgb"]["b"].astype(alpha.dtype),
                               alpha.shape[:-1] + (3,))
        return jnp.concatenate([rgb, alpha], axis=-1)

    if "features" in cfg.rgb_dec_input:
        if cfg.rgb_dec_input == "projections_features":
            raise NotImplementedError(
                "projections_features is deprecated in the reference "
                "(models.py:405-407)")
        # 'features': the rgb branch consumes the density features
        # (treated as a single-plane stack for viewdir combination).
        rgb_src = _linear(m["fc_feat"], h)[None]       # [1,N,C]
    else:
        rgb_src = pos_projs
    if cfg.use_viewdirs:
        x_rgb_in = combine_all_planes(rgb_src, view_proj, cfg)
    else:
        x_rgb_in = combine_pos_planes(rgb_src, cfg.proj_combination)

    _, rgb = _mlp_branch(m["rgb"], m["fc_rgb"], x_rgb_in, cfg)
    return jnp.concatenate([rgb, alpha], axis=-1)


def apply_triplane(params, cfg: TriplaneConfig, planes_pos, plane_view, box,
                   x, *, member: int = 0, noise_key=None,
                   plane_resolution: Optional[int] = None, rot_mats=None):
    """Reference-signature forward: [N, 3(+3)] points(+viewdirs) -> [N,4].

    Matches reference models.py:381-421 exactly (per-point viewdir
    sampling).
    """
    view_proj = None
    if cfg.use_viewdirs:
        view_proj = sample_viewdir_plane(plane_view, x[..., 3:], box, cfg)
    return apply_triplane_points(
        params, cfg, planes_pos, box, x[..., :3], view_proj, member=member,
        noise_key=noise_key, plane_resolution=plane_resolution,
        rot_mats=rot_mats)


def apply_triplane_rays(params, cfg: TriplaneConfig, planes_pos, plane_view,
                        box, pts, viewdirs, *, member: int = 0,
                        noise_key=None,
                        plane_resolution: Optional[int] = None,
                        rot_mats=None, tile_cfg=None, tile_tables=None,
                        sigma_only: bool = False):
    """Ray-structured forward: pts [R,S,3] + per-ray viewdirs [R,3]
    -> [R,S,4].

    The view-direction plane is sampled ONCE per ray and broadcast over
    samples (viewdirs are constant along a ray — the reference
    recomputes them per sample, train_utils.py:36-41; the result is
    identical).

    tile_cfg: optional ops.pallas.tile_sampler.TileSamplerConfig — route
    the positional-plane gathers through the locality-bucketed Pallas
    sampler (eval-only fast path; requires tile-coherent ray order, see
    render.py::tile_ray_maps, bilinear interpolation, and no
    point-coordinate noise)."""
    r, s, _ = pts.shape
    vp_ray = None
    if cfg.use_viewdirs and not sigma_only:
        # sigma_only renders never read the rgb branch, so the
        # view-plane gathers are dead work too
        vp_ray = sample_viewdir_plane(plane_view, viewdirs, box, cfg)
    if tile_cfg is not None:
        out, _ = _apply_triplane_rays_tiled(
            params, cfg, planes_pos, box, pts, vp_ray, r, s,
            member=member, noise_key=noise_key, rot_mats=rot_mats,
            tile_cfg=tile_cfg, tile_tables=tile_tables,
            sigma_only=sigma_only)
        return out
    view_proj = None
    if vp_ray is not None:
        view_proj = jnp.broadcast_to(
            vp_ray[:, None, :], (r, s, vp_ray.shape[-1])).reshape(
                r * s, vp_ray.shape[-1])
    out = apply_triplane_points(
        params, cfg, planes_pos, box, pts.reshape(-1, 3), view_proj,
        member=member, noise_key=noise_key,
        plane_resolution=plane_resolution, rot_mats=rot_mats,
        sigma_only=sigma_only)
    return out.reshape(r, s, 4)


def _repair_overflow_chunks(params, cfg, planes_pos, box, origins,
                            directions, z_vals, vp_ray, mask, res,
                            tile_cfg, *, member, rot_mats,
                            plane_resolution=None, sigma_only=False):
    """Hybrid overflow repair: re-evaluate up to ceil(repair_frac * NC)
    clamped chunks EXACTLY through the XLA point path and scatter the
    results over the kernel output.

    Fine-pass importance-sampled ranks diverge across a tile at depth
    silhouettes, so on converged fields a few %% of chunks exceed any
    static region envelope (round-4 study, tools/exp_gate_overflow.py)
    — the repaired render is exact everywhere while ~95%% of points
    keep riding the megakernel. Same per-point math as the XLA eval
    path (reference grid_sample semantics, models.py:303-309); the
    returned scalar is the RESIDUAL overflow fraction (clamped chunks
    beyond the repair budget — 0.0 means the render is exact)."""

    r, s = z_vals.shape
    tr, sl = tile_cfg.tile_rays, tile_cfg.slab
    nt, ns = r // tr, s // sl
    NC = nt * ns
    K = min(NC, max(1, math.ceil(NC * tile_cfg.repair_frac)))
    scores = mask.astype(jnp.float32)
    _, idx = jax.lax.top_k(scores, K)                       # [K] distinct
    valid = jnp.take(mask, idx)                             # [K] bool
    t, ss = idx // ns, idx % ns
    ray_ids = t[:, None] * tr + jnp.arange(tr)[None, :]     # [K, tr]
    zcols = ss[:, None] * sl + jnp.arange(sl)[None, :]      # [K, sl]
    ro = jnp.take(origins, ray_ids, axis=0)                 # [K, tr, 3]
    rd = jnp.take(directions, ray_ids, axis=0)
    z = z_vals[ray_ids[:, :, None], zcols[:, None, :]]      # [K, tr, sl]
    pts = ro[:, :, None, :] + rd[:, :, None, :] * z[..., None]
    vp = None
    if vp_ray is not None:
        cv = vp_ray.shape[-1]
        vp = jnp.broadcast_to(
            jnp.take(vp_ray, ray_ids, axis=0)[:, :, None, :],
            (K, tr, sl, cv)).reshape(K * tr * sl, cv)
    out = apply_triplane_points(
        params, cfg, planes_pos, box, pts.reshape(-1, 3), vp,
        member=member, noise_key=None,
        plane_resolution=plane_resolution, rot_mats=rot_mats,
        sigma_only=sigma_only)
    out = out.reshape(K, tr, sl, 4).astype(res.dtype)
    cur = res[ray_ids[:, :, None], zcols[:, None, :]]       # [K,tr,sl,4]
    upd = jnp.where(valid[:, None, None, None], out, cur)
    res = res.at[ray_ids[:, :, None], zcols[:, None, :]].set(upd)
    repaired = jnp.sum(valid.astype(jnp.float32))
    total = jnp.sum(scores)
    return res, (total - repaired) / NC


def _apply_triplane_rays_tiled(params, cfg, planes_pos, box, pts, vp_ray,
                               r, s, *, member, noise_key, rot_mats,
                               tile_cfg, tile_tables, origins=None,
                               directions=None, z_vals=None,
                               trainable=False, plane_resolution=None,
                               sigma_only=False):
    """Tiled-sampler forward, entirely in CHUNK point order.

    Per-point data is never transposed: when origins/directions/z_vals
    are given (the preferred ray entry, see
    apply_triplane_rays_from_z), points are GENERATED chunk-major —
    per-ray quantities broadcast with reshapes, z needs one small [R,S]
    transpose; the pts argument is only used as a fallback (one
    [R,S,3] transpose). Decoding happens in chunk order (per-point
    math is order-free) and only the 4-channel output is un-chunked —
    chunk-major transposes of [.., C]-wide per-point data dominated
    this path's cost before (PERF.md round 2).

    The depth slab adapts to (S, plane resolution): a chunk's depth
    footprint in plane cells is ~ slab * interval_px / S, so larger
    planes or fewer samples need shorter slabs to stay within the
    fixed [th, tw] region capacity. Without this, the 16+16 bench
    configuration silently clamped 67% of fine-pass chunks on the
    800^2 planes (measured; PERF.md round 2)."""
    assert cfg.plane_interp in ("bilinear", "bicubic"), cfg.plane_interp
    assert trainable or noise_key is None, \
        "point_coords_noise requires the trainable tiled path"
    assert not (trainable and cfg.plane_interp == "bicubic"), \
        "the trainable tiled sampler is bilinear-only (the reference " \
        "trains planes with bilinear interp; bicubic rides the XLA path)"
    from nvsr_tpu.ops.pallas.tile_sampler import choose_slab
    slab = choose_slab(s, planes_pos.shape[-1], tile_cfg)
    # large ray tiles shorten the slab so chunks stay at the
    # VMEM-proven 512 points (extent capacity improves as slabs shrink).
    # NVSR_CHUNK_CAP=1024 A/Bs B=1024 slab-4 chunks for LR-plane coarse
    # passes (half the region fetches + matmul issues per point at a
    # (24, 10) region; measurement knob, read at trace time).
    _cap = int(os.environ.get("NVSR_CHUNK_CAP", "512"))
    while tile_cfg.tile_rays * slab > _cap and slab > 1 \
            and s % (slab // 2) == 0:
        slab //= 2
    if slab != tile_cfg.slab:
        # keep the kernel's per-step point count constant: shorter
        # slabs shrink B, so the region group grows proportionally
        tile_cfg = dataclasses.replace(
            tile_cfg, slab=slab,
            group=tile_cfg.group * (tile_cfg.slab // slab))
    # shrink the region to this pass's measured extent envelope: the
    # gather matmul contraction is T = th*tw, the kernel's dominant
    # cost (tools/exp_mega_rate.py). Tables built at the config dims
    # stay valid — regions only shrink, and oy's clip uses the table's
    # build-time Hp.
    from nvsr_tpu.ops.pallas.tile_sampler import choose_region_dims
    if cfg.plane_interp == "bilinear":
        # (the envelopes are measured for 2-tap footprints; bicubic
        # needs +3 x-cells and keeps the full config regions)
        th_, tw_ = choose_region_dims(s, planes_pos.shape[-1], slab,
                                      tile_cfg.tile_rays, tile_cfg)
        if (th_, tw_) != (tile_cfg.th, tile_cfg.tw):
            tile_cfg = dataclasses.replace(tile_cfg, th=th_, tw=tw_)
    from nvsr_tpu.ops.pallas import fused_decoder
    from nvsr_tpu.ops.pallas.tile_sampler import (
        from_chunks, to_chunks, tiled_plane_sample_prechunked)
    tr, sl = tile_cfg.tile_rays, tile_cfg.slab
    nt, ns = r // tr, s // sl
    rot = rot_mats if rot_mats is not None \
        else make_rot_mats(cfg.num_planes)
    interpret = jax.default_backend() == "cpu"
    n_pts = r * s
    # bicubic rides the megakernel too (6-region cubic form) on the
    # from-z ray entry; the grids fallback entry keeps the non-fused
    # bicubic sampler + XLA decoder
    fused_ok = (not trainable
                and (cfg.plane_interp == "bilinear"
                     or (cfg.plane_interp == "bicubic"
                         and origins is not None))
                and fused_decoder.supports(cfg)
                and (vp_ray is not None or sigma_only)
                and planes_pos.shape[0] == 3
                and tile_cfg.tile_rays * slab <= _cap)
    if fused_ok:
        from nvsr_tpu.ops.pallas.tile_sampler import (LANES as _LANES,
                                                      packray_ok,
                                                      viewtile_ok)
        vtile = origins is not None and viewtile_ok(s, tile_cfg)
        pray = vtile and packray_ok(s, tile_cfg)
        if vp_ray is None:
            # sigma_only: the kernel never reads the view operand, but
            # the BlockSpec still streams it — a per-RAY zeros row
            # block (viewtile) keeps that dead traffic minimal
            vp_ray = jnp.zeros((r, 1), jnp.float32)
        cv = vp_ray.shape[-1]
        if vtile:
            # per-RAY view rows: the kernel broadcasts rays -> points
            # in VMEM (viewtile) — skips materializing the [N, 64]
            # per-point stream (34 ms/frame of wrapper at flagship fine
            # dims, PERF.md round-4 batch 8) and cuts the kernel's view
            # reads ~8x
            view64 = jnp.pad(vp_ray, ((0, 0), (0, _LANES - cv))
                             ).astype(jnp.bfloat16)
        else:
            # bf16 view features: the decoder matmul casts to bf16
            # anyway, and this halves the largest per-point kernel
            # input (HBM and VMEM traffic both)
            view64 = jnp.broadcast_to(
                jnp.pad(vp_ray, ((0, 0), (0, fused_decoder.HALF - cv))
                        ).astype(jnp.bfloat16).reshape(
                            nt, 1, tr, 1, fused_decoder.HALF),
                (nt, ns, tr, sl, fused_decoder.HALF)).reshape(
                    n_pts, fused_decoder.HALF)
        wpack, bpack, plan_info = fused_decoder.pack_decoder_weights(
            params, cfg, member)
        if origins is not None:
            # fastest entry: component-wise chunk pre-pass straight
            # from rays — no [.., 3]-minor points or [P, N, 2] grids
            # ever materialize (17.6 ms/4096 chunks saved, PERF.md r3)
            from nvsr_tpu.ops.pallas.tile_sampler import tiled_render_rays
            out8, overflow, ovf_mask = tiled_render_rays(
                planes_pos, origins, directions, z_vals, view64, wpack,
                bpack, plan_info, cfg, tile_cfg, box[:, :3], rot,
                align_corners=cfg.align_corners, interpret=interpret,
                tables=tile_tables,
                interp="cubic" if cfg.plane_interp == "bicubic"
                else "linear", view_tile=vtile, pack_ray=pray,
                sigma_only=sigma_only)
        else:
            from nvsr_tpu.ops.pallas.tile_sampler import \
                tiled_render_chunked
            pts_c = to_chunks(pts, nt, tr, ns, sl)          # [NC, B, 3]
            xyz = normalize_coords(pts_c.reshape(-1, 3), box[:, :3])
            grids = project_to_planes(xyz, rot)             # [P, N, 2]
            out8, overflow = tiled_render_chunked(
                planes_pos, grids.reshape(3, nt * ns, tr * sl, 2),
                view64, wpack, bpack, plan_info, cfg, tile_cfg,
                align_corners=cfg.align_corners, interpret=interpret,
                tables=tile_tables, sigma_only=sigma_only)
            ovf_mask = None
            pray = False
        if pray:
            # packray: the kernel already wrote ray-major rows
            # ([r, s*4], tile-coherent) — a contiguous reshape, no
            # transposes
            res = out8.reshape(r, s, 4)
        else:
            res = from_chunks(out8[:, :4].reshape(nt * ns, tr * sl, 4),
                              nt, tr, ns, sl).reshape(r, s, 4)
        if ovf_mask is not None and tile_cfg.repair_frac > 0:
            res, overflow = _repair_overflow_chunks(
                params, cfg, planes_pos, box, origins, directions,
                z_vals, None if sigma_only else vp_ray, ovf_mask, res,
                tile_cfg, member=member, rot_mats=rot,
                plane_resolution=plane_resolution,
                sigma_only=sigma_only)
        return res, overflow
    if origins is not None:
        z_c = to_chunks(z_vals[..., None], nt, tr, ns, sl)  # [NC, B, 1]
        o_c = jnp.broadcast_to(
            origins.reshape(nt, 1, tr, 1, 3),
            (nt, ns, tr, sl, 3)).reshape(nt * ns, tr * sl, 3)
        d_c = jnp.broadcast_to(
            directions.reshape(nt, 1, tr, 1, 3),
            (nt, ns, tr, sl, 3)).reshape(nt * ns, tr * sl, 3)
        pts_c = o_c + d_c * z_c
    else:
        pts_c = to_chunks(pts, nt, tr, ns, sl)              # [NC, B, 3]
    xyz = normalize_coords(pts_c.reshape(-1, 3), box[:, :3])
    if noise_key is not None and cfg.point_coords_noise:
        # train-time point_coords_noise on the normalized coords
        # (reference models.py:289-293) — drawn in chunk-major point
        # order here (same distribution; the tiled train path is an
        # opt-in whose ray order already differs from the reference)
        assert plane_resolution is not None
        std = cfg.point_coords_noise * 2.0 / (1 + plane_resolution)
        xyz = xyz + std * jax.random.normal(noise_key, xyz.shape, xyz.dtype)
    grids = project_to_planes(xyz, rot)                     # [P, N, 2]
    p = grids.shape[0]
    if trainable:
        # custom-VJP sampler: forward = the Pallas tile gather,
        # backward = hat-weight scatter into the pair table (the
        # training gather, reference train_nerf.py:903 backward
        # through grid_sample at models.py:303-309). The table is
        # built inside the VJP boundary — planes change every step
        from nvsr_tpu.ops.pallas.tile_sampler import \
            tiled_plane_sample_trainable
        pos_projs, overflow = tiled_plane_sample_trainable(
            planes_pos, grids.reshape(p, nt * ns, tr * sl, 2), tile_cfg,
            cfg.align_corners, interpret)
    elif cfg.plane_interp == "bicubic":
        from nvsr_tpu.ops.pallas.tile_sampler import \
            tiled_plane_sample_prechunked_bicubic
        pos_projs, overflow = tiled_plane_sample_prechunked_bicubic(
            planes_pos, grids.reshape(p, nt * ns, tr * sl, 2), tile_cfg,
            align_corners=cfg.align_corners, interpret=interpret,
            tables=tile_tables)
    else:
        pos_projs, overflow = tiled_plane_sample_prechunked(
            planes_pos, grids.reshape(p, nt * ns, tr * sl, 2), tile_cfg,
            align_corners=cfg.align_corners, interpret=interpret,
            tables=tile_tables)
    view_c = None
    if vp_ray is not None:
        cv = vp_ray.shape[-1]
        view_c = jnp.broadcast_to(
            vp_ray.reshape(nt, 1, tr, 1, cv),
            (nt, ns, tr, sl, cv)).reshape(r * s, cv)
    out = decode_projections(params, cfg, pos_projs, view_c,
                             member=member, sigma_only=sigma_only)
    return from_chunks(out.reshape(nt * ns, tr * sl, 4),
                       nt, tr, ns, sl).reshape(r, s, 4), overflow


def apply_triplane_rays_from_z(params, cfg: TriplaneConfig, planes_pos,
                               plane_view, box, origins, directions,
                               viewdirs, z_vals, *, member: int = 0,
                               rot_mats=None, tile_cfg, tile_tables=None,
                               trainable=False, noise_key=None,
                               plane_resolution=None, sigma_only=False):
    """Tiled ray forward straight from (origins, directions, z_vals) —
    skips the ray-major pts materialization entirely (points are
    generated chunk-major inside). origins/directions [R,3],
    z_vals [R,S] -> ([R,S,4], {"overflow_frac": scalar}) — the aux dict
    surfaces the fraction of chunks clamped to the static region
    capacity (the tiled path's safety net; 0.0 on supported geometry)."""
    r, s = z_vals.shape
    vp_ray = None
    if cfg.use_viewdirs and not sigma_only:
        # sigma_only (CDF-only coarse pass): the rgb branch is skipped
        # downstream, so the view-plane gathers are dead work too
        vp_ray = sample_viewdir_plane(plane_view, viewdirs, box, cfg,
                                      dense=not trainable)
    out, overflow = _apply_triplane_rays_tiled(
        params, cfg, planes_pos, box, None, vp_ray, r, s, member=member,
        noise_key=noise_key, rot_mats=rot_mats, tile_cfg=tile_cfg,
        tile_tables=tile_tables, origins=origins, directions=directions,
        z_vals=z_vals, trainable=trainable,
        plane_resolution=plane_resolution, sigma_only=sigma_only)
    return out, {"overflow_frac": overflow}


def make_density_fn(params, cfg: TriplaneConfig, planes_pos, box, *,
                    member: int = 0, rot_mats=None):
    """Density-only evaluator: [N,3] world xyz -> [N] sigma logits.

    Runs just the density branch (no viewdir plane / rgb head); used by
    occupancy estimation (ops/occupancy.py)."""
    m = params["members"][member]

    def density_fn(xyz_raw):
        xyz = normalize_coords(xyz_raw, box[:, :3])
        rot = rot_mats if rot_mats is not None \
            else make_rot_mats(cfg.num_planes)
        grids = project_to_planes(xyz, rot)
        pos_projs = sample_planes(planes_pos, grids, cfg)
        projected = combine_pos_planes(pos_projs, cfg.proj_combination)
        _, alpha = _mlp_branch(m["density"], m["fc_alpha"], projected, cfg)
        return alpha[..., 0]

    return density_fn

"""The fused rendering pipeline: rays -> coarse -> resample -> fine.

TPU-native re-design of the reference's rendering layer
(reference train_utils.py:15-331 `run_network` /
`predict_and_render_radiance` / `run_one_iter_of_nerf` / `eval_nerf`):

  * The whole coarse->fine pipeline is ONE jit-compiled function; the
    reference's two serial Python chunk loops (rays at
    train_utils.py:235-247, points at train_utils.py:48-56, with ad-hoc
    /10 and /4 divisors at train_utils.py:228-234) become a single
    `lax.map` over fixed-shape ray blocks, sized purely by memory.
  * Model families plug in through a `point_fn(pts, viewdirs, z_vals)`
    closure so the triplane model, the PE baseline, and the mip-IPE
    baseline share one pipeline.
  * Frozen-coarse "optional_no_grad" (reference train_nerf.py:349,560)
    maps to stop_gradient around the coarse radiance field.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.ops import encoding as enc
from nvsr_tpu.ops.geometry import ndc_rays
from nvsr_tpu.ops.rendering import RenderOutputs, volume_render
from nvsr_tpu.ops.sampling import hierarchical_z_vals, stratified_z_vals
from nvsr_tpu.models.nerf_mlp import apply_nerf_mlp
from nvsr_tpu.models.triplane import apply_triplane_rays


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static per-mode rendering settings (the `nerf.train` /
    `nerf.validation` config sections, reference config/TrainModels.yml)."""
    num_coarse: int = 64
    num_fine: int = 64
    perturb: bool = True
    lindisp: bool = False
    white_background: bool = False
    radiance_field_noise_std: float = 0.0
    use_viewdirs: bool = True
    mip: bool = False
    stop_coarse_grad: bool = False
    ray_block: int = 4096          # lax.map block size for large batches
    # keep per-sample z in RenderOutputs.z_vals (surface-AABB occupancy
    # tracking needs it; off by default — it is [R, S] extra output)
    keep_z: bool = False

    @classmethod
    def from_cfg(cls, mode_cfg, nerf_cfg, **overrides) -> "RenderConfig":
        kw = dict(
            num_coarse=mode_cfg.get("num_coarse", 64),
            num_fine=mode_cfg.get("num_fine", 64),
            perturb=bool(mode_cfg.get("perturb", False)),
            lindisp=mode_cfg.get("lindisp", False),
            white_background=mode_cfg.get("white_background", False),
            radiance_field_noise_std=mode_cfg.get(
                "radiance_field_noise_std", 0.0),
            use_viewdirs=nerf_cfg.get("use_viewdirs", True),
            mip=nerf_cfg.get("encode_position_fn", None) == "mip",
            # the reference chunksize counts rays pre-sample-expansion
            # (train_utils.py:228-235); our lax.map block is rays per
            # block, scaled down to keep a block's point batch on-chip
            ray_block=max(1024, mode_cfg.get("chunksize", 65536) // 16),
        )
        kw.update(overrides)
        return cls(**kw)


class RayBundle(NamedTuple):
    """Flat ray batch [R, ...]; near/far are [R, 1]."""
    origins: jnp.ndarray
    directions: jnp.ndarray
    near: jnp.ndarray
    far: jnp.ndarray
    viewdirs: Optional[jnp.ndarray] = None


def make_ray_bundle(ray_origins, ray_directions, near: float, far: float,
                    *, use_viewdirs: bool, no_ndc: bool = True,
                    hwf=None) -> RayBundle:
    """Assemble a flat RayBundle from [.., 3] origin/direction maps.

    Matches reference run_one_iter_of_nerf preprocessing
    (train_utils.py:207-226): viewdirs are normalized pre-NDC; NDC
    reprojection applies for forward-facing (LLFF) scenes.
    """
    ro = ray_origins.reshape(-1, 3)
    rd = ray_directions.reshape(-1, 3)
    viewdirs = None
    if use_viewdirs:
        viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    if not no_ndc:
        h, w, focal = hwf
        ro, rd = ndc_rays(h, w, focal, 1.0, ro, rd)
    near_a = jnp.full_like(rd[..., :1], near)
    far_a = jnp.full_like(rd[..., :1], far)
    return RayBundle(ro, rd, near_a, far_a, viewdirs)


@partial(jax.jit, static_argnames=("use_viewdirs", "no_ndc"))
def build_sampled_rays(pose, rows, cols, height, width, focal,
                       downsampling_offset, near, far, *,
                       use_viewdirs: bool, no_ndc: bool = True) -> RayBundle:
    """RayBundle for SELECTED pixels of one view, as a single jitted
    program.

    Replaces the reference's materialize-then-subset pattern
    (train_nerf.py:838-845 over full get_ray_bundle maps): the training
    loop picks pixel indices host-side and only ever computes — and
    keeps on-device — the `num_random_rays` rays it consumes.
    height/width/focal/offset/near/far are traced scalars, so one
    compilation serves every image size and scene.
    """
    from nvsr_tpu.ops.geometry import get_rays_at
    ro, rd = get_rays_at(rows, cols, height, width, focal, pose,
                         downsampling_offset)
    viewdirs = None
    if use_viewdirs:
        viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    if not no_ndc:
        ro, rd = ndc_rays(height, width, focal, 1.0, ro, rd)
    near_a = jnp.full_like(rd[..., :1], near)
    far_a = jnp.full_like(rd[..., :1], far)
    return RayBundle(ro, rd, near_a, far_a, viewdirs)


def tighten_bundle(rays: RayBundle, aabb, tile_rays: int = None) -> RayBundle:
    """Tighten a bundle's per-ray [near, far] to the occupied AABB
    (ops/occupancy.py); static shapes, opt-in sampling improvement.

    tile_rays: when the bundle is TILE-ordered (the Pallas tiled
    sampler's coherence contract), pass the tile size to tighten to the
    per-TILE UNION of the hit rays' intervals instead of per-ray
    bounds. Constant bounds per tile keep stratified ranks depth-
    aligned across the tile — per-ray intervals diverge near the box
    silhouette and blow chunk footprints past the region capacity
    (measured 68-row/119-col envelopes vs the 17-row in-production
    ones, tools/exp_fine_slab4.py). The union only ever WIDENS a hit
    ray's interval (never loses mass vs per-ray tightening); tiles
    with no hit at all stay per-ray degenerate (exact background)."""
    from nvsr_tpu.ops.occupancy import tighten_near_far
    near, far, hit = tighten_near_far(rays.origins, rays.directions,
                                      rays.near, rays.far, aabb)
    if tile_rays:
        nt = near.shape[0] // tile_rays
        hit_t = hit.reshape(nt, tile_rays)
        any_hit = jnp.any(hit_t, axis=1, keepdims=True)
        big = jnp.float32(3.4e38)
        n_t = jnp.min(jnp.where(hit_t, near.reshape(nt, tile_rays), big),
                      axis=1, keepdims=True)
        f_t = jnp.max(jnp.where(hit_t, far.reshape(nt, tile_rays), -big),
                      axis=1, keepdims=True)
        near = jnp.where(any_hit, n_t, near.reshape(nt, tile_rays)
                         ).reshape(near.shape)
        far = jnp.where(any_hit, f_t, far.reshape(nt, tile_rays)
                        ).reshape(far.shape)
    return rays._replace(near=near, far=far)


class RenderResult(NamedTuple):
    coarse: RenderOutputs
    fine: Optional[RenderOutputs]
    # diagnostics from aux-reporting point fns (point_fn.has_aux), e.g.
    # the tiled sampler's overflow_frac — reduced with max over
    # passes/blocks so any nonzero value survives to the caller
    aux: Optional[dict] = None


# point_fn(pts [R,S,3]|None, rays_block: RayBundle, z_vals) -> [R,S,4];
# point fns with .has_aux return ([R,S,4], {name: scalar}) instead
PointFn = Callable[[Optional[jnp.ndarray], "RayBundle", jnp.ndarray],
                   jnp.ndarray]


def render_rays(point_fn_coarse: PointFn, point_fn_fine: Optional[PointFn],
                rays: RayBundle, key, rcfg: RenderConfig) -> RenderResult:
    """Render a flat ray batch through the full coarse->fine pipeline.

    point_fn(pts [R,S,3]|None, rays_block, z_vals) -> [R,S,4]
    (for mip, pts is None: S counts intervals and z_vals has S+1 edges).

    Mirrors reference predict_and_render_radiance (train_utils.py:71-182).
    """
    k_strat, k_noise_c, k_hier, k_noise_f = jax.random.split(key, 4)
    s_coarse = rcfg.num_coarse + int(rcfg.mip)
    z_vals = stratified_z_vals(k_strat, rays.near, rays.far, s_coarse,
                               lindisp=rcfg.lindisp, perturb=rcfg.perturb)
    aux: dict = {}

    def run_pass(point_fn, z):
        if rcfg.mip or getattr(point_fn, "consumes_rays", False):
            # the point fn derives its own sample points from
            # (rays, z): mip casts conical frustums; the tiled triplane
            # path generates points chunk-major without materializing
            # the ray-major [R,S,3] pts
            out = point_fn(None, rays, z)
        else:
            pts = (rays.origins[..., None, :]
                   + rays.directions[..., None, :] * z[..., :, None])
            out = point_fn(pts, rays, z)
        if getattr(point_fn, "has_aux", False):
            out, pass_aux = out
            for k, v in pass_aux.items():
                aux[k] = jnp.maximum(aux[k], v) if k in aux else v
        return out

    rf_c = run_pass(point_fn_coarse, z_vals)
    if rcfg.stop_coarse_grad:
        rf_c = jax.lax.stop_gradient(rf_c)
    out_c = volume_render(
        rf_c, z_vals, rays.directions, noise_key=k_noise_c,
        radiance_field_noise_std=rcfg.radiance_field_noise_std,
        white_background=rcfg.white_background, mip=rcfg.mip,
        return_z=rcfg.keep_z)

    out_f = None
    if rcfg.num_fine > 0 and point_fn_fine is not None:
        weights = out_c.weights
        if rcfg.stop_coarse_grad:
            weights = jax.lax.stop_gradient(weights)
        z_fine = hierarchical_z_vals(k_hier, z_vals, weights,
                                     rcfg.num_fine + int(rcfg.mip),
                                     det=not rcfg.perturb, mip=rcfg.mip)
        rf_f = run_pass(point_fn_fine, z_fine)
        out_f = volume_render(
            rf_f, z_fine, rays.directions, noise_key=k_noise_f,
            radiance_field_noise_std=rcfg.radiance_field_noise_std,
            white_background=rcfg.white_background, mip=rcfg.mip,
            return_z=rcfg.keep_z)
    return RenderResult(out_c, out_f, aux)


def render_rays_chunked(point_fn_coarse, point_fn_fine, rays: RayBundle,
                        key, rcfg: RenderConfig, mesh=None) -> RenderResult:
    """Memory-bounded render of arbitrarily many rays.

    Pads to a multiple of rcfg.ray_block and `lax.map`s the fused
    pipeline over fixed-shape blocks — the TPU replacement for the
    reference's serial Python chunk loop (train_utils.py:235-247). One
    compiled program serves every image size with the same block shape.

    mesh: optional ('data','model') jax Mesh — each block's rays are
    sharded over the data axis (params should be replicated or
    tensor-sharded on the same mesh); XLA GSPMD inserts the collectives.
    """
    n = rays.origins.shape[0]
    block = min(rcfg.ray_block, max(n, 1))
    tile_rays = getattr(point_fn_coarse, "tile_rays", None)
    if mesh is not None and tile_rays is not None:
        # each data shard must hold whole ray tiles; round the block up
        # to the shard granularity (the pad rays render garbage that is
        # cropped on the way out)
        need = mesh.shape["data"] * tile_rays
        block = -(-block // need) * need
    n_blocks = -(-n // block)
    pad = n_blocks * block - n

    def pad_to(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    padded = RayBundle(*[None if f is None else pad_to(f) for f in rays])
    keys = jax.random.split(key, n_blocks)

    def one_block(args):
        blk_key, blk = args
        return render_rays(point_fn_coarse, point_fn_fine, blk, blk_key, rcfg)

    blocks = RayBundle(*[
        None if f is None else f.reshape(n_blocks, block, *f.shape[1:])
        for f in padded])
    if mesh is not None and tile_rays is not None:
        # tiled point fns contain a pallas_call, which GSPMD cannot
        # partition — shard each block's rays explicitly with shard_map
        # over the data axis instead. Preconditions (the caller gates on
        # them, experiment.eval_tile_cfg): whole image tiles per shard
        # and deterministic sampling (perturb off / no noise), so the
        # per-shard math is identical to the unsharded run's.
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        assert not rcfg.perturb and rcfg.radiance_field_noise_std == 0.0, \
            "mesh-sharded tiled eval requires deterministic sampling"

        def one_block_sharded(blk_key, blk):
            out = render_rays(point_fn_coarse, point_fn_fine, blk,
                              blk_key, rcfg)
            aux = {k: jax.lax.pmax(v, "data")
                   for k, v in (out.aux or {}).items()} or None
            return RenderResult(out.coarse, out.fine, aux)

        # pytree-PREFIX specs: P("data") applies to every per-ray leaf
        # of the coarse/fine outputs; aux scalars are replicated (pmax'd
        # inside the body)
        sharded = shard_map(
            one_block_sharded, mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=RenderResult(P("data"), P("data"), P()),
            check_vma=False)
        result = jax.lax.map(lambda args: sharded(args[0], args[1]),
                             (keys, blocks))
    else:
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            blocks = RayBundle(*[
                None if f is None else jax.device_put(
                    f, NamedSharding(mesh, P(None, "data")))
                for f in blocks])
            keys = jax.device_put(keys, NamedSharding(mesh, P()))
        result = jax.lax.map(one_block, (keys, blocks))

    def unblock(t):
        return None if t is None else jax.tree.map(
            lambda a: a.reshape(n_blocks * block, *a.shape[2:])[:n], t)

    aux = jax.tree.map(jnp.max, result.aux) if result.aux else None
    return RenderResult(unblock(result.coarse), unblock(result.fine), aux)


# ---------------------------------------------------------------------------
# point_fn builders for each model family
# ---------------------------------------------------------------------------

def make_triplane_point_fn(params, model_cfg, planes_pos, plane_view, box, *,
                           member: int = 0, noise_key=None,
                           plane_resolution=None, rot_mats=None,
                           tile_cfg=None, tile_train=False,
                           tile_tables=None,
                           sigma_only: bool = False) -> PointFn:
    """Triplane decoder point function (identity encoding; reference
    wires encode_* to identity for the planes model,
    train_nerf.py:312-314).

    tile_cfg: optional TileSamplerConfig — use the locality-bucketed
    Pallas plane sampler (requires tile-coherent ray order; see
    tile_ray_maps). The vertical-pair gather table is built HERE, once
    per point-fn, so the per-block sampling inside lax.map reuses it.

    sigma_only: CDF-only decode for an eval COARSE point fn — the rgb
    branch and the view-plane gathers are skipped (sigma bit-identical;
    rgb lanes hold the constant fc_rgb bias). The fine image of a
    coarse+fine render is unchanged: the hierarchical CDF consumes
    coarse WEIGHTS only (reference train_utils.py:131-156), and the
    fine pass re-decodes the merged z with its own decoder. Eval-only
    (the coarse image/loss diagnostics need the full decode; training
    always does)."""
    assert not (sigma_only and tile_train), \
        "sigma_only is an eval fast path; training needs coarse rgb"

    if tile_cfg is not None:
        from nvsr_tpu.models.triplane import apply_triplane_rays_from_z
        if tile_train:
            # trainable tiled path (custom-VJP sampler, XLA decoder):
            # no table prebuild — the pair table must live inside the
            # VJP boundary since the differentiated planes rebuild it
            # every training step
            tile_tables = None
        else:
            # the fused eval path cannot backprop or add coordinate
            # noise: a silently dropped training noise key would change
            # semantics with no signal
            assert noise_key is None and plane_resolution is None, (
                "tile_cfg without tile_train is an eval-only fast "
                "path; it does not support point_coords_noise "
                "(noise_key/plane_resolution)")
            if tile_tables is None:
                from nvsr_tpu.ops.pallas.tile_sampler import (
                    build_pair_tables, build_pair_tables_bicubic)
                build = build_pair_tables_bicubic \
                    if model_cfg.plane_interp == "bicubic" \
                    else build_pair_tables
                tile_tables = build(planes_pos, tile_cfg)

        def point_fn(pts, rays, z_vals):
            return apply_triplane_rays_from_z(
                params, model_cfg, planes_pos, plane_view, box,
                rays.origins, rays.directions, rays.viewdirs, z_vals,
                member=member, rot_mats=rot_mats, tile_cfg=tile_cfg,
                tile_tables=tile_tables, trainable=tile_train,
                noise_key=noise_key, plane_resolution=plane_resolution,
                sigma_only=sigma_only)

        point_fn.consumes_rays = True
        # returns ([R,S,4], {"overflow_frac": scalar}) — the fraction of
        # chunks whose footprint exceeded the static region capacity and
        # were nearest-cell clamped; render_rays max-reduces it into
        # RenderResult.aux so callers can detect and fall back
        point_fn.has_aux = True
        # the coherence contract for mesh-sharded eval: ray shards must
        # keep whole tiles (render_rays_chunked's shard_map branch)
        point_fn.tile_rays = tile_cfg.tile_rays
        return point_fn

    def point_fn(pts, rays, z_vals):
        return apply_triplane_rays(
            params, model_cfg, planes_pos, plane_view, box, pts,
            rays.viewdirs, member=member, noise_key=noise_key,
            plane_resolution=plane_resolution, rot_mats=rot_mats,
            sigma_only=sigma_only)

    return point_fn


# ---------------------------------------------------------------------------
# Image-tile ray ordering (for the locality-bucketed plane sampler)
# ---------------------------------------------------------------------------

def _tile_hw(tile):
    return (tile, tile) if isinstance(tile, int) else tile


def tile_ray_maps(arr, tile=8):
    """[H, W, ...] image-shaped map -> [H*W, ...] rays in tile-major
    order: each group of th*tw consecutive rays is one image tile (the
    spatial-coherence contract of
    ops/pallas/tile_sampler.TileSamplerConfig.tile_rays = th*tw).
    tile: side length, or an (th, tw) pair for rectangular tiles.
    Dense reshape/transpose only — no gathers."""
    th_, tw_ = _tile_hw(tile)
    h, w = arr.shape[:2]
    assert h % th_ == 0 and w % tw_ == 0, (h, w, tile)
    x = arr.reshape(h // th_, th_, w // tw_, tw_, *arr.shape[2:])
    x = jnp.moveaxis(x, 1, 2)
    return x.reshape(h * w, *arr.shape[2:])


def untile_ray_maps(flat, height: int, width: int, tile=8):
    """Inverse of tile_ray_maps: [H*W, ...] tile-major -> [H, W, ...]."""
    th_, tw_ = _tile_hw(tile)
    x = flat.reshape(height // th_, width // tw_, th_, tw_,
                     *flat.shape[1:])
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape(height, width, *flat.shape[1:])


def make_baseline_point_fn(params, mlp_cfg, *, num_encoding_fn_xyz=6,
                           num_encoding_fn_dir=4, include_input_xyz=True,
                           include_input_dir=True, mip=False,
                           ds_factor: int = 1,
                           ipe_multires: int = 10) -> PointFn:
    """PE / mip-IPE baseline point function.

    mip mode reproduces reference run_network's cast (train_utils.py:19-27):
    per-scene pixel radius dx = ds_factor * 0.00135, radii = dx*2/sqrt(12),
    IPE over conical frustum Gaussians between z edges.
    """

    def point_fn(pts, rays, z_vals):
        if mip:
            radii = ds_factor * 0.00135 * 2.0 / np.sqrt(12.0)
            means, covs = enc.cast_rays(z_vals, rays.origins, rays.directions,
                                        radii)
            embedded = enc.integrated_positional_encoding(
                (means, covs), min_deg=0, max_deg=ipe_multires - 1)
            r, s = embedded.shape[:2]
            embedded = embedded.reshape(r * s, -1)
        else:
            r, s, _ = pts.shape
            flat = pts.reshape(-1, 3)
            embedded = enc.positional_encoding(flat, num_encoding_fn_xyz,
                                               include_input_xyz)
        if mlp_cfg.use_viewdirs:
            dirs = jnp.broadcast_to(rays.viewdirs[:, None, :], (r, s, 3))
            emb_d = enc.positional_encoding(dirs.reshape(-1, 3),
                                            num_encoding_fn_dir,
                                            include_input_dir)
            embedded = jnp.concatenate([embedded, emb_d], axis=-1)
        out = apply_nerf_mlp(params, mlp_cfg, embedded)
        return out.reshape(r, s, 4)

    return point_fn


def render_image(point_fn_coarse, point_fn_fine, ray_origins, ray_directions,
                 key, rcfg: RenderConfig, *, near: float, far: float,
                 no_ndc: bool = True, hwf=None, mesh=None,
                 occ_aabb=None, tile: Optional[int] = None,
                 tighten_tile_union: bool = True) -> RenderResult:
    """Full-image render: [H,W,3] ray maps -> maps with [H,W,...] leading
    shape (reference eval_nerf, train_utils.py:285-331).

    occ_aabb: optional [2,3] occupied AABB — per-ray [near, far] are
    tightened to its slab intersection (must match how the scene was
    trained; ops/occupancy.py).

    tile: optional image-tile side (or (th, tw) pair) — rays are
    rendered in tile-major order (the coherence contract of the Pallas
    tile sampler; the point fns must have been built with a matching
    tile_cfg) and the output maps are restored to image order. Images
    whose H or W is not a tile multiple are edge-padded to one and
    cropped on the way out (e.g. every LLFF resolution), so the fast
    path serves arbitrary sizes."""
    h, w = ray_origins.shape[:2]
    hp, wp = h, w
    if tile:
        th_, tw_ = _tile_hw(tile)
        ph, pw = (-h) % th_, (-w) % tw_
        if ph or pw:
            pad = ((0, ph), (0, pw)) + ((0, 0),) * (ray_origins.ndim - 2)
            ray_origins = jnp.pad(ray_origins, pad, mode="edge")
            ray_directions = jnp.pad(ray_directions, pad, mode="edge")
            hp, wp = h + ph, w + pw
        ray_origins = tile_ray_maps(ray_origins, tile)
        ray_directions = tile_ray_maps(ray_directions, tile)
    rays = make_ray_bundle(ray_origins, ray_directions, near, far,
                           use_viewdirs=rcfg.use_viewdirs, no_ndc=no_ndc,
                           hwf=hwf)
    # tighten_tile_union=False: per-RAY [near, far] even for a tiled
    # render. Per-ray intervals sample exactly what the XLA path
    # samples (the per-tile UNION alone cost 0.16 dB absolute on the
    # trained gate scene — the entire round-4 "tiled eval gap", PERF.md
    # round 5), at the price of rank-misaligned chunk footprints. Only
    # valid for configs that absorb the misalignment: the compact
    # ladder step (slab 1, full regions, hybrid repair) measured
    # 3.6% raw clamps -> 0.0 after repair; the default envelope
    # overflows 65% per-ray and must keep the union.
    if occ_aabb is not None:
        rays = tighten_bundle(rays, jnp.asarray(occ_aabb),
                              tile_rays=th_ * tw_
                              if tile and tighten_tile_union else None)
    result = render_rays_chunked(point_fn_coarse, point_fn_fine, rays, key,
                                 rcfg, mesh=mesh)

    def reshape(out):
        if out is None:
            return None
        if tile:
            return jax.tree.map(
                lambda a: untile_ray_maps(a, hp, wp, tile)[:h, :w], out)
        return jax.tree.map(lambda a: a.reshape(h, w, *a.shape[1:]), out)

    return RenderResult(reshape(result.coarse), reshape(result.fine),
                        result.aux)

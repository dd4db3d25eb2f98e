"""Locality-bucketed feature-plane sampler (the TPU gather-wall breaker).

The rendering pipeline's cost is dominated by random row gathers from
the feature planes (PERF.md): XLA's gather engine tops out at ~50-60M
rows/s per chip regardless of row size (per-row descriptor overhead).
This module replaces it, for ray-structured eval batches, with a Pallas
kernel that exploits the spatial coherence of sample points:

  * Rays are ordered in image tiles (`tile_rays` consecutive rays form
    an 8x8 pixel tile — see render.py::tile_ray_maps) and samples are
    chunked into depth slabs (`slab` consecutive sorted z-samples), so
    each (tile, slab) chunk of B = tile_rays*slab points projects into
    a compact plane region.
  * A pre-pass (pure jnp, dense) computes each chunk's region origin
    and each point's continuous local flat coordinate.
  * The kernel DMAs each chunk's [th, tw]-cell region HBM->VMEM once
    (double-buffered across grid steps, `group` regions per step to
    amortize the per-step floor) and turns the bilinear x-interpolation
    into ONE hat-weight matmul on the MXU:
        w[b, t] = relu(1 - |t - fidx_b|)     (two nonzeros: the x taps)
        rows    = w @ region                 [B, T] @ [T, 128]
    The table packs each cell's channels for rows y AND y+1
    (vertical-pair layout, 2x64 lanes), so the single matmul
    x-interpolates both vertical taps; a cheap XLA epilogue finishes
    the y-lerp.

Measured (tools/exp_tile_kernel*.py + exp_mega_rate.py, 1x v5e):
~250M rows/s full megakernel at production shapes vs the 60M rows/s
XLA gather baseline; see PERF.md rounds 2-3.

The module has grown into the full fast sampling/decoding subsystem:

  * `_tile_gather`          standalone gather kernel (linear or cubic
                            MXU select weights);
  * the MEGAKERNEL          (`tiled_render_rays` / `_mega_call`):
                            region DMAs + gather matmuls + y-combine +
                            the ENTIRE decoder in one pallas call, with
                            the decoder hoisted across the region group
                            (one decode per grid step at M=group*B —
                            the kernel is matmul-issue bound);
  * bilinear AND bicubic    (`build_pair_tables` /
                            `build_pair_tables_bicubic`: bicubic
                            fetches A (y,y+1) and B (y-1,y+2) pair
                            regions and y-combines with the 4-tap
                            cubic weights — torch-exact borders);
  * a TRAINABLE custom-VJP  (`tiled_plane_sample_trainable`: backward
                            = hat-weight scatter into the pair table),
                            used by the coarse pass of tile-coherent
                            training batches.

Semantics: numerically matches grid_sample_2d(..., 'bilinear'|
'bicubic', padding_mode='border') with bfloat16 tap values AND
bfloat16 interpolation weights (the XLA packed path keeps weights
f32). Points of a chunk whose region exceeds [th, tw] cells are
clamped to the region (nearest-cell approximation); the returned
overflow fraction reports how many chunks clamped, and the production
eval falls back to the XLA path on any nonzero value. Tiled eval is
the DEFAULT production path on TPU (experiment.eval_tile_cfg).

Reference behavior being replaced: grid_sample at reference
models.py:303-309 — same math, locality-bucketed execution.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LANES = 128      # table cell width: 2 vertical taps x 64 channel lanes
HALF = 64        # per-tap channel slot (supports up to 64 channels)
YALIGN = 8       # region row origins align to the bf16 2-D tile rows
                 # (Mosaic tiles 2-D bf16 HBM memrefs (8,128)(2,1))


@dataclasses.dataclass(frozen=True)
class TileSamplerConfig:
    """Static chunk/region geometry (hashable; safe as a jit static).

    Capacity: a chunk fits when its points span <= th - (YALIGN-1)
    region rows (the y origin aligns DOWN to the 8-row tile) and
    <= tw - 1 cells in x (x origins are lane-granular, i.e. free).
    Defaults cover the measured worst-case extents of 8x8-ray x
    4-sample chunks at both the HR (800^2) and LR (200^2) plane
    resolutions of the flagship workflow across viewpoints
    (~16 cells either axis; tools/exp_tile_kernel*.py studies)."""
    tile_rays: int = 64    # rays per image tile (8x8)
    slab: int = 4          # consecutive z-samples per chunk
    th: int = 24           # region rows (y capacity: th - YALIGN + 1)
    tw: int = 18           # region cells per row (x capacity: tw - 1)
    group: int = 8         # regions per kernel grid step
    # shrink (th, tw) per pass to the measured chunk extents of
    # (S, plane_res) — the gather matmul's contraction dim is T = th*tw,
    # so smaller regions cut the kernel's dominant cost (62% of kernel
    # time at T=432, tools/exp_mega_rate.py round 3). Regions only ever
    # shrink below (th, tw), so tables built at the config dims stay
    # valid; overflow_frac + the eval XLA fallback are the safety net
    # on geometry outside the measured envelope.
    adaptive_region: bool = True
    # hybrid overflow repair: when > 0, up to ceil(repair_frac * NC)
    # clamped chunks per call are re-evaluated EXACTLY through the XLA
    # point path (gather + full decoder) and scattered over the kernel
    # output; overflow_frac then reports only the residual beyond the
    # budget. 0 disables (zero overhead — the flagship envelope never
    # clamps). Used by the tiled-eval ladder's compact step: fine-pass
    # importance-sampled ranks diverge at depth silhouettes, so a few
    # %% of chunks exceed ANY static envelope on converged fields
    # (round-4 study, tools/exp_gate_overflow.py).
    repair_frac: float = 0.0
    # hat-weight-build lowering inside the v2 megakernel: "vpu"
    # (max(0, 1-|d|), ~4 VPU passes per chunk-plane) or "mxu" (one
    # rank-2 dot_general producing [d+1 | 1-d] for all 3 planes, then
    # relu(min(..)) in 2 passes over [T, 3B]) — the build is 19% of
    # kernel time at fine dims (PERF.md R5 batch 5). ULP-equal, not
    # bit-exact (f32 addition order before the shared bf16 cast).
    # NVSR_MEGA_WBUILD overrides at trace time (fresh-process A/Bs).
    wbuild: str = "vpu"

    def __post_init__(self):
        assert self.th % 8 == 0, "region rows must align to sublanes"

    @property
    def chunk_points(self) -> int:
        return self.tile_rays * self.slab


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _scratch_budget() -> int:
    """Megakernel double-buffered region scratch budget in MB (caps the
    per-step region `group`). 6 MB measured best at round-2 shapes;
    env knob NVSR_MEGA_SCRATCH_MB sweeps it without code edits (VMEM
    itself is capped by vmem_limit_bytes=100MB on the kernel)."""
    import os
    return int(os.environ.get("NVSR_MEGA_SCRATCH_MB", 6))


def choose_slab(num_samples: int, plane_res: int,
                config: TileSamplerConfig) -> int:
    """Depth-slab length that keeps chunk footprints inside the region
    capacity: a slab spans ~ slab * interval_px / S plane cells along
    the ray direction, so larger planes or fewer samples need shorter
    slabs (derivation + failure measurement in PERF.md round 2)."""
    k = num_samples * 256 / max(plane_res, 1)
    slab = 4 if k >= 16 else (2 if k >= 8 else 1)
    slab = min(slab, config.slab)
    while num_samples % slab:
        slab //= 2
    return max(slab, 1)


def choose_region_dims(num_samples: int, plane_res: int, slab: int,
                       tile_rays: int, config: TileSamplerConfig):
    """Per-pass region dims (th, tw), never exceeding the config's.

    Measured chunk extents on flagship-class geometry (16x16-ray tiles,
    slab 2, per-TILE UNION occupancy bounds; extent study in PERF.md
    round 3, pinned by tests/test_tile_sampler.py):
      fine   (S=32 @ 800^2): <= 18 aligned rows, <= 14 x-cells (+tap)
                             at the bench eye; <= 23/<= 17 across the
                             6-viewpoint sweep
      coarse (S=16 @ 200^2): <= 12 aligned rows, <=  8 x-cells (+tap)
    The x extent is set mostly by the TILE's on-plane footprint (which
    scales with plane_res), the y/aligned-row extent by footprint plus
    the slab's depth motion (which shrinks as sampling densifies, i.e.
    as k = S*256/res grows). The fine tw is 16 (= 2 capacity margin,
    and T = 24*16 = 384 = 3 full 128-lane tiles); geometry outside the
    envelope clamps, reports overflow_frac, and falls back to the
    exact XLA path at eval."""
    cap = int(os.environ.get("NVSR_CHUNK_CAP", "512"))
    if (not config.adaptive_region or tile_rays * slab > cap
            or slab > 2):
        # B=1024 slab-4 coarse chunks (NVSR_CHUNK_CAP=1024 A/B) keep
        # the full config regions: slab-4 LR footprints at flagship
        # geometry measure <= 15 rows and <= 17 x-cells (the depth
        # motion of the x-carrying planes lands in the CELL axis —
        # /tmp round-5 extent study) = exactly the (24, 18) defaults
        return config.th, config.tw
    k = num_samples * 256 / max(plane_res, 1)
    if plane_res <= 400 and k >= 16:
        th, tw = 16, 10     # LR-plane coarse passes (8-12 measured)
        ov = os.environ.get("NVSR_REGION_LR", "")
    elif k >= 8 or plane_res > 400:
        th, tw = 24, 16     # HR-plane fine passes (14-18 measured)
        ov = os.environ.get("NVSR_REGION_HR", "")
    else:                   # sparse sampling: footprints grow, keep full
        th, tw = config.th, config.tw
        ov = ""
    if ov:
        # measurement knob (A/B region-dim frontiers on hardware; read
        # at trace time — one process per setting, see CLAUDE.md):
        # "THxTW", e.g. NVSR_REGION_LR=16x8. Larger-than-config dims
        # are allowed only when the table was built at least that big.
        th_s, _, tw_s = ov.partition("x")
        return int(th_s), int(tw_s)
    return min(th, config.th), min(tw, config.tw)


def viewtile_ok(num_samples: int, config: TileSamplerConfig) -> bool:
    """True when the megakernel can take PER-RAY view rows ([R, 128]
    bf16, tile-coherent ray order) and broadcast them to points
    in-kernel ("viewtile") instead of the caller materializing the
    [N, 64] per-point view stream — 34 ms/frame of wrapper time plus
    8x the kernel's view bytes at flagship fine dims (PERF.md round-4
    batch 8). Requires the v2 kernel (grid-step group pinned to 8) and
    grid steps that align to image-tile boundaries: with ns = S / slab
    chunks per tile, either 8 | ns (several steps per tile) or ns | 8
    (whole tiles per step)."""
    if os.environ.get("NVSR_MEGA_V1", "0") != "0":
        return False
    if os.environ.get("NVSR_MEGA_BATCHDEC", "0") != "0":
        return False
    if os.environ.get("NVSR_MEGA_VIEWTILE", "1") == "0":
        return False
    if config.tile_rays % 8:        # view block sublane dim must be 8k
        return False
    ns = num_samples // config.slab
    grp = int(os.environ.get("NVSR_MEGA_GROUP", "8"))
    return ns % grp == 0 or grp % ns == 0


def packray_ok(num_samples: int, config: TileSamplerConfig) -> bool:
    """True when the megakernel can ALSO write ray-major output
    ("packray": [R, S*4] f32, all samples of a ray in lanes) instead of
    the chunk-major point stream — eliminating both post-kernel
    transposes (packout unpack + from_chunks, 54 ms/flagship fine frame
    standalone; PERF.md round-4 batch 8) and halving output bytes.
    Requires the viewtile alignment (same tile <-> grid-step structure)
    and either all of a ray's samples fitting one 128-lane register
    (S*4 <= 128; the out block is revisited across a tile's k steps) or
    whole-cell rows where each grid step fills exactly one 128-lane
    cell (S*4 % 128 == 0 with group*slab*4 == 128 — the 64+64 / 32+32
    reference-semantics configs at the shipped group)."""
    if os.environ.get("NVSR_MEGA_PACKRAY", "1") == "0":
        return False
    if not viewtile_ok(num_samples, config):
        return False
    S4 = num_samples * 4
    if S4 <= 128:
        return True
    grp = int(os.environ.get("NVSR_MEGA_GROUP", "8"))
    return S4 % 128 == 0 and grp * config.slab * 4 == 128


def build_pair_tables(planes, config: TileSamplerConfig):
    """[P, C, H, W] planes -> stacked vertical-pair table.

    Returns (table [P*Hp, Wp*LANES] bf16, Hp, Wp). Cell (p, y, x) lives
    at row p*Hp + y, lanes [x*128, (x+1)*128): channels of (y, x) in
    lanes [0, 64) and of (min(y+1, H-1), x) in [64, 128) — edge
    replication reproduces 'border' padding for the y tap; x edges are
    handled by coordinate clipping in the pre-pass. H is padded to a
    sublane-aligned Hp and W by tw cells so every region DMA is in
    bounds.
    """
    P, C, H, W = planes.shape
    assert C <= HALF, f"tile sampler supports <= {HALF} channels, got {C}"
    # Hp >= th keeps oy's clip upper bound (Hp - th) non-negative: a
    # plane shorter than one region would otherwise produce a negative
    # region-row origin and an out-of-bounds HBM DMA (edge-padding the
    # extra rows is cheap and exact — y coords are clipped to H-1)
    Hp = max(_round_up(H, YALIGN), config.th)
    Wp = W + config.tw
    top = jnp.pad(planes, ((0, 0), (0, HALF - C), (0, 0), (0, 0)))
    bot = jnp.concatenate([top[:, :, 1:, :], top[:, :, -1:, :]], axis=2)
    cells = jnp.concatenate([top, bot], axis=1)          # [P, 128, H, W]
    cells = cells.transpose(0, 2, 3, 1)                  # [P, H, W, 128]
    cells = jnp.pad(cells, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)),
                    mode="edge")
    table = cells.reshape(P * Hp, Wp * LANES).astype(jnp.bfloat16)
    return table, Hp, Wp


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _cubic_weight(d, A: float = -0.75):
    """Torch's cubic convolution kernel over signed tap distance d
    (nonzero for |d| < 2; ops/grid_sample.py::_cubic_coeffs evaluated
    pointwise). Vectorized for the in-kernel [B, T] weight build."""
    ad = jnp.abs(d)
    w_near = ((A + 2.0) * ad - (A + 3.0)) * ad * ad + 1.0
    w_far = ((A * ad - 5.0 * A) * ad + 8.0 * A) * ad - 4.0 * A
    return jnp.where(ad <= 1.0, w_near,
                     jnp.where(ad < 2.0, w_far, 0.0))


def _gather_weights(cols, fidx, kernel: str):
    """[B, T] MXU select weights from local flat coords: 'linear' = the
    2-tap bilinear hat; 'cubic' = the 4-tap cubic convolution window
    (x taps of torch bicubic; the y taps ride the A/B pair tables)."""
    if kernel == "cubic":
        return _cubic_weight(cols - fidx).astype(jnp.bfloat16)
    return jnp.maximum(0.0, 1.0 - jnp.abs(cols - fidx)
                       ).astype(jnp.bfloat16)


def _kernel(org_cur, org_nxt, fidx_ref, table_ref, out_ref, region, sem, *,
            th, tw, group, B, kernel="linear"):
    T = th * tw
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, org, g):
        oy = pl.multiple_of(org[0, g, 0], YALIGN)
        ox = pl.multiple_of(org[0, g, 1] * LANES, LANES)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(oy, th), pl.ds(ox, tw * LANES)],
            region.at[slot, g],
            sem.at[slot, g])

    @pl.when(i == 0)
    def _():
        for g in range(group):
            dma(0, org_cur, g).start()

    @pl.when(i + 1 < n)
    def _():
        for g in range(group):
            dma((i + 1) % 2, org_nxt, g).start()

    slot = i % 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1).astype(jnp.float32)
    for g in range(group):
        fidx = fidx_ref[pl.ds(g * B, B), :1]
        w = _gather_weights(cols, fidx, kernel)
        dma(slot, org_cur, g).wait()
        flat = region[slot, g].reshape(T, LANES)
        out_ref[pl.ds(g * B, B), :] = jnp.dot(
            w, flat, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("th", "tw", "group", "B", "kernel",
                                    "interpret"))
def _tile_gather(table, oy, ox, fidx, *, th, tw, group, B,
                 kernel="linear", interpret=False):
    """table [Ht, Wt*128] bf16; oy [nchunks] (global table rows, aligned),
    ox [nchunks] (cells); fidx [nchunks*B, 1] f32 local flat coords
    -> [nchunks*B, 128] bf16 x-interpolated vertical tap pairs.

    Region origins arrive as ordinary SMEM blocks pipelined through the
    grid (two index_map views: step i for the compute/waits, step i+1
    for the cross-step double-buffer prefetch) — NOT as scalar-prefetch
    operands: when a PrefetchScalarGridSpec's scalars are produced by
    the SAME XLA program, their staging serializes with the launch and
    cost ~6 ms/call at production sizes (PERF.md round 2)."""
    nchunks = oy.shape[0]
    nsteps = nchunks // group
    assert nsteps * group == nchunks
    org = jnp.stack([oy, ox], axis=-1).reshape(nsteps, group, 2)
    org = jnp.concatenate([org, org[-1:]], axis=0)   # pad the i+1 view
    return pl.pallas_call(
        functools.partial(_kernel, th=th, tw=tw, group=group, B=B,
                          kernel=kernel),
        out_shape=jax.ShapeDtypeStruct((nchunks * B, LANES), jnp.bfloat16),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, group, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, group, 2), lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((group * B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((group * B, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, group, th, tw * LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
        interpret=interpret,
    )(org, org, fidx, table)


def to_chunks(x, ntiles, tile_rays, nslabs, slab):
    """[..., R, S, D] -> [..., ntiles*nslabs, tile_rays*slab, D]
    chunk-major (one dense transpose; D rides along)."""
    lead = x.shape[:-3]
    D = x.shape[-1]
    x = x.reshape(*lead, ntiles, tile_rays, nslabs, slab, D)
    x = jnp.moveaxis(x, -3, -4)        # [..., ntiles, nslabs, rays, slab, D]
    return x.reshape(*lead, ntiles * nslabs, tile_rays * slab, D)


def from_chunks(x, ntiles, tile_rays, nslabs, slab):
    """Inverse of to_chunks: [..., NC, B, D] -> [..., R, S, D]."""
    lead = x.shape[:-3]
    D = x.shape[-1]
    x = x.reshape(*lead, ntiles, nslabs, tile_rays, slab, D)
    x = jnp.moveaxis(x, -3, -4)
    return x.reshape(*lead, ntiles * tile_rays, nslabs * slab, D)


def build_pair_tables_bicubic(planes, config: TileSamplerConfig):
    """[P, C, H, W] planes -> stacked A/B vertical-pair tables for the
    bicubic tiled sampler.

    Torch bicubic (reference models.py:303-309 with plane_interp
    'bicubic'; ops/grid_sample.py::_bicubic is the torch-oracled XLA
    form) reads a 4x4 tap window around (x0, y0) = floor of the
    UNCLIPPED source coordinate, clamping tap indices to the plane
    ('border'). Layout here:
      * columns: table col c holds plane col clip(c - 2, 0, W-1) —
        2 replicated columns on the left (x taps reach x0-1 >= -2 once
        the source x is clipped to [-1, W], which is exact: outside
        that every tap clamps and the cubic weights sum to 1) and
        3 + tw on the right.
      * rows: base row r (r = y0 + 1, y0 in [-1, H]) holds, in the
        A table, plane rows (clip(y0), clip(y0+1)) in lane halves —
        exactly build_pair_tables shifted by one replicated row — and
        in the B table rows (clip(y0-1), clip(y0+2)): the outer y taps.
      * the B table is stacked BELOW the A table: one [2*P*Hp, Wp*128]
        bf16 array, so one kernel call serves both with plain row
        origins (B origins = A origins + P*Hp).
    Returns (table, Hp, Wp).
    """
    P, C, H, W = planes.shape
    assert C <= HALF, f"tile sampler supports <= {HALF} channels, got {C}"
    Hp = max(_round_up(H + 2, YALIGN), config.th)
    Wp = W + 5 + config.tw
    x = jnp.pad(planes, ((0, 0), (0, HALF - C), (0, 0), (0, 0)))
    # row-padded stack: q holds plane row clip(q - 2, 0, H - 1)
    ypad = jnp.concatenate([x[:, :, :1]] * 2 + [x] + [x[:, :, -1:]] * 3,
                           axis=2)                       # [P, 128?, H+5, W]

    def rows(q0):     # base rows r in [0, H+2) -> plane rows r + q0 - 2
        return ypad[:, :, q0:q0 + H + 2]

    a_cells = jnp.concatenate([rows(1), rows(2)], axis=1)   # (y0, y0+1)
    b_cells = jnp.concatenate([rows(0), rows(3)], axis=1)   # (y0-1, y0+2)

    def finish(cells):
        cells = cells.transpose(0, 2, 3, 1)              # [P, H+2, W, 128]
        cells = jnp.pad(cells, ((0, 0), (0, Hp - (H + 2)), (2, 3 + config.tw),
                                (0, 0)), mode="edge")
        return cells.reshape(P * Hp, Wp * LANES)

    table = jnp.concatenate([finish(a_cells), finish(b_cells)], axis=0)
    return table.astype(jnp.bfloat16), Hp, Wp


def _cubic_coeffs4(t, A: float = -0.75):
    """(w_{-1}, w_0, w_1, w_2) tap weights from the fractional offset t
    (== ops/grid_sample.py::_cubic_coeffs)."""
    return (_cubic_weight(-1.0 - t, A), _cubic_weight(-t, A),
            _cubic_weight(1.0 - t, A), _cubic_weight(2.0 - t, A))


def tiled_plane_sample_prechunked_bicubic(
        planes, g_c, config: TileSamplerConfig, align_corners: bool = True,
        interpret: bool = False, tables=None):
    """Bicubic tiled sampler on chunk-ordered grids (eval-only).

    planes [P, C, H, W]; g_c [P, NC, B, 2] chunk-ordered normalized
    grids -> ([P, NC*B, C] f32 chunk-major features, overflow_frac).
    The x interpolation runs as a 4-tap cubic MXU matmul against the
    region (kernel='cubic'); the 4 y taps come from the stacked A/B
    pair tables, combined by a cubic epilogue. Matches
    grid_sample_2d(..., 'bicubic', border) to bf16 tap/weight
    precision. ~2x the bilinear tiled cost (two regions + two matmuls
    per chunk-plane) — still far under the 16-gathers/point XLA path.
    """
    P, C, H, W = planes.shape
    _, NC, B, _ = g_c.shape
    th, tw = config.th, config.tw

    table, Hp, Wp = tables if tables is not None \
        else build_pair_tables_bicubic(planes, config)

    # UNCLIPPED source coords, then clip to [-1, size]: exact for torch
    # border semantics (see build_pair_tables_bicubic docstring)
    xs = jnp.clip(_unnormalize(g_c[..., 0], W, align_corners), -1.0,
                  float(W))
    ys = jnp.clip(_unnormalize(g_c[..., 1], H, align_corners), -1.0,
                  float(H))
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    tx = xs - x0
    ty = ys - y0
    r = y0.astype(jnp.int32) + 1                       # table base row
    c0 = x0.astype(jnp.int32) + 1                      # min-tap table col

    rmin, rmax = jnp.min(r, axis=-1), jnp.max(r, axis=-1)
    cmin, cmax = jnp.min(c0, axis=-1), jnp.max(c0, axis=-1)
    oy = jnp.clip((rmin // YALIGN) * YALIGN, 0, Hp - th)   # [P, NC]
    ox = jnp.clip(cmin, 0, Wp - tw)
    overflow = ((rmax - oy > th - 1) | (cmax + 3 - ox > tw - 1))
    overflow_frac = jnp.mean(overflow.astype(jnp.float32))

    yl = jnp.clip(r - oy[..., None], 0, th - 1).astype(jnp.float32)
    # local float x position; taps floor(fx)-1..+2 stay inside the row
    # for fx in [1, tw-2): clamp (with the overflow report) otherwise.
    # The bound must MATCH the overflow predicate above (in-capacity
    # iff fx < tw-2): a tighter clamp silently shifts the 4-tap window
    # one cell left for boundary points the predicate declares valid.
    fx = jnp.clip(xs + 2.0 - ox[..., None].astype(xs.dtype), 1.0,
                  tw - 2.0 - 1e-3)
    fidx = yl * tw + fx                                 # [P, NC, B]

    plane_row0 = (jnp.arange(P, dtype=jnp.int32) * Hp)[:, None]
    oyA = (oy + plane_row0).reshape(-1)
    oyB = oyA + P * Hp
    oy2 = jnp.concatenate([oyA, oyB])
    ox2 = jnp.tile(ox.reshape(-1), 2)
    fidx2 = jnp.tile(fidx.reshape(-1, 1), (2, 1))

    nchunks = oy2.shape[0]
    pad = _round_up(nchunks, config.group) - nchunks
    if pad:
        oy2 = jnp.pad(oy2, (0, pad))
        ox2 = jnp.pad(ox2, (0, pad))
        fidx2 = jnp.pad(fidx2, ((0, pad * B), (0, 0)))

    rows = _tile_gather(table, oy2, ox2, fidx2, th=th, tw=tw,
                        group=config.group, B=B, kernel="cubic",
                        interpret=interpret)
    n = P * NC * B
    ra, rb = rows[:n], rows[n:2 * n]
    wm1, w0, w1, w2 = _cubic_coeffs4(ty.reshape(-1, 1))
    out = (wm1 * rb[:, :C].astype(jnp.float32)
           + w0 * ra[:, :C].astype(jnp.float32)
           + w1 * ra[:, HALF:HALF + C].astype(jnp.float32)
           + w2 * rb[:, HALF:HALF + C].astype(jnp.float32))
    return out.reshape(P, NC * B, C), overflow_frac


def _grid_chunk_descriptors(g_c, H, W, Hp, config: TileSamplerConfig,
                            align_corners: bool):
    """Per-chunk region descriptors from chunk-ordered grids.

    g_c [P, NC, B, 2] normalized (x, y) -> (oy [P, NC] aligned region
    row origins, ox [P, NC] cell origins, fidx [P, NC, B] local flat
    coords, ty [P, NC, B] vertical lerp weights, overflow_frac). Shared
    by the forward sampler and the custom-VJP backward (which must
    rebuild the exact forward descriptors, clamping included, so the
    gradient matches what the forward actually computed)."""
    th, tw = config.th, config.tw
    xp = jnp.clip(_unnormalize(g_c[..., 0], W, align_corners), 0.0, W - 1.0)
    yp = jnp.clip(_unnormalize(g_c[..., 1], H, align_corners), 0.0, H - 1.0)
    y0 = jnp.clip(jnp.floor(yp).astype(jnp.int32), 0, H - 1)
    ty = yp - y0.astype(yp.dtype)                        # [P, NC, B]
    x0 = jnp.clip(jnp.floor(xp).astype(jnp.int32), 0, W - 1)

    ymin = jnp.min(y0, axis=-1)
    ymax = jnp.max(y0, axis=-1)
    xmin = jnp.min(x0, axis=-1)
    xmax = jnp.max(x0, axis=-1)
    oy = jnp.clip((ymin // YALIGN) * YALIGN, 0, Hp - th)  # [P, NC]
    ox = jnp.clip(xmin, 0, W - 1)
    overflow = ((ymax - oy > th - 1) |
                (xmax + 1 - ox > tw - 1))
    overflow_frac = jnp.mean(overflow.astype(jnp.float32))

    yl = jnp.clip(y0 - oy[..., None], 0, th - 1).astype(jnp.float32)
    xl = jnp.clip(xp - ox[..., None].astype(xp.dtype), 0.0,
                  tw - 1.0 - 1e-3)
    fidx = yl * tw + xl                                  # [P, NC, B]
    return oy, ox, fidx, ty, overflow_frac


def tiled_plane_sample_chunked(planes, grids, config: TileSamplerConfig,
                               align_corners: bool = True,
                               interpret: bool = False, tables=None):
    """Sample P same-resolution planes at ray-structured grids, leaving
    the result in CHUNK-major point order.

    The chunk rearrangement transposes have tiny inner strides, so only
    two dense transposes are performed per call: the packed (x, y)
    coordinate pairs going in, and — left to the CALLER — whatever
    comes back out. Decoding in chunk order and un-chunking only the
    final few-channel output (triplane.apply_triplane_rays) is ~10x
    cheaper than un-chunking [.., C] features here.

    Args:
      planes: [P, C, H, W] feature planes.
      grids: [P, R, S, 2] normalized (x, y) coords in [-1, 1]; R must be
        tile-coherent (tile_rays consecutive rays = one image tile) and
        a multiple of config.tile_rays; S a multiple of config.slab.
      config: chunk/region geometry.
      interpret: run the kernel in interpreter mode (CPU tests).
      tables: optional prebuilt (table, Hp, Wp) from build_pair_tables —
        REQUIRED for performance when sampling inside a scan/lax.map
        (otherwise the dense table build replays every iteration).

    Returns:
      (features [P, NC*B, C] f32 in chunk-major point order — restore
      ray order with from_chunks — and overflow_frac, the fraction of
      chunks whose points did not fit the [th, tw] region and were
      clamped to it).
    """
    P, C, H, W = planes.shape
    _, R, S, _ = grids.shape
    tr, sl = config.tile_rays, config.slab
    assert R % tr == 0 and S % sl == 0, (R, S, tr, sl)
    ntiles, nslabs = R // tr, S // sl
    # ONE chunk transpose, on the packed coordinate pairs
    g_c = to_chunks(grids, ntiles, tr, nslabs, sl)       # [P, NC, B, 2]
    return tiled_plane_sample_prechunked(
        planes, g_c, config, align_corners=align_corners,
        interpret=interpret, tables=tables)


def tiled_plane_sample_prechunked(planes, g_c, config: TileSamplerConfig,
                                  align_corners: bool = True,
                                  interpret: bool = False, tables=None,
                                  raw_pairs: bool = False):
    """Core of tiled_plane_sample_chunked on ALREADY chunk-ordered
    grids g_c [P, NC, B, 2] — the fastest entry: callers that can
    generate their sample points chunk-major (triplane ray path: per-ray
    quantities broadcast with reshapes; only z needs one small
    transpose) skip every per-point rearrangement."""
    P, C, H, W = planes.shape
    _, NC, B, _ = g_c.shape
    th, tw = config.th, config.tw

    table, Hp, Wp = tables if tables is not None \
        else build_pair_tables(planes, config)
    oy, ox, fidx, ty, overflow_frac = _grid_chunk_descriptors(
        g_c, H, W, Hp, config, align_corners)

    # fold the plane index into the stacked-table row origin
    plane_row0 = (jnp.arange(P, dtype=jnp.int32) * Hp)[:, None]
    oy_glob = (oy + plane_row0).reshape(-1)              # [P*NC]
    ox_flat = ox.reshape(-1)
    fidx_flat = fidx.reshape(-1, 1)

    # pad chunk count to a multiple of `group`
    nchunks = oy_glob.shape[0]
    pad = _round_up(nchunks, config.group) - nchunks
    if pad:
        oy_glob = jnp.pad(oy_glob, (0, pad))
        ox_flat = jnp.pad(ox_flat, (0, pad))
        fidx_flat = jnp.pad(fidx_flat, ((0, pad * B), (0, 0)))

    rows = _tile_gather(table, oy_glob, ox_flat, fidx_flat,
                        th=th, tw=tw, group=config.group, B=B,
                        interpret=interpret)
    if pad:
        rows = rows[:nchunks * B]

    ty_f = ty.reshape(-1, 1)
    if raw_pairs:
        # fused-decoder entry: hand back the bf16 vertical-tap pairs and
        # per-point ty; the y-lerp happens in-register inside
        # ops/pallas/fused_decoder.py (no [N, C] feature materialization)
        return rows, ty_f, overflow_frac
    out = (rows[:, :C].astype(jnp.float32) * (1.0 - ty_f)
           + rows[:, HALF:HALF + C].astype(jnp.float32) * ty_f)
    return out.reshape(P, nchunks // P * B, C), overflow_frac


def tiled_plane_sample(planes, grids, config: TileSamplerConfig,
                       align_corners: bool = True, interpret: bool = False,
                       tables=None):
    """Ray-ordered convenience wrapper: [P, R, S, C] features (see
    tiled_plane_sample_chunked for the fast chunk-layout form)."""
    P = planes.shape[0]
    _, R, S, _ = grids.shape
    tr, sl = config.tile_rays, config.slab
    ntiles, nslabs = R // tr, S // sl
    out_c, overflow = tiled_plane_sample_chunked(
        planes, grids, config, align_corners=align_corners,
        interpret=interpret, tables=tables)
    out = from_chunks(out_c.reshape(P, ntiles * nslabs, tr * sl, -1),
                      ntiles, tr, nslabs, sl)
    return out, overflow


def prepare_ray_chunks(origins, directions, z_vals, box3, rot, plane_hw,
                       Hp, config: TileSamplerConfig,
                       align_corners: bool = True, interp: str = "linear",
                       Wp: int = None):
    """Chunk descriptors straight from rays, COMPONENT-WISE.

    origins/directions [R, 3] (tile-coherent ray order), z_vals [R, S]
    -> (org [NC, 3, 2] int32 global table origins,
        fidx [3, NC, B] f32 local flat coords,
        ty [3, NC, B] f32 vertical lerp weights,
        overflow_frac).

    Every intermediate is an [NC, B]-shaped array (minor dim = chunk
    points): the grids-based pre-pass materializes [NC, B, 3] points
    and [P, N, 2] grids whose 12/8-byte minor dims cost 17.6 ms per
    4096-chunk call — 38% of the fused megakernel program — while this
    component-wise form fuses into ~1 ms of elementwise work
    (tools/exp_mega_prepass.py, PERF.md round 3). Same math as
    normalize_coords + project_to_planes + the grids pre-pass.
    """
    H, W = plane_hw
    tr, sl = config.tile_rays, config.slab
    R, S = z_vals.shape
    nt, ns = R // tr, S // sl
    NC, B = nt * ns, tr * sl
    th, tw = config.th, config.tw
    box3 = jnp.asarray(box3, dtype=z_vals.dtype)
    rot = np.asarray(rot)                    # host constants: unrolled

    z_c = jnp.moveaxis(z_vals.reshape(nt, tr, ns, sl), 1, 2
                       ).reshape(NC, B)
    # normalized point components n_c, one [NC, B] array each
    n = []
    for c in range(3):
        o_c = jnp.broadcast_to(origins[:, c].reshape(nt, 1, tr, 1),
                               (nt, ns, tr, sl)).reshape(NC, B)
        d_c = jnp.broadcast_to(directions[:, c].reshape(nt, 1, tr, 1),
                               (nt, ns, tr, sl)).reshape(NC, B)
        p_c = o_c + d_c * z_c
        n.append(2.0 * (p_c - box3[0, c]) / (box3[1, c] - box3[0, c])
                 - 1.0)

    P = rot.shape[0]
    oys, oxs, fidxs, tys, ovfs, oys_b = [], [], [], [], [], []
    for p in range(P):
        # projection onto columns 1:3 of rot[p] (triplane.py
        # project_to_planes), unrolled to scalar FMAs
        gx = n[0] * rot[p, 0, 1] + n[1] * rot[p, 1, 1] + n[2] * rot[p, 2, 1]
        gy = n[0] * rot[p, 0, 2] + n[1] * rot[p, 1, 2] + n[2] * rot[p, 2, 2]
        if interp == "cubic":
            # bicubic table geometry: source coords clipped to
            # [-1, size] (torch-exact beyond that), table row r = y0+1,
            # min-tap table col c0 = x0+1 (build_pair_tables_bicubic)
            xs = jnp.clip(_unnormalize(gx, W, align_corners), -1.0,
                          float(W))
            ys = jnp.clip(_unnormalize(gy, H, align_corners), -1.0,
                          float(H))
            x0 = jnp.floor(xs)
            y0 = jnp.floor(ys)
            r = y0.astype(jnp.int32) + 1
            c0 = x0.astype(jnp.int32) + 1
            oy = jnp.clip((jnp.min(r, axis=-1) // YALIGN) * YALIGN,
                          0, Hp - th)                    # [NC]
            ox = jnp.clip(jnp.min(c0, axis=-1), 0, Wp - tw)
            ovfs.append((jnp.max(r, axis=-1) - oy > th - 1)
                        | (jnp.max(c0, axis=-1) + 3 - ox > tw - 1))
            yl = jnp.clip(r - oy[:, None], 0, th - 1).astype(jnp.float32)
            # clamp bound matches the overflow predicate: in-capacity
            # iff fx < tw-2 (taps floor(fx)-1..+2 within the row)
            fx = jnp.clip(xs + 2.0 - ox[:, None].astype(xs.dtype), 1.0,
                          tw - 2.0 - 1e-3)
            fidxs.append(yl * tw + fx)
            tys.append(ys - y0)
            oys.append(oy + p * Hp)
            oys_b.append(oy + (P + p) * Hp)
            oxs.append(ox)
            continue
        xp = jnp.clip(_unnormalize(gx, W, align_corners), 0.0, W - 1.0)
        yp = jnp.clip(_unnormalize(gy, H, align_corners), 0.0, H - 1.0)
        y0 = jnp.clip(jnp.floor(yp).astype(jnp.int32), 0, H - 1)
        x0 = jnp.clip(jnp.floor(xp).astype(jnp.int32), 0, W - 1)
        oy = jnp.clip((jnp.min(y0, axis=-1) // YALIGN) * YALIGN,
                      0, Hp - th)                        # [NC]
        ox = jnp.clip(jnp.min(x0, axis=-1), 0, W - 1)
        ovfs.append((jnp.max(y0, axis=-1) - oy > th - 1)
                    | (jnp.max(x0, axis=-1) + 1 - ox > tw - 1))
        yl = jnp.clip(y0 - oy[:, None], 0, th - 1).astype(jnp.float32)
        xl = jnp.clip(xp - ox[:, None].astype(xp.dtype), 0.0,
                      tw - 1.0 - 1e-3)
        fidxs.append(yl * tw + xl)
        tys.append(yp - y0.astype(yp.dtype))
        oys.append(oy + p * Hp)
        oxs.append(ox)

    if interp == "cubic":
        oys = oys + oys_b                  # [A0 A1 A2 B0 B1 B2]
        oxs = oxs + oxs
    org = jnp.stack([jnp.stack(oys, axis=-1),
                     jnp.stack(oxs, axis=-1)], axis=-1)  # [NC, pp, 2]
    # [P, NC] per-(plane, chunk) overflow flags: callers derive both the
    # scalar frac (mean) and the per-chunk ANY mask (the round-4 hybrid
    # repair routes clamped chunks through the exact XLA point path)
    return (org, jnp.stack(fidxs), jnp.stack(tys), jnp.stack(ovfs))


# ---------------------------------------------------------------------------
# Megakernel: region gathers + full decoder in ONE pallas call
# ---------------------------------------------------------------------------

def _mega_kernel(org_cur, org_nxt, f0, f1, f2, t0, t1, t2, view_ref,
                 table_ref, wref, bref, out_ref, region, sem, *, th, tw,
                 group, B, cfg, plan_info, interp="linear",
                 batchdec=False):
    from nvsr_tpu.ops.pallas.fused_decoder import (HALF as DHALF,
                                                   OUT_LANES, decode_body,
                                                   lerp_pair)
    T = th * tw
    pp = 3 if interp == "linear" else 6
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, org, g, p):
        oy = pl.multiple_of(org[0, g, p, 0], YALIGN)
        ox = pl.multiple_of(org[0, g, p, 1] * LANES, LANES)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(oy, th), pl.ds(ox, tw * LANES)],
            region.at[slot, g, p],
            sem.at[slot, g, p])

    @pl.when(i == 0)
    def _():
        for g in range(group):
            for p in range(pp):
                dma(0, org_cur, g, p).start()

    @pl.when(i + 1 < n)
    def _():
        for g in range(group):
            for p in range(pp):
                dma((i + 1) % 2, org_nxt, g, p).start()

    slot = i % 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1).astype(jnp.float32)
    # gather AND decode per chunk (the production default): per-chunk
    # M=B decodes overlap the next chunk's region DMA, which measured
    # faster than hoisting one M=group*B decode per grid step both
    # standalone (275M vs 242M rows/s at fine dims, exp_mega_rate) and
    # in-context (1.382M vs 1.222M rays/s). The hoisted "batchdec"
    # variant is kept below for A/B (static `batchdec` arg).
    rows_p = [[], [], []]
    rows_b = [[], [], []]                # bicubic outer-tap pairs
    for g in range(group):
        for p, fr in enumerate((f0, f1, f2)):
            fidx = fr[pl.ds(g * B, B), :]                # [B, 1]
            w = _gather_weights(
                cols, fidx, "linear" if interp == "linear" else "cubic")
            dma(slot, org_cur, g, p).wait()
            # bf16 tap pairs: same declared semantics as the standalone
            # tile sampler (_tile_gather returns bf16 rows); halves the
            # [B, 128] gather-output VMEM traffic
            rows_p[p].append(jnp.dot(
                w, region[slot, g, p].reshape(T, LANES),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))
            if interp == "cubic":
                # same cubic x-weights against the B (outer y taps)
                # region of the stacked bicubic table
                dma(slot, org_cur, g, p + 3).wait()
                rows_b[p].append(jnp.dot(
                    w, region[slot, g, p + 3].reshape(T, LANES),
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16))
    # Per-chunk decode at M=B is the PRODUCTION default: the hoisted
    # M=group*B "batchdec" decode measured SLOWER both standalone
    # (242M vs 275M rows/s at fine dims, exp_mega_rate) and in-context
    # (1.222M vs 1.382M rays/s headline) — the concatenate + the big
    # single matmul serialize against the per-chunk DMA waits, while
    # per-chunk decodes overlap the next chunk's region fetch.
    # `batchdec` (static, resolved from NVSR_MEGA_BATCHDEC at the
    # _mega_finish layer and part of the jit cache key) re-enables the
    # hoist for A/B.
    if not batchdec:
        for g in range(group):
            sl = pl.ds(g * B, B)
            if interp == "linear":
                feats_g = [lerp_pair(rows_p[p][g], tr_[sl, :])
                           for p, tr_ in enumerate((t0, t1, t2))]
            else:
                feats_g = []
                for p, tr_ in enumerate((t0, t1, t2)):
                    ra, rb = rows_p[p][g], rows_b[p][g]
                    wm1, w0, w1, w2 = _cubic_coeffs4(tr_[sl, :])
                    feats_g.append(
                        wm1 * rb[:, :DHALF].astype(jnp.float32)
                        + w0 * ra[:, :DHALF].astype(jnp.float32)
                        + w1 * ra[:, DHALF:].astype(jnp.float32)
                        + w2 * rb[:, DHALF:].astype(jnp.float32))
            fv_g = view_ref[sl, :].astype(jnp.float32)
            head_g = decode_body(feats_g, fv_g, wref, bref, cfg,
                                 plan_info)
            out_ref[sl, :] = head_g[:, :OUT_LANES]
        return
    if interp == "linear":
        feats = [lerp_pair(jnp.concatenate(rows_p[p], axis=0), tr_[:])
                 for p, tr_ in enumerate((t0, t1, t2))]
    else:
        feats = []
        for p, tr_ in enumerate((t0, t1, t2)):
            ra = jnp.concatenate(rows_p[p], axis=0)
            rb = jnp.concatenate(rows_b[p], axis=0)
            wm1, w0, w1, w2 = _cubic_coeffs4(tr_[:])
            feats.append(wm1 * rb[:, :DHALF].astype(jnp.float32)
                         + w0 * ra[:, :DHALF].astype(jnp.float32)
                         + w1 * ra[:, DHALF:].astype(jnp.float32)
                         + w2 * rb[:, DHALF:].astype(jnp.float32))
    fv = view_ref[:].astype(jnp.float32)
    head = decode_body(feats, fv, wref, bref, cfg, plan_info)
    out_ref[:] = head[:, :OUT_LANES]


def _mega_kernel_v2(org_v0, org_v1, org_v2, org_v3, sub_ref, f0, f1, f2,
                    t0, t1, t2, view_ref, table_ref, wref, bref, out_ref,
                    region, sem, *, th, tw, group, B, cfg, plan_info,
                    interp="linear", batchdec=False, packout=False,
                    single=False, decm=1, viewtile=False, slab=1, vt=1,
                    packray=False, ns=1, probe="", wbuild="vpu",
                    slots=2, sigma_only=False, dmapair=False):
    """Descriptor-transposed megakernel (round 4).

    fidx/ty arrive as [1, group*B] lane-major ROWS (one block row per
    (plane, grid step), packed [3*nsteps, group*B]) instead of the v1
    [3*NC*B, 1] columns: a [N, 1] f32 operand is (8, 128)-tile padded
    to 128 lanes as VMEM tiles inside the BlockSpec pipeline (~128x the
    logical bytes through the kernel's DMA engine — narrow XLA arrays
    in HBM are compact, tools/exp_layout.py). v1 -> v2 measured
    148 -> 186M rows/s standalone (MODES=prod; PERF.md round 4).
    Consequences for the math:
      * the hat/cubic x-weights are built TRANSPOSED, wT [T, B], from
        the lane-major row against a dim-0 iota;
      * the y-lerp FOLDS INTO the weights: w2 = [wT*(1-ty), wT*ty]
        [T, 2B], one dot_general per chunk-plane contracting dim 0 of
        both operands -> [2B, 128], and the feature is
        out[:B, :HALF] + out[B:, HALF:] — gather matmul and y-lerp in a
        single MXU issue (the kernel is matmul-issue bound), replacing
        lerp_pair. Cubic keeps its two issues (A/B regions) with the
        4-tap y-coeffs folded pairwise.
    Numerics: identical taps/weights to v1 except WHERE the bf16
    rounding lands — v1 rounds the gathered rows to bf16 then y-lerps
    in f32; v2 rounds hat*(ty factor) to bf16 and accumulates in f32
    (one rounding either way, both within the declared bf16-weight
    semantics)."""
    from nvsr_tpu.ops.pallas.fused_decoder import (HALF as DHALF,
                                                   OUT_LANES, decode_body)
    T = th * tw
    pp = 3 if interp == "linear" else 6
    i = pl.program_id(0)
    n = pl.num_programs(0)

    # dmapair: regions are fetched per PAIR of consecutive chunks at
    # (rh, rw) = (th+8, tw+4) union dims; each chunk's gather reads its
    # own aligned sub-window (sub_ref offsets: rows multiple of 8,
    # cells lane-granular). See _mega_finish / PERF.md R5 batch 12.
    rh, rw = (th + 8, tw + 4) if dmapair else (th, tw)

    def dma(slot, org, j, p):
        oy = pl.multiple_of(org[0, j, p, 0], YALIGN)
        ox = pl.multiple_of(org[0, j, p, 1] * LANES, LANES)
        if probe == "halfdma":
            # attribution-only: fetch ONE 8-row tile of each region
            # (same copy count, th/8 x fewer bytes; the unfetched rows
            # compute on garbage) — splits the DMA cost into per-copy
            # vs per-byte (slice rows must be 8-aligned)
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(oy, 8), pl.ds(ox, rw * LANES)],
                region.at[slot, j, p, pl.ds(0, 8)],
                sem.at[slot, j, p])
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(oy, rh), pl.ds(ox, rw * LANES)],
            region.at[slot, j, p],
            sem.at[slot, j, p])

    # slots = depth of the region double-buffer pipeline (2 = classic
    # double buffering: step i+1's fetch issued at step i; 4 = three
    # steps of DMA lead time — NVSR_MEGA_SLOTS A/B, PERF.md round 5).
    # org views are the next `slots` grid steps' origin rows.
    org_views = (org_v0, org_v1, org_v2, org_v3)[:slots] \
        if slots > 2 else (org_v0, org_v1)
    n_copy = group // 2 if dmapair else group
    if probe != "nodma":
        @pl.when(i == 0)
        def _():
            for d in range(min(slots - 1, n)):
                for j in range(n_copy):
                    for p in range(pp):
                        dma(d, org_views[d], j, p).start()

        @pl.when(i + slots - 1 < n)
        def _():
            for j in range(n_copy):
                for p in range(pp):
                    dma((i + slots - 1) % slots, org_views[slots - 1],
                        j, p).start()

    slot = i % slots
    rowsT = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0
                                     ).astype(jnp.float32)

    def dg(w2, reg):
        return jax.lax.dot_general(w2, reg, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # single=True ("v2s", NVSR_MEGA_SINGLE): gather with a single-M
    # [T, B] weight (halving the folded form's doubled gather MACs) and
    # broadcast ty across lanes with a rank-1 dot_general (K=1 outer
    # product), then y-lerp on the VPU. Trades 2x gather FLOPs for
    # +1 tiny MXU issue + a VPU lerp per chunk-plane — A/B which side
    # of the FLOP-vs-issue balance wins at production shapes.
    ones_r = jnp.ones((1, LANES), jnp.float32)

    if viewtile:
        # per-RAY view rows: view_ref is ONE [vt*tr_rays, 128] bf16
        # block per grid step (vt whole image tiles) — points of chunk
        # g are rays of tile g // (group//vt), each repeated `slab`
        # times (point order r*slab + j). Broadcast in VMEM instead of
        # materializing the [N, 64] per-point stream in HBM (34 ms per
        # flagship fine frame + 8x the kernel view bytes; PERF.md
        # round-4 batch 8). The (tr, slab, 128) -> (B, 128) reshape is
        # minor-dim-128, the one 3D->2D form Mosaic accepts.
        tr_rays = B // slab
        nsl = group // vt

        def fv_range(g0, q):
            fvs = []
            for g in range(g0, g0 + q):
                v = view_ref[pl.ds((g // nsl) * tr_rays, tr_rays), :]
                v = jnp.broadcast_to(
                    v.reshape(tr_rays, 1, LANES),
                    (tr_rays, slab, LANES)).reshape(B, LANES)
                fvs.append(v[:, :DHALF].astype(jnp.float32))
            return fvs[0] if q == 1 else jnp.concatenate(fvs, axis=0)
    else:
        def fv_range(g0, q):
            return view_ref[pl.ds(g0 * B, q * B), :].astype(jnp.float32)

    def wait(g, p):
        # probe="nodma" (NVSR_MEGA_PROBE attribution knob): regions are
        # never fetched (garbage VMEM) — isolates the DMA-wait bubble.
        # probe="nowait": copies still START (engine + descriptor-issue
        # cost stays) but completions are never awaited — splits the
        # nodma delta into issue-side vs wait-side.
        # dmapair: the pair's single copy is awaited once, by the
        # EVEN chunk (chunks are processed in ascending order).
        if probe in ("nodma", "nowait"):
            return
        if dmapair:
            if g % 2 == 0:
                dma(slot, org_v0, g // 2, p).wait()
        else:
            dma(slot, org_v0, g, p).wait()

    def regwin(g, p):
        # the chunk's (th, tw)-cell gather window of its (pair) region
        if not dmapair:
            return region[slot, g, p].reshape(T, LANES)
        soy = pl.multiple_of(sub_ref[0, g, p, 0], YALIGN)
        sox = pl.multiple_of(sub_ref[0, g, p, 1] * LANES, LANES)
        win = region[slot, g // 2, p, pl.ds(soy, th),
                     pl.ds(sox, tw * LANES)]
        return win.reshape(th, tw, LANES).reshape(T, LANES)

    if wbuild == "mxu" and interp == "linear" and single:
        # MXU-assisted hat build (round 5): the [T, B] VPU build
        # (sub/abs/sub/max ~4 passes per chunk-plane = 19% of kernel
        # time, PERF.md R5 batch 5) becomes ONE rank-2 dot_general per
        # chunk producing D = [d+1 | 1-d] for all 3 planes at once
        # (d = row - fx), then hat = relu(min(D_left, D_right)) — the
        # identity 1-|d| = min(d+1, 1-d) — in 2 VPU passes over
        # [T, 3B]. f32-algebraic equality with the VPU form up to
        # addition order (one f32 rounding before the bf16 cast either
        # way; tolerance-tested in tests/test_tile_sampler.py).
        iota_rT = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1
                                           ).astype(jnp.float32)
        A2 = jnp.concatenate([iota_rT, jnp.ones((1, T), jnp.float32)],
                             axis=0)                       # [2, T]
        sgn = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 6 * B), 1) < 3 * B,
            1.0, -1.0)                                     # [1, 6B]

        def hat3(g):
            fxs = [fr[pl.ds(g, 1), :] for fr in (f0, f1, f2)]  # [1, B]
            c1 = jnp.concatenate(
                [1.0 - fxs[0], 1.0 - fxs[1], 1.0 - fxs[2],
                 1.0 + fxs[0], 1.0 + fxs[1], 1.0 + fxs[2]],
                axis=1)                                    # [1, 6B]
            M2 = jnp.concatenate([sgn, c1], axis=0)        # [2, 6B]
            D = jax.lax.dot_general(A2, M2, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.maximum(
                jnp.minimum(D[:, :3 * B], D[:, 3 * B:]), 0.0
            ).astype(jnp.bfloat16)                         # [T, 3B]
    else:
        hat3 = None

    def chunk_feats(g):
        feats_g = []
        w3 = hat3(g) if hat3 is not None and probe != "constw" else None
        for p, (fr, tr_) in enumerate(((f0, t0), (f1, t1), (f2, t2))):
            fx = fr[pl.ds(g, 1), :]                      # [1, B]
            tyv = tr_[pl.ds(g, 1), :]                    # [1, B]
            if w3 is not None:
                wT = w3[:, p * B:(p + 1) * B]
                wait(g, p)
                rows = dg(wT, regwin(g, p))
                tyc = dg(tyv, ones_r)
                feats_g.append(rows[:, :DHALF]
                               + tyc[:, :DHALF]
                               * (rows[:, DHALF:] - rows[:, :DHALF]))
                continue
            if probe == "constw" and interp == "linear" and single:
                # probe="constw": the [T, B] hat build replaced by a
                # descriptor-free constant (hoisted out of the chunk
                # loop by the compiler) — isolates the VPU weight-build
                # cost while keeping every matmul/DMA/lerp in place.
                wT = (rowsT * 1e-7 + 0.31).astype(jnp.bfloat16)
                wait(g, p)
                rows = dg(wT, regwin(g, p))
                tyc = dg(tyv, ones_r)
                feats_g.append(rows[:, :DHALF]
                               + tyc[:, :DHALF]
                               * (rows[:, DHALF:] - rows[:, :DHALF]))
                continue
            if interp == "linear" and single:
                wT = jnp.maximum(0.0, 1.0 - jnp.abs(rowsT - fx)
                                 ).astype(jnp.bfloat16)
                wait(g, p)
                rows = dg(wT, regwin(g, p))
                tyc = dg(tyv, ones_r)            # [B, 128] f32 rank-1
                feats_g.append(rows[:, :DHALF]
                               + tyc[:, :DHALF]
                               * (rows[:, DHALF:] - rows[:, :DHALF]))
            elif interp == "linear":
                wT = jnp.maximum(0.0, 1.0 - jnp.abs(rowsT - fx))
                w2 = jnp.concatenate([wT * (1.0 - tyv), wT * tyv],
                                     axis=1).astype(jnp.bfloat16)
                wait(g, p)
                o2 = dg(w2, regwin(g, p))
                feats_g.append(o2[:B, :DHALF] + o2[B:, DHALF:])
            else:
                wT = _cubic_weight(rowsT - fx)
                cm1, c0_, c1_, c2_ = _cubic_coeffs4(tyv)
                w2a = jnp.concatenate([wT * c0_, wT * c1_],
                                      axis=1).astype(jnp.bfloat16)
                w2b = jnp.concatenate([wT * cm1, wT * c2_],
                                      axis=1).astype(jnp.bfloat16)
                wait(g, p)
                a2 = dg(w2a, region[slot, g, p].reshape(T, LANES))
                wait(g, p + 3)
                b2 = dg(w2b, region[slot, g, p + 3].reshape(T, LANES))
                feats_g.append(a2[:B, :DHALF] + a2[B:, DHALF:]
                               + b2[:B, :DHALF] + b2[B:, DHALF:])
        return feats_g

    if packray:
        # RAY-MAJOR output (round 4): the out block is [vt*tr, S4] f32
        # (S4 = ns*slab*4 <= 128 lanes = ALL samples of a ray packed as
        # (sample, rgbsigma)), revisited for the k = ns/group
        # consecutive steps of one tile when k > 1. Chunk g's decode
        # row (r, j) lands at out row (g//nsl)*tr + r, lanes
        # ((i%k)*group + g%nsl)*slab*4 + j*4 + (0:4): parity slices of
        # the head are placed by static 4-lane rolls (the packout trick
        # at sample granularity) and accumulated per tile. This removes
        # BOTH post-kernel transposes (packout unpack 16.5 ms +
        # from_chunks 37.8 ms at flagship fine dims, PERF.md round-4
        # batch 8) and halves the output bytes ([R, S4] vs [N, 8]-
        # unpacked-from-[N, 128]).
        tr_r = B // slab
        nsl_ = group // vt
        k = ns // group if group < ns else 1
        S4 = ns * slab * 4
        mask4 = (jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                 < 4).astype(jnp.float32)
        accs = [jnp.zeros((tr_r, LANES), jnp.float32) for _ in range(vt)]
        q = decm
        assert group % q == 0, (group, q)
        for g0 in range(0, group, q):
            if q == 1:
                feats = chunk_feats(g0)
            else:
                per = [chunk_feats(g0 + dq) for dq in range(q)]
                feats = [jnp.concatenate([per[dq][p] for dq in range(q)],
                                         axis=0) for p in range(3)]
            head = decode_body(feats,
                               None if sigma_only else fv_range(g0, q),
                               wref, bref, cfg, plan_info,
                               sigma_only=sigma_only,
                               skip_fv=probe == "nofv")
            for dq in range(q):
                g = g0 + dq
                h = head[dq * B:(dq + 1) * B, :] if q > 1 else head
                # (B, 128) -> (tr, slab, 128) -> parity slice (the
                # minor-128 3D<->2D forms Mosaic accepts)
                h3 = h.reshape(tr_r, slab, LANES)
                for j in range(slab):
                    hj = h3[:, j, :] * mask4
                    accs[g // nsl_] = accs[g // nsl_] + pltpu.roll(
                        hj, ((g % nsl_) * slab + j) * 4, axis=1)
        acc = accs[0] if vt == 1 else jnp.concatenate(accs, axis=0)
        if S4 > LANES:
            # multi-cell rows (S*4 = m*128, e.g. the 64+64 and 32+32
            # reference-semantics configs): one grid step fills exactly
            # ONE 128-lane cell (group*slab*4 == 128, asserted at the
            # call), and the out BlockSpec maps step i to (tile, cell)
            # (i // k, i % k) — a full-block write, no revisit
            out_ref[:] = acc
            return
        if k == 1:
            out_ref[:] = acc[:, :S4] if S4 < LANES else acc
        else:
            i_k = i % k
            for kk in range(k):
                @pl.when(i_k == kk)
                def _(kk=kk):
                    a = (acc if kk == 0
                         else pltpu.roll(acc, kk * group * slab * 4,
                                         axis=1))
                    a = a[:, :S4] if S4 < LANES else a
                    if kk == 0:
                        out_ref[:] = a
                    else:
                        out_ref[:] = out_ref[:] + a
        return
    if packout:
        # packed output: lanes 8g:8g+8 of one [B, 128] block hold chunk
        # g's (rgb, sigma) — heads are zero beyond lane OUT_LANES (the
        # packed head weights/bias are zero-padded), so static lane
        # rolls compose the group into ONE full-width write. This
        # replaces group writes into a [N, 8] f32 output whose (8, 128)
        # tiling pads 16x (~21 GB/frame of phantom output traffic at
        # flagship fine dims; PERF.md round 4). Requires group <= 16.
        #
        # decm=q (NVSR_MEGA_DECM) decodes q consecutive chunks per
        # decode_body issue (M = q*B): between the per-chunk M=B
        # default and the losing M=group*B batchdec hoist — larger M
        # amortizes the ~13 decoder matmul issues while still
        # overlapping region DMA.
        q = decm
        assert group % q == 0, (group, q)
        acc = jnp.zeros((B, 128), jnp.float32)
        for g0 in range(0, group, q):
            if q == 1:
                feats = chunk_feats(g0)
            else:
                per = [chunk_feats(g0 + dq) for dq in range(q)]
                feats = [jnp.concatenate([per[dq][p] for dq in range(q)],
                                         axis=0) for p in range(3)]
            fv = None if sigma_only else fv_range(g0, q)
            head = decode_body(feats, fv, wref, bref, cfg, plan_info,
                               sigma_only=sigma_only,
                               skip_fv=probe == "nofv")
            for dq in range(q):
                h_dq = head[dq * B:(dq + 1) * B, :] if q > 1 else head
                acc = acc + pltpu.roll(h_dq, 8 * (g0 + dq), axis=1)
        out_ref[:] = acc
        return
    if not batchdec:
        for g in range(group):
            sl_ = pl.ds(g * B, B)
            head_g = decode_body(chunk_feats(g),
                                 None if sigma_only else fv_range(g, 1),
                                 wref, bref, cfg, plan_info,
                                 sigma_only=sigma_only,
                                 skip_fv=probe == "nofv")
            out_ref[sl_, :] = head_g[:, :OUT_LANES]
        return
    per_g = [chunk_feats(g) for g in range(group)]
    feats = [jnp.concatenate([per_g[g][p] for g in range(group)], axis=0)
             for p in range(3)]
    fv = None if sigma_only else view_ref[:].astype(jnp.float32)
    head = decode_body(feats, fv, wref, bref, cfg, plan_info,
                       sigma_only=sigma_only, skip_fv=probe == "nofv")
    out_ref[:] = head[:, :OUT_LANES]


@functools.partial(jax.jit, static_argnames=("th", "tw", "group", "B",
                                             "cfg", "plan_info", "interp",
                                             "interpret", "batchdec",
                                             "packout", "single", "decm",
                                             "viewtile", "slab", "ns",
                                             "packray", "probe",
                                             "wbuild", "slots",
                                             "sigma_only", "dmapair"))
def _mega_call_v2(table, org, sub, fidx, ty, view, wpack, bpack, *, th,
                  tw, group, B, cfg, plan_info, interp="linear",
                  interpret=False, batchdec=False, packout=False,
                  single=False, decm=1, viewtile=False, slab=1, ns=1,
                  packray=False, probe="", wbuild="vpu", slots=2,
                  sigma_only=False, dmapair=False):
    """fidx/ty arrive as [3*NC, B] f32 — one lane-major row per
    (plane, chunk), (group, B) blocks, three index_map views per array
    (same pattern as v1's plane-major views); group must be a multiple
    of 8 (Mosaic block tiling). The [N, 1]-free layout is the entire
    point of v2: see _mega_kernel_v2.

    packout: the group's heads are lane-packed into one [B, 128] block
    per grid step (chunk g at lanes 8g:8g+8) and the caller unpacks —
    see _mega_kernel_v2; returns [nsteps*B, 128] instead of [N, 8]."""
    from nvsr_tpu.ops.pallas.fused_decoder import HALF as DHALF, OUT_LANES
    nsteps = org.shape[0] - 3  # 3 pad rows (slots=4 views)
    pp = org.shape[-2]
    assert pp == (3 if interp == "linear" else 6)
    assert fidx.shape == (3 * nsteps * group, B), fidx.shape
    assert not (packout and batchdec)
    assert not packout or group <= 16
    # dmapair: org rows hold PAIR-union origins ([.., group//2, pp, 2])
    # and `sub` the per-chunk aligned sub-window offsets; regions are
    # fetched per pair at (th+8, tw+4) — see _mega_finish
    o_g = group // 2 if dmapair else group
    assert org.shape[1] == o_g, (org.shape, group, dmapair)
    rh, rw = (th + 8, tw + 4) if dmapair else (th, tw)
    # Mosaic block constraint: the last two block dims must divide
    # (8, 128) or equal the respective array dims — hence per-CHUNK
    # descriptor rows [3*NC, B] with (group, B) blocks: group % 8 == 0
    # (rows) and B always equals the array minor dim (lanes). The
    # [1, group*B] single-row form is rejected on the sublane dim.
    assert group % 8 == 0, group

    def pm_spec(p):
        return pl.BlockSpec((group, B),
                            lambda i, _p=p: (_p * nsteps + i, 0),
                            memory_space=pltpu.VMEM)

    if viewtile:
        # per-RAY view rows [tiles*tr_rays, 128] bf16: one block of
        # `vt` whole image tiles per grid step (see _mega_kernel_v2).
        # Valid iff grid steps align to tile boundaries: group % ns == 0
        # (vt = group/ns tiles per step) or ns % group == 0 (vt = 1,
        # ns/group steps per tile).
        assert not batchdec
        tr_rays = B // slab
        if group % ns == 0:
            vt = group // ns
            vmap = lambda i: (i, 0)
        else:
            assert ns % group == 0, (ns, group)
            vt = 1
            k = ns // group
            vmap = lambda i: (i // k, 0)
        vspec = pl.BlockSpec((vt * tr_rays, LANES), vmap,
                             memory_space=pltpu.VMEM)
    else:
        vt = 1
        vspec = pl.BlockSpec((group * B, DHALF), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    if packray:
        # ray-major [(nsteps/k)*vt*tr, S4] output: one [vt*tr, S4]
        # block per tile, revisited for the k consecutive steps of that
        # tile (same i//k index_map as the viewtile input) and
        # accumulated in-kernel.
        assert viewtile and not batchdec and not packout
        S4 = ns * slab * 4
        tr_r = B // slab
        k = ns // group if group < ns else 1
        assert nsteps % k == 0, (nsteps, k)
        if S4 > 128:
            # multi-cell rows: each step fills one 128-lane cell of its
            # tile's row block (see _mega_kernel_v2)
            assert group * slab * 4 == 128, (group, slab)
            assert vt == 1
            out_shape = jax.ShapeDtypeStruct(
                ((nsteps // k) * tr_r, S4), jnp.float32)
            out_spec = pl.BlockSpec((tr_r, 128),
                                    lambda i, _k=k: (i // _k, i % _k),
                                    memory_space=pltpu.VMEM)
        else:
            out_shape = jax.ShapeDtypeStruct(
                ((nsteps // k) * vt * tr_r, S4), jnp.float32)
            out_spec = pl.BlockSpec((vt * tr_r, S4),
                                    lambda i, _k=k: (i // _k, 0),
                                    memory_space=pltpu.VMEM)
    elif packout:
        out_shape = jax.ShapeDtypeStruct((nsteps * B, 128), jnp.float32)
        out_spec = pl.BlockSpec((B, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((nsteps * group * B, OUT_LANES),
                                         jnp.float32)
        out_spec = pl.BlockSpec((group * B, OUT_LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_mega_kernel_v2, th=th, tw=tw, group=group, B=B,
                          cfg=cfg, plan_info=plan_info, interp=interp,
                          batchdec=batchdec, packout=packout,
                          single=single, decm=decm, viewtile=viewtile,
                          slab=slab, vt=vt, packray=packray, ns=ns,
                          probe=probe, wbuild=wbuild, slots=slots,
                          sigma_only=sigma_only, dmapair=dmapair),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=out_shape,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, o_g, pp, 2),
                         lambda i, _d=d: (i + _d, 0, 0, 0),
                         memory_space=pltpu.SMEM)
            for d in range(4)
        ] + [
            pl.BlockSpec((1, group, pp, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pm_spec(0), pm_spec(1), pm_spec(2),
            pm_spec(0), pm_spec(1), pm_spec(2),
            vspec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((slots, o_g, pp, rh, rw * LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((slots, o_g, pp)),
        ],
        interpret=interpret,
    )(org, org, org, org, sub, fidx, fidx, fidx, ty, ty, ty, view,
      table, wpack, bpack)


@functools.partial(jax.jit, static_argnames=("th", "tw", "group", "B",
                                             "cfg", "plan_info", "interp",
                                             "interpret", "batchdec"))
def _mega_call(table, org, fidx, ty, view, wpack, bpack, *, th, tw,
               group, B, cfg, plan_info, interp="linear", interpret=False,
               batchdec=False):
    """fidx/ty arrive PLANE-MAJOR as [3*NC*B, 1] — three index_map
    views per array, so no interleaved per-point packing (and no
    [.., 3]-minor transposes) ever materializes. interp='cubic' fetches
    SIX regions per chunk (A and B tables of build_pair_tables_bicubic;
    org is [.., 6, 2]) and y-combines with the 4-tap cubic weights."""
    from nvsr_tpu.ops.pallas.fused_decoder import HALF as DHALF, OUT_LANES
    nsteps = org.shape[0] - 3  # 3 pad rows (v2 slots views; v1 uses i, i+1)
    pp = org.shape[-2]
    assert pp == (3 if interp == "linear" else 6)

    def pm_spec(p):
        return pl.BlockSpec((group * B, 1),
                            lambda i, _p=p: (_p * nsteps + i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_mega_kernel, th=th, tw=tw, group=group, B=B,
                          cfg=cfg, plan_info=plan_info, interp=interp,
                          batchdec=batchdec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((nsteps * group * B, OUT_LANES),
                                       jnp.float32),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, group, pp, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, group, pp, 2), lambda i: (i + 1, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pm_spec(0), pm_spec(1), pm_spec(2),
            pm_spec(0), pm_spec(1), pm_spec(2),
            pl.BlockSpec((group * B, DHALF), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group * B, OUT_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, group, pp, th, tw * LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, group, pp)),
        ],
        interpret=interpret,
    )(org, org, fidx, fidx, fidx, ty, ty, ty, view, table, wpack, bpack)


def tiled_render_chunked(planes, g_c, view_c, wpack, bpack, plan_info,
                         model_cfg, config: TileSamplerConfig,
                         align_corners: bool = True,
                         interpret: bool = False, tables=None,
                         sigma_only: bool = False):
    """Gather + decode for ray-structured chunks in ONE kernel.

    planes [P=3, C, H, W]; g_c [3, NC, B, 2] chunk-ordered normalized
    grids; view_c [NC*B, fused_decoder.HALF] chunk-ordered padded view
    features; wpack/bpack/plan_info from
    fused_decoder.pack_decoder_weights. Returns
    ([NC*B, OUT_LANES] f32 radiance (rgb 0:3, sigma 3), overflow_frac).

    Compared to _tile_gather + fused_decode this removes the [N, 128]
    tap-pair round trip through HBM and one kernel launch per pass —
    the per-chunk regions feed the decoder entirely in VMEM."""
    P, C, H, W = planes.shape
    assert P == 3
    _, NC, B, _ = g_c.shape
    th, tw = config.th, config.tw
    # the 3x regions per chunk triple the double-buffered VMEM scratch:
    # cap the group so it stays well under the 16 MB scoped budget.
    # The unrolled kernel body also scales with B: B=1024 exceeds the
    # limit outright (measured), so chunks are capped at 512 points.
    assert B <= 512, f"megakernel chunk size {B} exceeds the VMEM budget"
    group = min(config.group,
                max(1, (_scratch_budget() << 20)
                    // (2 * 3 * th * tw * LANES * 2)))

    table, Hp, Wp = tables if tables is not None \
        else build_pair_tables(planes, config)
    oy, ox, fidx, ty, overflow_frac = _grid_chunk_descriptors(
        g_c, H, W, Hp, config, align_corners)

    plane_row0 = (jnp.arange(P, dtype=jnp.int32) * Hp)[:, None]
    org = jnp.stack([oy + plane_row0, ox], axis=-1)      # [3, NC, 2]
    org = jnp.moveaxis(org, 0, 1)                        # [NC, 3, 2]
    out, overflow_frac, _ = _mega_finish(
        table, org, fidx, ty, view_c, wpack, bpack,
        overflow_frac, th=th, tw=tw, group=group, B=B,
        cfg=model_cfg, plan_info=plan_info,
        interpret=interpret, wbuild=config.wbuild,
        sigma_only=sigma_only)
    return out, overflow_frac


def _mega_finish(table, org, fidx, ty, view_c, wpack, bpack,
                 overflow_frac, *, th, tw, group, B, cfg, plan_info,
                 interpret, interp="linear", view_tile=False, ns=None,
                 slab=1, pack_ray=False, wbuild="vpu",
                 sigma_only=False):
    """Pad to the group multiple and launch the megakernel. fidx/ty are
    [3, NC, B] plane-major (flattened to [3*NC*B, 1] views — no
    per-point interleave); org [NC, 3, 2] (linear) or [NC, 6, 2]
    (cubic: A then B table origins).

    view_tile: view_c is PER-RAY [R, 128] bf16 (tile-coherent ray
    order) instead of the per-point [N, HALF] stream; requires
    viewtile_ok(...) at the caller and the v2 kernel (see
    _mega_kernel_v2). ns = chunks per image tile, slab = samples per
    chunk row.

    pack_ray: the kernel writes RAY-MAJOR [R, ns*slab*4] f32 (all
    samples of a ray in lanes) instead of the chunk-major point stream
    — no post-kernel transposes at all; requires view_tile and
    packray_ok(...) at the caller. The return is then [nt*tile_rays,
    S*4] (tile-coherent ray rows), not [NC*B, OUT_LANES]."""
    import os
    stub = os.environ.get("NVSR_MEGA_STUB", "0")
    # "1": stub every megakernel call; "fine": stub only calls against
    # the HR (fine-pass) table — identified by table height, the only
    # per-call signal at this layer (the flagship fine table is 800^2+,
    # coarse 200^2-class)
    if stub == "1" or (stub == "fine" and table.shape[0] > 1500):
        # attribution-only debug knob (BENCH docs): skip the pallas call
        # but keep every producer alive with non-foldable tiny terms, so
        # an in-frame ablation isolates kernel time from wrapper time
        from nvsr_tpu.ops.pallas.fused_decoder import OUT_LANES
        if pack_ray:
            # ray-major stub: same output shape as the packray kernel,
            # scalar dependence on every producer
            dep = (fidx.sum() * 1e-9 + ty.sum() * 1e-9
                   + org.sum() * 1e-9
                   + view_c[:1, :1].astype(jnp.float32) * 1e-6
                   + table[:1, :1].astype(jnp.float32) * 1e-30
                   + wpack[:1, :1] * 1e-30)
            nt_ = org.shape[0] // ns
            out = jnp.zeros((nt_ * (B // slab), ns * slab * 4),
                            jnp.float32) + dep
            return out, overflow_frac, None
        dep = ((fidx[0] + fidx[1] + fidx[2] + ty[0]).reshape(-1, 1)
               * 1e-6 + org.sum() * 1e-9)
        vterm = (view_c[:1, :OUT_LANES].astype(jnp.float32) if view_tile
                 else view_c[:, :OUT_LANES].astype(jnp.float32))
        out = (vterm + dep
               + table[:1, :OUT_LANES].astype(jnp.float32) * 1e-30
               + wpack[:1, :OUT_LANES] * 1e-30)
        return out, overflow_frac, None
    NC, pp = org.shape[0], org.shape[-2]
    batchdec = os.environ.get("NVSR_MEGA_BATCHDEC", "0") != "0"
    # v2 (descriptor-transposed kernel, see _mega_kernel_v2) is the
    # default; NVSR_MEGA_V1=1 restores the [N, 1]-descriptor kernel for
    # A/B. Resolved at trace time (one fresh process per measurement —
    # same caveat as NVSR_MEGA_BATCHDEC: an outer jit cached before a
    # toggle won't retrace).
    use_v2 = os.environ.get("NVSR_MEGA_V1", "0") == "0"
    if use_v2:
        # v2's descriptor blocks require group % 8 == 0 and B % 128 == 0
        # (Mosaic block tiling: last two block dims divide (8, 128) or
        # equal the array dims). Group is pinned to 8 regardless of the
        # caller's scratch-budget-derived group (region scratch at
        # group 8 = 8.3 MB bilinear / 16.5 MB cubic, under the kernel's
        # 100 MB VMEM limit; NVSR_MEGA_SCRATCH_MB applies to v1 only).
        # NVSR_MEGA_GROUP A/Bs larger multiples of 8 (bigger decode M
        # via decm, fewer grid steps; region scratch scales with it).
        # A PER-PASS group can come through TileSamplerConfig.group
        # (e.g. 16 for a sigma-only coarse pass: half the grid steps'
        # fixed issue overhead with half the decode matmuls to
        # pipeline — round-5 A/B); the env overrides both passes.
        group = int(os.environ.get("NVSR_MEGA_GROUP",
                                   str(group if group in (8, 16)
                                       else 8)))
        assert group in (8, 16), \
            "NVSR_MEGA_GROUP must be 8 or 16 (packout packs group " \
            "chunks into 128 lanes; both measured, 8 wins — PERF.md " \
            "batch 13)"
    view_tile = view_tile and use_v2 and not batchdec
    pack_ray = pack_ray and view_tile
    pad = _round_up(NC, group) - NC
    if pad:
        org = jnp.pad(org, ((0, pad), (0, 0), (0, 0)))
        fidx = jnp.pad(fidx, ((0, 0), (0, pad), (0, 0)))
        ty = jnp.pad(ty, ((0, 0), (0, pad), (0, 0)))
        if not view_tile:
            view_c = jnp.pad(view_c, ((0, pad * B), (0, 0)))
    if view_tile:
        # pad the per-ray view rows to whole view BLOCKS: padded grid
        # steps index tiles beyond the scene's nt
        tr_rays = B // slab
        vt = group // ns if group % ns == 0 else 1
        tiles = -(-(NC + pad) // ns)
        rows = _round_up(tiles, vt) * tr_rays
        if rows > view_c.shape[0]:
            view_c = jnp.pad(view_c,
                             ((0, rows - view_c.shape[0]), (0, 0)))
    nsteps = (NC + pad) // group
    # +3 zero rows: v2's four org views index steps i..i+3 (the slots=4
    # DMA pipeline; views beyond nsteps read zeros and are never
    # waited); v1 uses views i and i+1 only
    org = jnp.concatenate(
        [org.reshape(nsteps, group, pp, 2),
         jnp.zeros((3, group, pp, 2), org.dtype)], axis=0)

    # PAIR-SHARED region fetches (round 5, NVSR_MEGA_DMAPAIR=1):
    # consecutive chunks (2j, 2j+1) — same tile, adjacent slabs — share
    # ONE fetched union region of (th+8, tw+4); each chunk gathers from
    # its own aligned sub-window (row offsets multiple of 8, cell
    # offsets lane-granular). The region DMA cost is PER-COPY, not
    # per-byte (halfdma probe, PERF.md R5 batch 12), so halving the
    # copies is free; pairs whose origin delta exceeds the union slack
    # are clamped + flagged for the repair/ladder path exactly like
    # capacity overflow.
    dmapair = (use_v2 and interp == "linear" and not batchdec
               and os.environ.get("NVSR_MEGA_DMAPAIR", "0") == "1"
               and group % 2 == 0)
    sub = jnp.zeros((nsteps, group, pp, 2), jnp.int32)
    pair_ovf = None
    if dmapair:
        th_u, tw_u = th + 8, tw + 4
        wp_cells = table.shape[1] // LANES
        if table.shape[0] < th_u or wp_cells < tw_u:
            dmapair = False
    if dmapair:
        o2 = org[:nsteps].reshape(nsteps, group // 2, 2, pp, 2)
        o_u = jnp.min(o2, axis=2)                 # [ns, g/2, pp, 2]
        o_u = jnp.minimum(
            o_u, jnp.asarray([table.shape[0] - th_u, wp_cells - tw_u],
                             o_u.dtype))
        d = o2 - o_u[:, :, None]                  # per-chunk offsets
        lim = jnp.asarray([8, 4], d.dtype)
        sub = jnp.minimum(d, lim).reshape(nsteps, group, pp, 2)
        over = jnp.any((d > lim).reshape(nsteps * group, pp * 2),
                       axis=-1)                   # [NC+pad]
        pair_ovf = over[:NC]
        overflow_frac = jnp.maximum(
            overflow_frac, jnp.mean(pair_ovf.astype(jnp.float32)))
        org_p = jnp.concatenate(
            [o_u, jnp.zeros((3, group // 2, pp, 2), o_u.dtype)], axis=0)
    else:
        org_p = org

    if use_v2:
        # packout (see _mega_kernel_v2): lane-packed [nsteps*B, 128]
        # output instead of the 16x-tile-padded [N, 8]; unpacked here
        # with one small transpose. A/B knob NVSR_MEGA_PACKOUT=0.
        packout = (not pack_ray and not batchdec
                   and os.environ.get("NVSR_MEGA_PACKOUT", "1") != "0")
        out = _mega_call_v2(
            table, org_p, sub, fidx.reshape(3 * nsteps * group, B),
            ty.reshape(3 * nsteps * group, B), view_c, wpack, bpack,
            th=th, tw=tw, group=group, B=B, cfg=cfg, plan_info=plan_info,
            interp=interp, interpret=interpret, batchdec=batchdec,
            packout=packout, dmapair=dmapair,
            # shipped defaults (round-4 hardware A/B, PERF.md): the
            # single-M gather + whole-group q=8 decode measured 1.849M
            # vs 1.430M rays/s for the folded/per-chunk form on the
            # flagship frame (decm 4: 1.772M). decm is clamped to a
            # divisor of the runtime group.
            single=os.environ.get("NVSR_MEGA_SINGLE", "1") != "0",
            # default 16 gcd-clamps to 8 on the group-8 fine pass
            # (unchanged) and to 16 on a group-16 sigma-only coarse
            # pass (one decode issue per grid step; round-5 A/B
            # 2.389M vs 2.382M group16/decm8)
            decm=math.gcd(group, max(
                1, int(os.environ.get("NVSR_MEGA_DECM", "16")))),
            viewtile=view_tile, slab=slab,
            ns=ns if view_tile else 1, packray=pack_ray,
            # attribution-only (measurement, never production): "constw"
            # removes the [T, B] VPU hat builds, "nodma" the region
            # fetches, "nowait" the completion waits only — per-step
            # overhead split, PERF.md round 5
            probe=os.environ.get("NVSR_MEGA_PROBE", ""),
            # hat-build lowering (TileSamplerConfig.wbuild; env
            # override for fresh-process A/Bs) — see _mega_kernel_v2
            wbuild=os.environ.get("NVSR_MEGA_WBUILD", wbuild),
            # region-pipeline depth (2 = double buffer; 4 = 3 steps of
            # DMA lead; measurement A/B, PERF.md round 5)
            slots=int(os.environ.get("NVSR_MEGA_SLOTS", "2")),
            # sigma-only decode for CDF-only coarse passes (round 5):
            # v2 path only — the v1 kernel keeps the full decode
            sigma_only=sigma_only)
        if pack_ray:
            # ray-major rows (tile-coherent): slice off the padded
            # phantom tiles and return [nt*tile_rays, S*4] directly
            return (out[:(NC // ns) * (B // slab)], overflow_frac,
                    pair_ovf)
        if packout:
            from nvsr_tpu.ops.pallas.fused_decoder import OUT_LANES
            out = out.reshape(nsteps, B, 16, 8)
            out = jnp.moveaxis(out, 2, 1)[:, :group, :, :OUT_LANES]
            out = out.reshape(nsteps * group * B, OUT_LANES)
    else:
        out = _mega_call(table, org, fidx.reshape(-1, 1),
                         ty.reshape(-1, 1), view_c, wpack, bpack, th=th,
                         tw=tw, group=group, B=B, cfg=cfg,
                         plan_info=plan_info, interp=interp,
                         interpret=interpret, batchdec=batchdec)
    if pad:
        out = out[:NC * B]
    return out, overflow_frac, pair_ovf


# ---------------------------------------------------------------------------
# Trainable tiled sampler: custom VJP (the training-path gather)
# ---------------------------------------------------------------------------
#
# The reference's training hot path backpropagates through grid_sample
# (reference models.py:303-309, reached by loss.backward() at
# train_nerf.py:903): the backward of a bilinear gather is a scatter of
# the hat weights into the plane gradient. This entry makes the Pallas
# tile sampler differentiable so PATCH-COHERENT training batches (see
# render.tile_ray_maps / the opt-in patch sampler) can ride the fast
# gather in both directions:
#   forward:  the _tile_gather kernel (same numerics as eval);
#   backward: pure XLA — per-chunk  dregion = w^T @ drows  batched
#             einsums, one region-windowed scatter-add per chunk into
#             the pair table, then the (linear) table build transposed
#             back onto the planes.
# Gradients flow to `planes` only; the grid cotangent is zero (the
# reference never differentiates w.r.t. sample coordinates either —
# grids derive from untrained ray geometry). Clamped (overflowing)
# chunks backprop through the same clamped descriptors the forward
# used, so the gradient is exact for the function actually computed.

def _bwd_chunk_batch(config: TileSamplerConfig, C: int, drows, fidx):
    """One batch of per-chunk region cotangents.

    drows [nc, B, 128] f32 (vertical-pair layout), fidx [nc, B] ->
    dregion [nc, th*tw, 128]: rebuild the hat weights and contract over
    points on the MXU (w^T @ drows), in bf16 like the forward."""
    T = config.th * config.tw
    cols = jnp.arange(T, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cols[None, None, :]
                                       - fidx[..., None]))
    return jnp.einsum("cbt,cbl->ctl", w.astype(jnp.bfloat16),
                      drows.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def _fold_table_grad(dtable, P, C, H, W, Hp, Wp):
    """Transpose of build_pair_tables: [P*Hp, Wp*128] -> [P, C, H, W].

    Padded columns (x >= W) and padded rows (y >= H) are edge
    replicas, so their cotangents fold into column W-1 / row H-1; the
    bottom-tap half (lanes HALF:) addressed row min(y+1, H-1)."""
    d = dtable.reshape(P, Hp, Wp, LANES)
    # x edge-pad fold
    dx = d[:, :, :W]
    dx = dx.at[:, :, W - 1].add(d[:, :, W:].sum(axis=2))
    top = dx[..., :C]                                  # [P, Hp, W, C]
    bot = dx[..., HALF:HALF + C]
    # top taps: row y for y < H; pad rows replicate H-1
    dt = top[:, :H]
    dt = dt.at[:, H - 1].add(top[:, H:].sum(axis=1))
    # bottom taps: table row y holds plane row min(y+1, H-1)
    db = jnp.zeros_like(dt)
    db = db.at[:, 1:H].add(bot[:, :H - 1])
    db = db.at[:, H - 1].add(bot[:, H - 1:].sum(axis=1))
    return (dt + db).transpose(0, 3, 1, 2)             # [P, C, H, W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def tiled_plane_sample_trainable(planes, g_c, config: TileSamplerConfig,
                                 align_corners: bool = True,
                                 interpret: bool = False,
                                 bwd_batch: int = 256):
    """Differentiable tiled_plane_sample_prechunked (planes grads only).

    planes [P, C, H, W]; g_c [P, NC, B, 2] chunk-ordered normalized
    grids -> ([P, NC*B, C] f32 chunk-major features, overflow_frac).
    The pair table is built INSIDE the VJP boundary (training updates
    planes every step, so there is no cross-step table reuse to cache).
    bwd_batch: chunks per backward einsum/scatter batch (bounds the
    [nc, B, T] hat-weight materialization)."""
    return tiled_plane_sample_prechunked(
        planes, g_c, config, align_corners=align_corners,
        interpret=interpret)


def _trainable_fwd(planes, g_c, config, align_corners, interpret,
                   bwd_batch):
    out = tiled_plane_sample_prechunked(
        planes, g_c, config, align_corners=align_corners,
        interpret=interpret)
    return out, (planes.shape, g_c)


def _trainable_bwd(config, align_corners, interpret, bwd_batch,
                   residuals, cots):
    (P, C, H, W), g_c = residuals
    dout, _ = cots                      # [P, NCp*B, C]; overflow: no grad
    _, NC, B, _ = g_c.shape
    th, tw = config.th, config.tw
    T = th * tw
    Hp = max(_round_up(H, YALIGN), config.th)
    Wp = W + config.tw
    oy, ox, fidx, ty, _ = _grid_chunk_descriptors(
        g_c, H, W, Hp, config, align_corners)

    # epilogue transpose: out = top*(1-ty) + bot*ty with top/bot the
    # row halves -> drows lanes [0:C] = dout*(1-ty), [HALF:HALF+C] =
    # dout*ty
    dout = dout.reshape(P, NC, B, C).astype(jnp.float32)
    tyb = ty[..., None]
    drows = jnp.zeros((P, NC, B, LANES), jnp.float32)
    drows = drows.at[..., :C].set(dout * (1.0 - tyb))
    drows = drows.at[..., HALF:HALF + C].set(dout * tyb)

    plane_row0 = (jnp.arange(P, dtype=jnp.int32) * Hp)[:, None]
    oy_glob = (oy + plane_row0).reshape(-1)
    idx = jnp.stack([oy_glob, ox.reshape(-1) * LANES], axis=-1)
    drows = drows.reshape(P * NC, B, LANES)
    fidx_f = fidx.reshape(P * NC, B)

    nct = P * NC
    nb = -(-nct // bwd_batch)
    pad = nb * bwd_batch - nct
    if pad:
        drows = jnp.pad(drows, ((0, pad), (0, 0), (0, 0)))
        fidx_f = jnp.pad(fidx_f, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))

    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1))

    def body(dtable, args):
        dr, fx, ix = args
        dregion = _bwd_chunk_batch(config, C, dr, fx)   # [nc, T, 128]
        upd = dregion.reshape(-1, th, tw * LANES)
        dtable = jax.lax.scatter_add(
            dtable, ix, upd, dnums,
            indices_are_sorted=False, unique_indices=False)
        return dtable, None

    dtable = jnp.zeros((P * Hp, Wp * LANES), jnp.float32)
    dtable, _ = jax.lax.scan(
        body, dtable,
        (drows.reshape(nb, bwd_batch, B, LANES),
         fidx_f.reshape(nb, bwd_batch, B),
         idx.reshape(nb, bwd_batch, 2)))
    dplanes = _fold_table_grad(dtable, P, C, H, W, Hp, Wp)
    return dplanes.astype(jnp.float32), jnp.zeros_like(g_c)


tiled_plane_sample_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def tiled_render_rays(planes, origins, directions, z_vals, view_c, wpack,
                      bpack, plan_info, model_cfg,
                      config: TileSamplerConfig, box3, rot,
                      align_corners: bool = True, interpret: bool = False,
                      tables=None, interp: str = "linear",
                      view_tile: bool = False, pack_ray: bool = False,
                      sigma_only: bool = False):
    """Gather + decode straight from rays: the fastest production entry.

    origins/directions [R, 3] tile-coherent; z_vals [R, S]; view_c
    [R*S, fused_decoder.HALF] chunk-ordered view features. The chunk
    pre-pass runs component-wise (prepare_ray_chunks) and the kernel
    reads plane-major fidx/ty views — between them this removes the
    17.6 ms/4096-chunk pre-pass wall of the grids-based entry
    (PERF.md round 3). interp='cubic' runs the bicubic megakernel
    (6 region fetches against the stacked A/B table, cubic x weights,
    4-tap y combine in-kernel; ~2x the bilinear gather cost). Returns
    ([R*S, OUT_LANES] f32 chunk-major, overflow_frac,
    ovf_mask [NC] bool — per-chunk ANY-plane overflow, consumed by the
    hybrid repair in triplane._apply_triplane_rays_tiled)."""
    P, C, H, W = planes.shape
    assert P == 3
    th, tw = config.th, config.tw
    pp = 3 if interp == "linear" else 6
    group = min(config.group,
                max(1, (_scratch_budget() << 20)
                    // (2 * pp * th * tw * LANES * 2)))
    if tables is not None:
        table, Hp, Wp = tables
    elif interp == "cubic":
        table, Hp, Wp = build_pair_tables_bicubic(planes, config)
    else:
        table, Hp, Wp = build_pair_tables(planes, config)
    org, fidx, ty, ovf_pc = prepare_ray_chunks(
        origins, directions, z_vals, box3, rot, (H, W), Hp, config,
        align_corners=align_corners, interp=interp, Wp=Wp)
    overflow_frac = jnp.mean(ovf_pc.astype(jnp.float32))
    B = config.chunk_points
    out, overflow_frac, pair_ovf = _mega_finish(
        table, org, fidx, ty, view_c, wpack, bpack,
        overflow_frac, th=th, tw=tw, group=group, B=B,
        cfg=model_cfg, plan_info=plan_info,
        interpret=interpret, interp=interp, view_tile=view_tile,
        ns=z_vals.shape[1] // config.slab, slab=config.slab,
        pack_ray=pack_ray, wbuild=config.wbuild,
        sigma_only=sigma_only)
    ovf_mask = jnp.any(ovf_pc, axis=0)
    if pair_ovf is not None:
        # pair-union clamps are repaired exactly like capacity clamps
        ovf_mask = ovf_mask | pair_ovf
    return out, overflow_frac, ovf_mask

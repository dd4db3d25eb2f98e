"""Fused triplane decoder: tap-pair rows -> (rgb, sigma) in one kernel.

After the tile sampler (tile_sampler.py) the per-point data flow is
  y-lerp epilogue -> combine planes -> density MLP -> rgb MLP
— five-plus HBM round trips of [N, 48..128] intermediates per point
(~6 KB/point) for ~0.27 MFLOP of decoder math that fits entirely in
VMEM. This kernel fuses all of it: it reads each point's THREE
vertical-tap-pair rows ([B,128] bf16 straight from the tile gather,
via three index_map views into the plane-major rows array), y-lerps
in-register, combines (avg/sum), and runs both decoder branches as
MXU matmuls against a packed weight table, writing only [B, 8]
(rgb in lanes 0:3, sigma in lane 3).

Weight packing (host-side, once per eval scene): every layer weight is
stacked into one [rows_total, 128] f32 table with static row offsets;
first layers address the 64-lane padded feature slots (pad rows are
zero) and the two heads are padded into an 8-lane output block so the
caller's radiance field is `out[..., :4]`. Matmuls run bf16 with f32
accumulation — identical semantics to
TriplaneConfig.compute_dtype='bfloat16' (triplane.py::_linear).

Scope: proj_combination in (avg, sum), viewdir_proj_combination
'concat_pos', rgb_dec_input 'projections'; skip layers supported via
split matmuls. Eval-only (no VJP), used by the tiled render path.

Reference behavior: the decoder tail of TwoDimPlanesModel.forward
(reference models.py:381-421) — same math, fused execution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALF = 64        # padded per-plane feature slot (tile_sampler.HALF)
OUT_LANES = 8    # padded output block: rgb lanes 0:3, alpha lane 3


def supports(cfg) -> bool:
    # compute_dtype must be EXPLICITLY bfloat16: the kernel's matmuls
    # run bf16 with f32 accumulation, so engaging it for an f32 config
    # would silently measure a different numerics path than training
    # (the production eval substitutes bf16 at one documented site:
    # experiment.Experiment._point_fns_for_eval)
    return (cfg.compute_dtype == "bfloat16"
            and cfg.proj_combination in ("avg", "sum")
            and cfg.viewdir_combination == "concat_pos"
            and cfg.rgb_dec_input == "projections"
            and cfg.use_viewdirs
            and cfg.num_plane_channels <= HALF
            and cfg.viewdir_channels <= HALF
            and cfg.dec_channels == 128)


def pack_decoder_weights(params, cfg, member: int = 0):
    """Flatten one decoder member into (wpack [rows,128], bpack [L,128],
    plan_info) for the kernel.

    Row-block layout per layer (matching the kernel's matmul order):
      density L0: one HALF-row block (combined features);
      rgb L0: four HALF-row blocks (f0, f1, f2, view);
      hidden: 128 rows, plus the branch-input HALF blocks when the
      reference skip concat applies (reference models.py:203-207);
      heads: two 128-row blocks into the OUT_LANES slot.
    """
    m = params["members"][member]
    C = cfg.num_plane_channels
    Cv = cfg.viewdir_channels
    w_rows = []
    biases = []
    plan = []

    def add_layer(w_blocks, b, out_cols=128):
        padded = [jnp.pad(wb, ((0, pr - wb.shape[0]),
                               (0, out_cols - wb.shape[1])))
                  for wb, pr in w_blocks]
        block = jnp.concatenate(padded, axis=0).astype(jnp.float32)
        if out_cols < 128:
            block = jnp.pad(block, ((0, 0), (0, 128 - out_cols)))
        w_rows.append(block)
        biases.append(jnp.pad(b.astype(jnp.float32),
                              (0, 128 - b.shape[0])))
        plan.append(int(block.shape[0]))

    dl = m["density"]
    add_layer([(dl[0]["w"], HALF)], dl[0]["b"])
    for ln in range(1, len(dl)):
        w = dl[ln]["w"]
        if cfg.is_skip_layer(ln - 1):
            add_layer([(w[:cfg.dec_channels], 128),
                       (w[cfg.dec_channels:], HALF)], dl[ln]["b"])
        else:
            add_layer([(w, 128)], dl[ln]["b"])

    rl = m["rgb"]
    w0 = rl[0]["w"]                       # [3C + Cv, 128]
    add_layer([(w0[0 * C:1 * C], HALF), (w0[1 * C:2 * C], HALF),
               (w0[2 * C:3 * C], HALF), (w0[3 * C:3 * C + Cv], HALF)],
              rl[0]["b"])
    for ln in range(1, len(rl)):
        w = rl[ln]["w"]
        if cfg.is_skip_layer(ln - 1):
            d = cfg.dec_channels
            add_layer([(w[:d], 128),
                       (w[d + 0 * C:d + 1 * C], HALF),
                       (w[d + 1 * C:d + 2 * C], HALF),
                       (w[d + 2 * C:d + 3 * C], HALF),
                       (w[d + 3 * C:], HALF)], rl[ln]["b"])
        else:
            add_layer([(w, 128)], rl[ln]["b"])

    # combined head: rgb -> lanes 0:3, alpha -> lane 3 (split matmul
    # over the two branch activations)
    wr = jnp.pad(m["fc_rgb"]["w"], ((0, 0), (0, OUT_LANES - 3)))
    wa = jnp.pad(m["fc_alpha"]["w"], ((0, 0), (3, OUT_LANES - 4)))
    bh = jnp.concatenate([m["fc_rgb"]["b"], m["fc_alpha"]["b"],
                          jnp.zeros(128 - 4)])
    add_layer([(wr, 128)], bh, out_cols=OUT_LANES)
    add_layer([(wa, 128)], jnp.zeros(OUT_LANES), out_cols=OUT_LANES)

    wpack = jnp.concatenate(w_rows, axis=0)
    bpack = jnp.stack(biases)
    return wpack, bpack, (tuple(plan), len(dl), len(rl))


def decode_body(feats, fv, wref, bref, cfg, plan_info,
                sigma_only=False, skip_fv=False):
    """The fused decoder math on in-register per-plane features.

    feats: list of 3 [B, HALF] f32 (y-lerped plane features);
    fv: [B, HALF] f32 view features; wref/bref: packed weight refs.
    Returns [B, >=OUT_LANES] f32 (rgb 0:3, sigma 3). Shared by the
    standalone fused_decode kernel and the gather+decode megakernel
    (tile_sampler.tiled_render_chunked).

    sigma_only: skip the view-conditioned rgb branch and its head —
    the sigma lane (3) is bit-identical to the full decode, rgb lanes
    hold the constant fc_rgb bias. The eval coarse pass only feeds the
    hierarchical CDF (weights from sigma; reference
    train_utils.py:131-156), so a fine-image-only render never reads
    coarse rgb — this halves the coarse decode (round-5 fast path;
    the coarse-loss/coarse-PNG eval diagnostics opt out).

    skip_fv: attribution-only (NVSR_MEGA_PROBE=nofv): the fv part's
    matmuls are skipped (packed-row cursor still advances) — bounds
    the per-ray-precompute ("fvz") opportunity."""
    plan, n_density, n_rgb = plan_info
    f0, f1, f2 = feats
    comb = f0 + f1 + f2
    if cfg.proj_combination == "avg":
        comb = comb / 3.0

    state = {"off": 0, "li": 0}

    def matmul(x, rows_n):
        w = wref[pl.ds(state["off"], rows_n), :].astype(jnp.bfloat16)
        state["off"] += rows_n
        return jnp.dot(x.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32)

    def part_mm(part):
        if skip_fv and part is fv:
            state["off"] += HALF
            return 0.0
        return matmul(part, HALF)

    def run_branch(x_in_parts, n_layers):
        x = None
        for ln in range(n_layers):
            rows_n = plan[state["li"]]
            if ln == 0:
                y = 0.0
                for part in x_in_parts:
                    y = y + part_mm(part)
                assert rows_n == HALF * len(x_in_parts)
            elif cfg.is_skip_layer(ln - 1):
                y = matmul(x, 128)
                for part in x_in_parts:
                    y = y + part_mm(part)
                assert rows_n == 128 + HALF * len(x_in_parts)
            else:
                y = matmul(x, 128)
                assert rows_n == 128
            y = y + bref[state["li"], :]
            # store activations in bf16: the next matmul casts its input
            # to bf16 anyway, so this is bit-identical — it just halves
            # the [B, 128] inter-layer VMEM traffic (the kernel is
            # VMEM-bandwidth bound, PERF.md round 3)
            x = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
            state["li"] += 1
        return x

    hd = run_branch([comb], n_density)
    if sigma_only:
        # advance the packed-row cursor over the skipped rgb branch
        # and the rgb head (wr) so the alpha head (wa) indexes
        # correctly; the bias row is the combined head bias bh
        for _ in range(n_rgb):
            state["off"] += plan[state["li"]]
            state["li"] += 1
        li_h = state["li"]
        state["off"] += plan[li_h]          # wr rows
        return matmul(hd, 128) + bref[li_h, :]
    hr = run_branch([f0, f1, f2, fv], n_rgb)
    return (matmul(hr, 128) + matmul(hd, 128)
            + bref[state["li"], :])


def lerp_pair(rows, ty):
    """[B, 128] vertical tap pair -> [B, HALF] y-lerped features."""
    top = rows[:, :HALF].astype(jnp.float32)
    bot = rows[:, HALF:].astype(jnp.float32)
    return top * (1.0 - ty) + bot * ty


def _kernel(r0, r1, r2, t0, t1, t2, view, wref, bref, out_ref, *,
            cfg, plan_info, B):
    feats = [lerp_pair(r0[:], t0[:, :1]), lerp_pair(r1[:], t1[:, :1]),
             lerp_pair(r2[:], t2[:, :1])]
    head = decode_body(feats, view[:].astype(jnp.float32), wref, bref,
                       cfg, plan_info)
    out_ref[:] = head[:, :OUT_LANES]


@functools.partial(jax.jit, static_argnames=("cfg", "plan_info", "B",
                                             "interpret"))
def fused_decode(rows, ty, view, wpack, bpack, *, cfg, plan_info, B,
                 interpret=False):
    """rows [3*N, 128] bf16 plane-major tap pairs; ty [3*N, 1] f32;
    view [N, HALF] f32 -> [N, OUT_LANES] f32 (rgb 0:3, sigma 3)."""
    n3 = rows.shape[0]
    N = n3 // 3
    nsteps = N // B
    assert nsteps * B == N, (N, B)

    def rows_spec(p):
        return pl.BlockSpec((B, 128), lambda i, _p=p: (_p * nsteps + i, 0),
                            memory_space=pltpu.VMEM)

    def ty_spec(p):
        return pl.BlockSpec((B, 1), lambda i, _p=p: (_p * nsteps + i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, plan_info=plan_info, B=B),
        out_shape=jax.ShapeDtypeStruct((N, OUT_LANES), jnp.float32),
        grid=(nsteps,),
        in_specs=[
            rows_spec(0), rows_spec(1), rows_spec(2),
            ty_spec(0), ty_spec(1), ty_spec(2),
            pl.BlockSpec((B, HALF), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, OUT_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, rows, rows, ty, ty, ty, view, wpack, bpack)

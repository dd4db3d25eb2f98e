"""Attribute the megakernel's per-row cost at fine-pass shapes.

The round-3 question (VERDICT r2 #1): the fine pass runs ~139M rows/s
vs the coarse pass's ~206M with IDENTICAL chunk structure (B=512,
slab 2, group 9) — the only differences are the table size (580 MB
HR 800^2 vs 33 MB LR 200^2) and twice the chunk count. This tool times
`tiled_render_chunked`-shaped kernels standalone with pieces removed:

  full          the round-2 megakernel (per-chunk gather + decode)
  batchdec      the SHIPPED round-3 kernel: per-chunk gathers, ONE
                decode per grid step at M=group*B (issue-bound fix)
  cubic         the bicubic megakernel (6 regions, cubic weights,
                4-tap y combine, batched decode)
  nodecode      gather matmuls only (decode skipped)
  constw        DMA + matmul with a CONSTANT weight matrix
                (hat-build VPU cost removed)
  nodma         compute only (regions never fetched; DMA cost removed)
  mmonly        3 const-weight gather matmuls per chunk, nothing else
  nomm          everything EXCEPT the gather matmuls
  dmashare      2 chunks share one region fetch
  small/large   table resolution 200^2 vs 800^2 (DMA locality)
  rand/walk     chunk origins random vs scanline-adjacent

Workload is sized so one call lasts >> the ~5 ms tunnel floor
(PERF.md round 2 measurement caveat).

Usage: python tools/exp_mega_rate.py [--quick]
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvsr_tpu.models.triplane import TriplaneConfig, init_decoder_params
from nvsr_tpu.ops.pallas import fused_decoder
from nvsr_tpu.ops.pallas.tile_sampler import (LANES, YALIGN,
                                              TileSamplerConfig,
                                              build_pair_tables)

_probe = jax.jit(lambda x: jnp.sum(jax.tree.leaves(x)[0]
                                   .astype(jnp.float32)))


def sync(x):
    return float(_probe(x))


def timeit(fn, reps=6):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def variant_kernel(org_cur, org_nxt, ft_ref, view_ref, table_ref, wref,
                   bref, out_ref, region, sem, *, th, tw, group, B, cfg,
                   plan_info, mode):
    from nvsr_tpu.ops.pallas.fused_decoder import (OUT_LANES, decode_body,
                                                   lerp_pair)
    T = th * tw
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, org, g, p):
        oy = pl.multiple_of(org[0, g, p, 0], YALIGN)
        ox = pl.multiple_of(org[0, g, p, 1] * LANES, LANES)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(oy, th), pl.ds(ox, tw * LANES)],
            region.at[slot, g, p],
            sem.at[slot, g, p])

    share = mode == "dmashare"

    def dma_g(g):
        return (g // 2) * 2 if share else g

    if mode == "cubic":
        # the bicubic megakernel form: 6 regions/chunk (A+B tables),
        # cubic x weights, 4-tap y combine, batched decode
        from nvsr_tpu.ops.pallas.tile_sampler import (_cubic_coeffs4,
                                                      _gather_weights)
        slot_ = i % 2

        @pl.when(i == 0)
        def _():
            for g in range(group):
                for p in range(6):
                    dma(0, org_cur, g, p).start()

        @pl.when(i + 1 < n)
        def _():
            for g in range(group):
                for p in range(6):
                    dma((i + 1) % 2, org_nxt, g, p).start()
        cols_ = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1
                                         ).astype(jnp.float32)
        rows_a = [[], [], []]
        rows_b = [[], [], []]
        for g in range(group):
            ft = ft_ref[pl.ds(g * B, B), :]
            for p in range(3):
                w = _gather_weights(cols_, ft[:, p:p + 1], "cubic")
                dma(slot_, org_cur, g, p).wait()
                rows_a[p].append(jnp.dot(
                    w, region[slot_, g, p].reshape(T, LANES),
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16))
                dma(slot_, org_cur, g, p + 3).wait()
                rows_b[p].append(jnp.dot(
                    w, region[slot_, g, p + 3].reshape(T, LANES),
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16))
        ft_all = ft_ref[:]
        H64 = fused_decoder.HALF
        feats = []
        for p in range(3):
            ra = jnp.concatenate(rows_a[p], axis=0)
            rb = jnp.concatenate(rows_b[p], axis=0)
            wm1, w0, w1, w2 = _cubic_coeffs4(ft_all[:, 4 + p:5 + p])
            feats.append(wm1 * rb[:, :H64].astype(jnp.float32)
                         + w0 * ra[:, :H64].astype(jnp.float32)
                         + w1 * ra[:, H64:].astype(jnp.float32)
                         + w2 * rb[:, H64:].astype(jnp.float32))
        fv = view_ref[:].astype(jnp.float32)
        head = decode_body(feats, fv, wref, bref, cfg, plan_info)
        out_ref[:] = head[:, :OUT_LANES]
        return
    if mode == "mm2":
        # batchdec + PAIRED gather matmuls: two chunks of the same
        # plane share one [2B, 2T] @ [2T, 128] block-diagonal matmul —
        # 2x the MXU FLOPs but HALF the matmul issues. Wins only if the
        # per-issue overhead exceeds one chunk-matmul's pure MXU time
        # (~0.25 us at B=512, T=384).
        from nvsr_tpu.ops.pallas.fused_decoder import (
            decode_body as _db, lerp_pair as _lp)
        assert group % 2 == 0
        slot_ = i % 2

        @pl.when(i == 0)
        def _():
            for g in range(group):
                for p in range(3):
                    dma(0, org_cur, g, p).start()

        @pl.when(i + 1 < n)
        def _():
            for g in range(group):
                for p in range(3):
                    dma((i + 1) % 2, org_nxt, g, p).start()
        cols_ = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1
                                         ).astype(jnp.float32)
        zeros_w = jnp.zeros((B, T), jnp.bfloat16)
        rows_p = [[], [], []]
        for g in range(0, group, 2):
            ft0 = ft_ref[pl.ds(g * B, B), :]
            ft1 = ft_ref[pl.ds((g + 1) * B, B), :]
            for p in range(3):
                w0 = jnp.maximum(0.0, 1.0 - jnp.abs(cols_ - ft0[:, p:p + 1])
                                 ).astype(jnp.bfloat16)
                w1 = jnp.maximum(0.0, 1.0 - jnp.abs(cols_ - ft1[:, p:p + 1])
                                 ).astype(jnp.bfloat16)
                w2 = jnp.concatenate(
                    [jnp.concatenate([w0, zeros_w], axis=1),
                     jnp.concatenate([zeros_w, w1], axis=1)], axis=0)
                dma(slot_, org_cur, g, p).wait()
                dma(slot_, org_cur, g + 1, p).wait()
                reg2 = jnp.concatenate(
                    [region[slot_, g, p].reshape(T, LANES),
                     region[slot_, g + 1, p].reshape(T, LANES)], axis=0)
                rows_p[p].append(jnp.dot(
                    w2, reg2, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16))
        ft_all = ft_ref[:]
        feats = [_lp(jnp.concatenate(rows_p[p], axis=0),
                     ft_all[:, 4 + p:5 + p]) for p in range(3)]
        fv = view_ref[:].astype(jnp.float32)
        head = _db(feats, fv, wref, bref, cfg, plan_info)
        out_ref[:] = head[:, :OUT_LANES]
        return
    if mode == "batchdec":
        # hoist the decoder ACROSS the group: gathers+lerp per chunk as
        # usual, but ONE decode_body per grid step on the stacked
        # [group*B, .] features — 13 matmuls at M=group*B instead of
        # group x 13 at M=B (the kernel is matmul-issue bound, not
        # FLOP bound)
        slot_ = i % 2

        @pl.when(i == 0)
        def _():
            for g in range(group):
                for p in range(3):
                    dma(0, org_cur, g, p).start()

        @pl.when(i + 1 < n)
        def _():
            for g in range(group):
                for p in range(3):
                    dma((i + 1) % 2, org_nxt, g, p).start()
        cols_ = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1
                                         ).astype(jnp.float32)
        rows_p = [[], [], []]
        for g in range(group):
            ft = ft_ref[pl.ds(g * B, B), :]
            for p in range(3):
                w = jnp.maximum(0.0, 1.0 - jnp.abs(cols_ - ft[:, p:p + 1])
                                ).astype(jnp.bfloat16)
                dma(slot_, org_cur, g, p).wait()
                rows_p[p].append(jnp.dot(
                    w, region[slot_, g, p].reshape(T, LANES),
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16))
        ft_all = ft_ref[:]
        feats = [lerp_pair(jnp.concatenate(rows_p[p], axis=0),
                           ft_all[:, 4 + p:5 + p]) for p in range(3)]
        fv = view_ref[:].astype(jnp.float32)
        head = decode_body(feats, fv, wref, bref, cfg, plan_info)
        out_ref[:] = head[:, :OUT_LANES]
        return

    if mode != "nodma":
        @pl.when(i == 0)
        def _():
            for g in range(group):
                if share and g % 2:
                    continue
                for p in range(3):
                    dma(0, org_cur, g, p).start()

        @pl.when(i + 1 < n)
        def _():
            for g in range(group):
                if share and g % 2:
                    continue
                for p in range(3):
                    dma((i + 1) % 2, org_nxt, g, p).start()

    slot = i % 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1).astype(jnp.float32)
    if mode == "mmonly":
        # nothing but the 3 gather matmuls per chunk: constant weights,
        # no ft/view reads, no lerp, no decode — pure MXU + DMA stream
        wconst = (cols < 2).astype(jnp.bfloat16)
        for g in range(group):
            acc = 0.0
            for p in range(3):
                dma(slot, org_cur, g, p).wait()
                acc = acc + jnp.dot(
                    wconst, region[slot, g, p].reshape(T, LANES),
                    preferred_element_type=jnp.float32)
            out_ref[pl.ds(g * B, B), :] = acc[:, :OUT_LANES]
        return
    if mode == "nomm":
        # everything EXCEPT the gather matmuls: hat build, DMA, ft/view
        # reads, lerp on a fixed region slice, full decode
        for g in range(group):
            ft = ft_ref[pl.ds(g * B, B), :]
            feats = []
            for p in range(3):
                fidx = ft[:, p:p + 1]
                w = jnp.maximum(0.0, 1.0 - jnp.abs(cols - fidx)
                                ).astype(jnp.bfloat16)
                dma(slot, org_cur, g, p).wait()
                rows = (region[slot, g, p].reshape(T, LANES)[:1]
                        + w[:, :1])                      # [B, 128] cheap
                feats.append(lerp_pair(rows, ft[:, 4 + p:5 + p]))
            fv = view_ref[pl.ds(g * B, B), :].astype(jnp.float32)
            head = decode_body(feats, fv, wref, bref, cfg, plan_info)
            out_ref[pl.ds(g * B, B), :] = head[:, :OUT_LANES]
        return
    for g in range(group):
        ft = ft_ref[pl.ds(g * B, B), :]
        feats = []
        for p in range(3):
            fidx = ft[:, p:p + 1]
            if mode == "constw":
                w = (cols < 2).astype(jnp.bfloat16)
            else:
                w = jnp.maximum(0.0, 1.0 - jnp.abs(cols - fidx)
                                ).astype(jnp.bfloat16)
            if mode != "nodma" and not (share and g % 2):
                dma(slot, org_cur, dma_g(g), p).wait()
            rows = jnp.dot(w, region[slot, dma_g(g), p].reshape(T, LANES),
                           preferred_element_type=jnp.float32)
            feats.append(lerp_pair(rows, ft[:, 4 + p:5 + p]))
        if mode == "nodecode":
            out_ref[pl.ds(g * B, B), :] = (feats[0] + feats[1] + feats[2]
                                           )[:, :fused_decoder.OUT_LANES]
        else:
            fv = view_ref[pl.ds(g * B, B), :].astype(jnp.float32)
            head = decode_body(feats, fv, wref, bref, cfg, plan_info)
            out_ref[pl.ds(g * B, B), :] = head[:, :OUT_LANES]


@functools.partial(jax.jit, static_argnames=("th", "tw", "group", "B",
                                             "cfg", "plan_info", "mode"))
def variant_call(table, org, ft, view, wpack, bpack, *, th, tw, group, B,
                 cfg, plan_info, mode):
    from nvsr_tpu.ops.pallas.fused_decoder import HALF as DHALF, OUT_LANES
    nsteps = org.shape[0] - 1
    pp = org.shape[-2]
    return pl.pallas_call(
        functools.partial(variant_kernel, th=th, tw=tw, group=group, B=B,
                          cfg=cfg, plan_info=plan_info, mode=mode),
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
            pl.BlockSpec((group * B, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
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
    )(org, org, ft, view, table, wpack, bpack)


def make_inputs(key, res, NC, B, tc, origin_mode, cubic=False):
    """Synthetic chunk descriptors: origins either scanline-adjacent
    (consecutive chunks step 0-2 cells, like slabs of one tile) or
    uniform-random over the plane. cubic=True builds the stacked A/B
    bicubic table and [NC, 6, 2] origins (B origins = A + 3*Hp)."""
    from nvsr_tpu.ops.pallas.tile_sampler import build_pair_tables_bicubic
    C = 48
    planes = 0.03 * jax.random.normal(key, (3, C, res, res))
    build = build_pair_tables_bicubic if cubic else build_pair_tables
    table, Hp, Wp = build(planes, tc)
    th, tw = tc.th, tc.tw
    rng = np.random.default_rng(0)
    if origin_mode == "walk":
        # scanline: successive chunks move ~1 cell in x, wrap in y
        step = rng.integers(0, 3, size=(NC, 3, 2)).cumsum(axis=0)
        oy = (step[..., 0] % max(Hp - th, 1)) // YALIGN * YALIGN
        ox = step[..., 1] % max(res - 1, 1)
    else:
        oy = rng.integers(0, max((Hp - th) // YALIGN, 1),
                          size=(NC, 3)) * YALIGN
        ox = rng.integers(0, max(res - 1, 1), size=(NC, 3))
    plane_row0 = np.arange(3) * Hp
    org = np.stack([oy + plane_row0, ox], axis=-1)        # [NC, 3, 2]
    if cubic:
        org = np.concatenate(
            [org, org + np.asarray([3 * Hp, 0])], axis=1)  # [NC, 6, 2]
    fidx = rng.uniform(1.0, tw - 3.5 if cubic else tw - 1.5,
                       size=(NC, B, 3)).astype(np.float32)
    fidx = fidx + (rng.integers(0, th, size=(NC, B, 3)) * tw)
    ty = rng.uniform(0, 1, size=(NC, B, 3)).astype(np.float32)
    ft = np.concatenate([fidx, np.zeros((NC, B, 1), np.float32),
                         ty, np.zeros((NC, B, 1), np.float32)],
                        axis=-1).reshape(NC * B, 8)
    view = rng.standard_normal((NC * B, fused_decoder.HALF)) * 0.3
    return (table, jnp.asarray(org), jnp.asarray(ft),
            jnp.asarray(view.astype(np.float32)))


def main():
    quick = "--quick" in sys.argv
    cfg = TriplaneConfig(proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         skip_connect_every=3, compute_dtype="bfloat16")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    wpack, bpack, plan_info = fused_decoder.pack_decoder_weights(
        params, cfg, 0)
    B = int(os.environ.get("B", 512))
    NC = 1024 if quick else 4096      # rows/call = NC*B*3 = 6.3M full
    NC = NC * 512 // B                # constant points/call across B
    NC = int(os.environ.get("NC", NC))  # e.g. 256 = the in-context
    #                                     per-lax.map-block call size
    group = int(os.environ.get("GROUP", 9))
    th = int(os.environ.get("TH", 24))
    tw = int(os.environ.get("TW", 18))
    tc = TileSamplerConfig(tile_rays=B // 2, slab=2, th=th, tw=tw)
    key = jax.random.PRNGKey(1)
    res = int(os.environ.get("RES", 800))
    origin_mode = os.environ.get("ORG", "walk")
    modes = os.environ.get("MODES", "full,nodecode,constw,nodma"
                           ).split(",")

    print(f"B={B} NC={NC} group={group} th={th} tw={tw} res={res} "
          f"org={origin_mode} rows/call={NC * B * 3 / 1e6:.1f}M",
          flush=True)
    cubic = "cubic" in modes
    table, org, ft, view = make_inputs(key, res, NC, B, tc, origin_mode,
                                       cubic=cubic)
    pp = org.shape[-2]
    nsteps = NC // group
    orgs = jnp.concatenate(
        [org[:nsteps * group].reshape(nsteps, group, pp, 2),
         jnp.zeros((1, group, pp, 2), org.dtype)], axis=0)
    ft_c = ft[:nsteps * group * B]
    view_c = view[:nsteps * group * B]
    rows = nsteps * group * B * 3
    # CALLS=k: split the workload into k SLICED pallas calls chained
    # inside ONE jit (per-call fixed costs preserved, the ~5 ms tunnel
    # floor amortized) — measures the in-context per-lax.map-block call
    # size without the floor poisoning small calls.
    calls = int(os.environ.get("CALLS", 1))
    if calls > 1:
        assert nsteps % calls == 0
        sub = nsteps // calls

        @jax.jit
        def chained(orgs, ft_c, view_c):
            outs = []
            for c in range(calls):
                o = jax.lax.dynamic_slice_in_dim(orgs, c * sub, sub + 1, 0)
                f = jax.lax.dynamic_slice_in_dim(
                    ft_c, c * sub * group * B, sub * group * B, 0)
                v = jax.lax.dynamic_slice_in_dim(
                    view_c, c * sub * group * B, sub * group * B, 0)
                outs.append(variant_call(
                    table, o, f, v, wpack, bpack, th=th, tw=tw,
                    group=group, B=B, cfg=cfg, plan_info=plan_info,
                    mode=modes[0]))
            return jnp.concatenate(outs)

        t = timeit(lambda: chained(orgs, ft_c, view_c))
        print(f"chained x{calls} (NC/call={NC // calls}) {t * 1e3:7.2f} ms"
              f"  {rows / t / 1e6:6.0f}M rows/s", flush=True)
        return
    for mode in modes:
        if mode == "prodvt":
            # the SHIPPED kernel with per-RAY view rows (viewtile):
            # chunks are grouped into synthetic tiles of ns chunks
            # (flagship fine: S=32 / slab=2 -> ns=16) and the [R, 128]
            # bf16 view rows replace the per-point stream
            from nvsr_tpu.ops.pallas.tile_sampler import _mega_finish
            ns = int(os.environ.get("NS", 16))
            ncp = nsteps * group
            assert ncp % ns == 0, (ncp, ns)
            tr_rays = B // tc.slab
            fidx_p = jnp.moveaxis(
                ft_c[:, :3].reshape(ncp, B, 3), 2, 0)
            ty_p = jnp.moveaxis(
                ft_c[:, 4:7].reshape(ncp, B, 3), 2, 0)
            org_p = orgs[:nsteps].reshape(ncp, pp, 2)
            view_r = jnp.asarray(
                np.random.default_rng(2).standard_normal(
                    ((ncp // ns) * tr_rays, 128)) * 0.3
            ).astype(jnp.bfloat16)

            @jax.jit
            def prodvt_call(table, org_p, fidx_p, ty_p, view_r, wpack,
                            bpack):
                out, _, _p = _mega_finish(
                    table, org_p, fidx_p, ty_p, view_r, wpack, bpack,
                    jnp.float32(0.0), th=th, tw=tw, group=group, B=B,
                    cfg=cfg, plan_info=plan_info, interpret=False,
                    interp="cubic" if cubic else "linear",
                    view_tile=True, ns=ns, slab=tc.slab,
                    pack_ray=(os.environ.get("PACKRAY", "1") != "0"
                              and ns * tc.slab * 4 <= 128))
                return out

            t = timeit(lambda: prodvt_call(table, org_p, fidx_p, ty_p,
                                           view_r, wpack, bpack))
            print(f"{mode:9s} {t * 1e3:7.2f} ms  "
                  f"{rows / t / 1e6:6.0f}M rows/s", flush=True)
            continue
        if mode == "prod":
            # the SHIPPED production kernel via _mega_finish (v2 by
            # default; NVSR_MEGA_V1/NVSR_MEGA_PACKOUT env A/Bs apply)
            from nvsr_tpu.ops.pallas.tile_sampler import _mega_finish
            ncp = nsteps * group
            fidx_p = jnp.moveaxis(
                ft_c[:, :3].reshape(ncp, B, 3), 2, 0)      # [3, NC, B]
            ty_p = jnp.moveaxis(
                ft_c[:, 4:7].reshape(ncp, B, 3), 2, 0)
            org_p = orgs[:nsteps].reshape(ncp, pp, 2)
            view_b = view_c.astype(jnp.bfloat16)

            @jax.jit
            def prod_call(table, org_p, fidx_p, ty_p, view_b, wpack,
                          bpack):
                out, _, _p = _mega_finish(
                    table, org_p, fidx_p, ty_p, view_b, wpack, bpack,
                    jnp.float32(0.0), th=th, tw=tw, group=group, B=B,
                    cfg=cfg, plan_info=plan_info, interpret=False,
                    interp="cubic" if cubic else "linear")
                return out

            t = timeit(lambda: prod_call(table, org_p, fidx_p, ty_p,
                                         view_b, wpack, bpack))
            print(f"{mode:9s} {t * 1e3:7.2f} ms  "
                  f"{rows / t / 1e6:6.0f}M rows/s", flush=True)
            continue
        t = timeit(lambda m=mode: variant_call(
            table, orgs, ft_c, view_c, wpack, bpack, th=th,
            tw=tw, group=group, B=B, cfg=cfg,
            plan_info=plan_info, mode=m))
        print(f"{mode:9s} {t * 1e3:7.2f} ms  "
              f"{rows / t / 1e6:6.0f}M rows/s", flush=True)


if __name__ == "__main__":
    main()

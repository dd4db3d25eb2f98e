"""SR-conv bf16 TRAINING gate: quality + step time (VERDICT r4 #4).

bench.py's `train_step_hr_sr_s` has always timed the HR/SR training
step with PlaneSRConfig.compute_dtype='bfloat16' (bf16 conv operands,
f32 MXU accumulation), while the shipped YAMLs left
super_resolution.model.compute_dtype unset — i.e. production SR
trained in f32 and was never measured. This closes the loop both ways:

  * trains the mini TrainModels chain (parity_check.CONFIG_TMPL_SR:
    an LR+HR train couple plus an SR-gain scene) twice — f32 conv vs
    bf16 conv, same seed — and reports held-out PSNR for each;
  * times the production-dims HR/SR train step under both dtypes
    (the bench body at TrainModels scale) so the speed side of the
    trade is measured in the same run.

Ship criterion (mirrors the 0.1 dB reference-parity budget,
BASELINE.json): PSNR(bf16) >= PSNR(f32) - 0.1 dB. Reference scale
context: /root/reference/config/TrainModels.yml:8 (1.5M iters).

Usage: python tools/exp_sr_bf16_gate.py [--workdir /tmp/srbf16_ws]
          [--iters 2000] [--size 128] [--skip-step-timing]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)
sys.path.insert(0, TOOLS)

from parity_check import CONFIG_TMPL_SR, ensure_scene  # noqa: E402


def build_cfg(ws, variant, iters):
    from nvsr_tpu.utils.config import get_config
    os.makedirs(os.path.join(ws, "config"), exist_ok=True)
    with open(os.path.join(ws, "config", "local_config.yml"), "w") as f:
        f.write(f"root: {ws}\n")
    path = os.path.join(ws, "config", f"srbf16_{variant}.yml")
    with open(path, "w") as f:
        f.write(CONFIG_TMPL_SR.format(logdir=f"logs_srbf16_{variant}",
                                      iters=iters))
    cfg = get_config(path)
    cfg.experiment["id"] = f"srbf16_{variant}"
    # analytic scenes composite over black -> black-fog degenerate
    # (CLAUDE.md); white background is mandatory for a crisp field
    for mode in ("train", "validation"):
        cfg.nerf[mode]["white_background"] = True
    if variant == "bf16":
        cfg.super_resolution.model["compute_dtype"] = "bfloat16"
    return cfg


def run_variant(ws, variant, iters):
    from nvsr_tpu.experiment import Experiment
    from nvsr_tpu.ops.rendering import mse2psnr
    import jax.numpy as jnp

    cfg = build_cfg(ws, variant, iters)
    exp = Experiment(cfg, root_path=ws)
    t0 = time.perf_counter()
    exp.run(max_iters=iters)
    train_s = time.perf_counter() - t0
    losses = exp.evaluate(iters)
    psnrs = [float(mse2psnr(jnp.asarray(l)))
             for group in losses.values() for l in group]
    return float(np.mean(psnrs)), train_s


def time_production_step(compute_dtype):
    """bench.bench_train_steps' HR/SR body at TrainModels dims, with
    the SR compute dtype under test."""
    import jax
    import jax.numpy as jnp
    from nvsr_tpu.models import (PlaneSRConfig, TriplaneConfig,
                                 init_decoder_params, init_plane_sr_params)
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import RenderConfig, make_ray_bundle
    from nvsr_tpu.train import StepFlags, train_step

    probe = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    cfg = TriplaneConfig(proj_combination="avg",
                         viewdir_proj_combination="concat_pos",
                         skip_connect_every=3,
                         gather_table_dtype="bfloat16")
    sr_cfg = PlaneSRConfig(scale_factor=4, compute_dtype=compute_dtype)
    dc = init_decoder_params(jax.random.PRNGKey(0), cfg)
    df = init_decoder_params(jax.random.PRNGKey(1), cfg)
    sr = init_plane_sr_params(jax.random.PRNGKey(2), sr_cfg)
    planes = {"pos": 0.03 * jax.random.normal(jax.random.PRNGKey(3),
                                              (3, 48, 200, 200)),
              "view": 0.03 * jax.random.normal(jax.random.PRNGKey(4),
                                               (48, 32, 32))}
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)
    eye = np.asarray([3.8, 0.5, 0.7], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]).astype(np.float32)
    right /= np.linalg.norm(right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1] = right, np.cross(right, fwd)
    c2w[:3, 2], c2w[:3, 3] = -fwd, eye
    ro, rd = get_ray_bundle(64, 64, 80.0, np.asarray(c2w))
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    target = jnp.full((4096, 3), 0.5)
    rcfg = RenderConfig(num_coarse=64, num_fine=64, perturb=True,
                        radiance_field_noise_std=0.2)
    flags = StepFlags(sr_iter=True)
    out = train_step(dc, df, sr, planes, jnp.asarray(box), rays, target,
                     jax.random.PRNGKey(9), model_cfg=cfg, sr_cfg=sr_cfg,
                     rcfg=rcfg, flags=flags)
    assert np.isfinite(float(probe(out[0]["loss"])))
    t0 = time.perf_counter()
    for i in range(3):
        out = train_step(dc, df, sr, planes, jnp.asarray(box), rays,
                         target, jax.random.PRNGKey(10 + i),
                         model_cfg=cfg, sr_cfg=sr_cfg, rcfg=rcfg,
                         flags=flags)
    float(probe(out[0]["loss"]))
    return (time.perf_counter() - t0) / 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/srbf16_ws")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--skip-step-timing", action="store_true")
    ap.add_argument("--variants", default="f32,bf16")
    ap.add_argument("--platform", default=None,
                    help="e.g. 'cpu' to smoke-test without the TPU "
                         "tunnel (must be set before any array op)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    ws = os.path.abspath(args.workdir)
    os.makedirs(ws, exist_ok=True)
    ensure_scene(ws, args.size, "blob")
    ensure_scene(ws, args.size, "blob2")

    out = {"iters": args.iters, "size": args.size}
    for v in args.variants.split(","):
        psnr, train_s = run_variant(ws, v, args.iters)
        out[f"psnr_{v}"] = round(psnr, 3)
        out[f"train_wall_s_{v}"] = round(train_s, 1)
        print(f"variant {v}: held-out PSNR {psnr:.3f} dB "
              f"(train {train_s:.0f}s)", flush=True)
    if not args.skip_step_timing:
        for v, cd in (("f32", None), ("bf16", "bfloat16")):
            out[f"step_hr_sr_s_{v}"] = round(time_production_step(cd), 4)
            print(f"production HR/SR step [{v}]: "
                  f"{out[f'step_hr_sr_s_{v}']:.4f}s", flush=True)
    if "psnr_f32" in out and "psnr_bf16" in out:
        out["delta_db"] = round(out["psnr_bf16"] - out["psnr_f32"], 3)
        out["pass"] = bool(out["psnr_bf16"] >= out["psnr_f32"] - 0.1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

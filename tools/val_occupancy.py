"""Validate that occupancy-tightened sampling halves the sample budget
at equal PSNR (the bench.py default configuration).

Trains the planes workflow on the analytic blob scene three ways:

  A. baseline:   64+64 samples, full-range [near, far] (reference
                 semantics, train_utils.py:95-100);
  B. tightened:  32+32 samples, nerf.train.occupancy enabled (per-scene
                 AABB estimated during training, applied in train AND
                 eval — ops/occupancy.py);
  C. ablation:   32+32 samples, NO occupancy (shows the reduction is
                 only free because of the tightening).

and reports each variant's held-out validation PSNR. Success criterion:
PSNR(B) >= PSNR(A) - 0.1 dB while B renders with half the plane
gathers per ray. Results recorded in PERF.md (round 2).

Usage: python tools/val_occupancy.py [--workdir /tmp/occval_ws]
                                     [--iters 1500] [--size 100]
"""

import argparse
import json
import os
import sys

import numpy as np

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)

from parity_check import CONFIG_TMPL  # noqa: E402


def ensure_scene(ws, size, n_train=32, field="blob"):
    """Generate the analytic scene with enough views for a crisp field
    (the parity harness's 8-view default floats badly at any scale).
    field: scene family from gen_scene.FIELDS — 'blob' (two compact
    isotropic Gaussians; the family the estimator defaults were tuned
    on) or 'ring' (off-center torus + diagonal bar: wide x/y, thin z,
    strongly anisotropic — VERDICT r2 #7's unseen-geometry check)."""
    import subprocess
    scene_dir = os.path.join(ws, "datasets", field)
    if not os.path.isfile(os.path.join(scene_dir, "transforms_val.json")):
        subprocess.run(
            [sys.executable, os.path.join(TOOLS, "gen_scene.py"),
             os.path.join(ws, "datasets"), field, str(size),
             str(n_train), "4", "4", field], check=True)
    return scene_dir


def build_cfg(ws, variant, iters, scene_key="2,128,16", field="blob"):
    from nvsr_tpu.utils.config import get_config
    os.makedirs(os.path.join(ws, "config"), exist_ok=True)
    with open(os.path.join(ws, "config", "local_config.yml"), "w") as f:
        f.write(f"root: {ws}\n")
    path = os.path.join(ws, "config", f"occval_{field}_{variant}.yml")
    with open(path, "w") as f:
        f.write(CONFIG_TMPL.format(logdir=f"logs_{field}_{variant}",
                                   iters=iters))
    cfg = get_config(path)
    cfg.experiment["id"] = f"occval_{field}_{variant}"
    # a converged, capable model (the parity template's 25x25-view ds-4
    # setup never exceeds ~15 dB held-out; occupancy questions are only
    # meaningful on a field whose geometry is crisp)
    cfg.dataset["dir"]["train"] = {scene_key: [field]}
    cfg.nerf.train["num_random_rays"] = 1024
    samples = {"A": 64, "B": 32, "C": 32, "D": 16, "E": 16,
               "T": 16, "U": 16, "V": 16,
               # G: asymmetric 8 coarse + 16 fine with occupancy — the
               # round-3 budget candidate (coarse exists only to place
               # fine samples; with tightened [near, far] 8 strata
               # still localize the surface)
               "G": (8, 16),
               # H: the aggressive 8+8 floor — halves variant D's
               # gathers again; only ships if PSNR(H) >= PSNR(A)
               "H": 8}[variant]
    occupancy = variant in ("B", "D", "T", "U", "V", "G", "H")
    if variant in ("U", "V"):
        # U/V: flagship-width decoders (128, 4+4 layers, skip 3) so the
        # FUSED decoder kernel engages on the tiled eval path; U evals
        # tiled+fused, V evals through the XLA path (the PSNR pair is
        # the hardware gate for ops/pallas/fused_decoder.py).
        cfg.models.coarse["dec_channels"] = 128
        cfg.models.coarse["dec_density_layers"] = 4
        cfg.models.coarse["dec_rgb_layers"] = 4
        cfg.experiment["id"] = f"occval_{field}_V"  # share V's training
        cfg.experiment["logdir"] = f"logs_{field}_V"
        # tiled eval is DEFAULT-ON on TPU since round 3: the XLA side
        # of the U/V gate must opt out explicitly
        cfg.nerf.validation["tiled_gather"] = variant == "U"
    if variant == "T":
        # T: variant D plus the Pallas tiled eval path
        # (nerf.validation.tiled_gather) — the hardware quality gate for
        # ops/pallas/tile_sampler + fused_decoder on a trained scene.
        # Needs 8-divisible eval views (run with --size 256 -> 128^2).
        cfg.nerf.validation["tiled_gather"] = True
    elif variant == "D":
        # D: the XLA-path partner of T (tiled is default-on now)
        cfg.nerf.validation["tiled_gather"] = False
    # white background (the blob scene renders over black): with a
    # black background the optimizer reaches a BLACK-FOG degenerate —
    # acc ~= 1 on every ray (opaque fog renders black as well as empty
    # space does) and rendering mass genuinely fills the scene box, so
    # no occupancy bound can exist. White-background compositing forces
    # empty space to actually be empty (reference train semantics for
    # synthetic scenes).
    for mode in ("train", "validation"):
        cfg.nerf[mode]["white_background"] = True
    nc, nf = samples if isinstance(samples, tuple) else (samples, samples)
    for mode in ("train", "validation"):
        cfg.nerf[mode]["num_coarse"] = nc
        cfg.nerf[mode]["num_fine"] = nf
    if occupancy:
        cfg.nerf.train["occupancy"] = {
            "enabled": True, "warmup_iters": 300, "update_every": 250}
    return cfg


def run_variant(ws, variant, iters, field="blob"):
    from nvsr_tpu.experiment import Experiment
    from nvsr_tpu.ops.rendering import mse2psnr
    import jax.numpy as jnp

    cfg = build_cfg(ws, variant, iters, field=field)
    exp = Experiment(cfg, root_path=ws)
    exp.run(max_iters=iters)
    losses = exp.evaluate(iters)
    psnrs = [float(mse2psnr(jnp.asarray(l)))
             for group in losses.values() for l in group]
    occ = None
    scene = exp.training_scenes[0]
    sp = exp.planes_buffer.get(scene)
    if sp.occ_aabb is not None:
        occ = np.asarray(sp.occ_aabb).round(3).tolist()
    return float(np.mean(psnrs)), occ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/occval_ws")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--size", type=int, default=200)
    ap.add_argument("--variants", default="A,B,C,D,E")
    ap.add_argument("--field", default="blob",
                    help="scene family: blob | ring (gen_scene.FIELDS)")
    args = ap.parse_args()
    ws = os.path.abspath(args.workdir)
    os.makedirs(ws, exist_ok=True)
    ensure_scene(ws, args.size, field=args.field)

    out = {"iters": args.iters, "size": args.size, "field": args.field}
    for v in args.variants.split(","):
        psnr, occ = run_variant(ws, v, args.iters, field=args.field)
        out[f"psnr_{v}"] = round(psnr, 3)
        if occ is not None:
            out[f"occ_aabb_{v}"] = occ
        print(f"variant {v}: held-out PSNR {psnr:.3f} dB"
              + (f", occ AABB {occ}" if occ else ""))
    if "psnr_A" in out and "psnr_B" in out:
        out["delta_B_vs_A_db"] = round(out["psnr_B"] - out["psnr_A"], 3)
        out["pass"] = bool(out["psnr_B"] >= out["psnr_A"] - 0.1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

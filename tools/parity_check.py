"""End-to-end PSNR parity against the ACTUAL reference program.

Pipeline (each phase skipped when its artifact already exists):
  1. generate an analytic multi-view-consistent Blender scene
     (tools/gen_scene.py) under <workdir>/datasets;
  2. train the unmodified reference (/root/reference/train_nerf.py via
     tools/run_reference.py) on CPU for `--iters` iterations;
  3. run the reference's own `--eval images` to get its per-image PSNRs
     (the golden, written to <workdir>/results/.../metrics.txt);
  4. convert the reference checkpoint + .par planes into this repo's
     formats (nvsr_tpu/convert.py) under <workdir>/logs_ours;
  5. evaluate the SAME views through this repo's full eval driver
     (nvsr_tpu.experiment.Experiment, eval mode);
  6. compare: assert our mean PSNR is within --tol (default 0.1 dB,
     BASELINE.json quality bar) of the reference's.

Usage: python tools/parity_check.py [--workdir /tmp/parity_ws]
                                    [--iters 1000] [--size 100] [--tol 0.1]
Prints one JSON line with both PSNRs and the delta.
"""

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)

SCENE = "blob"
EXP_ID = "ref_parity"

CONFIG_TMPL = """\
experiment:
  logdir: {logdir}
  id: ref_parity
  randomseed: 0
  train_iters: {iters}
  validate_every: 250
  save_every: 1000000
  print_every: 50
dataset:
  synt:
    root: datasets
    near: 2
    far: 6
    no_ndc: True
  llff:
    root: datasets
    near: 0
    far: 1
    no_ndc: False
  dir:
    train:
      4,64,16: ['blob']
  prob_assigned2scene_groups: False
  testskip: 1
  llffhold: 2
models:
  coarse:
    type: TwoDimPlanesModel
    plane_interp: bilinear
    dec_density_layers: 2
    dec_rgb_layers: 2
    dec_channels: 64
    rgb_dec_input: projections
    proj_combination: avg
    viewdir_proj_combination: concat_pos
    align_corners: True
    skip_connect_every: 3
    num_plane_channels: 16
  fine:
    type: TwoDimPlanesModel
optimizer:
  type: Adam
  lr: 5.E-4
nerf:
  use_viewdirs: True
  train:
    what: ['LR_planes','decoder']
    num_random_rays: 512
    chunksize: 65536
    store_planes:
      buffer_size: 1
      steps_per_buffer: 1000000
    perturb: True
    num_coarse: 32
    num_fine: 32
    white_background: False
    radiance_field_noise_std: 0.2
    lindisp: False
  validation:
    chunksize: 65536
    perturb: False
    num_coarse: 32
    num_fine: 32
    white_background: False
    radiance_field_noise_std: 0.
    lindisp: False
"""


def sh(args, cwd):
    print("+", " ".join(args))
    subprocess.run(args, cwd=cwd, check=True)


def ensure_scene(ws, size):
    scene_dir = os.path.join(ws, "datasets", SCENE)
    if not os.path.isfile(os.path.join(scene_dir, "transforms_val.json")):
        sh([sys.executable, os.path.join(TOOLS, "gen_scene.py"),
            os.path.join(ws, "datasets"), SCENE, str(size), "8", "2", "2"],
           cwd=ws)
    return scene_dir


def write_cfg(ws, name, logdir, iters):
    os.makedirs(os.path.join(ws, "config"), exist_ok=True)
    with open(os.path.join(ws, "config", "local_config.yml"), "w") as f:
        f.write(f"root: {ws}\n")
    path = os.path.join(ws, "config", name)
    with open(path, "w") as f:
        f.write(CONFIG_TMPL.format(logdir=logdir, iters=iters))
    return path


def reference_train_and_eval(ws, iters):
    ref_logdir = os.path.join(ws, "logs", EXP_ID)
    cfg = write_cfg(ws, "parity.yml", "logs", iters)
    if not any(f.endswith(".ckpt_best")
               for f in (os.listdir(ref_logdir)
                         if os.path.isdir(ref_logdir) else [])):
        sh([sys.executable, os.path.join(TOOLS, "run_reference.py"),
            "--config", cfg], cwd=ws)
    results = os.path.join(ws, "results", EXP_ID)
    metrics = None
    if os.path.isdir(results):
        for root, _, files in os.walk(results):
            if "metrics.txt" in files:
                metrics = os.path.join(root, "metrics.txt")
    if metrics is None:
        os.makedirs(os.path.join(ws, "results"), exist_ok=True)
        sh([sys.executable, os.path.join(TOOLS, "run_reference.py"),
            "--config", cfg, "--eval", "images", "--results_path", "results",
            "--load-checkpoint", os.path.join("logs", EXP_ID)], cwd=ws)
        for root, _, files in os.walk(results):
            if "metrics.txt" in files:
                metrics = os.path.join(root, "metrics.txt")
    assert metrics, "reference eval produced no metrics.txt"
    return ref_logdir, results, metrics


def parse_reference_metrics(metrics_path, results_dir):
    """(mean psnr from metrics.txt, per-image PSNRs from filenames)."""
    mean_psnr = None
    with open(metrics_path) as f:
        for line in f:
            m = re.match(r".*/psnr: ([\d.]+)", line.strip())
            if m:
                mean_psnr = float(m.group(1))
    per_image = {}
    for root, _, files in os.walk(results_dir):
        if os.path.basename(root).endswith("fine"):
            for fn in files:
                m = re.match(r"(\d+)_PSNR(\d+)_(\d+)\.png", fn)
                if m:
                    per_image[int(m.group(1))] = float(
                        f"{m.group(2)}.{m.group(3)}")
    assert mean_psnr is not None, "no psnr in reference metrics.txt"
    return mean_psnr, per_image


def convert_to_ours(ws, ref_logdir):
    """Reference torch artifacts -> our checkpoint/planes layout under
    <ws>/logs_ours/ref_parity."""
    from nvsr_tpu.convert import (convert_par_file, convert_triplane_decoder,
                                  load_torch_checkpoint)
    from nvsr_tpu.planes_store import PlaneStore, ScenePlanes
    from nvsr_tpu.utils.config import get_config
    from nvsr_tpu.utils.io import save_pickle

    ours_logdir = os.path.join(ws, "logs_ours", EXP_ID)
    os.makedirs(os.path.join(ours_logdir, "planes"), exist_ok=True)

    ckpt = load_torch_checkpoint(
        os.path.join(ref_logdir, "checkpoint.ckpt_best"))
    coarse, rot = convert_triplane_decoder(ckpt["model_coarse_state_dict"])
    fine, _ = convert_triplane_decoder(ckpt["model_fine_state_dict"])
    cfg = get_config(os.path.join(ws, "config", "parity_ours.yml"))
    state = {
        "model_coarse_state_dict": coarse,
        "model_fine_state_dict": fine,
        "models_config": cfg.models.to_dict(),
    }
    if rot is not None:
        state["rot_mats"] = rot
    save_pickle(os.path.join(ours_logdir, "checkpoint.ckpt"), state,
                suffix="ckpt", best=True)

    store = PlaneStore(os.path.join(ours_logdir, "planes"))
    import torch
    for fn in os.listdir(os.path.join(ref_logdir, "planes")):
        if not fn.endswith(".par_best"):
            continue
        scene = fn[len("coarse_"):-len(".par_best")]
        par = torch.load(os.path.join(ref_logdir, "planes", fn),
                         map_location="cpu", weights_only=False)
        planes, box, _ = convert_par_file(par)
        sp = ScenePlanes(np.asarray(planes["pos"]),
                         np.asarray(planes["view"])
                         if "view" in planes else None, np.asarray(box))
        store.save(scene, sp)
        store.save(scene, sp, as_best=True)
    # the effective config our eval override reads (reference behavior:
    # eval reads the TRAINED experiment's config.yml)
    with open(os.path.join(ours_logdir, "config.yml"), "w") as f:
        f.write(cfg.dump())
    return ours_logdir


def evaluate_ours(ws, iters):
    from nvsr_tpu.experiment import Experiment
    from nvsr_tpu.ops.rendering import mse2psnr
    import jax.numpy as jnp

    write_cfg(ws, "parity_ours.yml", "logs_ours", iters)
    from nvsr_tpu.utils.config import get_config
    cfg = get_config(os.path.join(ws, "config", "parity_ours.yml"))
    exp = Experiment(cfg, eval_mode="images",
                     results_path=os.path.join(ws, "results_ours"),
                     root_path=ws)
    losses = exp.evaluate()
    psnrs = [float(mse2psnr(jnp.asarray(l)))
             for group in losses.values() for l in group]
    return float(np.mean(psnrs)), psnrs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/parity_ws")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--size", type=int, default=100)
    ap.add_argument("--tol", type=float, default=0.1)
    args = ap.parse_args()
    ws = os.path.abspath(args.workdir)
    os.makedirs(ws, exist_ok=True)

    ensure_scene(ws, args.size)
    ref_logdir, results, metrics = reference_train_and_eval(ws, args.iters)
    ref_psnr, ref_per_image = parse_reference_metrics(metrics, results)
    write_cfg(ws, "parity_ours.yml", "logs_ours", args.iters)
    convert_to_ours(ws, ref_logdir)
    ours_psnr, ours_per_image = evaluate_ours(ws, args.iters)

    delta = ours_psnr - ref_psnr
    print(json.dumps({
        "reference_psnr": round(ref_psnr, 4),
        "ours_psnr": round(ours_psnr, 4),
        "delta_db": round(delta, 4),
        "reference_per_image": ref_per_image,
        "ours_per_image": [round(p, 3) for p in ours_per_image],
        "tolerance_db": args.tol,
        "pass": bool(abs(delta) <= args.tol),
    }))
    assert abs(delta) <= args.tol, (
        f"PSNR parity FAILED: ours {ours_psnr:.3f} vs reference "
        f"{ref_psnr:.3f} (|delta| {abs(delta):.3f} > {args.tol})")
    print("PARITY OK")


if __name__ == "__main__":
    main()

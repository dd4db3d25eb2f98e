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

Real-data parity (VERDICT r3 #7 — the one-command path for the day the
reference's datasets/released checkpoints are obtainable):

  python tools/parity_check.py --mode planes \
      --data /path/to/nerf_synthetic --scene lego \
      --checkpoint /path/to/released_logdir

--data points at a dataset root (containing scene dirs) or a single
scene dir (transforms_*.json => Blender-synthetic; poses_bounds.npy =>
LLFF, group keys get the ',llff' type tag automatically). --checkpoint
points at a trained reference logdir (config.yml +
checkpoint.ckpt_best [+ SR_checkpoint.ckpt_best] + planes/*.par_best):
phase 2 (training) is skipped, the reference runs its own --eval
images on that checkpoint for the golden, and BOTH programs evaluate
under the checkpoint's own config.yml (reference eval semantics,
/root/reference/train_nerf.py:62-72) with logdir/dataset roots
re-rooted into the workdir. --scene filters the config's scene-group
lists to the named scene(s) (literal-name lists only).
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

CONFIG_TMPL_MIP = """\
experiment:
  logdir: {logdir}
  id: ref_parity_mip
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
      4,: ['blob']
    val:
      2,: ['blob']
  prob_assigned2scene_groups: False
  testskip: 1
  llffhold: 2
models:
  coarse:
    type: FlexibleNeRFModel
    num_layers: 4
    hidden_size: 64
    skip_connect_every: 3
    include_input_xyz: True
    num_encoding_fn_xyz: 6
    use_viewdirs: True
    include_input_dir: True
    num_encoding_fn_dir: 4
  fine:
    type: FlexibleNeRFModel
optimizer:
  type: Adam
  lr: 1.0E-3
nerf:
  use_viewdirs: True
  encode_position_fn: mip
  encode_direction_fn: positional_encoding
  train:
    num_random_rays: 512
    chunksize: 65536
    perturb: True
    num_coarse: 24
    num_fine: 24
    white_background: False
    im_inconsistency_loss_w: 1
    im_consistency_iters_freq: 0.25
    radiance_field_noise_std: 0.2
    lindisp: False
  validation:
    chunksize: 65536
    perturb: False
    num_coarse: 24
    num_fine: 24
    white_background: False
    radiance_field_noise_std: 0.
    lindisp: False
"""

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


CONFIG_TMPL_SR = """\
experiment:
  logdir: {logdir}
  id: ref_parity_sr
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
    # the flagship TrainModels structure at mini scale
    # (/root/reference/config/TrainModels.yml:46-55): an LR+HR train
    # couple (blob) trains the SR net; a second scene with only LR
    # training views (blob2) gets its HR views evaluated through
    # SR'd planes — the scene where SR_psnr_gain is measured
    train:
      4,32,16: ['blob', 'blob2']
      2,64,16: ['blob']
    val:
      2,64,16: ['blob2']
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
super_resolution:
  lr: 5.E-5
  training:
    loss: fine
  apply_2_coarse: False
  model:
    type: EDSR
    hidden_size: 32
    n_blocks: 2
nerf:
  use_viewdirs: True
  train:
    what: ['LR_planes','decoder','SR']
    num_random_rays: 512
    chunksize: 65536
    store_planes:
      buffer_size: 1
      steps_per_buffer: 1000000
    perturb: True
    num_coarse: 32
    num_fine: 32
    white_background: False
    im_inconsistency_loss_w: 0
    im_consistency_iters_freq: 0.25
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


def ensure_scene(ws, size, name=SCENE):
    scene_dir = os.path.join(ws, "datasets", name)
    if not os.path.isfile(os.path.join(scene_dir, "transforms_val.json")):
        sh([sys.executable, os.path.join(TOOLS, "gen_scene.py"),
            os.path.join(ws, "datasets"), name, str(size), "8", "2", "2"],
           cwd=ws)
    return scene_dir


def is_scene_dir(path):
    return (os.path.isfile(os.path.join(path, "transforms_train.json"))
            or os.path.isfile(os.path.join(path, "poses_bounds.npy")))


def link_real_data(ws, data, scenes):
    """Link real scene dirs into <ws>/datasets. `data` is a single
    scene dir or a dataset root containing scene dirs; returns
    [(name, is_llff)] for the linked scenes."""
    os.makedirs(os.path.join(ws, "datasets"), exist_ok=True)
    data = os.path.abspath(data)
    if is_scene_dir(data):
        pairs = [(scenes[0] if scenes else os.path.basename(data), data)]
    else:
        assert scenes, "--data is a dataset root: name scenes via --scene"
        for s in scenes:
            assert is_scene_dir(os.path.join(data, s)), (
                f"{data}/{s} has neither transforms_train.json nor "
                "poses_bounds.npy")
        pairs = [(s, os.path.join(data, s)) for s in scenes]
    out = []
    for name, src in pairs:
        dst = os.path.join(ws, "datasets", name)
        if not os.path.exists(dst):
            os.symlink(src, dst)
        out.append((name, os.path.isfile(
            os.path.join(src, "poses_bounds.npy"))))
    return out


def make_external_render(ckpt_dir, mode, scenes):
    """Config renderer for released-checkpoint parity: the TRAINED
    experiment's own config.yml with logdir/dataset roots re-rooted
    into the workdir (reference eval semantics: the eval config comes
    from the trained experiment, train_nerf.py:62-72)."""
    from nvsr_tpu.utils.config import get_config
    path = os.path.join(ckpt_dir, "config.yml")
    if not os.path.isfile(path):
        return None

    def render(logdir, iters):
        cfg = get_config(path)
        cfg.experiment["logdir"] = logdir
        cfg.experiment["id"] = exp_id(mode)
        cfg.experiment["train_iters"] = iters
        for k in ("synt", "llff"):
            if k in cfg.get("dataset", {}):
                cfg.dataset[k]["root"] = "datasets"
        for k in ("path", "planes_path"):
            cfg.get("models", {}).pop(k, None)
        cfg.get("super_resolution", {}).get("model", {}).pop("path", None)
        if scenes:
            # keep only the named scenes (literal-name lists; range
            # entries like [a,b] are left untouched)
            for split in list(cfg.dataset.get("dir", {})):
                groups = cfg.dataset.dir[split]
                for gk in list(groups):
                    names = groups[gk]
                    if not (isinstance(names, list)
                            and all(isinstance(n, str) for n in names)):
                        continue
                    kept = [n for n in names if n in scenes]
                    if kept:
                        groups[gk] = kept
                    else:
                        del groups[gk]
        return cfg.dump()

    return render


def make_template_render(mode, scenes, llff=False):
    """Default config renderer: the shipped mini templates, with the
    analytic scene names swapped for real ones and the ',llff' type tag
    appended to scene-group keys for LLFF data."""
    tmpl = {"planes": CONFIG_TMPL, "mip": CONFIG_TMPL_MIP,
            "sr": CONFIG_TMPL_SR}[mode]

    def render(logdir, iters):
        text = tmpl.format(logdir=logdir, iters=iters)
        if scenes:
            text = text.replace("blob2", scenes[1] if len(scenes) > 1
                                else scenes[0])
            text = text.replace("blob", scenes[0])
        if llff:
            text = re.sub(r"^(\s+)(\d[\d,]*):", r"\1\2,llff:", text,
                          flags=re.M)
        return text

    return render


def write_cfg(ws, name, logdir, iters, mode="planes", render=None):
    os.makedirs(os.path.join(ws, "config"), exist_ok=True)
    with open(os.path.join(ws, "config", "local_config.yml"), "w") as f:
        f.write(f"root: {ws}\n")
    path = os.path.join(ws, "config", name)
    if render is None:
        render = make_template_render(mode, None)
    with open(path, "w") as f:
        f.write(render(logdir, iters))
    return path


def exp_id(mode):
    return {"planes": "ref_parity", "mip": "ref_parity_mip",
            "sr": "ref_parity_sr"}[mode]


def reference_train_and_eval(ws, iters, mode="planes", render=None):
    EXP_ID = exp_id(mode)
    ref_logdir = os.path.join(ws, "logs", EXP_ID)
    cfg = write_cfg(ws, f"parity_{mode}.yml", "logs", iters, mode,
                    render=render)
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


def parse_metrics_txt(results_dir, key):
    """Collect every `<group>/<key>: value` line from metrics.txt files
    under results_dir (both programs' eval mode writes this format —
    reference train_nerf.py:247-251, ours utils/logging.py:153-163)."""
    vals = []
    for root, _, files in os.walk(results_dir):
        if "metrics.txt" not in files:
            continue
        with open(os.path.join(root, "metrics.txt")) as f:
            for line in f:
                m = re.match(r"[^:\s]+/" + re.escape(key) +
                             r": ([-\d.naif]+)", line.strip())
                if m:
                    vals.append(float(m.group(1)))
    return vals


def parse_reference_metrics(results_dir):
    """Mean PSNR over all eval images, from the per-image PSNRs the
    reference embeds in its output PNG names (plus the per-image list)."""
    per_image = []
    for root, _, files in os.walk(results_dir):
        if os.path.basename(root).endswith("fine"):
            for fn in sorted(files):
                m = re.match(r"(\d+)_PSNR(\d+)_(\d+)\.png", fn)
                if m:
                    per_image.append(float(f"{m.group(2)}.{m.group(3)}"))
    assert per_image, "no per-image PSNRs in reference results"
    return float(np.mean(per_image)), per_image


def convert_to_ours(ws, ref_logdir, mode="planes", render=None):
    """Reference torch artifacts -> our checkpoint/planes layout under
    <ws>/logs_ours/<exp_id>."""
    from nvsr_tpu.convert import (convert_nerf_mlp, convert_par_file,
                                  convert_plane_sr,
                                  convert_triplane_decoder,
                                  load_torch_checkpoint)
    from nvsr_tpu.planes_store import PlaneStore, ScenePlanes
    from nvsr_tpu.utils.config import get_config
    from nvsr_tpu.utils.io import save_pickle

    EXP_ID = exp_id(mode)
    ours_logdir = os.path.join(ws, "logs_ours", EXP_ID)
    os.makedirs(os.path.join(ours_logdir, "planes"), exist_ok=True)

    ckpt = load_torch_checkpoint(
        os.path.join(ref_logdir, "checkpoint.ckpt_best"))
    cfg_path = write_cfg(ws, f"parity_{mode}_ours.yml", "logs_ours",
                         0, mode, render=render)
    cfg = get_config(cfg_path)
    if mode == "mip":
        state = {
            "model_coarse_state_dict": convert_nerf_mlp(
                ckpt["model_coarse_state_dict"]),
            "model_fine_state_dict": convert_nerf_mlp(
                ckpt["model_fine_state_dict"]),
        }
        save_pickle(os.path.join(ours_logdir, "checkpoint.ckpt"), state,
                    suffix="ckpt", best=True)
        with open(os.path.join(ours_logdir, "config.yml"), "w") as f:
            f.write(cfg.dump())
        return ours_logdir
    coarse, rot = convert_triplane_decoder(ckpt["model_coarse_state_dict"])
    fine, _ = convert_triplane_decoder(ckpt["model_fine_state_dict"])
    state = {
        "model_coarse_state_dict": coarse,
        "model_fine_state_dict": fine,
        "models_config": cfg.models.to_dict(),
    }
    if rot is not None:
        state["rot_mats"] = rot
    save_pickle(os.path.join(ours_logdir, "checkpoint.ckpt"), state,
                suffix="ckpt", best=True)
    if mode == "sr":
        # the flagship SR workflow's second artifact: the reference's
        # trained PlanesSR/EDSR weights (SR_checkpoint.ckpt_best,
        # reference train_nerf.py:995-999) -> our SR checkpoint layout
        sr_ckpt = load_torch_checkpoint(
            os.path.join(ref_logdir, "SR_checkpoint.ckpt_best"))
        save_pickle(os.path.join(ours_logdir, "SR_checkpoint.ckpt"),
                    {"SR_model": convert_plane_sr(sr_ckpt["SR_model"])},
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


def evaluate_ours(ws, iters, mode="planes", render=None):
    from nvsr_tpu.experiment import Experiment
    from nvsr_tpu.ops.rendering import mse2psnr
    import jax.numpy as jnp

    write_cfg(ws, f"parity_{mode}_ours.yml", "logs_ours", iters, mode,
              render=render)
    from nvsr_tpu.utils.config import get_config
    cfg = get_config(os.path.join(ws, "config", f"parity_{mode}_ours.yml"))
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
    ap.add_argument("--mode", choices=["planes", "mip", "sr"],
                    default="planes")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend for our eval (numerics "
                         "are platform-independent at these tolerances)")
    ap.add_argument("--data", default=None,
                    help="real dataset root or a single scene dir "
                         "(skips analytic scene generation)")
    ap.add_argument("--scene", action="append", default=None,
                    help="scene name(s) under --data (repeatable; SR "
                         "mode wants two: couple scene + gain scene)")
    ap.add_argument("--checkpoint", default=None,
                    help="trained/released reference logdir "
                         "(config.yml + checkpoint.ckpt_best + planes/)"
                         " — skips reference training")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    ws = os.path.abspath(args.workdir)
    os.makedirs(ws, exist_ok=True)

    render = None
    if args.data:
        linked = link_real_data(ws, args.data, args.scene)
        scenes = [n for n, _ in linked]
        llff = any(l for _, l in linked)
        render = make_template_render(args.mode, scenes, llff=llff)
    else:
        scenes = None
        ensure_scene(ws, args.size)
        if args.mode == "sr":
            # second scene: LR-trained, HR views eval-only (SR-gain
            # scene)
            ensure_scene(ws, args.size, "blob2")
    if args.checkpoint:
        ckpt = os.path.abspath(args.checkpoint)
        dst = os.path.join(ws, "logs", exp_id(args.mode))
        os.makedirs(os.path.join(ws, "logs"), exist_ok=True)
        if not os.path.exists(dst):
            import shutil
            shutil.copytree(ckpt, dst)   # eval writes into the logdir
        ext = make_external_render(ckpt, args.mode, scenes)
        render = ext or render
    ref_logdir, results, metrics = reference_train_and_eval(
        ws, args.iters, args.mode, render=render)
    convert_to_ours(ws, ref_logdir, args.mode, render=render)
    _, ours_per_image = evaluate_ours(ws, args.iters, args.mode,
                                      render=render)
    if args.mode == "sr":
        # in SR mode the 'fine'-dir PNG names carry the skip-SR
        # reference PSNRs, not the SR render's — compare the programs'
        # own <group>/psnr metrics.txt lines symmetrically instead
        ref_per_image = parse_metrics_txt(results, "psnr")
        ref_psnr = float(np.mean(ref_per_image))
        ours_per_image = parse_metrics_txt(
            os.path.join(ws, "results_ours"), "psnr")
        ours_psnr = float(np.mean(ours_per_image))
    else:
        ref_psnr, ref_per_image = parse_reference_metrics(results)
        ours_psnr = float(np.mean(ours_per_image))

    delta = ours_psnr - ref_psnr
    record = {
        "mode": args.mode,
        "reference_psnr": round(ref_psnr, 4),
        "ours_psnr": round(ours_psnr, 4),
        "delta_db": round(delta, 4),
        "reference_per_image": ref_per_image,
        "ours_per_image": [round(p, 3) for p in ours_per_image],
        "tolerance_db": args.tol,
        "pass": bool(abs(delta) <= args.tol),
    }
    gain_ok = True
    if args.mode == "sr":
        # SR-gain parity: both programs log <group>/SR_psnr_gain into
        # their eval metrics.txt — the delta bounds the PlanesSR/EDSR +
        # SceneCoupler LR/HR coupling numerics end-to-end
        ref_gain = parse_metrics_txt(results, "SR_psnr_gain")
        ours_gain = parse_metrics_txt(os.path.join(ws, "results_ours"),
                                      "SR_psnr_gain")
        record["reference_sr_gain"] = [round(g, 4) for g in ref_gain]
        record["ours_sr_gain"] = [round(g, 4) for g in ours_gain]
        if ref_gain and ours_gain:
            gd = float(np.mean(ours_gain)) - float(np.mean(ref_gain))
            record["sr_gain_delta_db"] = round(gd, 4)
            gain_ok = abs(gd) <= args.tol
            record["pass"] = bool(record["pass"] and gain_ok)
        else:
            record["pass"] = False
            gain_ok = False
    print(json.dumps(record))
    assert abs(delta) <= args.tol, (
        f"PSNR parity FAILED: ours {ours_psnr:.3f} vs reference "
        f"{ref_psnr:.3f} (|delta| {abs(delta):.3f} > {args.tol})")
    assert gain_ok, "SR_psnr_gain parity FAILED: " + json.dumps(record)
    print("PARITY OK")


if __name__ == "__main__":
    main()

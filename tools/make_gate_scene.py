"""Train (if needed) and export the bench PSNR-gate scene asset.

VERDICT r3 #5: the driver bench renders random-init planes only, so a
kernel bug that manifests on STRUCTURED plane content would pass its
finite-checksum assert. This tool produces `assets/gate_scene.pkl`
(committed in-repo, a few MB): a converged flagship-width field
(val_occupancy variant V — 128-wide 4+4/skip-3 decoders, 16-ch 128^2
planes, occupancy-trained, white background) plus one held-out view,
so bench.py can render it through BOTH the tiled Pallas path and the
XLA path every driver run and assert their agreement (psnr_gate_db)
and the absolute eval PSNR (mirrors reference eval semantics,
train_utils.py:285).

Usage: python tools/make_gate_scene.py [--workdir /tmp/gate_ws]
                                       [--iters 2500] [--size 256]
Training runs on the default backend (TPU: minutes). Export is
deterministic given a trained logdir; re-running with an existing
workdir skips training.
"""

import argparse
import os
import pickle
import sys

import numpy as np

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)
sys.path.insert(0, TOOLS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/gate_ws")
    ap.add_argument("--iters", type=int, default=2500)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default=os.path.join(REPO, "assets",
                                                  "gate_scene.pkl"))
    args = ap.parse_args()

    import jax
    if os.environ.get("NVSR_PLATFORM"):  # e.g. cpu export while the
        # TPU tunnel is busy (export is backend-agnostic given a ckpt)
        jax.config.update("jax_platforms", os.environ["NVSR_PLATFORM"])
    from val_occupancy import build_cfg, ensure_scene
    from nvsr_tpu.experiment import Experiment
    from nvsr_tpu.ops.rendering import mse2psnr
    from nvsr_tpu.planes_store import materialize_pos_planes

    ws = os.path.abspath(args.workdir)
    os.makedirs(ws, exist_ok=True)
    ensure_scene(ws, args.size)
    cfg = build_cfg(ws, "V", args.iters)
    # trained-ness must be decided BEFORE constructing an Experiment:
    # the constructor (mirroring reference train_nerf.py:79-95) refuses
    # a checkpointed logdir unless load_checkpoint="resume" is passed.
    logdir = os.path.join(ws, cfg.experiment["logdir"],
                          cfg.experiment.get("id", ""))
    trained = os.path.isdir(logdir) and any(
        ".ckpt" in f for f in os.listdir(logdir))
    if not trained:
        exp = Experiment(cfg, root_path=ws)
        exp.run(max_iters=args.iters)
    else:
        print(f"reusing trained logdir {logdir}")
    # training donates plane/optimizer buffers into the jitted updates —
    # a post-run Experiment holds deleted arrays. Load fresh from the
    # checkpoint either way.
    exp = Experiment(cfg, load_checkpoint="resume", root_path=ws)

    scene_id = exp.evaluation_sequences[0]
    planes = exp.planes_buffer.load_scene(scene_id, load_best=False)
    img_idx = exp.i_val[scene_id][0]
    img, pose, h, w, focal, ds_f = exp.dataset.item(img_idx)

    # held-out sanity: the exported field must actually be converged
    out, _ = exp.render_eval_image(scene_id, img_idx)
    rgb = np.asarray(out.fine.rgb)
    psnr = float(mse2psnr(np.mean((rgb - np.asarray(img)[..., :3]) ** 2)))
    print(f"export view held-out PSNR: {psnr:.2f} dB")
    assert psnr > 25.0, "gate scene did not converge — raise --iters"

    dc = exp.decoder_coarse if exp.decoder_opt is None \
        else exp.decoder_opt.params["dc"]
    df = dc if exp.share_coarse_fine else (
        exp.decoder_fine if exp.decoder_opt is None
        or "df" not in exp.decoder_opt.params
        else exp.decoder_opt.params["df"])
    to_np = lambda t: jax.tree.map(np.asarray, jax.device_get(t))
    asset = {
        "model_cfg": exp.model_cfg,           # frozen dataclass, pickles
        "decoder_coarse": to_np(dc),
        "decoder_fine": to_np(df),
        "planes_pos": np.asarray(
            materialize_pos_planes(planes.planes_pos, planes.rank)),
        "plane_view": None if planes.plane_view is None
        else np.asarray(planes.plane_view),
        "box": np.asarray(planes.box),
        "occ_aabb": None if planes.occ_aabb is None
        else np.asarray(planes.occ_aabb),
        "pose": np.asarray(pose), "h": int(h), "w": int(w),
        "focal": float(focal), "ds_factor": int(ds_f),
        "near": 2.0, "far": 6.0, "white_background": True,
        "num_coarse": 16, "num_fine": 16,
        "gt": (255 * np.clip(np.asarray(img)[..., :3], 0, 1)
               ).astype(np.uint8),
        "export_psnr_db": psnr,
        "scene_id": scene_id,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(asset, f)
    print(f"wrote {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()

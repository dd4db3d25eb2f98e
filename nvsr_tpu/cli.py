"""train_nerf-compatible command line entry point.

Reproduces the reference CLI surface (reference train_nerf.py:21-77):

    python -m nvsr_tpu.cli --config <yml> [--load-checkpoint DIR|resume]
                           [--eval images|video --results_path DIR]

including the machine-local `config/local_config.yml` root-path
indirection (reference train_nerf.py:50-60) and eval-mode config
override from the trained experiment's dumped config
(train_nerf.py:62-71).
"""

from __future__ import annotations

import argparse
import os

# NVSR_PLATFORM=cpu|tpu: pick the jax backend IN-PROCESS, before any
# array op. A plain JAX_PLATFORMS env var does not survive environments
# whose sitecustomize force-registers a remote backend — and when that
# backend's tunnel is down, PJRT init hangs the whole CLI. Mirrors
# bench.py's BENCH_PLATFORM knob.
if os.environ.get("NVSR_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["NVSR_PLATFORM"])

from nvsr_tpu.experiment import Experiment
from nvsr_tpu.utils.config import get_config


def build_argparser():
    parser = argparse.ArgumentParser(prog="nvsr_tpu")
    parser.add_argument("--config", type=str,
                        help="Path to (.yml) config file.")
    parser.add_argument("--load-checkpoint", type=str, default="",
                        help="Path to load saved checkpoint from "
                             "(or 'resume').")
    parser.add_argument("--eval", type=str, choices=["images", "video"],
                        default=None,
                        help="Run in evaluation mode and render "
                             "images/video.")
    parser.add_argument("--results_path", type=str,
                        help="Path to save evaluation results.")
    parser.add_argument("--local-config", type=str,
                        default=os.path.join("config", "local_config.yml"),
                        help="Machine-local config with the dataset/logs "
                             "root path.")
    parser.add_argument("--max-iters", type=int, default=None,
                        help="Override experiment.train_iters (for smoke "
                             "runs).")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of the run "
                             "into this directory.")
    return parser


def main(argv=None):
    args = build_argparser().parse_args(argv)
    eval_mode = args.eval
    assert args.config or args.load_checkpoint, (
        "Specify a configuration file and/or a checkpoint to resume.")

    root_path = ""
    if os.path.isfile(args.local_config):
        local = get_config(args.local_config)
        root_path = local.get("root", "")

    config_file = (os.path.join(args.load_checkpoint, "config.yml")
                   if args.config is None else args.config)
    cfg = get_config(config_file)
    experiment_id = cfg.experiment.get(
        "id", cfg.experiment["logdir"].split("/")[-1])
    planes_model = ("coarse" not in cfg.get("models", {})
                    or cfg.models.coarse.get("type") == "TwoDimPlanesModel")

    if eval_mode and planes_model and args.config is not None:
        # Override with the training-time config, keeping the eval
        # dataset section (reference train_nerf.py:62-71).
        dataset_cfg = cfg.dataset
        trained_cfg_file = os.path.join(root_path, cfg.experiment["logdir"],
                                        experiment_id, "config.yml")
        if os.path.isfile(trained_cfg_file):
            cfg = get_config(trained_cfg_file)
            cfg["dataset"] = dataset_cfg

    print(f"Using configuration file {config_file}")
    print(("Evaluating" if eval_mode else "Running")
          + f" experiment {experiment_id}")

    exp = Experiment(cfg, load_checkpoint=args.load_checkpoint,
                     eval_mode=eval_mode, results_path=args.results_path,
                     root_path=root_path)
    if args.profile_dir:
        import jax
        with jax.profiler.trace(args.profile_dir):
            exp.run(max_iters=args.max_iters)
    else:
        exp.run(max_iters=args.max_iters)


if __name__ == "__main__":
    main()

"""End-to-end workflow tests: the four reference stages in miniature
(SURVEY.md §4 integration strategy), on a synthetic corpus."""

import os

import numpy as np
import pytest

from helpers_synth import write_blender_scene
from nvsr_tpu.experiment import Experiment, find_latest_checkpoint
from nvsr_tpu.utils.config import CfgNode


def _mini_cfg(tmp_path, *, logdir="logs/exp1", train_groups=None,
              val_groups=None, what=("LR_planes", "decoder", "SR"),
              sr=True, pretrained=None, planes_path=None,
              im_inconsistency=None, iters=6):
    cfg = {
        "experiment": {
            "logdir": logdir, "randomseed": 0, "train_iters": iters,
            "validate_every": [0.05, 4], "save_every": 1000,
            "print_every": 1000,
        },
        "dataset": {
            "synt": {"root": "synt", "near": 2, "far": 6, "no_ndc": True},
            "llff": {"root": "llff", "near": 0, "far": 1, "no_ndc": False},
            "testskip": 1, "llffhold": 2,
            "dir": {"train": train_groups or {"4,8,8": ["lego"]},
                    "val": val_groups or {}},
        },
        "models": {
            "coarse": {
                "type": "TwoDimPlanesModel", "plane_interp": "bilinear",
                "dec_density_layers": 2, "dec_rgb_layers": 2,
                "dec_channels": 16, "num_plane_channels": 4,
                "rgb_dec_input": "projections",
                "proj_combination": "avg",
                "viewdir_proj_combination": "concat_pos",
                "align_corners": True,
            },
            "fine": {"type": "TwoDimPlanesModel"},
        },
        "optimizer": {"type": "Adam", "lr": 5e-4, "planes_lr": 1e-2},
        "nerf": {
            "use_viewdirs": True,
            "train": {
                "what": list(what), "num_random_rays": 128,
                "chunksize": 4096,
                "store_planes": {"steps_per_buffer": 200},
                "perturb": True, "num_coarse": 6, "num_fine": 6,
                "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
            },
            "validation": {
                "chunksize": 4096, "perturb": False, "num_coarse": 6,
                "num_fine": 6, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
            },
        },
    }
    if im_inconsistency is not None:
        cfg["nerf"]["train"]["im_inconsistency_loss_w"] = im_inconsistency
        cfg["nerf"]["train"]["im_consistency_iters_freq"] = 0.3
    if sr:
        cfg["super_resolution"] = {
            "lr": 5e-4, "training": {"loss": "fine"},
            "apply_2_coarse": False,
            "model": {"type": "EDSR", "hidden_size": 8, "n_blocks": 1},
        }
    if pretrained:
        cfg["models"]["path"] = pretrained
    if planes_path:
        cfg["models"]["planes_path"] = planes_path
    return CfgNode(cfg)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    write_blender_scene(str(root / "synt"), "lego", size=32)
    write_blender_scene(str(root / "synt"), "ship", size=32)
    return root


@pytest.fixture(scope="module")
def stage1(corpus):
    """Mini TrainModels: LR+HR scenes, joint decoder+SR+planes."""
    cfg = _mini_cfg(
        corpus, logdir="logs/stage1",
        train_groups={"4,8,8": ["lego", "ship"], "2,16,8": ["lego", "ship"]},
        iters=6)
    exp = Experiment(cfg, root_path=str(corpus))
    exp.run()
    return exp


def test_stage1_trains_and_checkpoints(stage1, corpus):
    logdir = os.path.join(str(corpus), "logs/stage1")
    assert find_latest_checkpoint(logdir, sr=False) is not None
    assert find_latest_checkpoint(logdir, sr=True) is not None
    planes_dir = os.path.join(logdir, "planes")
    assert any(f.endswith(".planes") for f in os.listdir(planes_dir))
    # HR scenes share the LR scene's planes
    assert stage1.scene_coupler.scene2saved["lego_DS2_PlRes16_8"] == \
        "lego_DS4_PlRes8_8"
    assert stage1.scene_coupler.ds_factor == 2


def test_stage1_eval_groups(stage1):
    # both LR (couple targets) and HR (validation) tags present
    assert any("LR" in v for v in stage1.val_strings)
    assert any(v.startswith("validation") and "LR" not in v
               for v in stage1.val_strings)


def test_stage2_planes_only_frozen_decoder(stage1, corpus):
    """Mini Feature_Planes_Only: new scene planes, frozen decoder/SR."""
    write_blender_scene(str(corpus / "synt"), "chair", size=32)
    cfg = _mini_cfg(
        corpus, logdir="logs/stage2",
        train_groups={"4,8,8": ["chair"]},
        val_groups={"2,16,8": ["chair"]},
        what=("LR_planes",), sr=False, pretrained="logs/stage1", iters=5)
    exp = Experiment(cfg, root_path=str(corpus))
    # decoder inherited from pretrained: no decoder optimizer
    assert exp.decoder_opt is None
    assert exp.sr_experiment  # inherited from stage-1 config
    dec_before = np.asarray(
        exp.decoder_coarse["members"][0]["fc_alpha"]["w"]).copy()
    exp.run()
    dec_after = np.asarray(
        exp.decoder_coarse["members"][0]["fc_alpha"]["w"])
    np.testing.assert_array_equal(dec_before, dec_after)  # frozen
    # new planes created for the new scene
    assert exp.store.exists("chair_DS4_PlRes8_8")


def test_stage3_refine_with_consistency(stage1, corpus):
    """Mini RefineOnTestScene: joint refinement + consistency loss."""
    cfg = _mini_cfg(
        corpus, logdir="logs/stage3",
        train_groups={"4,8,8": ["ship"]},
        val_groups={"2,16,8": ["ship"]},
        pretrained="logs/stage1", planes_path="logs/stage1",
        im_inconsistency=1.0, iters=6)
    exp = Experiment(cfg, root_path=str(corpus))
    # the HR val-only scene joins training for consistency iterations
    assert "ship_DS2_PlRes16_8" in exp.i_train
    assert exp.loss4best == "im_inconsistency"
    exp.run()


def test_eval_mode_writes_images_and_metrics(stage1, corpus):
    cfg = _mini_cfg(
        corpus, logdir="logs/stage1",
        train_groups={"4,8,8": ["lego", "ship"],
                      "2,16,8": ["lego", "ship"]},
        val_groups={"2,16,8": ["lego"]}, iters=6)
    results = str(corpus / "results")
    exp = Experiment(cfg, eval_mode="images", results_path=results,
                     root_path=str(corpus))
    exp.run()
    out_root = os.path.join(results, "stage1")
    seqs = os.listdir(out_root)
    assert seqs, "no evaluation outputs written"
    seq_dir = os.path.join(out_root, exp.evaluation_sequences[0])
    assert os.path.isfile(os.path.join(seq_dir, "metrics.txt"))
    pngs = [f for sub in os.listdir(seq_dir)
            if os.path.isdir(os.path.join(seq_dir, sub))
            for f in os.listdir(os.path.join(seq_dir, sub))
            if f.endswith(".png")]
    assert pngs, "no rendered PNGs written"


def test_resume_continues_iteration(stage1, corpus):
    logdir = os.path.join(str(corpus), "logs/stage1")
    cfg = _mini_cfg(
        corpus, logdir="logs/stage1",
        train_groups={"4,8,8": ["lego", "ship"],
                      "2,16,8": ["lego", "ship"]}, iters=8)
    exp = Experiment(cfg, load_checkpoint="resume", root_path=str(corpus))
    assert exp.experiment_info["start_i"] > 0


def test_mip_baseline_smoke(corpus):
    cfg = _mini_cfg(corpus, logdir="logs/mip", iters=4,
                    train_groups={"4,": ["lego"]},
                    val_groups={"2,": ["lego"]}, sr=False, what=())
    cfg.models = CfgNode({
        "coarse": {"type": "FlexibleNeRFModel", "num_layers": 2,
                   "hidden_size": 16, "skip_connect_every": 4,
                   "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
                   "include_input_xyz": True, "include_input_dir": True},
        "fine": {"type": "FlexibleNeRFModel"},
    })
    cfg.nerf["encode_position_fn"] = "mip"
    exp = Experiment(cfg, root_path=str(corpus))
    assert not exp.planes_model
    exp.run()
    assert find_latest_checkpoint(
        os.path.join(str(corpus), "logs/mip"), sr=False) is not None


def test_shipped_configs_parse():
    """Every shipped YAML parses and exposes the expected keys
    (SURVEY.md §4 config smoke)."""
    import glob
    from nvsr_tpu.utils.config import get_config
    files = glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "*.yml"))
    assert len(files) >= 4
    for f in files:
        cfg = get_config(f)
        assert "experiment" in cfg and "nerf" in cfg and "dataset" in cfg
        for key, scenes in dict(cfg.dataset["dir"].get("train", {})).items():
            from nvsr_tpu.scenes import parse_scene_group_key
            parse_scene_group_key(key)


def test_module_confinement_blocks_decoder(corpus):
    """A scene confined to 'decoder' never steps the decoder
    (reference train_nerf.py:909, module_confinements gating)."""
    cfg = _mini_cfg(corpus, logdir="logs/confined",
                    train_groups={"4,8,8,'synt',1,['decoder']": ["lego"]},
                    sr=False, what=("LR_planes", "decoder"), iters=4)
    exp = Experiment(cfg, root_path=str(corpus))
    before = np.asarray(
        exp.decoder_opt.params["dc"]["members"][0]["fc_alpha"]["w"]).copy()
    exp.run()
    after = np.asarray(
        exp.decoder_opt.params["dc"]["members"][0]["fc_alpha"]["w"])
    np.testing.assert_array_equal(before, after)
    # planes still trained
    planes = exp.planes_buffer.get("lego_DS4_PlRes8_8")
    assert exp.planes_buffer.dirty or exp.store.exists("lego_DS4_PlRes8_8")


def test_separate_decoder_sr_gating(corpus):
    """separate_decoder_sr freezes the decoder on SR (HR) iterations
    (reference train_nerf.py:911-912)."""
    cfg = _mini_cfg(
        corpus, logdir="logs/sepdec",
        train_groups={"4,8,8": ["lego"], "2,16,8": ["lego"]}, iters=6)
    cfg.nerf.train["separate_decoder_sr"] = True
    exp = Experiment(cfg, root_path=str(corpus))
    exp.run()  # smoke: both LR and HR iterations occur without error
    assert exp.scene_coupler.ds_factor == 2


def test_plane_coverage_and_jump_start(corpus):
    """plane_stats debug histograms (reference models.py:328-352) and
    the jump_start curriculum hook (models.py:748-765)."""
    cfg = _mini_cfg(corpus, logdir="logs/coverage",
                    train_groups={"4,8,8": ["lego", "ship"]}, sr=False,
                    what=("LR_planes", "decoder"), iters=2)
    cfg.models.coarse["plane_stats"] = True
    exp = Experiment(cfg, root_path=str(corpus))
    exp.planes_buffer.draw_scenes()
    exp.image_sampler.update_active(exp.planes_buffer.cur_scenes)
    exp.evaluate(0)
    cov_dir = os.path.join(exp.logdir, "coverage")
    pngs = os.listdir(cov_dir)
    assert any(f.startswith("plane_coverage_") for f in pngs)
    assert any(f.endswith("_coverage.png")
               and not f.startswith("plane_coverage_") for f in pngs)
    counts = exp._plane_coverage.counts
    assert any(c.sum() > 0 for c in counts.values())

    buf = exp.planes_buffer
    spb_before = buf.steps_per_buffer
    n = buf.jump_start(config=[0.5, 1e-3], on=True)
    assert n == 1 and buf.steps_per_buffer == -1
    scenes = buf.jump_start(on=False)
    assert buf.steps_per_buffer == spb_before
    assert set(scenes) == set(buf.cur_scenes)


def test_running_scores_lazy_metric_registration():
    """Conditionally-fired metrics (e.g. tiled_overflow_frac, surfaced
    only when a chunk clamps at eval) must register lazily — a KeyError
    here killed a val_occupancy eval mid-run (round 4)."""
    from nvsr_tpu.utils.logging import RunningScores
    rs = RunningScores(["loss"], ["validation"], {"validation": 4})
    rs.add("loss", "validation", 1.0)
    rs.add("tiled_overflow_frac", "validation", 0.5)   # unregistered
    rs.add("loss", "new_group", 2.0)                   # unknown group
    assert rs.mean("tiled_overflow_frac", "validation") == 0.5
    assert rs.mean("loss", "new_group") == 2.0

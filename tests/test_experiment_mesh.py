"""Mesh-integrated production workflows (SURVEY.md §2.10): the SAME
Experiment train/eval paths run data-parallel over the 8-virtual-CPU
mesh via `experiment.data_parallel`, with metrics equal to the
unsharded run."""

import numpy as np
import pytest

from helpers_synth import write_blender_scene
from nvsr_tpu.experiment import Experiment
from test_experiment import _mini_cfg


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_mesh")
    write_blender_scene(str(root / "synt"), "lego", size=32)
    write_blender_scene(str(root / "synt"), "ship", size=32)
    return root


def _run_steps(corpus, logdir, data_parallel, n_iters=4, model_parallel=1):
    """Mini TrainModels (LR+HR couple, joint planes+decoder+SR) driven
    through Experiment.train_iteration; returns (losses, psnrs, image)."""
    cfg = _mini_cfg(
        corpus, logdir=logdir,
        train_groups={"4,8,8": ["lego", "ship"], "2,16,8": ["lego", "ship"]},
        iters=n_iters)
    if data_parallel:
        cfg.experiment["data_parallel"] = data_parallel
        if model_parallel > 1:
            cfg.experiment["model_parallel"] = model_parallel
    exp = Experiment(cfg, root_path=str(corpus))
    if data_parallel:
        assert exp.mesh is not None, "mesh not built from the config key"
    exp.planes_buffer.draw_scenes()
    exp.image_sampler.update_active(exp.planes_buffer.cur_scenes)
    for i in range(n_iters):
        exp.train_iteration(i)
    losses, psnrs = exp.flush_train_metrics()
    scene = exp.evaluation_sequences[0]
    img_idx = exp.i_val[scene][0]
    out, _ = exp.render_eval_image(scene, img_idx)
    rgb = np.asarray(out.fine.rgb if out.fine is not None else out.coarse.rgb)
    return losses, psnrs, rgb


def test_data_parallel_matches_unsharded(corpus):
    l_ref, p_ref, img_ref = _run_steps(corpus, "logs/mesh_ref", False)
    l_dp, p_dp, img_dp = _run_steps(corpus, "logs/mesh_dp", True)
    assert len(l_ref) == len(l_dp) > 0
    np.testing.assert_allclose(l_dp, l_ref, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(p_dp, p_ref, rtol=2e-4)
    np.testing.assert_allclose(img_dp, img_ref, rtol=1e-4, atol=2e-5)


def test_data_plus_model_parallel_runs(corpus):
    """dp x tp (4x2) through the production step: finite metrics and an
    eval render consistent with the unsharded run."""
    l_ref, _, img_ref = _run_steps(corpus, "logs/mesh_ref2", False)
    l_tp, _, img_tp = _run_steps(corpus, "logs/mesh_tp", 8,
                                 model_parallel=2)
    assert np.isfinite(l_tp).all()
    np.testing.assert_allclose(l_tp, l_ref, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(img_tp, img_ref, rtol=1e-3, atol=1e-4)


def test_tiled_eval_composes_with_mesh(corpus):
    """VERDICT r2 #8: the Pallas tiled eval path composes with data
    sharding — tile-major ray order sharded over the mesh's data axis
    (render_rays_chunked's shard_map branch) renders the SAME image as
    the unsharded tiled run and the XLA gather path."""
    def render(logdir, data_parallel, tiled):
        cfg = _mini_cfg(corpus, logdir=logdir,
                        train_groups={"4,8,8": ["lego"]}, sr=False,
                        what=("LR_planes", "decoder"), iters=2)
        if data_parallel:
            cfg.experiment["data_parallel"] = True
        cfg.nerf.validation["tiled_gather"] = tiled
        cfg.nerf.validation["tile_shape"] = "4x4"
        exp = Experiment(cfg, root_path=str(corpus))
        exp.planes_buffer.draw_scenes()
        exp.image_sampler.update_active(exp.planes_buffer.cur_scenes)
        scene = exp.evaluation_sequences[0]
        if tiled:
            assert exp.eval_tile_cfg(scene) is not None, \
                "tiled eval should qualify on this mesh/config"
        out, _ = exp.render_eval_image(scene, exp.i_val[scene][0])
        return np.asarray(out.fine.rgb if out.fine is not None
                          else out.coarse.rgb)

    img_tiled = render("logs/mt_ref", False, True)
    img_mesh = render("logs/mt_dp", True, True)
    img_xla = render("logs/mt_xla", False, False)
    assert np.isfinite(img_mesh).all()
    np.testing.assert_allclose(img_mesh, img_tiled, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(img_mesh, img_xla, rtol=1e-2, atol=5e-3)


def test_scene_sharded_device_pool(corpus, tmp_path_factory):
    """store_planes.device_pool: 8 scenes' planes resident on distinct
    devices of the mesh, training + eval still correct."""
    import jax
    from nvsr_tpu.utils.config import CfgNode

    root = tmp_path_factory.mktemp("pool")
    names = [f"sc{i}" for i in range(8)]
    for n in names:
        write_blender_scene(str(root / "synt"), n, size=16)
    cfg = _mini_cfg(root, logdir="logs/pool",
                    train_groups={"4,8,8": names}, sr=False,
                    what=("LR_planes", "decoder"), iters=8)
    cfg.experiment["data_parallel"] = True
    cfg.nerf.train.store_planes["device_pool"] = True
    exp = Experiment(cfg, root_path=str(root))
    exp.planes_buffer.draw_scenes()
    exp.image_sampler.update_active(exp.planes_buffer.cur_scenes)

    # planes resident on 8 DISTINCT single devices
    homes = set()
    for sc in exp.training_scenes:
        arr = exp.planes_buffer.get(sc).planes_pos
        devs = arr.sharding.device_set
        assert len(devs) == 1, "pooled planes must be single-device"
        homes.add(next(iter(devs)))
    assert len(homes) == 8, f"expected 8 distinct home devices: {homes}"

    for i in range(8):
        exp.train_iteration(i)
    losses, _ = exp.flush_train_metrics()
    assert np.isfinite(losses).all()
    # updates landed back on the home devices
    for sc in exp.training_scenes:
        arr = exp.planes_buffer.get(sc).planes_pos
        assert len(arr.sharding.device_set) == 1

    scene = exp.evaluation_sequences[0]
    out, _ = exp.render_eval_image(scene, exp.i_val[scene][0])
    assert np.isfinite(np.asarray(out.fine.rgb)).all()

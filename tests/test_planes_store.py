"""Tests for the plane store + buffered optimizer (the .par-equivalent)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvsr_tpu.planes_store import (
    PlaneStore,
    PlanesBuffer,
    ScenePlanes,
    create_scene_planes,
    decoder_tied_init_std,
)
from nvsr_tpu.models.triplane import TriplaneConfig, init_decoder_params


def _mk_planes(key, res=8):
    box = np.stack([-np.ones(5), np.ones(5)]).astype(np.float32)
    return create_scene_planes(
        key, num_planes=3, num_channels=4, resolution=res,
        viewdir_resolution=4, viewdir_channels=4, init_std=0.05, box=box)


def test_create_scene_planes_shapes():
    p = _mk_planes(jax.random.PRNGKey(0))
    assert p.planes_pos.shape == (3, 4, 8, 8)
    assert p.plane_view.shape == (4, 4, 4)
    assert abs(float(jnp.std(p.planes_pos)) - 0.05) < 0.01


def test_decoder_tied_init_std():
    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=4)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    std = decoder_tied_init_std(params, std_factor=0.1)
    assert 0 < std < 1


def test_store_roundtrip(tmp_path):
    store = PlaneStore(str(tmp_path))
    p = _mk_planes(jax.random.PRNGKey(1))
    store.save("lego_DS8_PlRes200_32", p)
    loaded, opt = store.load("lego_DS8_PlRes200_32")
    np.testing.assert_array_equal(np.asarray(loaded.planes_pos),
                                  np.asarray(p.planes_pos))
    np.testing.assert_array_equal(np.asarray(loaded.plane_view),
                                  np.asarray(p.plane_view))
    np.testing.assert_array_equal(loaded.box, p.box)
    assert opt is None


def test_store_best_and_search_path(tmp_path):
    loc1 = tmp_path / "logdir" / "planes"
    loc2 = tmp_path / "pretrained" / "planes"
    loc2.mkdir(parents=True)
    store2 = PlaneStore(str(loc2))
    p = _mk_planes(jax.random.PRNGKey(2))
    store2.save("sc_A", p, as_best=True)
    loc1.mkdir(parents=True)
    # hierarchy: logdir first, falls through to pretrained
    store = PlaneStore([str(loc1), str(loc2)])
    assert store.exists("sc_A", prefer_best=True)
    loaded, _ = store.load("sc_A", prefer_best=True)
    np.testing.assert_array_equal(np.asarray(loaded.planes_pos),
                                  np.asarray(p.planes_pos))


def test_atomic_write_keeps_backup_semantics(tmp_path):
    store = PlaneStore(str(tmp_path))
    p1 = _mk_planes(jax.random.PRNGKey(3))
    p2 = _mk_planes(jax.random.PRNGKey(4))
    path = store.save("s", p1)
    store.save("s", p2)
    assert os.path.isfile(path)
    assert not os.path.isfile(path + "_temp") and not os.path.isfile(
        path.replace(".planes", ".planes_bckp"))
    loaded, _ = store.load("s")
    np.testing.assert_array_equal(np.asarray(loaded.planes_pos),
                                  np.asarray(p2.planes_pos))


def _make_buffer(tmp_path, scenes, **kw):
    store = PlaneStore(str(tmp_path))
    for i, sc in enumerate(scenes):
        store.save(sc, _mk_planes(jax.random.PRNGKey(i)))
    return PlanesBuffer(store, scenes, lr=1e-2,
                        rng=np.random.default_rng(0), **kw)


def test_buffer_holds_all_when_small(tmp_path):
    buf = _make_buffer(tmp_path, ["a", "b", "c"])
    buf.draw_scenes()
    assert sorted(buf.cur_scenes) == ["a", "b", "c"]
    assert buf.steps_per_buffer == -1


def test_buffer_redraw_cadence(tmp_path):
    buf = _make_buffer(tmp_path, ["a", "b", "c", "d"], buffer_size=2,
                       steps_per_buffer=2)
    buf.draw_scenes()
    first = sorted(buf.cur_scenes)
    assert len(first) == 2
    assert buf.step_cadence() is None
    new = buf.step_cadence()
    assert new is not None and len(new) == 2


def test_optimizer_step_updates_planes_and_persists(tmp_path):
    buf = _make_buffer(tmp_path, ["a"])
    buf.draw_scenes()
    scene = "a"
    planes = buf.get(scene)
    before = np.asarray(planes.planes_pos).copy()
    grads = {"pos": jnp.ones_like(planes.planes_pos),
             "view": jnp.ones_like(planes.plane_view)}
    buf.apply_grads(scene, grads)
    after = np.asarray(buf.get(scene).planes_pos)
    assert np.abs(after - before).max() > 1e-4
    # optimizer state survives a flush/reload cycle
    buf.save_params()
    state_before = jax.tree.leaves(buf.opt_states[scene])
    buf.resident.clear()
    buf.opt_states.clear()
    buf.draw_scenes()
    state_after = jax.tree.leaves(buf.opt_states[scene])
    for a, b in zip(state_before, state_after):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    np.testing.assert_allclose(np.asarray(buf.get(scene).planes_pos), after,
                               atol=1e-7)


def test_frozen_scene_never_steps(tmp_path):
    store = PlaneStore(str(tmp_path))
    p = _mk_planes(jax.random.PRNGKey(0))
    store.save("f", p, as_best=True)
    store.save("f", p)
    buf = PlanesBuffer(store, ["f"], lr=1e-2, frozen_scenes=["f"],
                       rng=np.random.default_rng(0))
    buf.draw_scenes()
    grads = {"pos": jnp.ones_like(p.planes_pos),
             "view": jnp.ones_like(p.plane_view)}
    buf.apply_grads("f", grads)
    np.testing.assert_array_equal(np.asarray(buf.get("f").planes_pos),
                                  np.asarray(p.planes_pos))
    assert not buf.dirty


def test_coupled_scene_shares_planes(tmp_path):
    store = PlaneStore(str(tmp_path))
    store.save("lr", _mk_planes(jax.random.PRNGKey(0)))
    buf = PlanesBuffer(store, ["lr", "hr"], lr=1e-2,
                       scene2saved={"lr": "lr", "hr": "lr"},
                       rng=np.random.default_rng(0))
    buf.draw_scenes()
    assert buf.get("hr") is buf.get("lr")


def test_save_best_snapshots_all(tmp_path):
    buf = _make_buffer(tmp_path, ["a", "b"])
    buf.draw_scenes()
    buf.save_params(as_best=True)
    assert buf.store.exists("a", prefer_best=True)
    assert buf.store.exists("b", prefer_best=True)


def test_plane_stats(tmp_path):
    buf = _make_buffer(tmp_path, ["a", "b"])
    stats = buf.get_plane_stats()
    assert stats["mean"].shape == (4,)
    assert stats["std"].shape == (4,)
    assert np.all(stats["std"] > 0)


def test_low_rank_planes_roundtrip_and_materialize(tmp_path):
    from nvsr_tpu.planes_store import materialize_pos_planes

    box = np.stack([-np.ones(5), np.ones(5)]).astype(np.float32)
    p = create_scene_planes(
        jax.random.PRNGKey(0), num_planes=3, num_channels=4, resolution=16,
        viewdir_resolution=4, viewdir_channels=4, init_std=0.05, box=box,
        rank_ratio=0.25)
    assert p.rank == 4
    assert p.planes_pos.shape == (3, 4, 16, 8)  # [P,C,R,2k]
    full = materialize_pos_planes(p.planes_pos, p.rank)
    assert full.shape == (3, 4, 16, 16)
    # A @ B^T definition (reference models.py:227-229)
    a = np.asarray(p.planes_pos[..., :4])
    b = np.asarray(p.planes_pos[..., 4:])
    np.testing.assert_allclose(np.asarray(full[0, 0]), a[0, 0] @ b[0, 0].T,
                               rtol=1e-5, atol=1e-6)
    store = PlaneStore(str(tmp_path))
    store.save("lr_scene", p)
    loaded, _ = store.load("lr_scene")
    assert loaded.rank == 4
    np.testing.assert_array_equal(np.asarray(loaded.planes_pos),
                                  np.asarray(p.planes_pos))


def test_plateau_scheduler_and_buffer_lr(tmp_path):
    from nvsr_tpu.train import PlateauScheduler

    sched = PlateauScheduler(lr=1e-2, patience=2, factor=0.5)
    assert sched.step(1.0) == 1e-2   # new best
    assert sched.step(1.1) == 1e-2   # bad 1
    assert sched.step(1.1) == 1e-2   # bad 2 == patience
    assert sched.step(1.1) == 5e-3   # bad 3 > patience -> reduce
    assert sched.step(0.5) == 5e-3   # new best, no change

    buf = _make_buffer(tmp_path, ["a"])
    buf.draw_scenes()
    planes = buf.get("a")
    g = {"pos": jnp.ones_like(planes.planes_pos),
         "view": jnp.ones_like(planes.plane_view)}
    buf.apply_grads("a", g)
    before = np.asarray(buf.get("a").planes_pos).copy()
    buf.set_lr(0.0)  # freeze via lr
    buf.apply_grads("a", g)
    np.testing.assert_allclose(np.asarray(buf.get("a").planes_pos), before,
                               atol=1e-7)

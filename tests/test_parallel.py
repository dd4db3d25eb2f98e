"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4: shard_map/psum logic without a pod)."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvsr_tpu.models.plane_sr import PlaneSRConfig, init_plane_sr_params
from nvsr_tpu.models.triplane import TriplaneConfig, init_decoder_params
from nvsr_tpu.ops.geometry import get_ray_bundle
from nvsr_tpu.parallel.sharding import (
    data_sharding,
    decoder_tp_shardings,
    make_mesh,
    plane_sr_tp_shardings,
    replicate,
    replicate_tree,
)
from nvsr_tpu.render import RenderConfig, make_ray_bundle
from nvsr_tpu.train import StepFlags, train_step


def _camera(eye):
    eye = np.asarray(eye, dtype=np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]).astype(np.float32)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=4,
                         dec_density_layers=2, dec_rgb_layers=2)
    dc = init_decoder_params(jax.random.PRNGKey(0), cfg)
    df = init_decoder_params(jax.random.PRNGKey(1), cfg)
    sr_cfg = PlaneSRConfig(in_channels=4, out_channels=4, hidden_size=8,
                           n_blocks=1, scale_factor=2)
    sr = init_plane_sr_params(jax.random.PRNGKey(2), sr_cfg)
    planes = {
        "pos": jnp.asarray(0.1 * rng.standard_normal(
            (3, 4, 12, 12)).astype(np.float32)),
        "view": jnp.asarray(0.1 * rng.standard_normal(
            (4, 6, 6)).astype(np.float32)),
    }
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)
    ro, rd = get_ray_bundle(8, 8, 10.0, jnp.asarray(_camera([3.0, 0, 0])))
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    target = jnp.asarray(rng.random((64, 3)).astype(np.float32))
    rcfg = RenderConfig(num_coarse=6, num_fine=6, perturb=False)
    return cfg, dc, df, sr_cfg, sr, planes, box, rays, target, rcfg


def test_mesh_shapes(cpu_devices):
    mesh = make_mesh(8, model_parallel=2, devices=cpu_devices)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(8, devices=cpu_devices)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_sharded_step_matches_unsharded(setup, cpu_devices):
    """The dp x tp sharded training step must produce the same loss and
    gradients as the single-device step."""
    cfg, dc, df, sr_cfg, sr, planes, box, rays, target, rcfg = setup
    flags = StepFlags(sr_iter=True)
    key = jax.random.PRNGKey(0)

    ref_metrics, ref_grads = train_step(
        dc, df, sr, planes, jnp.asarray(box), rays, target, key,
        model_cfg=cfg, sr_cfg=sr_cfg, rcfg=rcfg, flags=flags)

    mesh = make_mesh(8, model_parallel=2, devices=cpu_devices)
    dec_sh = decoder_tp_shardings(dc, mesh)
    sr_sh = plane_sr_tp_shardings(sr, mesh)
    with mesh:
        step = jax.jit(
            lambda dc, df, srp, pl, rays, target, key: train_step(
                dc, df, srp, pl, jnp.asarray(box), rays, target, key,
                model_cfg=cfg, sr_cfg=sr_cfg, rcfg=rcfg, flags=flags),
            in_shardings=(dec_sh, dec_sh, sr_sh,
                          replicate_tree(planes, mesh),
                          jax.tree.map(lambda a: data_sharding(mesh, a.ndim),
                                       rays),
                          data_sharding(mesh, 2), replicate(mesh)))
        metrics, grads = step(
            jax.device_put(dc, dec_sh), jax.device_put(df, dec_sh),
            jax.device_put(sr, sr_sh),
            jax.device_put(planes, replicate_tree(planes, mesh)),
            jax.tree.map(lambda a, s: jax.device_put(a, s), rays,
                         jax.tree.map(lambda a: data_sharding(mesh, a.ndim),
                                      rays)),
            jax.device_put(target, data_sharding(mesh, 2)),
            jax.device_put(key, replicate(mesh)))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    for name in ("dc", "sr", "planes"):
        for a, b in zip(jax.tree.leaves(grads[name]),
                        jax.tree.leaves(ref_grads[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)


def test_data_parallel_render_matches(setup, cpu_devices):
    """Ray-sharded rendering equals single-device rendering."""
    from nvsr_tpu.render import make_triplane_point_fn, render_rays

    cfg, dc, _, _, _, planes, box, rays, _, rcfg = setup
    pf = make_triplane_point_fn(dc, cfg, planes["pos"], planes["view"], box)
    key = jax.random.PRNGKey(3)
    ref = render_rays(pf, pf, rays, key, rcfg)

    mesh = make_mesh(8, devices=cpu_devices)
    rays_sh = jax.tree.map(lambda a: data_sharding(mesh, a.ndim), rays)
    with mesh:
        f = jax.jit(lambda rays, key: render_rays(pf, pf, rays, key, rcfg),
                    in_shardings=(rays_sh, replicate(mesh)))
        out = f(jax.tree.map(lambda a, s: jax.device_put(a, s), rays,
                             rays_sh),
                jax.device_put(key, replicate(mesh)))
    np.testing.assert_allclose(np.asarray(out.fine.rgb),
                               np.asarray(ref.fine.rgb), rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Multi-host plane-pool groundwork (SURVEY §2.10c; VERDICT r3 #8)
# ---------------------------------------------------------------------------

def test_host_partition_deterministic_and_balanced():
    from nvsr_tpu.parallel.host_pool import HostPartition, scene_owner

    scenes = [f"scene{i:03d}_DS2_PlRes64_16" for i in range(64)]
    p0 = HostPartition(scenes, process_index=0, process_count=4)
    p1 = HostPartition(scenes, process_index=1, process_count=4)
    # ownership is a deterministic function of the id (crc32, not the
    # salted hash()) — every host computes the same assignment
    assert [p0.owns(s) for s in scenes] == \
           [scene_owner(s, 4) == 0 for s in scenes]
    owned_sets = [set(HostPartition(scenes, process_index=i,
                                    process_count=4).owned)
                  for i in range(4)]
    assert set().union(*owned_sets) == set(scenes)
    assert sum(len(s) for s in owned_sets) == len(scenes)  # disjoint
    bal = p1.balance()
    assert all(4 <= bal.get(h, 0) <= 28 for h in range(4)), bal


def test_host_partition_broadcast_replicates_on_mesh(cpu_devices):
    from nvsr_tpu.parallel.host_pool import HostPartition

    mesh = make_mesh(8, devices=cpu_devices)
    part = HostPartition(["a", "b"], process_index=0, process_count=1)
    tree = {"pos": jnp.arange(24.0).reshape(2, 3, 4), "view": None,
            "opt": {"m": jnp.ones((3,))}}
    out = part.broadcast(tree, "a", mesh)
    np.testing.assert_array_equal(np.asarray(out["pos"]),
                                  np.asarray(tree["pos"]))
    assert out["pos"].sharding.mesh.shape == mesh.shape
    assert out["pos"].sharding.is_fully_replicated
    assert out["view"] is None


def test_planes_buffer_host_partition_skips_foreign_saves(tmp_path,
                                                          cpu_devices):
    """Simulated 2-host pool in one process: a buffer holding an owned
    and a non-owned scene flushes ONLY the owned scene's file; both
    scenes' planes are placed replicated over the mesh via the explicit
    broadcast step."""
    from nvsr_tpu.parallel.host_pool import HostPartition, scene_owner
    from nvsr_tpu.planes_store import PlaneStore, PlanesBuffer, ScenePlanes

    scenes = ["lego_DS2", "ship_DS2", "mic_DS2", "chair_DS2"]
    # pick one owned + one foreign scene for simulated host 0
    owned = [s for s in scenes if scene_owner(s, 2) == 0]
    foreign = [s for s in scenes if scene_owner(s, 2) == 1]
    assert owned and foreign, "crc32 split degenerate — change names"
    pair = [owned[0], foreign[0]]

    store = PlaneStore([str(tmp_path)])
    box = np.stack([np.full(5, -4.0), np.full(5, 4.0)]).astype(np.float32)
    for i, s in enumerate(pair):
        sp = ScenePlanes(np.full((3, 4, 8, 8), float(i + 1),
                                 np.float32),
                         np.ones((4, 4, 4), np.float32), box)
        store.save(s, sp)

    mesh = make_mesh(8, devices=cpu_devices)
    part = HostPartition(pair, process_index=0, process_count=2)
    buf = PlanesBuffer(store, pair, lr=1e-2, placement=replicate(mesh),
                       host_partition=part)
    buf.draw_scenes()
    for s in pair:
        sp = buf.get(s)
        assert sp.planes_pos.sharding.is_fully_replicated
    # dirty both; only the owned scene's file may be rewritten
    mtimes = {s: os.path.getmtime(store.path(s, must_exist=True))
              for s in pair}
    time.sleep(0.05)
    buf.dirty.update(pair)
    buf._flush()
    assert os.path.getmtime(store.path(owned[0], must_exist=True)) \
        >= mtimes[owned[0]]
    assert os.path.getmtime(store.path(foreign[0], must_exist=True)) \
        == mtimes[foreign[0]]


def test_two_host_pool_full_cycle(tmp_path, cpu_devices):
    """Two simulated hosts drive their own PlanesBuffer over ONE store
    dir through full redraw -> train -> save cycles (VERDICT r4 #9):
    every disk write comes from the scene's owner host only, both
    hosts draw identical buffers each cycle (the SPMD contract — same
    sampler seed on every host), and after the final flush a fresh
    reader sees exactly the trained state both hosts hold resident
    (nothing lost to the owner-only-write routing)."""
    from nvsr_tpu.parallel.host_pool import HostPartition, scene_owner
    from nvsr_tpu.planes_store import PlaneStore, PlanesBuffer, ScenePlanes

    scenes = ["lego_DS2", "ship_DS2", "mic_DS2", "chair_DS2"]
    assert {scene_owner(s, 2) for s in scenes} == {0, 1}
    box = np.stack([np.full(5, -4.0), np.full(5, 4.0)]).astype(np.float32)
    seed_store = PlaneStore([str(tmp_path)])
    for i, s in enumerate(scenes):
        seed_store.save(s, ScenePlanes(
            np.full((3, 4, 8, 8), float(i + 1), np.float32),
            np.full((4, 4, 4), float(i + 1), np.float32), box))

    mesh = make_mesh(8, devices=cpu_devices)
    writes = {0: [], 1: []}

    def make_host(idx):
        store = PlaneStore([str(tmp_path)])
        orig_save = store.save

        def logged_save(scene, planes, opt_state=None, **kw):
            writes[idx].append(scene)
            return orig_save(scene, planes, opt_state, **kw)

        store.save = logged_save
        part = HostPartition(scenes, process_index=idx, process_count=2)
        buf = PlanesBuffer(store, scenes, lr=1e-2, buffer_size=2,
                           steps_per_buffer=2,
                           placement=replicate(mesh), host_partition=part,
                           rng=np.random.default_rng(7))
        return part, buf

    (p0, b0), (p1, b1) = make_host(0), make_host(1)
    stepped = set()
    for cycle in range(4):
        cur0, cur1 = b0.draw_scenes(), b1.draw_scenes()
        assert cur0 == cur1, "hosts diverged on the buffer draw"
        for s in cur0:
            # replicated-compute contract: every host derives the SAME
            # grads from the jit-sharded step; a distinct per-(scene,
            # cycle) value makes any lost/mixed update detectable
            g = {"pos": jnp.full((3, 4, 8, 8),
                                 0.1 * (cycle + 1) * (hash(s) % 7 + 1)
                                 / 7.0),
                 "view": jnp.zeros((4, 4, 4))}
            b0.apply_grads(s, g)
            b1.apply_grads(s, g)
            stepped.add(s)
    b0._flush()
    b1._flush()

    # owner-only writes, and the owner DID write every scene it trained
    for idx, part in ((0, p0), (1, p1)):
        assert writes[idx], f"host {idx} never wrote"
        assert all(part.owns(s) for s in writes[idx]), writes[idx]
    assert set(writes[0]) | set(writes[1]) >= stepped

    # both hosts hold identical resident state; a fresh reader of the
    # single store dir sees exactly that state (Adam moments included)
    reader = PlaneStore([str(tmp_path)])
    for s in sorted(stepped):
        r0, r1 = b0.load_scene(s), b1.load_scene(s)
        np.testing.assert_array_equal(np.asarray(r0.planes_pos),
                                      np.asarray(r1.planes_pos))
        disk, _ = reader.load(s)
        np.testing.assert_allclose(np.asarray(disk.planes_pos),
                                   np.asarray(r0.planes_pos), rtol=0,
                                   atol=0)
        assert not np.array_equal(np.asarray(disk.planes_pos),
                                  np.full((3, 4, 8, 8),
                                          float(scenes.index(s) + 1)))

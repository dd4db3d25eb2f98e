"""Per-scene feature planes: init, out-of-core store, buffered optimizer.

TPU-native redesign of the reference's `PlanesOptimizer`
(reference models.py:499-765), split into:

  * `ScenePlanes` — the per-scene state (positional plane stack,
    view-direction plane, coordinate box) as a plain pytree;
  * `PlaneStore` — the on-disk `.par`-equivalent (npz files named
    `{model}_{scene_id}.planes` holding planes + Adam moments + box,
    with the reference's atomic-write/backup semantics and search-path
    hierarchy, models.py:612-627);
  * `PlanesBuffer` — the resident working set: draws `buffer_size`
    scenes every `steps_per_buffer` steps via `SceneSampler`, holds
    their planes + optax Adam states in device memory, writes dirty
    scenes back on redraw/save. Where the reference mutated a single
    torch Adam's param_groups in place (models.py:719-725), each scene
    simply owns its own optax state pytree — swapping is data movement,
    not optimizer surgery.

On TPU the buffer can usually hold every scene (HBM is the pool); the
disk path remains for many-scene corpora and for checkpoint parity.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from nvsr_tpu.scenes import SceneSampler
from nvsr_tpu.utils import native_store
from nvsr_tpu.utils.io import safe_load, safe_save, save_npz

SUFFIX = "planes"


@dataclass
class ScenePlanes:
    """Per-scene learnable state.

    planes_pos: [P, C, R, R] full planes, OR [P, C, R, 2k] low-rank
    factors when rank is set (reference gen_plane low-rank expansion,
    models.py:223-231: plane = A @ B^T with A = [..., :k], B = [..., k:]).
    plane_view: [Cv, Rv, Rv] or None; box: [2, 3+2*use_viewdirs].
    """
    planes_pos: jnp.ndarray
    plane_view: Optional[jnp.ndarray]
    box: np.ndarray
    rank: Optional[int] = None
    # occupied world AABB [2,3] from ops/occupancy.py (TPU-native
    # sampling-bound tightening; None until estimated during training)
    occ_aabb: Optional[np.ndarray] = None

    def params(self) -> dict:
        p = {"pos": self.planes_pos}
        if self.plane_view is not None:
            p["view"] = self.plane_view
        return p

    def with_params(self, p: dict) -> "ScenePlanes":
        return replace(self, planes_pos=p["pos"],
                       plane_view=p.get("view", self.plane_view))


def materialize_pos_planes(planes_pos, rank: Optional[int]):
    """Expand low-rank factors to full planes (reference models.py:
    227-229); identity when rank is None."""
    if rank is None:
        return planes_pos
    a = planes_pos[..., :rank]                  # [P, C, R, k]
    b = planes_pos[..., rank:]                  # [P, C, R, k]
    return jnp.einsum("pcrk,pcsk->pcrs", a, b)


def create_scene_planes(key, *, num_planes: int, num_channels: int,
                        resolution, viewdir_resolution=None,
                        viewdir_channels: int = 0, init_std: float,
                        box, rank_ratio: Optional[float] = None,
                        dtype=jnp.float32) -> ScenePlanes:
    """Random-normal plane init with the decoder-tied STD
    (reference create_plane, models.py:436-439; STD wiring
    models.py:556-566: init_std = STD_factor * std(fc_alpha.W)).

    rank_ratio: when set, positional planes are stored as low-rank
    factors [P, C, R, 2*ceil(rank_ratio*R)] with sqrt(init_std)
    initialization so the product has ~init_std scale
    (reference models.py:541,561-565)."""
    k1, k2 = jax.random.split(key)
    if not isinstance(resolution, (tuple, list)):
        resolution = (resolution, resolution)
    rank = None
    if rank_ratio is not None:
        rank = int(np.ceil(rank_ratio * resolution[0]))
        planes_pos = np.sqrt(init_std) * jax.random.normal(
            k1, (num_planes, num_channels, resolution[0], 2 * rank), dtype)
    else:
        planes_pos = init_std * jax.random.normal(
            k1, (num_planes, num_channels, resolution[0], resolution[1]),
            dtype)
    plane_view = None
    if viewdir_channels:
        if not isinstance(viewdir_resolution, (tuple, list)):
            viewdir_resolution = (viewdir_resolution, viewdir_resolution)
        plane_view = init_std * jax.random.normal(
            k2, (viewdir_channels, viewdir_resolution[0],
                 viewdir_resolution[1]), dtype)
    return ScenePlanes(planes_pos, plane_view, np.asarray(box), rank=rank)


def decoder_tied_init_std(decoder_params, std_factor: float = 0.1,
                          member: int = 0) -> float:
    """STD_factor x std(fc_alpha weight) (reference models.py:560)."""
    w = decoder_params["members"][member]["fc_alpha"]["w"]
    return float(std_factor * jnp.std(w))


class PlaneStore:
    """Disk store with the reference's search-path hierarchy:
    [logdir/planes, models.planes_path/planes, pretrained/planes]
    (reference train_nerf.py:565-579, models.py:612-627)."""

    def __init__(self, save_locations, run_time_signature: float = 0,
                 backend: str = "auto"):
        """backend: 'native' (C codec, native/nvsr_native.cpp), 'npz', or
        'auto' (native when the library builds). Loads sniff the file
        magic, so both formats interoperate."""
        if isinstance(save_locations, str):
            save_locations = [save_locations]
        self.save_locations = list(save_locations)
        self.run_time_signature = run_time_signature
        if backend == "auto":
            backend = "native" if native_store.available() else "npz"
        assert backend in ("native", "npz")
        self.backend = backend

    def path(self, scene: str, model_name: str = "coarse",
             must_exist: bool = False, prefer_best: bool = False,
             locations=None) -> str:
        fname = f"{model_name}_{scene}.{SUFFIX}"
        for loc in (locations or self.save_locations):
            p = os.path.join(loc, fname)
            if must_exist:
                check = p.replace(f".{SUFFIX}", f".{SUFFIX}_best") \
                    if prefer_best else p
                if os.path.isfile(check):
                    return p
            elif os.path.isdir(loc):
                return p
        return ""

    def exists(self, scene: str, prefer_best: bool = False) -> bool:
        return bool(self.path(scene, must_exist=True,
                              prefer_best=prefer_best))

    def save(self, scene: str, planes: ScenePlanes, opt_state=None,
             as_best: bool = False, model_name: str = "coarse") -> str:
        arrays = {
            "planes_pos": np.asarray(planes.planes_pos),
            "box": np.asarray(planes.box),
        }
        if planes.rank is not None:
            arrays["rank"] = np.asarray(planes.rank)
        if planes.plane_view is not None:
            arrays["plane_view"] = np.asarray(planes.plane_view)
        if planes.occ_aabb is not None:
            arrays["occ_aabb"] = np.asarray(planes.occ_aabb)
        if opt_state is not None:
            flat, _ = jax.tree.flatten(opt_state)
            for i, leaf in enumerate(flat):
                arrays[f"opt_{i}"] = np.asarray(leaf)
        path = self.path(scene, model_name=model_name)
        assert path, f"no writable store location for scene {scene}"
        run_folder = os.path.dirname(path)
        run_folder = run_folder[:-len("/planes")] \
            if run_folder.endswith("/planes") else run_folder
        if self.backend == "native":
            return safe_save(path, lambda tmp: native_store.save_arrays(
                tmp, arrays), SUFFIX, best=as_best,
                run_time_signature=self.run_time_signature,
                run_folder=run_folder)
        return save_npz(path, arrays, suffix=SUFFIX, best=as_best,
                        run_time_signature=self.run_time_signature,
                        run_folder=run_folder)

    def load(self, scene: str, prefer_best: bool = False,
             model_name: str = "coarse", opt_state_template=None,
             locations=None):
        """Returns (ScenePlanes, opt_state|None)."""
        path = self.path(scene, model_name=model_name, must_exist=True,
                         prefer_best=prefer_best, locations=locations)
        assert path, (
            f"Could not find the required feature planes file for scene "
            f"{scene} in {locations or self.save_locations}")
        def read_any(p):
            if native_store.is_nvps_file(p):
                return native_store.load_arrays(p)
            with np.load(p, allow_pickle=False) as z:
                return {k: z[k] for k in z.files}

        arrays = safe_load(path, read_any, SUFFIX, best=prefer_best)
        planes = ScenePlanes(
            jnp.asarray(arrays["planes_pos"]),
            jnp.asarray(arrays["plane_view"])
            if "plane_view" in arrays else None,
            arrays["box"],
            rank=int(np.asarray(arrays["rank"]).reshape(()))
            if "rank" in arrays else None,
            occ_aabb=arrays.get("occ_aabb"))
        opt_state = None
        if opt_state_template is not None:
            flat, treedef = jax.tree.flatten(opt_state_template)
            if all(f"opt_{i}" in arrays for i in range(len(flat))):
                opt_state = jax.tree.unflatten(
                    treedef,
                    [jnp.asarray(arrays[f"opt_{i}"]).astype(l.dtype)
                     if hasattr(l, "dtype") else arrays[f"opt_{i}"]
                     for i, l in enumerate(flat)])
        return planes, opt_state


class PlanesBuffer:
    """The resident scene working set + per-scene Adam optimizer.

    Behavior parity with reference PlanesOptimizer (models.py:499-765):
    buffer_size scenes resident; every steps_per_buffer steps the buffer
    is flushed + redrawn (steps_per_buffer == -1 means the buffer covers
    all scenes and is only reshuffled); save-on-cycle via the sampler's
    reshuffle callback; frozen scenes never step or save; `save_params
    (as_best=True)` snapshots every training scene.
    """

    def __init__(self, store: PlaneStore, training_scenes, *, lr: float,
                 buffer_size: Optional[int] = None,
                 steps_per_buffer: int = -1, optimize: bool = True,
                 frozen_scenes=(), scene2saved: Optional[dict] = None,
                 do_when_reshuffling: Callable = None,
                 rng: np.random.Generator = None, placement=None,
                 host_partition=None):
        """placement: optional — resident planes and their Adam states
        are placed with it on load. Either one jax Sharding for every
        scene (e.g. replicated over a data-parallel mesh, SURVEY.md
        §2.10b) or a dict {saved_scene_id: Sharding} for a scene-sharded
        DEVICE POOL (§2.10c): each scene's planes+moments live in one
        device's HBM, broadcast over ICI for the compute step — the
        device-memory generalization of the reference's disk buffer
        (models.py:683-726).

        host_partition: optional parallel.host_pool.HostPartition — the
        multi-host (DCN) pool boundary: placement routes through its
        explicit broadcast step (owner -> all hosts; a replicated
        device_put on one process), and disk writes are skipped for
        scenes this host does not own."""
        self.store = store
        self.placement = placement
        self.host_partition = host_partition
        self.training_scenes = list(training_scenes)
        self.scene2saved = scene2saved or {s: s for s in self.training_scenes}
        self.frozen_scenes = set(frozen_scenes)
        self.optimize = optimize
        self.lr = lr
        self.opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, eps=1e-8)
        self.buffer_size = buffer_size or len(self.training_scenes)
        self.steps_per_buffer = steps_per_buffer
        if self.buffer_size >= len(self.training_scenes):
            self.buffer_size = len(self.training_scenes)
            self.steps_per_buffer = -1
        assert (self.steps_per_buffer == -1
                or self.steps_per_buffer >= self.buffer_size), (
            "steps_per_buffer < buffer_size would load scenes in vain "
            "(reference models.py:534-535)")
        self.sampler = SceneSampler(
            self.training_scenes,
            do_when_reshuffling=do_when_reshuffling,
            frozen_scenes=list(self.frozen_scenes), rng=rng)
        self.resident: dict[str, ScenePlanes] = {}
        self.opt_states: dict = {}
        self.dirty: set[str] = set()
        self.steps_since_drawing = 0
        self.cur_scenes: list[str] = []

        def _apply(grads, state, params, lr):
            state.hyperparams["learning_rate"] = lr
            updates, new_state = self.opt.update(grads, state, params)
            return optax.apply_updates(params, updates), new_state

        # One fused, buffer-donating device program per step: planes and
        # their Adam moments are the largest training state (hundreds of
        # MB at production dims) — donating state+params updates them in
        # place instead of allocating fresh copies per iteration. Grads
        # are NOT donated (callers may legitimately reuse a grads tree).
        self._apply = jax.jit(_apply, donate_argnums=(1, 2))

    # -- buffer management --------------------------------------------------
    def _flush(self):
        for scene in sorted(self.dirty):
            if (self.host_partition is not None
                    and not self.host_partition.owns(scene)):
                # multi-host pool: the owner host persists this scene
                # (all hosts hold identical replicated planes, so the
                # skip loses nothing)
                continue
            self.store.save(scene, self.resident[scene],
                            self.opt_states.get(scene))
        self.dirty.clear()

    def draw_scenes(self):
        """Flush + load a fresh buffer (reference models.py:683-726)."""
        self._flush()
        if getattr(self, "_prefetch", None) is not None:
            self._prefetch.join()
            self._prefetch = None
        self.steps_since_drawing = 0
        self.cur_scenes = self.sampler.sample(
            self.buffer_size, just_shuffle=self.steps_per_buffer == -1)
        keep = {self.scene2saved[s] for s in self.cur_scenes}
        for scene in list(self.resident):
            if scene not in keep:
                del self.resident[scene]
                self.opt_states.pop(scene, None)
        for scene in self.cur_scenes:
            saved = self.scene2saved[scene]
            if saved in self.resident:
                continue
            frozen = scene in self.frozen_scenes
            planes, opt_state = self.store.load(
                saved, prefer_best=frozen or not self.optimize,
                opt_state_template=self._opt_template(saved))
            planes, opt_state = self._place(planes, opt_state, saved)
            self.resident[saved] = planes
            if self.optimize and not frozen:
                self.opt_states[saved] = (
                    opt_state if opt_state is not None
                    else self.opt.init(planes.params()))
        self._start_prefetch()
        return self.cur_scenes

    def _start_prefetch(self):
        """Warm the page cache for the NEXT buffer's plane files on
        background threads (native prefetcher) while training runs."""
        if self.steps_per_buffer == -1:
            return
        try:
            from nvsr_tpu.utils import native_store
            if not native_store.available():
                return
            upcoming = list(self.sampler.sample_from[:self.buffer_size])
            paths = []
            for sc in upcoming:
                saved = self.scene2saved.get(sc, sc)
                path = self.store.path(saved, must_exist=True)
                if path:
                    paths.append(path)
            if paths:
                self._prefetch = native_store.Prefetcher(paths, n_threads=2)
        except Exception:
            self._prefetch = None

    def _scene_sharding(self, saved: str):
        if isinstance(self.placement, dict):
            return self.placement.get(saved)
        return self.placement

    def _place(self, planes: ScenePlanes, opt_state, saved: str):
        sharding = self._scene_sharding(saved)
        if self.host_partition is not None:
            # explicit owner->all-hosts broadcast (DCN when
            # process_count > 1; a replicated device_put on one host)
            mesh = getattr(sharding, "mesh", None)
            arrays = {"pos": planes.planes_pos, "view": planes.plane_view,
                      "opt": opt_state}
            arrays = self.host_partition.broadcast(arrays, saved, mesh)
            return replace(planes, planes_pos=arrays["pos"],
                           plane_view=arrays["view"]), arrays["opt"]
        if sharding is None:
            return planes, opt_state
        planes = replace(
            planes,
            planes_pos=jax.device_put(planes.planes_pos, sharding),
            plane_view=(None if planes.plane_view is None else
                        jax.device_put(planes.plane_view, sharding)))
        if opt_state is not None:
            opt_state = jax.device_put(opt_state, sharding)
        return planes, opt_state

    def _opt_template(self, scene: str):
        if not self.optimize:
            return None
        # shape-only template for opt-state reload
        try:
            planes, _ = self.store.load(scene, prefer_best=False)
        except AssertionError:
            return None
        return self.opt.init(planes.params())

    def get(self, scene: str) -> ScenePlanes:
        return self.resident[self.scene2saved[scene]]

    def load_scene(self, scene: str, load_best: bool = False) -> ScenePlanes:
        """Single-scene load for evaluation (reference models.py:589-610)."""
        self._flush()
        saved = self.scene2saved[scene]
        if saved not in self.resident:
            planes, opt_state = self.store.load(
                saved, prefer_best=load_best,
                opt_state_template=self._opt_template(saved))
            planes, opt_state = self._place(planes, opt_state, saved)
            self.resident[saved] = planes
            if self.optimize and scene not in self.frozen_scenes:
                self.opt_states[saved] = (
                    opt_state if opt_state is not None
                    else self.opt.init(planes.params()))
        return self.resident[saved]

    # -- optimization -------------------------------------------------------
    def apply_grads(self, scene: str, grads: dict):
        """One Adam step on this scene's planes (no-op for frozen)."""
        if not self.optimize or scene in self.frozen_scenes:
            return
        saved = self.scene2saved[scene]
        planes = self.resident[saved]
        sharding = self._scene_sharding(saved)
        if sharding is not None:
            # pooled scenes: grads arrive replicated from the compute
            # step; move them to the scene's home placement so the
            # donated update runs (and stays) there
            grads = jax.device_put(grads, sharding)
        new_params, new_state = self._apply(
            grads, self.opt_states[saved], planes.params(),
            jnp.asarray(self.lr, dtype=jnp.float32))
        self.resident[saved] = planes.with_params(new_params)
        self.opt_states[saved] = new_state
        self.dirty.add(saved)

    def set_occ_aabb(self, scene: str, aabb):
        """Record a freshly-estimated occupied AABB for this scene (it
        persists with the planes and is used to tighten sampling
        bounds in train AND eval)."""
        saved = self.scene2saved[scene]
        self.resident[saved] = replace(self.resident[saved],
                                       occ_aabb=np.asarray(aabb))
        self.dirty.add(saved)

    def set_lr(self, lr: float):
        """Adjust the planes learning rate (plateau scheduler hook)."""
        self.lr = float(lr)

    def step_cadence(self):
        """Advance the buffer clock; redraw when due. Returns the new
        scene list (or None) like reference PlanesOptimizer.step
        (models.py:728-743)."""
        self.steps_since_drawing += 1
        if self.steps_since_drawing == self.steps_per_buffer:
            return self.draw_scenes()
        return None

    def jump_start(self, config=None, on: bool = True):
        """Curriculum warm-up (reference jump_start, models.py:748-765):
        on=True pins training to the first `config[0]` scenes (fraction
        or count) with the buffer redraw suspended until the caller's
        loss criterion is met; on=False restores the redraw cadence and
        redraws. Returns num_scenes (on) or the new scene list (off)."""
        if on:
            num_scenes = config[0]
            if isinstance(num_scenes, float):
                num_scenes = int(np.ceil(num_scenes
                                         * len(self.sampler.scenes)))
            self._jump_start_memory = {
                "steps_per_buffer": self.steps_per_buffer}
            self.sampler.sample_from = []
            self.steps_per_buffer = -1
            return num_scenes
        self.steps_per_buffer = \
            self._jump_start_memory["steps_per_buffer"]
        self.sampler.sample_from = []
        self.draw_scenes()
        return self.cur_scenes

    def save_params(self, as_best: bool = False):
        """Write planes back to disk; as_best snapshots all training
        scenes (reference models.py:640-670)."""
        scenes = self.training_scenes if as_best else self.cur_scenes
        saved_set = []
        for sc in scenes:
            if sc in self.frozen_scenes:
                continue
            saved = self.scene2saved[sc]
            if saved in saved_set:
                continue
            saved_set.append(saved)
            if saved in self.resident:
                self.store.save(saved, self.resident[saved],
                                self.opt_states.get(saved), as_best=as_best)
            elif as_best and self.store.exists(saved):
                planes, opt_state = self.store.load(
                    saved, opt_state_template=self._opt_template(saved))
                self.store.save(saved, planes, opt_state, as_best=True)
        if not as_best:
            self.dirty.clear()

    # -- statistics ---------------------------------------------------------
    def get_plane_stats(self, viewdir: bool = False) -> dict:
        """Per-channel mean/std over the corpus planes, for SR input
        normalization (reference models.py:629-638)."""
        means, stds = [], []
        for sc in self.training_scenes:
            saved = self.scene2saved[sc]
            if saved in self.resident:
                planes = self.resident[saved]
            else:
                best = self.store.exists(saved, prefer_best=True)
                planes, _ = self.store.load(saved, prefer_best=best)
            pos = np.asarray(planes.planes_pos)  # [P,C,R,R]
            means.extend(pos.mean(axis=(2, 3)))
            stds.extend(pos.reshape(*pos.shape[:2], -1).std(axis=2))
            if viewdir and planes.plane_view is not None:
                pv = np.asarray(planes.plane_view)
                means.append(pv.mean(axis=(1, 2)))
                stds.append(pv.reshape(pv.shape[0], -1).std(axis=1))
        return {"mean": np.stack(means).mean(0), "std": np.stack(stds).mean(0)}

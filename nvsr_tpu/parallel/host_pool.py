"""Multi-host (DCN) scene-plane pool: the abstraction boundary.

The reference's PlanesOptimizer is a single-process disk<->GPU buffer
(/root/reference/models.py:683-726). On a TPU pod slice the natural
generalization is a pool distributed over HOSTS: each host's local
storage owns a disjoint subset of the scene .nvps files, the owner
loads/saves them, and the planes of the step's active scenes are
broadcast to every host over DCN (single-controller JAX: all hosts
must hold the same GLOBAL arrays before a jit-sharded step).

This module is the boundary only — deterministically partition scene
ownership, load on the owner, broadcast to the mesh. The DCN leg rides
`jax.experimental.multihost_utils.broadcast_one_to_all`, which only
activates when `jax.process_count() > 1` (untestable in this one-host
environment); on one process the broadcast degenerates to a replicated
`device_put`, which IS the single-host production path, so the
degenerate branch is exercised by every mesh test.

SURVEY.md §2.10 consequence (c); VERDICT r3 missing #3 / next #8.
"""

from __future__ import annotations

import zlib
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

from nvsr_tpu.parallel.sharding import replicate


def scene_owner(saved_scene_id: str, n_hosts: int) -> int:
    """Deterministic owner host for a saved scene id.

    crc32, not hash(): Python string hashing is salted per process and
    hosts must agree without communicating."""
    return zlib.crc32(saved_scene_id.encode()) % max(n_hosts, 1)


class HostPartition:
    """Scene-ownership view of one host in an n-host plane pool.

    process_index/process_count default to the live JAX runtime's; pass
    them explicitly to simulate a multi-host layout in tests.
    """

    def __init__(self, scenes: Sequence[str],
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.process_count = (jax.process_count()
                              if process_count is None else process_count)
        self.process_index = (jax.process_index()
                              if process_index is None else process_index)
        self.scenes = list(scenes)

    def owner(self, saved_scene_id: str) -> int:
        return scene_owner(saved_scene_id, self.process_count)

    def owns(self, saved_scene_id: str) -> bool:
        return self.owner(saved_scene_id) == self.process_index

    @property
    def owned(self) -> list:
        return [s for s in self.scenes if self.owns(s)]

    def broadcast(self, tree, saved_scene_id: str, mesh: Optional[Mesh]):
        """The explicit DCN step: materialize `tree` (the owner's
        host-local planes/opt-state pytree) as global replicated arrays
        on every host. Non-owners pass a zeros-shaped template tree.
        Single-process: a replicated device_put (no DCN)."""
        if self.process_count > 1 and jax.process_count() > 1:
            from jax.experimental import multihost_utils
            tree = multihost_utils.broadcast_one_to_all(
                tree, is_source=self.owns(saved_scene_id))
        if mesh is not None:
            tree = jax.device_put(tree, replicate(mesh))
        return tree

    def balance(self) -> dict:
        """Scenes per host (observability: a pathological corpus could
        skew crc32 ownership; callers can log this)."""
        counts = {}
        for s in self.scenes:
            counts[self.owner(s)] = counts.get(self.owner(s), 0) + 1
        return counts

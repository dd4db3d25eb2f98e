"""Multi-chip scaling: device mesh + sharding rules.

The reference is single-process single-GPU (SURVEY.md §2.10) — this
layer is green-field TPU design, not a port:

  * mesh ('data', 'model') over ICI-connected chips;
  * the ray mega-batch is sharded over 'data' (the scaling axis is
    rays x samples — the reference's serial chunk loop becomes the
    data axis of the mesh);
  * decoder/SR parameters are small (~1-10 MB): replicated by default,
    with optional Megatron-style tensor sharding of the decoder hidden
    dims and SR conv channels over 'model' for large configurations;
  * gradients reduce over 'data' via the psum XLA inserts for the
    jit-sharded loss; nothing is hand-scheduled.

Everything here returns `NamedSharding`s consumed by `jax.jit`'s
in_shardings/out_shardings — XLA GSPMD propagates the rest.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """('data', 'model') mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard axis 0 over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_rays(mesh: Mesh, rays):
    """Place a RayBundle with rays sharded over the data axis."""
    return jax.tree.map(
        lambda a: jax.device_put(a, data_sharding(mesh, a.ndim)), rays)


def _linear_tp(mesh: Mesh, shard_out: bool) -> dict:
    if shard_out:
        return {"w": NamedSharding(mesh, P(None, "model")),
                "b": NamedSharding(mesh, P("model"))}
    return {"w": NamedSharding(mesh, P("model", None)),
            "b": NamedSharding(mesh, P())}


def decoder_tp_shardings(params, mesh: Mesh):
    """Tensor-parallel shardings for the triplane decoder pytree.

    Alternating column/row sharding over the MLP trunk (Megatron
    pattern): layer 0 splits the output features, layer 1 the input
    features, etc.; heads replicate. With model_parallel == 1 this
    degenerates to full replication.
    """
    def member_shardings(m):
        out = {}
        for branch in ("density", "rgb"):
            layers = []
            for i, _ in enumerate(m[branch]):
                layers.append(_linear_tp(mesh, shard_out=(i % 2 == 0)))
            out[branch] = layers
        for head in ("fc_alpha", "fc_rgb", "fc_feat"):
            if head in m:
                out[head] = {"w": replicate(mesh), "b": replicate(mesh)}
        return out

    return {"members": [member_shardings(m) for m in params["members"]]}


def plane_sr_tp_shardings(params, mesh: Mesh):
    """Channel-sharded conv weights for the plane-SR net (output
    channels over 'model'; XLA inserts the halo-free channel
    collectives)."""
    def conv_shard(p):
        out = {"w": NamedSharding(mesh, P("model", None, None, None))}
        if "b" in p:
            out["b"] = NamedSharding(mesh, P("model"))
        return out

    def walk(tree):
        if isinstance(tree, dict):
            if "w" in tree and getattr(tree["w"], "ndim", 0) == 4:
                return conv_shard(tree)
            return {k: walk(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v) for v in tree]
        return replicate(mesh)

    return walk(params)


def replicate_tree(params, mesh: Mesh):
    return jax.tree.map(lambda _: replicate(mesh), params)

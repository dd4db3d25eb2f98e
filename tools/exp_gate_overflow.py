"""Probe: why does the trained gate scene overflow the tiled path?

Renders assets/gate_scene.pkl through the tiled path under slab /
region-dim variants (CPU interpret by default) and reports
overflow_frac + tiled-vs-XLA PSNR for each, to ground the
geometry-aware slab choice (round 4; the k-heuristic in choose_slab
picks slab=4 at S=16/res=128 where the per-sample depth motion is
~8 cells — the chunk envelope holds ~15).

Usage: NVSR_PLATFORM=cpu python tools/exp_gate_overflow.py [variants]
variants: comma list of name=slab:th:tw (default sweep).
"""

import os
import pickle
import sys

import numpy as np

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)

import jax  # noqa: E402

if os.environ.get("NVSR_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NVSR_PLATFORM"])

import jax.numpy as jnp  # noqa: E402

from nvsr_tpu.ops.pallas.tile_sampler import TileSamplerConfig  # noqa: E402
from nvsr_tpu.ops.rendering import mse2psnr  # noqa: E402
from nvsr_tpu.render import (RenderConfig, make_triplane_point_fn,  # noqa: E402
                             render_image)
from nvsr_tpu.experiment import downsampling_offset  # noqa: E402
from nvsr_tpu.ops.geometry import get_ray_bundle  # noqa: E402


def main():
    with open(os.path.join(REPO, "assets", "gate_scene.pkl"), "rb") as f:
        a = pickle.load(f)
    cfg = a["model_cfg"]
    planes = jnp.asarray(a["planes_pos"])
    view = None if a["plane_view"] is None else jnp.asarray(a["plane_view"])
    ro, rd = get_ray_bundle(
        a["h"], a["w"], a["focal"], jnp.asarray(a["pose"]),
        downsampling_offset=downsampling_offset(a["ds_factor"]))
    rcfg = RenderConfig(num_coarse=a["num_coarse"], num_fine=a["num_fine"],
                        perturb=False, radiance_field_noise_std=0.0,
                        white_background=a["white_background"])
    occ = None if a["occ_aabb"] is None else jnp.asarray(a["occ_aabb"])
    box = np.asarray(a["box"])
    print("scene box:", box[:, :3].tolist())
    print("occ aabb:", None if a["occ_aabb"] is None
          else np.asarray(a["occ_aabb"]).tolist())
    print("plane res:", planes.shape, "near/far:",
          a["near"], a["far"])

    def frame(tc, tile=16):
        import dataclasses
        mcfg = cfg if tc is None else dataclasses.replace(
            cfg, compute_dtype="bfloat16")
        mk = lambda dec: make_triplane_point_fn(
            jax.tree.map(jnp.asarray, dec), mcfg, planes, view,
            jnp.asarray(a["box"]), tile_cfg=tc)
        out = render_image(mk(a["decoder_coarse"]), mk(a["decoder_fine"]),
                           ro, rd, jax.random.PRNGKey(0), rcfg,
                           near=a["near"], far=a["far"], occ_aabb=occ,
                           tile=tile if tc is not None else None)
        ovf = float((out.aux or {}).get("overflow_frac", 0.0))
        return np.asarray(out.fine.rgb), ovf

    rgb_x, _ = frame(None)

    spec = sys.argv[1] if len(sys.argv) > 1 else (
        "compact_repair=1:24:18:8:125,default_repair=0:0:0:16:1000")
    for item in spec.split(","):
        name, dims = item.split("=")
        parts = [int(v) for v in dims.split(":")]
        slab, th, tw = parts[:3]
        tile = parts[3] if len(parts) > 3 else 16
        rep = parts[4] / 1000.0 if len(parts) > 4 else 0.0
        kw = dict(tile_rays=tile * tile, repair_frac=rep)
        if slab:
            kw["slab"] = slab
        if th:
            kw.update(th=th, tw=tw, adaptive_region=False)
        tc = TileSamplerConfig(**kw)
        rgb_t, ovf = frame(tc, tile=tile)
        psnr = float(mse2psnr(np.mean((rgb_t - rgb_x) ** 2)))
        print(f"{name:16s} slab={slab or 'auto'} th/tw="
              f"{th or 'auto'}/{tw or 'auto'}  overflow={ovf:.4f}  "
              f"tiled-vs-XLA {psnr:.2f} dB", flush=True)


if __name__ == "__main__":
    main()

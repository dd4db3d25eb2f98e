"""Benchmark: full-frame triplane render throughput on one TPU chip.

Renders Blender-lego-scale frames (800x800 rays, 64 coarse + 64 fine
samples, reference model dimensions: 3x48x800^2 feature planes, 128-wide
decoders with concat_pos viewdir combination) through the fused pipeline
and reports rays/second.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N/2.5e6}
vs_baseline is the fraction of the per-chip north star (BASELINE.json:
>= 20M rays/s on v5e-8 => 2.5M rays/s/chip).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def _camera(eye):
    eye = np.asarray(eye, dtype=np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]).astype(np.float32)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


def main():
    from nvsr_tpu.models import TriplaneConfig, init_decoder_params
    from nvsr_tpu.ops.geometry import get_ray_bundle
    from nvsr_tpu.render import (RenderConfig, make_ray_bundle,
                                 make_triplane_point_fn, render_rays_chunked)

    H = W = int(os.environ.get("BENCH_SIZE", 800))
    plane_res = int(os.environ.get("BENCH_PLANE_RES", 800))
    ray_block = int(os.environ.get("BENCH_RAY_BLOCK", 8192))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    dtype = jnp.float32

    model_cfg = TriplaneConfig(
        proj_combination="avg", viewdir_proj_combination="concat_pos",
        skip_connect_every=3,
        gather_table_dtype=os.environ.get("BENCH_TABLE_DTYPE", "bfloat16"),
        compute_dtype=os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16"))
    sr_factor = 4
    lr_res = plane_res // sr_factor
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # the flagship eval workflow (SURVEY §3.2): the coarse decoder reads
    # the raw LR planes; the fine decoder reads the SR'd planes, which
    # are super-resolved once per scene and cached across eval frames
    # (reference SR_planes cache, models.py:892-925) — so the steady-
    # state frame cost is gathers + decoders, with SR amortized out.
    decoder_c = init_decoder_params(k1, model_cfg, dtype=dtype)
    decoder_f = init_decoder_params(k4, model_cfg, dtype=dtype)
    planes_lr = 0.03 * jax.random.normal(
        k2, (3, model_cfg.num_plane_channels, lr_res, lr_res), dtype)
    planes_sr = 0.03 * jax.random.normal(
        k5, (3, model_cfg.num_plane_channels, plane_res, plane_res), dtype)
    plane_view = 0.03 * jax.random.normal(
        k3, (model_cfg.viewdir_channels, 32, 32), dtype)
    box = np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                    [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32)

    ro, rd = get_ray_bundle(H, W, 0.5 * W / np.tan(0.3),
                            jnp.asarray(_camera([3.8, 0.5, 0.7])))
    rays = make_ray_bundle(ro, rd, 2.0, 6.0, use_viewdirs=True)
    rcfg = RenderConfig(num_coarse=64, num_fine=64, perturb=False,
                        radiance_field_noise_std=0.0, ray_block=ray_block)

    def render(decoder_c, decoder_f, planes_lr, planes_sr, plane_view,
               rays, key):
        pf_c = make_triplane_point_fn(decoder_c, model_cfg, planes_lr,
                                      plane_view, box)
        pf_f = make_triplane_point_fn(decoder_f, model_cfg, planes_sr,
                                      plane_view, box)
        out = render_rays_chunked(pf_c, pf_f, rays, key, rcfg)
        return out.fine.rgb

    render_jit = jax.jit(render)
    args = (decoder_c, decoder_f, planes_lr, planes_sr, plane_view)
    probe = jax.jit(jnp.sum)  # 4-byte sync point

    # Timing note: on this deployment dispatch is fully asynchronous and
    # block_until_ready does NOT synchronize through the device tunnel;
    # only a host transfer does. We therefore chain `repeats` frames and
    # fetch a scalar reduction of the last output — the float() forces
    # completion of the whole chain while moving 4 bytes.
    out = render_jit(*args, rays, jax.random.PRNGKey(1))
    float(probe(out))  # warmup compile (render + probe)

    n_rays = H * W
    t0 = time.perf_counter()
    for i in range(repeats):
        out = render_jit(*args, rays, jax.random.PRNGKey(2 + i))
    checksum = float(probe(out))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)
    rays_per_sec = repeats * n_rays / elapsed

    per_chip_target = 20e6 / 8.0
    print(json.dumps({
        "metric": f"rays_per_sec_render_{H}x{W}_c64f64",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / per_chip_target, 4),
    }))


if __name__ == "__main__":
    main()

"""EDSR conv-stack microbench: layout / dtype / remat attribution.

The HR/SR training step is SR-conv-bound (exp_train_budget round 3:
full_occ16 0.824 s with only ~0.16 s sample-proportional — tiny_sr
0.261 s at 64+64). This tool times the EDSR 256x32 stack standalone,
fwd and fwd+bwd, under:

  nchw      the shipped path (apply_edsr: NCHW/OIHW, bf16, per-block
            jax.checkpoint)
  nhwc      same math, NHWC/HWIO layouts (TPU-native conv layout)
  nchw_nockpt / nhwc_nockpt   no rematerialization (memory permitting)

Rows: time per apply over [3, 48, H, W] inputs at the production LR
plane size (200^2 + required padding), scale 4.

Usage: ONLY=nchw,nhwc python tools/exp_sr_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.models import PlaneSRConfig, init_plane_sr_params
from nvsr_tpu.models.plane_sr import apply_edsr

_probe = jax.jit(lambda x: jnp.sum(jax.tree.leaves(x)[0]
                                   .astype(jnp.float32)))


def apply_edsr_nhwc(params, cfg, x_nhwc, ckpt=True):
    """apply_edsr re-expressed in NHWC/HWIO (same math, TPU-native
    layout): x [N, H, W, C] -> [N, H', W', C]."""
    cd = cfg.compute_dtype

    def conv(p, x):
        w = jnp.transpose(p["w"], (2, 3, 1, 0))     # OIHW -> HWIO
        if cd is not None:
            x = x.astype(cd)
            w = w.astype(cd)
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y

    out = conv(params["conv_input"], x_nhwc)
    h = out

    def block(blk, h):
        k_sz = blk["conv1"]["w"].shape[-1]
        m = 2 * (k_sz // 2)
        identity = h if k_sz == 1 else h[:, m:-m, m:-m, :]
        y = conv(blk["conv2"], jax.nn.relu(conv(blk["conv1"], h)))
        return identity + 0.1 * y

    if ckpt:
        block = jax.checkpoint(block)
    for blk in params["blocks"]:
        h = block(blk, h)
    h = conv(params["conv_mid"], h)
    for up in params["upscale"]:
        y = conv(up, h)
        n, hh, ww, c4 = y.shape
        c = c4 // 4
        # torch PixelShuffle in NHWC: channel index = cc*4 + ry*2 + rx
        y = y.reshape(n, hh, ww, c, 2, 2)
        y = y.transpose(0, 1, 4, 2, 5, 3).reshape(n, 2 * hh, 2 * ww, c)
        h = y
    return conv(params["conv_output"], h)


def main():
    reps = int(os.environ.get("REPS", 3))
    hidden = int(os.environ.get("HIDDEN", 256))
    blocks = int(os.environ.get("BLOCKS", 32))
    cfg = PlaneSRConfig(scale_factor=4, hidden_size=hidden,
                        n_blocks=blocks, compute_dtype="bfloat16")
    params = init_plane_sr_params(jax.random.PRNGKey(0), cfg)
    pad = cfg.required_padding
    x = 0.03 * jax.random.normal(jax.random.PRNGKey(1),
                                 (3, 48, 200 + 2 * pad, 200 + 2 * pad))

    variants = {}

    def reg(name, fn):
        variants[name] = fn

    edsr = params["inner"]

    reg("nchw", jax.jit(lambda p, x: apply_edsr(p, cfg, x)))
    reg("nchw_bwd", jax.jit(jax.grad(
        lambda p, x: jnp.sum(apply_edsr(p, cfg, x)
                             .astype(jnp.float32) ** 2), argnums=(0, 1))))
    xh = jnp.transpose(x, (0, 2, 3, 1))
    reg("nhwc", jax.jit(lambda p, x: apply_edsr_nhwc(p, cfg, x)))
    reg("nhwc_bwd", jax.jit(jax.grad(
        lambda p, x: jnp.sum(apply_edsr_nhwc(p, cfg, x)
                             .astype(jnp.float32) ** 2), argnums=(0, 1))))
    reg("nhwc_bwd_nockpt", jax.jit(jax.grad(
        lambda p, x: jnp.sum(apply_edsr_nhwc(p, cfg, x, ckpt=False)
                             .astype(jnp.float32) ** 2), argnums=(0, 1))))

    # the exact train-context call: apply_plane_sr(train=True) =
    # lax.map batch-1 over planes, per-block remat, fwd+bwd
    from nvsr_tpu.models.plane_sr import apply_plane_sr
    reg("train_ctx_bwd", jax.jit(jax.grad(
        lambda p, xx: jnp.sum(apply_plane_sr(p, cfg, xx, train=True)
                              .astype(jnp.float32) ** 2),
        argnums=(0, 1))))

    # batch-1 lax.map variants: the train path runs planes sequentially
    reg("nchw_b1", jax.jit(lambda p, x: jax.lax.map(
        lambda xx: apply_edsr(p, cfg, xx[None])[0], x)))
    reg("nhwc_b1_bwd", jax.jit(jax.grad(
        lambda p, x: jnp.sum(jax.lax.map(
            lambda xx: apply_edsr_nhwc(p, cfg, xx[None])[0], x)
            .astype(jnp.float32) ** 2), argnums=(0, 1))))
    # weights-only grads (detach_LR_planes semantics)
    reg("nhwc_bwd_w", jax.jit(jax.grad(
        lambda p, x: jnp.sum(apply_edsr_nhwc(p, cfg, x)
                             .astype(jnp.float32) ** 2), argnums=0)))

    only = os.environ.get("ONLY", "").split(",") if "ONLY" in os.environ \
        else list(variants)

    for name in only:
        fn = variants[name]
        arg = xh if name.startswith("nhwc") else (
            x[..., pad:-pad, pad:-pad] if name == "train_ctx_bwd" else x)
        par = params if name == "train_ctx_bwd" else edsr
        try:
            out = fn(par, arg)
            _probe(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(par, arg)
            float(_probe(out))
            dt = (time.perf_counter() - t0) / reps
            print(f"{name:18s} {dt * 1e3:9.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

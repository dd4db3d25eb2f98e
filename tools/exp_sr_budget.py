"""Attribute the EDSR SR cost inside the HR/SR training step.

tools/exp_train_budget.py (round 3) showed the HR/SR step is dominated
by the SR network, not gathers: full 0.913 s vs tiny_sr 0.263 s — the
EDSR 256x32 fwd+bwd is ~0.65 s. At production dims that is ~28 TFLOP
(fwd 9.2T + remat recompute + bwd), i.e. ~20% MXU efficiency. This
tool times value_and_grad of the SR forward standalone under layout /
remat / batching variants to find the lost factor:

  base       NCHW, per-block jax.checkpoint, lax.map over planes
             (batch 1). NOTE: production has since moved to NHWC
             internals (plane_sr._conv) — the shipped path now
             corresponds to `nhwc1`; `base` measures the old layout.
  batch3     shipped but all 3 planes as one conv batch
  noremat    no jax.checkpoint (stores every block activation)
  remat4     checkpoint every 4th block (sqrt-ish schedule)
  nhwc       NHWC/HWIO dimension numbers (TPU-native conv layout)
  fwd        forward only, no grad (reference point)

Usage: python tools/exp_sr_budget.py [variants,comma,separated]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.models.plane_sr import (PlaneSRConfig, apply_plane_sr,
                                      init_plane_sr_params, pixel_shuffle)

_probe = jax.jit(lambda x: jnp.sum(jax.tree.leaves(x)[0]
                                   .astype(jnp.float32)))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    assert np.isfinite(float(_probe(out)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(_probe(out))
    return (time.perf_counter() - t0) / reps


def edsr_variant(params, cfg, x, *, layout="NCHW", remat_every=1,
                 batch=False):
    """apply_edsr re-expressed with knobs; numerics identical to the
    shipped path (same ops, different schedule/layout)."""
    cd = cfg.compute_dtype

    if layout == "NHWC":
        dn = ("NHWC", "HWIO", "NHWC")

        def conv(p, h):
            w = jnp.transpose(p["w"], (2, 3, 1, 0))      # OIHW -> HWIO
            if cd is not None:
                h, w = h.astype(cd), w.astype(cd)
            return jax.lax.conv_general_dilated(
                h, w, (1, 1), "VALID", dimension_numbers=dn)

        def shuffle(h, r):
            # torch PixelShuffle channel order (c*r^2 + ry*r + rx) so
            # the NHWC variants stay numerics-identical to base
            n, hh, ww, c4 = h.shape
            c = c4 // (r * r)
            h = h.reshape(n, hh, ww, c, r, r)
            h = h.transpose(0, 1, 4, 2, 5, 3)
            return h.reshape(n, hh * r, ww * r, c)
    else:
        def conv(p, h):
            w = p["w"]
            if cd is not None:
                h, w = h.astype(cd), w.astype(cd)
            return jax.lax.conv_general_dilated(
                h, w, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        shuffle = pixel_shuffle

    def block(blk, h):
        k_sz = blk["conv1"]["w"].shape[-1]
        m = 2 * (k_sz // 2)
        if layout == "NHWC":
            identity = h if k_sz == 1 else h[:, m:-m, m:-m, :]
        else:
            identity = h if k_sz == 1 else h[..., m:-m, m:-m]
        y = conv(blk["conv2"], jax.nn.relu(conv(blk["conv1"], h)))
        return identity + 0.1 * y

    def run(x):
        if layout == "NHWC":
            x = x.transpose(0, 2, 3, 1)
        h = conv(params["conv_input"], x)
        blocks = params["blocks"]
        if remat_every <= 1:
            blk_fn = jax.checkpoint(block)
            for blk in blocks:
                h = blk_fn(blk, h)
        else:
            def seg(blks, h):
                for blk in blks:
                    h = block(blk, h)
                return h
            seg_ckpt = jax.checkpoint(seg)
            for i in range(0, len(blocks), remat_every):
                h = seg_ckpt(blocks[i:i + remat_every], h)
        h = conv(params["conv_mid"], h)
        for up in params["upscale"]:
            h = shuffle(conv(up, h), 2)
        h = conv(params["conv_output"], h)
        if layout == "NHWC":
            h = h.transpose(0, 3, 1, 2)
        return h

    if batch:
        return run(x)
    return jax.lax.map(lambda p: run(p[None])[0], x)


def main():
    cfg = PlaneSRConfig(scale_factor=4, compute_dtype="bfloat16")
    params = init_plane_sr_params(jax.random.PRNGKey(0), cfg)["inner"]
    pad = cfg.required_padding
    x = 0.03 * jax.random.normal(jax.random.PRNGKey(1), (3, 48, 200, 200))
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")

    def loss_of(variant_kwargs):
        @jax.jit
        def f(params, xp):
            def loss(params):
                y = edsr_variant(params, cfg, xp, **variant_kwargs)
                return jnp.mean(y.astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss)(params)
        return f

    fwd_base = jax.jit(functools.partial(edsr_variant, cfg=cfg))

    variants = {
        "base": dict(),
        "batch3": dict(batch=True),
        "noremat": dict(remat_every=10 ** 6, batch=True),
        "remat4": dict(remat_every=4, batch=True),
        "nhwc": dict(layout="NHWC", remat_every=4, batch=True),
        "nhwc1": dict(layout="NHWC"),
    }

    # shipped-path variants (apply_edsr, NHWC internals, per-plane
    # lax.map + per-block remat): 'ship' = conv_impl 'xla';
    # 'ship_mm' = the k^2-shifted-matmul conv lowering (round 4)
    import dataclasses

    from nvsr_tpu.models.plane_sr import apply_edsr

    def ship_loss(conv_impl):
        scfg = dataclasses.replace(cfg, conv_impl=conv_impl)

        @jax.jit
        def f(params, xp):
            def loss(params):
                y = jax.lax.map(
                    lambda p: apply_edsr(params, scfg, p[None])[0], xp)
                return jnp.mean(y.astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss)(params)
        return f

    def ship_fwd(conv_impl):
        scfg = dataclasses.replace(cfg, conv_impl=conv_impl)
        return jax.jit(lambda params, xp: jax.lax.map(
            lambda p: apply_edsr(params, scfg, p[None])[0], xp))

    ship = {"ship": "xla", "ship_mm": "mm"}
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else \
        list(variants) + list(ship)
    t_fwd = timeit(lambda: fwd_base(params, x=xp))
    print(f"fwd(base)   {t_fwd * 1e3:7.1f} ms", flush=True)
    for name in only:
        try:
            if name in ship:
                tf = timeit(lambda f=ship_fwd(ship[name]): f(params, xp))
                print(f"fwd  {name:8s} {tf * 1e3:7.1f} ms", flush=True)
                t = timeit(lambda f=ship_loss(ship[name]): f(params, xp))
            else:
                t = timeit(lambda f=loss_of(variants[name]): f(params, xp))
            print(f"grad {name:8s} {t * 1e3:7.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"grad {name:8s} FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

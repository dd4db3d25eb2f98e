"""Feature-plane super-resolution: EDSR / SRResNet backbones + wrapper.

TPU-native re-design of the reference's plane-SR stack
(reference models.py:769-926 EDSR+PlanesSR, models.py:1021-1145 SRResNet):

  * EDSR runs VALID (zero-padding-free) convolutions, tracking the same
    fractional `required_padding` bookkeeping as the reference
    (models.py:793-800,840-842) so replicate-padded full-plane SR is
    bit-comparable: pad by ceil(P), run, crop `HR_overpadding`.
  * The reference's ROI path (models.py:884-926) — a GPU memory
    optimization that super-resolves only the sampled crop — is replaced
    by whole-plane SR once per step: on TPU the batched convs are
    MXU-bound and the result is cached outside the jitted render, which
    is numerically what the reference's SR_planes cache converges to.
  * PixelShuffle is a reshape/transpose; XLA fuses it into the convs.

Conv weights use the reference's Kaiming/10 init (models.py:843-848).
Parity is tested against a torch re-derivation in tests/test_plane_sr.py.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from nvsr_tpu.ops.resize import upsample_plane

_INT32_MAX = np.iinfo(np.int32).max


# ---------------------------------------------------------------------------
# Layer plan (kernel sizes + padding bookkeeping)
# ---------------------------------------------------------------------------

def edsr_layer_plan(n_blocks: int, scale_factor: int,
                    receptive_field_bound: int = _INT32_MAX) -> dict:
    """Kernel-size schedule + fractional required padding.

    Mirrors the reference's `kernel_size()` closure (models.py:795-800):
    layers switch to 1x1 once the receptive field would exceed the bound;
    the receptive-field growth per conv halves after each PixelShuffle.
    """
    assert math.log2(scale_factor) == int(math.log2(scale_factor)), \
        "only power-of-2 SR scale factors are supported"
    state = {"pad": 0.0, "rf": 1.0}
    KS = 3

    def ks(num_layers: int = 1) -> int:
        if (1 + 2 * (state["pad"] + state["rf"] * num_layers * ((KS - 1) // 2))
                ) <= receptive_field_bound:
            state["pad"] += state["rf"] * num_layers * (KS // 2)
            return KS
        return 1

    plan = {"conv_input": ks()}
    plan["blocks"] = [ks(2) for _ in range(n_blocks)]
    plan["conv_mid"] = ks()
    ups = []
    for _ in range(int(math.log2(scale_factor))):
        ups.append(ks())
        state["rf"] /= 2
    plan["upscale"] = ups
    plan["conv_output"] = ks()
    plan["required_padding_raw"] = state["pad"]
    return plan


@dataclasses.dataclass(frozen=True)
class PlaneSRConfig:
    arch: str = "EDSR"                   # EDSR | SRResNet
    in_channels: int = 48
    out_channels: int = 48
    hidden_size: int = 256
    n_blocks: int = 32
    scale_factor: int = 4
    receptive_field_bound: int = _INT32_MAX
    plane_interp: str = "bilinear"       # residual-upsample mode
    align_corners: bool = True
    input_normalization: bool = False
    sr_input_noise: float = 0.0
    sr_output_noise: float = 0.0
    no_batch_norm: bool = False          # SRResNet only
    # run convolutions in this dtype with f32 accumulation ('bfloat16'
    # doubles MXU throughput); None = input dtype
    compute_dtype: str = None
    # EDSR tile size (LR pixels): when set, the plane is super-resolved
    # in fixed-size overlapping tiles (halo = required_padding) instead
    # of one full-plane conv stack. This is the TPU-native equivalent of
    # the reference's ROI crop (models.py:884-926): VALID convolutions
    # make each HR pixel depend on a bounded LR window, so tiling is
    # EXACT while capping activation memory at O(tile^2) — the
    # full-plane path stops fitting HBM beyond ~800^2 LR planes at
    # production widths (PERF.md).
    tile_size: int = None
    # rematerialize each residual block in the backward (saves HBM at
    # +1 recomputed forward per block ~= +33% training conv FLOPs).
    # bf16 NHWC sequential-per-plane training may fit without it at
    # TrainModels dims — set False to trade memory back for speed
    # (config key super_resolution.model.remat)
    remat: bool = True
    # checkpoint granularity: 1 = every residual block (max HBM
    # saving); k>1 = one checkpoint per k-block segment (stores k x the
    # activations but recomputes each segment only once in the backward
    # — the sqrt-schedule point between remat=True and remat=False).
    # Ignored when remat=False. (config key
    # super_resolution.model.remat_every)
    remat_every: int = 1
    # batch all P planes through the conv trunk during TRAINING instead
    # of the sequential per-plane lax.map (P x the activation HBM, but
    # one conv stream — pick per exp_sr_budget measurements). Eval
    # always batches. (config key super_resolution.model.train_batch)
    train_batch: bool = False
    # convolution lowering: 'xla' = lax.conv_general_dilated; 'mm' =
    # k^2 shifted dot_generals (pure MXU matmuls, matmul-based
    # backward). XLA:TPU's batch-1 conv lowering measured ~25% of bf16
    # MXU peak at these shapes (fwd 178.7 ms for 9.2 TFLOP, PERF.md
    # round 4); the mm form targets the lost factor. Numerics: each
    # tap product accumulates in f32 and the sum is rounded once to
    # compute_dtype — the same one-rounding-per-layer semantics as the
    # f32-accumulating conv. (config key
    # super_resolution.model.conv_impl)
    conv_impl: str = "xla"

    @property
    def required_padding(self) -> int:
        """Integer replicate-padding of the LR input
        (reference models.py:840-841)."""
        if self.arch != "EDSR":
            return 0
        raw = edsr_layer_plan(self.n_blocks, self.scale_factor,
                              self.receptive_field_bound)[
                                  "required_padding_raw"]
        return int(np.ceil(raw))

    @property
    def hr_overpadding(self) -> int:
        """Crop applied to the HR output (reference models.py:840-842)."""
        if self.arch != "EDSR":
            return 0
        raw = edsr_layer_plan(self.n_blocks, self.scale_factor,
                              self.receptive_field_bound)[
                                  "required_padding_raw"]
        return int(np.ceil(raw)) * self.scale_factor - int(
            raw * self.scale_factor)

    @classmethod
    def from_cfg(cls, sr_cfg, scale_factor: int, plane_channels: int,
                 plane_interp: str, align_corners: bool) -> "PlaneSRConfig":
        """Build from a reference-style `super_resolution` YAML section
        (train_nerf.py:417-425 wiring)."""
        model = sr_cfg.get("model", {})
        return cls(
            arch=model.get("type", "EDSR"),
            in_channels=plane_channels,
            out_channels=plane_channels,
            hidden_size=model.get("hidden_size", 256),
            n_blocks=model.get("n_blocks", 32),
            scale_factor=scale_factor,
            receptive_field_bound=model.get("receptive_field_bound",
                                            _INT32_MAX),
            plane_interp=sr_cfg.get("plane_resize_mode", plane_interp),
            align_corners=align_corners,
            input_normalization=sr_cfg.get("input_normalization", False),
            sr_input_noise=sr_cfg.get("sr_input_noise", 0.0),
            sr_output_noise=sr_cfg.get("sr_output_noise", 0.0),
            no_batch_norm=model.get("no_batch_norm", False),
            compute_dtype=model.get("compute_dtype", None),
            tile_size=model.get("tile_size", None),
            remat=model.get("remat", True),
            remat_every=model.get("remat_every", 1),
            train_batch=model.get("train_batch", False),
            conv_impl=model.get("conv_impl", "xla"),
        )


# ---------------------------------------------------------------------------
# Params + primitives
# ---------------------------------------------------------------------------

def _init_conv(key, in_ch: int, out_ch: int, k: int, bias: bool,
               dtype=jnp.float32):
    """Reference PlanesSR conv init: N(0, sqrt(2/n)/10), zero bias
    (models.py:843-848, applied over every conv in the wrapper)."""
    n = k * k * out_ch
    std = math.sqrt(2.0 / n) / 10.0
    p = {"w": std * jax.random.normal(key, (out_ch, in_ch, k, k), dtype)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def _conv(p, x, padding="VALID", compute_dtype=None, impl="xla"):
    """x: [N,H,W,C] (NHWC — the TPU-native conv layout); weights stay
    OIHW in the pytree (torch layout for ckpt conversion) and are
    transposed to HWIO per call (a few hundred KB, fused away).

    NHWC matters enormously here: XLA:TPU lowers NCHW conv stacks at
    these shapes (C=256, W~300) through per-layer relayouts measured at
    up to 90x slower end-to-end (tools/exp_sr_conv.py round 3); all
    SR-module internals therefore run NHWC and the public plane APIs
    transpose once at entry/exit.

    compute_dtype='bfloat16' casts operands (and the output) to bf16 —
    the MXU still accumulates each conv in f32 internally, so the cost
    is one bf16 rounding per layer. (preferred_element_type upcasting
    is avoided: conv's transpose rule rejects mixed-dtype cotangents.)

    impl='mm' (PlaneSRConfig.conv_impl) lowers the conv as k^2 shifted
    [N*Ho*Wo, I] @ [I, O] dot_generals accumulated in f32 — pure MXU
    matmuls with a matmul-based autodiff backward, sidestepping
    XLA:TPU's batch-1 conv lowering (~25% of bf16 peak at production
    EDSR shapes, PERF.md round 4). Same one-rounding-per-layer
    numerics as the conv form.
    """
    w = jnp.transpose(p["w"], (2, 3, 1, 0))         # OIHW -> HWIO
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if impl == "mm":
        k = w.shape[0]
        if padding != "VALID" and padding != [(0, 0), (0, 0)]:
            assert not isinstance(padding, str), padding
            x = jnp.pad(x, ((0, 0), tuple(padding[0]), tuple(padding[1]),
                            (0, 0)))
        ho, wo = x.shape[1] - k + 1, x.shape[2] - k + 1
        acc = None
        for dy in range(k):
            for dx in range(k):
                xs = x[:, dy:dy + ho, dx:dx + wo, :]
                r = jax.lax.dot_general(
                    xs, w[dy, dx], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = r if acc is None else acc + r
        y = acc.astype(x.dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def pixel_shuffle(x, r: int):
    """torch.nn.PixelShuffle: [N, C*r^2, H, W] -> [N, C, rH, rW]."""
    n, c_r2, h, w = x.shape
    c = c_r2 // (r * r)
    x = x.reshape(n, c, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, c, h * r, w * r)


def _pixel_shuffle_nhwc(x, r: int):
    """torch.nn.PixelShuffle in NHWC: [N, H, W, C*r^2] -> [N, rH, rW, C]
    (torch channel index = c*r^2 + ry*r + rx, models.py upsampler)."""
    n, h, w, c_r2 = x.shape
    c = c_r2 // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


def _prelu(p, x):
    return jnp.where(x >= 0, x, p * x)


# ---------------------------------------------------------------------------
# EDSR
# ---------------------------------------------------------------------------

def init_edsr_params(key, cfg: PlaneSRConfig, dtype=jnp.float32):
    plan = edsr_layer_plan(cfg.n_blocks, cfg.scale_factor,
                           cfg.receptive_field_bound)
    params = {}
    key, sub = jax.random.split(key)
    params["conv_input"] = _init_conv(sub, cfg.in_channels, cfg.hidden_size,
                                      plan["conv_input"], bias=False,
                                      dtype=dtype)
    blocks = []
    for k_sz in plan["blocks"]:
        key, k1, k2 = jax.random.split(key, 3)
        blocks.append({
            "conv1": _init_conv(k1, cfg.hidden_size, cfg.hidden_size, k_sz,
                                bias=False, dtype=dtype),
            "conv2": _init_conv(k2, cfg.hidden_size, cfg.hidden_size, k_sz,
                                bias=False, dtype=dtype),
        })
    params["blocks"] = blocks
    key, sub = jax.random.split(key)
    params["conv_mid"] = _init_conv(sub, cfg.hidden_size, cfg.hidden_size,
                                    plan["conv_mid"], bias=False, dtype=dtype)
    ups = []
    for k_sz in plan["upscale"]:
        key, sub = jax.random.split(key)
        ups.append(_init_conv(sub, cfg.hidden_size, cfg.hidden_size * 4, k_sz,
                              bias=False, dtype=dtype))
    params["upscale"] = ups
    key, sub = jax.random.split(key)
    params["conv_output"] = _init_conv(sub, cfg.hidden_size, cfg.out_channels,
                                       plan["conv_output"], bias=False,
                                       dtype=dtype)
    return params


def apply_edsr(params, cfg: PlaneSRConfig, x):
    """[N,C,H,W] (pre-padded) -> [N,C,H',W'] VALID-conv EDSR.

    Residual blocks crop their identity path by the VALID margin
    (reference models.py:777-786), scale the residual by 0.1, and the
    trunk ends with PixelShuffle upscaling. Internals run NHWC (see
    _conv); entry/exit transpose once.
    """
    cd = cfg.compute_dtype
    ci = cfg.conv_impl
    h = _conv(params["conv_input"], jnp.transpose(x, (0, 2, 3, 1)),
              compute_dtype=cd, impl=ci)

    # Each residual block is rematerialized: at production dims
    # (256ch x 32 blocks over a padded 336^2 plane) storing every conv
    # activation for the backward needs >8 GB — recomputing a block's
    # two convs in the backward trades ~2x SR FLOPs for fitting HBM.
    def block(blk, h):
        k_sz = blk["conv1"]["w"].shape[-1]
        if k_sz == 1:
            identity = h
        else:
            m = 2 * (k_sz // 2)
            identity = h[:, m:-m, m:-m, :]
        y = _conv(blk["conv2"], jax.nn.relu(
            _conv(blk["conv1"], h, compute_dtype=cd, impl=ci)),
            compute_dtype=cd, impl=ci)
        return identity + 0.1 * y

    # NOTE (round 4): a lax.scan over stacked block params (to shrink
    # the unrolled backward graph enough for the remote compile helper
    # to accept the noremat schedule) is shape-incompatible with this
    # VALID trunk: every block shrinks the carry by 2*(k//2)*2 rows, and
    # the fixed-canvas workaround (conv the full initial extent, crop
    # once at the end — exact on the kept interior) costs ~1.52x fwd
    # FLOPs at production pad/size ratio (336^2 canvas vs a 334->206
    # shrinking extent), i.e. noremat-on-canvas ~= 3*1.52 = 4.56x fwd
    # > the shipped remat-all 4x. Measured frontier in PERF.md round 4.
    if cfg.remat and cfg.remat_every <= 1:
        block = jax.checkpoint(block)

    if cfg.remat and cfg.remat_every > 1:
        # segment checkpointing: recompute each k-block segment once in
        # the backward while storing only one activation per segment
        def seg(blks, h):
            for blk in blks:
                h = block(blk, h)
            return h

        seg_ckpt = jax.checkpoint(seg)
        blocks = params["blocks"]
        for i in range(0, len(blocks), cfg.remat_every):
            h = seg_ckpt(blocks[i:i + cfg.remat_every], h)
    else:
        for blk in params["blocks"]:
            h = block(blk, h)
    h = _conv(params["conv_mid"], h, compute_dtype=cd, impl=ci)
    for up in params["upscale"]:
        h = _pixel_shuffle_nhwc(_conv(up, h, compute_dtype=cd, impl=ci), 2)
    return jnp.transpose(_conv(params["conv_output"], h, compute_dtype=cd,
                               impl=ci),
                         (0, 3, 1, 2))


def _crop_overpadding(y, cfg: PlaneSRConfig):
    over = cfg.hr_overpadding
    if over > 0:
        y = y[..., over:-over, over:-over]
    return y


def apply_edsr_tiled(params, cfg: PlaneSRConfig, x, orig_hw):
    """Tile-wise EDSR over a pre-padded plane batch.

    x: [N, C, Hp, Wp] where Hp = H + 2*required_padding (the same
    replicate padding the full-plane path applies); orig_hw: (H, W) of
    the unpadded plane. Returns exactly what `apply_edsr(x)` cropped by
    hr_overpadding would: [N, C, s*H, s*W].

    Geometry: the VALID stack maps input length n -> s*n - 2*s*raw_pad.
    A tile of T LR rows plus its P-halo (T + 2P rows) therefore yields
    s*T + 2*hr_overpadding HR rows; cropping the overpadding leaves the
    tile's exact s*T HR rows. Each HR pixel sees the same input window
    as in the full-plane run, so tiling is numerically equivalent.
    """
    h, w = orig_hw
    pad = cfg.required_padding
    over = cfg.hr_overpadding
    s = cfg.scale_factor
    t = int(cfg.tile_size)
    nth, ntw = -(-h // t), -(-w // t)
    # extend on the bottom/right so the tile grid covers the plane;
    # edge values there cannot influence HR outputs inside [0, s*h)
    eh, ew = nth * t + 2 * pad - x.shape[2], ntw * t + 2 * pad - x.shape[3]
    if eh > 0 or ew > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, max(eh, 0)), (0, max(ew, 0))),
                    mode="edge")

    tiles = []
    for i in range(nth):
        for j in range(ntw):
            tiles.append(x[:, :, i * t:i * t + t + 2 * pad,
                           j * t:j * t + t + 2 * pad])
    tiles = jnp.stack(tiles)                       # [nt, N, C, t+2P, t+2P]
    nt, n, c = tiles.shape[:3]
    tiles = tiles.reshape(nt * n, c, t + 2 * pad, t + 2 * pad)

    # one tile batch per step keeps peak activation memory at O(t^2)
    def one(tile):
        y = apply_edsr(params, cfg, tile[None])[0]
        if over > 0:
            y = y[..., over:-over, over:-over]
        return y

    out = jax.lax.map(one, tiles)                  # [nt*N, C, s*t, s*t]
    out = out.reshape(nt, n, c, s * t, s * t)
    rows = [jnp.concatenate([out[i * ntw + j] for j in range(ntw)], axis=-1)
            for i in range(nth)]
    full = jnp.concatenate(rows, axis=-2)          # [N, C, s*nth*t, ...]
    return full[..., :s * h, :s * w]


# ---------------------------------------------------------------------------
# SRResNet (SRGAN generator variant; reference models.py:1021-1145)
# ---------------------------------------------------------------------------

def init_srresnet_params(key, cfg: PlaneSRConfig, dtype=jnp.float32):
    params = {}
    key, k1, k2 = jax.random.split(key, 3)
    params["conv1"] = _init_conv(k1, cfg.in_channels, cfg.hidden_size, 9,
                                 bias=True, dtype=dtype)
    params["prelu1"] = jnp.full((), 0.25, dtype)
    blocks = []
    for _ in range(cfg.n_blocks):
        key, ka, kb = jax.random.split(key, 3)
        blk = {
            "conv1": _init_conv(ka, cfg.hidden_size, cfg.hidden_size, 3,
                                bias=False, dtype=dtype),
            "prelu": jnp.full((), 0.25, dtype),
            "conv2": _init_conv(kb, cfg.hidden_size, cfg.hidden_size, 3,
                                bias=False, dtype=dtype),
        }
        if not cfg.no_batch_norm:
            blk["bn1"] = _init_bn(cfg.hidden_size, dtype)
            blk["bn2"] = _init_bn(cfg.hidden_size, dtype)
        blocks.append(blk)
    params["blocks"] = blocks
    key, sub = jax.random.split(key)
    params["conv2"] = _init_conv(sub, cfg.hidden_size, cfg.hidden_size, 3,
                                 bias=False, dtype=dtype)
    if not cfg.no_batch_norm:
        params["bn2"] = _init_bn(cfg.hidden_size, dtype)
    ups = []
    for _ in range(int(math.log2(cfg.scale_factor))):
        key, sub = jax.random.split(key)
        ups.append({
            "conv": _init_conv(sub, cfg.hidden_size, cfg.hidden_size * 4, 3,
                               bias=True, dtype=dtype),
            "prelu": jnp.full((), 0.25, dtype),
        })
    params["upscale"] = ups
    key, sub = jax.random.split(key)
    params["conv3"] = _init_conv(sub, cfg.hidden_size, cfg.out_channels, 9,
                                 bias=True, dtype=dtype)
    return params


def _init_bn(ch: int, dtype=jnp.float32):
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype),
            "mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}


def _bn(p, x, train: bool):
    """BatchNorm over NHWC activations (stats across N, H, W)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x - mean) * inv * p["scale"] + p["bias"]


def apply_srresnet(params, cfg: PlaneSRConfig, x, train: bool = False):
    """[N,C,H,W] -> [N,C,sH,sW]; SAME padding throughout
    (required_padding == 0, reference models.py:1077). Internals run
    NHWC (see _conv); entry/exit transpose once."""
    same = lambda k: [(k // 2, k // 2)] * 2
    ci = cfg.conv_impl

    x = jnp.transpose(x, (0, 2, 3, 1))
    h1 = _prelu(params["prelu1"], _conv(params["conv1"], x, padding=same(9),
                                        impl=ci))
    h = h1
    for blk in params["blocks"]:
        y = _conv(blk["conv1"], h, padding=same(3), impl=ci)
        if "bn1" in blk:
            y = _bn(blk["bn1"], y, train)
        y = _prelu(blk["prelu"], y)
        y = _conv(blk["conv2"], y, padding=same(3), impl=ci)
        if "bn2" in blk:
            y = _bn(blk["bn2"], y, train)
        h = h + y
    h2 = _conv(params["conv2"], h, padding=same(3), impl=ci)
    if "bn2" in params:
        h2 = _bn(params["bn2"], h2, train)
    h = h1 + h2
    for up in params["upscale"]:
        h = _prelu(up["prelu"],
                   _pixel_shuffle_nhwc(_conv(up["conv"], h, padding=same(3),
                                             impl=ci), 2))
    return jnp.transpose(_conv(params["conv3"], h, padding=same(9), impl=ci),
                         (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# PlanesSR wrapper: full-plane residual super-resolution
# ---------------------------------------------------------------------------

def init_plane_sr_params(key, cfg: PlaneSRConfig, dtype=jnp.float32):
    if cfg.arch == "EDSR":
        params = {"inner": init_edsr_params(key, cfg, dtype)}
    elif cfg.arch == "SRResNet":
        params = {"inner": init_srresnet_params(key, cfg, dtype)}
    else:
        raise ValueError(f"unknown SR arch: {cfg.arch}")
    if cfg.input_normalization:
        # populated from corpus plane statistics
        # (reference models.py:861-863, train_nerf.py:606-608)
        params["norm"] = {
            "mean": jnp.full((cfg.in_channels,), jnp.nan, dtype),
            "std": jnp.full((cfg.in_channels,), jnp.nan, dtype),
        }
    return params


def apply_plane_sr(params, cfg: PlaneSRConfig, lr_planes, *, train=False,
                   noise_key=None):
    """Super-resolve feature planes: [P,C,H,W] -> [P,C,sH,sW].

    SR(plane) = inner(norm(plane + in_noise)) + bilinear_up(plane)
    (reference models.py:884-926, full-plane path). All P planes run as
    one conv batch (MXU-friendly).
    """
    x = lr_planes
    if train and cfg.sr_input_noise > 0 and noise_key is not None:
        noise_key, sub = jax.random.split(noise_key)
        std = cfg.sr_input_noise * jnp.std(x)
        x = x + std * jax.random.normal(sub, x.shape, x.dtype)
    if "norm" in params:
        x = (x - params["norm"]["mean"][None, :, None, None]) \
            / params["norm"]["std"][None, :, None, None]

    pad = cfg.required_padding
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    if cfg.arch == "EDSR":
        if cfg.tile_size is not None:
            # fixed-memory tiled path (exact; see apply_edsr_tiled)
            diff = apply_edsr_tiled(params["inner"], cfg, x,
                                    lr_planes.shape[-2:])
        elif train and not cfg.train_batch:
            # sequential per-plane trunk during training: the remat
            # boundaries (one activation per residual block) dominate
            # HBM at production dims; batch-1 cuts that peak P-fold at
            # unchanged FLOPs.
            diff = jax.lax.map(
                lambda p: apply_edsr(params["inner"], cfg, p[None])[0], x)
            diff = _crop_overpadding(diff, cfg)
        else:
            diff = apply_edsr(params["inner"], cfg, x)
            diff = _crop_overpadding(diff, cfg)
    else:
        assert cfg.tile_size is None, \
            "tile_size is only supported for the EDSR (VALID-conv) arch"
        diff = apply_srresnet(params["inner"], cfg, x, train=train)

    residual = upsample_plane(lr_planes, cfg.scale_factor,
                              mode=cfg.plane_interp,
                              align_corners=cfg.align_corners)
    out = diff + residual
    if train and cfg.sr_output_noise > 0 and noise_key is not None:
        std = cfg.sr_output_noise * jnp.std(jax.lax.stop_gradient(diff))
        out = out + std * jax.random.normal(noise_key, out.shape, out.dtype)
    return out


def sr_scale_factor(sf_config, coupler_ds_factor: int) -> int:
    """Resolve the SR scale factor from config
    (reference train_nerf.py:407-415): 'linear' -> ds ratio,
    'sqrt' -> sqrt(ds ratio), or an explicit int."""
    if sf_config == "linear":
        return int(coupler_ds_factor)
    if sf_config == "sqrt":
        return int(np.sqrt(coupler_ds_factor))
    return int(sf_config)

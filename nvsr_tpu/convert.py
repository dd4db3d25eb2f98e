"""Reference-checkpoint conversion: torch .ckpt/.par -> nvsr_tpu pytrees.

One-off interop for validating PSNR parity against models trained with
the reference implementation (SURVEY.md §7 build order step 2). Reads
the reference's torch state_dict layouts:

  * TwoDimPlanesModel decoder checkpoints (reference train_nerf.py:
    993-1008): `density_dec.{m}.{l}.weight`, `rgb_dec...`, `fc_alpha...`,
    incl. the legacy pre-ensemble layout (`.` -> `.0.` migration,
    train_nerf.py:534-542) and `rot_mats` backfill (models.py:246-249);
  * FlexibleNeRFModel checkpoints;
  * SR checkpoints (`SR_model` with/without the `inner_model.` prefix,
    train_nerf.py:500-502);
  * per-scene `.par` plane files ({'params', 'opt_states',
    'coords_normalization'}, models.py:574,668-669), mapping torch Adam
    moments onto the optax Adam state.

torch is imported lazily and used only to deserialize; no torch math.
"""

from __future__ import annotations

import re
from collections import OrderedDict

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _lin(sd, prefix):
    return {"w": _np(sd[prefix + ".weight"]).T.copy(),
            "b": _np(sd[prefix + ".bias"]).copy()}


def _ensure_ensemble_layout(sd):
    """Apply the `.` -> `.0.` ensemble migration when loading legacy
    checkpoints (reference train_nerf.py:534-542)."""
    needs = any("density_dec" in k
                and re.search(r"density_dec\.(\d)+\.(\d)+\.", k) is None
                for k in sd)
    if not needs:
        return sd
    return OrderedDict(
        (k if "NON_LEARNED" in k else k.replace(".", ".0.", 1), v)
        for k, v in sd.items())


def convert_triplane_decoder(state_dict):
    """torch TwoDimPlanesModel state_dict -> (params pytree, rot_mats).

    Planes (`planes_.sc...`) and SR keys are excluded by the reference's
    own save path (train_nerf.py:1001-1006) but are skipped here too for
    robustness.
    """
    sd = {k: v for k, v in state_dict.items()
          if "planes_." not in k and "SR_model" not in k}
    sd = _ensure_ensemble_layout(sd)

    members_idx = sorted({int(m.group(1)) for k in sd
                          for m in [re.match(r"density_dec\.(\d+)\.", k)]
                          if m})
    members = []
    for mi in members_idx:
        m = {}
        for branch, name in (("density", "density_dec"), ("rgb", "rgb_dec")):
            layers_idx = sorted({
                int(mm.group(1)) for k in sd
                for mm in [re.match(rf"{name}\.{mi}\.(\d+)\.weight", k)]
                if mm})
            m[branch] = [_lin(sd, f"{name}.{mi}.{li}") for li in layers_idx]
        m["fc_alpha"] = _lin(sd, f"fc_alpha.{mi}")
        m["fc_rgb"] = _lin(sd, f"fc_rgb.{mi}")
        if f"fc_feat.{mi}.weight" in sd:
            m["fc_feat"] = _lin(sd, f"fc_feat.{mi}")
        members.append(m)

    rot_keys = sorted([k for k in state_dict
                       if "rot_mats_NON_LEARNED" in k],
                      key=lambda k: int(k.split(".")[-1]))
    rot_mats = (np.stack([_np(state_dict[k]) for k in rot_keys])
                if rot_keys else None)
    return {"members": members}, rot_mats


def convert_nerf_mlp(state_dict):
    """torch FlexibleNeRFModel state_dict -> params pytree."""
    sd = dict(state_dict)
    params = {"layer1": _lin(sd, "layer1")}
    n_xyz = len({k for k in sd if k.startswith("layers_xyz.")
                 and k.endswith(".weight")})
    params["layers_xyz"] = [_lin(sd, f"layers_xyz.{i}")
                            for i in range(n_xyz)]
    if "fc_out.weight" in sd:
        params["fc_out"] = _lin(sd, "fc_out")
    else:
        n_dir = len({k for k in sd if k.startswith("layers_dir.")
                     and k.endswith(".weight")})
        params["layers_dir"] = [_lin(sd, f"layers_dir.{i}")
                                for i in range(n_dir)]
        params["fc_alpha"] = _lin(sd, "fc_alpha")
        params["fc_rgb"] = _lin(sd, "fc_rgb")
        params["fc_feat"] = _lin(sd, "fc_feat")
    return params


def _conv(sd, prefix):
    p = {"w": _np(sd[prefix + ".weight"]).copy()}
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"]).copy()
    return p


def convert_plane_sr(state_dict):
    """torch PlanesSR (EDSR inner) state_dict -> params pytree."""
    sd = dict(state_dict)
    if not any(k.startswith("inner_model.") or "NON_LEARNED" in k
               for k in sd):
        # legacy layout without the wrapper prefix
        # (reference train_nerf.py:500-502)
        sd = {("inner_model." + k if "NON_LEARNED" not in k else k): v
              for k, v in sd.items()}
    inner = {}
    inner["conv_input"] = _conv(sd, "inner_model.conv_input")
    n_blocks = len({k for k in sd
                    if re.match(r"inner_model\.residual\.(\d+)\.conv1\.", k)})
    inner["blocks"] = [
        {"conv1": _conv(sd, f"inner_model.residual.{i}.conv1"),
         "conv2": _conv(sd, f"inner_model.residual.{i}.conv2")}
        for i in range(n_blocks)]
    inner["conv_mid"] = _conv(sd, "inner_model.conv_mid")
    # upscale Sequential interleaves convs with PixelShuffle: indices
    # 0, 2, 4, ... are the convs (reference models.py:808-815)
    up_idx = sorted({int(m.group(1)) for k in sd
                     for m in [re.match(
                         r"inner_model\.upscale\.(\d+)\.weight", k)] if m})
    inner["upscale"] = [_conv(sd, f"inner_model.upscale.{i}")
                        for i in up_idx]
    inner["conv_output"] = _conv(sd, "inner_model.conv_output")
    params = {"inner": inner}
    if "planes_mean_NON_LEARNED" in sd:
        params["norm"] = {
            "mean": _np(sd["planes_mean_NON_LEARNED"]).reshape(-1).copy(),
            "std": _np(sd["planes_std_NON_LEARNED"]).reshape(-1).copy()}
    return params


def convert_par_file(par_content, num_pos_planes: int = 3):
    """Reference `.par` content -> (planes dict, box, adam moments).

    par_content: {'params': {plane_name: [1,C,R,R] tensors},
                  'opt_states': [torch Adam per-plane state or None],
                  'coords_normalization': [2,D]}.
    Returns:
      ({'pos': [P,C,R,R], 'view': [Cv,Rv,Rv]|None}, box,
       {'count', 'mu', 'nu'}|None) with moments in the same pos/view
      layout.
    """
    params = par_content["params"]
    names = sorted(params.keys(),
                   key=lambda k: int(re.search(r"_D(\d+)$", k).group(1)))
    pos = [_np(params[n])[0] for n in names
           if int(re.search(r"_D(\d+)$", n).group(1)) < num_pos_planes]
    view = [_np(params[n])[0] for n in names
            if int(re.search(r"_D(\d+)$", n).group(1)) >= num_pos_planes]
    planes = {"pos": np.stack(pos)}
    if view:
        planes["view"] = view[0]
    box = _np(par_content["coords_normalization"])

    moments = None
    opt_states = par_content.get("opt_states")
    if opt_states and all(s is not None for s in opt_states):
        def moment(field):
            vals = [_np(s[field])[0] for s in opt_states]
            out = {"pos": np.stack(vals[:num_pos_planes])}
            if len(vals) > num_pos_planes:
                out["view"] = vals[num_pos_planes]
            return out
        moments = {
            "count": int(_np(opt_states[0]["step"]).reshape(())),
            "mu": moment("exp_avg"),
            "nu": moment("exp_avg_sq"),
        }
    return planes, box, moments


def load_torch_checkpoint(path: str):
    """Deserialize a torch checkpoint file (lazy torch import)."""
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)

"""Smoke test for the driver artifact producer (bench.py): the program
must emit exactly one parseable JSON line on the stdlib path even
without TPU hardware (BENCH_PLATFORM=cpu + BENCH_TUNNEL_WAIT_S=0), and
the tunnel-outage gate must emit an error artifact instead of hanging."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(env_extra, timeout):
    env = dict(os.environ)
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    return json.loads(lines[0])

def test_bench_emits_artifact_on_cpu():
    rec = _run({
        "BENCH_PLATFORM": "cpu", "BENCH_TUNNEL_WAIT_S": "0",
        "BENCH_SIZE": "16", "BENCH_PLANE_RES": "32",
        "BENCH_RAY_BLOCK": "256", "BENCH_TILED": "0",
        "BENCH_MATRIX": "0", "BENCH_TRAIN": "0", "BENCH_REPEATS": "1",
        "BENCH_OCC": "0", "BENCH_COARSE": "2", "BENCH_FINE": "2",
        "BENCH_PSNR_GATE": "0",   # interpret-mode gate is minutes-slow
    }, timeout=600)
    assert rec["metric"] == "rays_per_sec_render_flagship_eval"
    assert rec["unit"] == "rays/s"
    assert rec["value"] > 0
    assert rec["overflow_frac"] == 0.0


def test_bench_psnr_gate_smoke(tmp_path):
    """The trained-field gate section (bench_psnr_gate) end-to-end on a
    fabricated tiny asset: both render paths execute (tiled in
    interpret mode on CPU), the artifact carries a numeric psnr_gate_db
    and the absolute eval PSNRs."""
    import pickle

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nvsr_tpu.models import TriplaneConfig, init_decoder_params

    cfg = TriplaneConfig(dec_channels=16, num_plane_channels=8,
                         dec_density_layers=2, dec_rgb_layers=2,
                         proj_combination="avg",
                         viewdir_proj_combination="concat_pos")
    dec = init_decoder_params(jax.random.PRNGKey(0), cfg)
    for mem in dec["members"]:
        mem["fc_alpha"]["b"] = mem["fc_alpha"]["b"] + 1.0  # live density
    rng = np.random.default_rng(0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 4.0]
    asset = {
        "model_cfg": cfg,
        "decoder_coarse": jax.tree.map(np.asarray, dec),
        "decoder_fine": jax.tree.map(np.asarray, dec),
        "planes_pos": 0.3 * rng.standard_normal(
            (3, 8, 16, 16)).astype(np.float32),
        "plane_view": 0.3 * rng.standard_normal(
            (8, 8, 8)).astype(np.float32),
        "box": np.stack([[-4, -4, -4, -np.pi, -np.pi / 2],
                         [4, 4, 4, np.pi, np.pi / 2]]).astype(np.float32),
        "occ_aabb": None, "pose": pose, "h": 16, "w": 16,
        "focal": 20.0, "ds_factor": 1, "near": 2.0, "far": 6.0,
        "white_background": True, "num_coarse": 3, "num_fine": 3,
        "gt": rng.integers(0, 255, (16, 16, 3)).astype(np.uint8),
        "scene_id": "fake",
    }
    p = tmp_path / "gate_scene.pkl"
    with open(p, "wb") as f:
        pickle.dump(asset, f)
    rec = _run({
        "BENCH_PLATFORM": "cpu", "BENCH_TUNNEL_WAIT_S": "0",
        "BENCH_SIZE": "16", "BENCH_PLANE_RES": "32",
        "BENCH_RAY_BLOCK": "256", "BENCH_TILED": "0",
        "BENCH_MATRIX": "0", "BENCH_TRAIN": "0", "BENCH_REPEATS": "1",
        "BENCH_OCC": "0", "BENCH_COARSE": "2", "BENCH_FINE": "2",
        "BENCH_GATE_ASSET": str(p),
    }, timeout=900)
    assert isinstance(rec["psnr_gate_db"], (int, float)), rec
    assert isinstance(rec["eval_psnr_xla_db"], (int, float))
    assert isinstance(rec["eval_psnr_tiled_db"], (int, float))


def test_bench_tunnel_gate_emits_error_artifact():
    # force an unreachable-tunnel verdict deterministically: the probe
    # body hangs (a real jax.devices() probe races against tunnel
    # responsiveness — it can answer within any small budget)
    rec = _run({"BENCH_TUNNEL_WAIT_S": "3",
                "BENCH_TUNNEL_PROBE": "import time; time.sleep(600)"},
               timeout=120)
    assert rec["value"] == 0.0
    assert "tunnel unreachable" in rec["error"]
    assert rec["last_known_hw"]["value"] > 0

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
    }, timeout=600)
    assert rec["metric"] == "rays_per_sec_render_flagship_eval"
    assert rec["unit"] == "rays/s"
    assert rec["value"] > 0
    assert rec["overflow_frac"] == 0.0


def test_bench_tunnel_gate_emits_error_artifact():
    # force an unreachable-tunnel verdict quickly: probe budget so
    # small the (hanging or slow) PJRT init cannot answer
    rec = _run({"BENCH_TUNNEL_WAIT_S": "3"}, timeout=120)
    assert rec["value"] == 0.0
    assert "tunnel unreachable" in rec["error"]
    assert rec["last_known_hw"]["value"] > 0

"""The scaling kit's multi-process mode must actually run (VERDICT r4 #3).

Round 4 shipped a "one-command" >80%-efficiency measurement kit that built
its mesh from a single process's jax.devices() — on a real N-host slice it
could not run at all. This launches scripts/scaling_bench.py --kit on a
local 2-process x 1-virtual-CPU-device cluster (the gloo-safe topology,
tests/test_multiprocess.py docstring) and asserts the full config matrix
(replicated + partitioned x halo A/B) completes with coherent rows and a
report — the same wiring, flag surface, and put_global batch assembly a
real multi-host slice uses.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "scaling_bench.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


@pytest.mark.slow
def test_kit_runs_on_two_process_cluster(tmp_path):
    port = _free_port()
    report = tmp_path / "SCALING_mp.md"
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, "--kit", "--virtual-cpu",
             "--devices", "1", "--steps", "2",
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--baseline-eps", "1e5", "--report", str(report)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_clean_env(), cwd=REPO)
        for pid in (0, 1)]
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    # process 0 prints the JSON result line and writes the report
    json_lines = [ln for ln in logs[0].splitlines() if ln.startswith("[{")]
    assert json_lines, logs[0][-4000:]
    rows = json.loads(json_lines[-1])
    assert {r["config"] for r in rows} == {
        "replicated", "partitioned/all_to_all", "partitioned/ring"}
    for r in rows:
        assert r["devices"] == 2 and r["processes"] == 2
        assert r["edges_per_s"] > 0
        # efficiency normalized against the provided --baseline-eps
        assert abs(r["efficiency_vs_1chip"]
                   - r["edges_per_s"] / (1e5 * 2)) < 1e-2
    assert report.exists()
    text = report.read_text()
    assert "Processes: 2" in text and "--baseline-eps" in text

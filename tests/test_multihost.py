"""Multi-host distributed BA: two OS processes joined via jax.distributed,
observation shards split across process boundaries, Schur reductions as
cross-process psums (BASELINE configs[4]/multi-host story)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_two_process_distributed_ba():
    port = 9277 + (os.getpid() % 500)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "fitslam_tpu.parallel.multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--local-devices", "2", "--obs", "512", "--iters", "4"],
            cwd=str(REPO), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1].split(" ", 1)[1]))
    for r in results:
        assert r["n_processes"] == 2
        assert r["n_devices"] == 4          # 2 local devices per process
        assert r["chi2_last"] < r["chi2_first"] * 0.2
    # both processes converge to the same chi2 (same global problem)
    assert abs(results[0]["chi2_last"] - results[1]["chi2_last"]) <= max(
        1e-3, 1e-3 * abs(results[0]["chi2_last"])
    )

"""Native host runtime (native/runtime.cc via ctypes): ring buffer, PGM
sequence reader with prefetch, event logger. Builds the .so on demand."""

import numpy as np
import pytest

from fitslam_tpu import runtime as rt

pytestmark = pytest.mark.skipif(
    not rt.ensure_built(), reason="native toolchain unavailable"
)


def test_ring_push_pop_order():
    ring = rt.SpscRing(slot_size=16, n_slots=4)
    for i in range(4):
        assert ring.push(np.full(16, i, np.uint8))
    assert not ring.push(np.zeros(16, np.uint8))     # full
    assert len(ring) == 4
    for i in range(4):
        out = ring.pop()
        assert out is not None and (out == i).all()
    assert ring.pop() is None                        # empty
    ring.close()


def test_pgm_sequence_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (48, 64), np.uint8) for _ in range(6)]
    for i, f in enumerate(frames):
        rt.write_pgm(str(tmp_path / f"frame_{i:04d}.pgm"), f)
    reader = rt.PgmSequenceReader(str(tmp_path), prefetch=3)
    assert (reader.width, reader.height, reader.count) == (64, 48, 6)
    got = list(reader)
    reader.close()
    assert len(got) == 6
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)


def test_pgm_reader_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        rt.PgmSequenceReader(str(tmp_path / "nope"))


def test_eventlog_csv(tmp_path):
    log = rt.NativeEventLog()
    i = log.begin("frontend")
    j = log.begin("backend")
    log.end(i)
    log.end(j)
    assert log.count() == 2
    p = tmp_path / "events.csv"
    assert log.export_csv(str(p)) == 2
    rows = p.read_text().strip().splitlines()
    assert rows[0] == "name,begin_ns,end_ns"
    name, b, e = rows[1].split(",")
    assert name == "frontend" and int(e) >= int(b) > 0
    log.close()


def test_now_ns_monotonic():
    a = rt.now_ns()
    b = rt.now_ns()
    assert b >= a > 0


def test_dataset_pipeline_end_to_end(tmp_path):
    """The native prefetching reader feeds the real SLAM loop from disk and
    the native event log exports spans (examples/run_dataset.py path)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, str(repo / "examples" / "run_dataset.py"),
         "--frames", "10", "--cpu", "--dataset", str(tmp_path / "seq"),
         "--record", str(tmp_path / "seq")],
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "ATE RMSE" in out.stdout
    assert (tmp_path / "seq" / "events.csv").exists()
    rows = (tmp_path / "seq" / "events.csv").read_text().strip().splitlines()
    assert len(rows) > 10  # header + h2d/slam_step spans

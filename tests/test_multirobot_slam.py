"""Multi-robot active SLAM e2e: two rovers, each with its OWN full SLAM
stack (stereo frontend + backend + clouds + exploration), sharing current
goals through the peer_goals seam (reference: multi_launch_nodes.sh +
multirobot_send_current_goal, SURVEY.md §2.3 E17). Asserts both SLAM
instances track, goal sharing exists, and the fleet's union coverage beats a
single rover at equal steps."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from run_multirobot_slam import run_fleet  # noqa: E402

STEPS = 100


@pytest.fixture(scope="module")
def fleet_vs_solo():
    fleet, fleet_cov = run_fleet(2, STEPS, verbose=False)
    solo, solo_cov = run_fleet(1, STEPS, verbose=False)
    return fleet, fleet_cov, solo, solo_cov


def test_both_rovers_slam(fleet_vs_solo):
    fleet, fleet_cov, _, _ = fleet_vs_solo
    for i, (robot, nav, system) in enumerate(fleet):
        assert int(system.slam.map.n_kf) >= 4, f"rover {i} made no keyframes"
        assert int(system.slam.map.n_lm) >= 200, f"rover {i} mapped nothing"


def test_fleet_beats_solo_coverage(fleet_vs_solo):
    _, fleet_cov, _, solo_cov = fleet_vs_solo
    assert fleet_cov[-1] > solo_cov[-1] + 0.05, (
        f"fleet {fleet_cov[-1]:.3f} vs solo {solo_cov[-1]:.3f}")


def test_rovers_explored_separately(fleet_vs_solo):
    fleet, _, _, _ = fleet_vs_solo
    (r0, _, s0), (r1, _, s1) = fleet
    # both moved, and they stayed apart (goal sharing prevents convergence
    # on the same frontier)
    t0 = np.array([(x, y) for x, y, _ in r0.trajectory])
    t1 = np.array([(x, y) for x, y, _ in r1.trajectory])
    assert np.ptp(t0, axis=0).sum() > 1.0
    assert np.ptp(t1, axis=0).sum() > 1.0
    assert np.linalg.norm([r0.x - r1.x, r0.y - r1.y]) > 2.0

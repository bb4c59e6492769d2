import dataclasses

import pytest

from fitslam_tpu.utils import config as C


def test_defaults_validate():
    cfg = C.FitSlamConfig().validate()
    assert cfg.fisher_information.threshold == 550.0
    assert cfg.traversability.lethal_threshold == 55


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        """
orb:
  num_features: 2048
fisher_information:
  threshold: 2.0
cost_assigner:
  cost_calculation_methods: [ArrivalInformation]
"""
    )
    cfg = C.load_config(str(p))
    assert cfg.orb.num_features == 2048
    assert cfg.fisher_information.threshold == 2.0
    assert cfg.cost_assigner.cost_calculation_methods == ("ArrivalInformation",)
    # untouched namespaces keep defaults
    assert cfg.roadmap.max_edge_length == 6.1


def test_overrides():
    cfg = C.load_config(overrides={"tracking.min_inliers": 30, "nav.desired_speed": 0.8})
    assert cfg.tracking.min_inliers == 30
    assert cfg.nav.desired_speed == 0.8


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("orb:\n  bogus_key: 1\n")
    with pytest.raises(KeyError):
        C.load_config(str(p))


def test_mutually_exclusive_hysteresis():
    cfg = C.FitSlamConfig()
    bad = dataclasses.replace(
        cfg, goal_hysteresis=dataclasses.replace(cfg.goal_hysteresis, use_roadmap=True)
    )
    with pytest.raises(ValueError):
        bad.validate()


def test_frozen():
    cfg = C.FitSlamConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.orb.num_features = 1  # type: ignore


def test_profiling_smoke():
    from fitslam_tpu.utils.profiling import EventLogger, MODULE

    log = EventLogger(time_tier=MODULE)
    with log.scope("frontier_search", MODULE):
        pass
    log.start("tick")
    log.end("tick", MODULE)
    assert "frontier_search" in log.stats
    assert log.stats["tick"].count == 1
    csv_text = log.to_csv()
    assert "frontier_search" in csv_text
    assert log.time_since_start() >= 0.0


def test_launch_mode_presets():
    """Per-mode config parity (SURVEY.md §5: rapid/light/active triples)."""
    rapid = C.FitSlamConfig.preset("rapid")
    assert rapid.exploration_bt.rate_hz == 5.0
    assert not rapid.fisher_information.enabled
    assert rapid.sensor_simulator.enabled
    light = C.FitSlamConfig.preset("light")
    assert light.exploration_bt.rate_hz == 1.0
    assert not light.fisher_information.enabled
    active = C.FitSlamConfig.preset("active_slam")
    assert active.exploration_bt.rate_hz == 1.0
    assert active.fisher_information.enabled
    with pytest.raises(KeyError):
        C.FitSlamConfig.preset("warp")

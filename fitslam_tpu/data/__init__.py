"""Synthetic worlds, sequences, and fake backends (test + bench fixtures).

The reference tests against simulators rather than unit fixtures
(SURVEY.md §4: slam_keyframe_pcl_simulator, get_landmarks_simulator,
sensorSimulator). This package provides the same capability natively:
procedural terrains, landmark fields, camera trajectories, rendered stereo
frames, and per-keyframe point clouds, all seeded and deterministic.
"""

"""fitslam_tpu — a TPU-native active-SLAM engine.

A ground-up JAX/XLA/Pallas re-implementation of the capability surface of
FIT-SLAM (reference: suchetanrs/FIT-SLAM): stereo/RGB-D visual SLAM (ORB
features, matching, local/global bundle adjustment, pose-graph optimization
with loop closure), traversability grid fusion, frontier-based exploration
with Fisher-information viewpoint gating, navigation, and multi-robot task
allocation — designed TPU-first (batched dense kernels, fixed-capacity masked
state, shard_map over device meshes) rather than ported from the reference's
ROS2/C++ process topology.

Subpackages
-----------
ops       : device kernels (Lie groups, ORB, matching, BA, raycast, grids, FIM)
models    : SLAM / exploration subsystems composed from ops
parallel  : mesh construction and sharded (multi-chip) solvers
runtime   : host-side orchestration (tick engine, message bus, native bindings)
utils     : config, profiling, logging, evaluation
data      : synthetic worlds / sequence generators (test + bench fixtures)
"""

from fitslam_tpu.version import __version__

__all__ = ["__version__"]

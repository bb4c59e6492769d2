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

# Mixed-precision policy (round-3 root cause of the r02 throughput
# regression): round 2 set the PROCESS-GLOBAL jax_default_matmul_precision to
# float32 to stop the geometry math (rotation chains, J^T J / Schur blocks,
# triangulation) from compounding bf16 error over hundreds of frames — which
# fixed the rotation-stressed loop bench but silently dragged every conv and
# matmul in the IMAGE frontend (pyramid blur, orientation/BRIEF gathers) onto
# the 6-pass f32 path, costing ~35% end-to-end frames/s, and mutated global
# JAX config on import (ADVICE r2). The policy is now scoped per-op instead:
# ops/lie.py, ops/ba.py, ops/pgo.py, ops/geometry.py and ops/fisher.py pin
# Precision.HIGHEST on their (tiny, HBM-irrelevant) geometry contractions;
# the big MXU ops (descriptor matmuls — exact in bf16: ±1 values — and image
# convolutions) keep the fast default. No global config is touched.

from fitslam_tpu.version import __version__

__all__ = ["__version__"]

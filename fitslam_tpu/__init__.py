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

import jax as _jax

# On TPU, f32 dot/einsum default to bf16-input passes. That is right for the
# big MXU ops (descriptor matmuls are exact in bf16: ±1 integer values), but
# it silently degrades the small f32 GEOMETRY math — rotation chains,
# J^T J / Schur blocks, triangulation — which compounds over hundreds of
# frames (measured: the rotation-stressed loop benchmark diverges on TPU but
# not on CPU). Those matmuls are tiny and HBM-irrelevant, so full f32 is
# ~free; explicit bf16 inputs (descriptors, images) are unaffected.
_jax.config.update("jax_default_matmul_precision", "float32")

from fitslam_tpu.version import __version__

__all__ = ["__version__"]

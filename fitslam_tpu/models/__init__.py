"""SLAM / exploration subsystems composed from ops kernels."""

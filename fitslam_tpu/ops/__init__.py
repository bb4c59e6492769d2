"""Device kernels: batched, jit-stable, fixed-shape numerical primitives."""

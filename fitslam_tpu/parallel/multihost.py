"""Multi-host distribution: jax.distributed bring-up + global-mesh BA.

Reference mapping (SURVEY.md §2.5, §5): the reference distributes work as
multiple processes on one host over DDS (CycloneDDS unicast-localhost).
The TPU equivalent is `jax.distributed.initialize` over DCN — each process
contributes its local devices to one global mesh, and the observation-
sharded bundle adjustment (parallel/dist_ba.py) runs unchanged with its
Schur reductions becoming cross-host psums over ICI/DCN.

Runnable as a module for the scaling harness (BASELINE.md: >= 70% efficiency
at 2 hosts):

    python -m fitslam_tpu.parallel.multihost --num-processes 2 --process-id 0 &
    python -m fitslam_tpu.parallel.multihost --num-processes 2 --process-id 1

Each process prints one JSON line with chi2 trajectory and per-iteration
wall time; tests/test_multihost.py spawns the fleet and checks the math.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def initialize(coordinator: str, num_processes: int, process_id: int,
               platform: str = "cpu", local_devices: int = 1) -> None:
    """Bring up jax.distributed with `local_devices` per process."""
    flags = os.environ.get("XLA_FLAGS", "")
    if platform == "cpu" and "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()
    import jax

    if platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def build_problem(key_seed: int = 0, n_kf: int = 6, n_lm: int = 96,
                  n_obs: int = 512):
    """Deterministic synthetic BA problem, identical on every process."""
    import jax
    import jax.numpy as jnp

    from fitslam_tpu.ops import ba, lie
    from fitslam_tpu.ops.geometry import Intrinsics

    K = Intrinsics(fx=jnp.float32(120.0), fy=jnp.float32(120.0),
                   cx=jnp.float32(64.0), cy=jnp.float32(48.0),
                   baseline=jnp.float32(0.1))
    key = jax.random.PRNGKey(key_seed)
    pts = jax.random.uniform(key, (n_lm, 3), minval=-3.0, maxval=3.0) + jnp.array([0, 0, 6.0])
    T_cw = lie.se3_exp(0.05 * jax.random.normal(jax.random.fold_in(key, 1), (n_kf, 6)))
    kf_idx = jax.random.randint(jax.random.fold_in(key, 2), (n_obs,), 0, n_kf)
    lm_idx = jax.random.randint(jax.random.fold_in(key, 3), (n_obs,), 0, n_lm)
    p_c = (T_cw.R[kf_idx] @ pts[lm_idx][..., None])[..., 0] + T_cw.t[kf_idx]
    z = jnp.maximum(p_c[:, 2], 0.5)
    uvr = jnp.stack(
        [K.fx * p_c[:, 0] / z + K.cx, K.fy * p_c[:, 1] / z + K.cy,
         K.fx * p_c[:, 0] / z + K.cx - K.bf / z],
        axis=-1,
    )
    obs = ba.Observations(
        kf=kf_idx.astype(jnp.int32), lm=lm_idx.astype(jnp.int32), uvr=uvr,
        sigma2=jnp.ones((n_obs,)), valid=jnp.ones((n_obs,), bool),
    )
    prob = ba.BAProblem(
        T_cw=T_cw,
        points=pts + 0.05 * jax.random.normal(jax.random.fold_in(key, 4), pts.shape),
        obs=obs,
        fixed_kf=jnp.zeros((n_kf,), bool).at[0].set(True),
        fixed_lm=jnp.zeros((n_lm,), bool),
    )
    return K, prob


def run_global_ba(iters: int = 5, n_obs: int = 512, timing_reps: int = 3):
    """Distributed BA over ALL global devices; returns a result dict."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fitslam_tpu.parallel import dist_ba, mesh as mesh_mod

    n_dev = len(jax.devices())
    K, prob = build_problem(n_obs=n_obs)
    mesh = mesh_mod.make_mesh(n_dev, axis_names=("data",))
    sharded_obs = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), prob.obs
    )
    prob = prob._replace(obs=sharded_obs)
    out, chis = dist_ba.distributed_bundle_adjust(mesh, K, prob, iters=iters)
    jax.block_until_ready(out.T_cw.t)
    # steady-state timing
    t0 = time.perf_counter()
    for _ in range(timing_reps):
        out2, _ = dist_ba.distributed_bundle_adjust(mesh, K, prob, iters=iters)
        jax.block_until_ready(out2.T_cw.t)
    dt = (time.perf_counter() - t0) / timing_reps
    chis = [float(c) for c in chis]
    return {
        "process_id": getattr(jax, "process_index", lambda: 0)()
        if callable(getattr(jax, "process_index", None)) else 0,
        "n_devices": n_dev,
        "n_processes": jax.process_count(),
        "chi2_first": chis[0],
        "chi2_last": chis[-1],
        "ba_solve_s": dt,
        "ba_iters_per_s": iters / dt,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:9277")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=1)
    ap.add_argument("--obs", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)

    initialize(args.coordinator, args.num_processes, args.process_id,
               local_devices=args.local_devices)
    res = run_global_ba(iters=args.iters, n_obs=args.obs)
    print("MULTIHOST_RESULT " + json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Checkpoint / resume of the full SLAM + exploration state.

Reference capability (SURVEY.md §5 checkpoint/resume): the reference
persists ONLY the Fisher-information lookup table
(fisher_information_lookup_table.dat, FisherInfoManager.cpp:117-262); the
SLAM map lives in ORB-SLAM3's Atlas save/load (submodule). Here the entire
system state — map, tracker, cloud ring buffer, roadmap, exploration host
state — checkpoints to one compressed npz + JSON sidecar, so a crashed or
migrated run resumes bit-exactly.

Device state is fixed-capacity pytrees of arrays, so (de)serialization is a
generic flatten: every leaf keyed by its tree path, restored into a template
of identical structure (shape/dtype checked).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def pytree_to_arrays(tree) -> Dict[str, np.ndarray]:
    """Flatten a pytree of arrays to {path: np.ndarray}. Non-native dtypes
    (bfloat16) are stored as same-width integer bit views — npz cannot
    round-trip ml_dtypes."""
    import ml_dtypes

    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if arr.dtype == ml_dtypes.bfloat16:
            arr = arr.view(np.uint16)
        out[_path_str(path)] = arr
    return out


def arrays_to_pytree(template, arrays: Dict[str, np.ndarray]):
    """Restore a pytree structured like `template` from {path: array}."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = _path_str(path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf '{key}'")
        arr = arrays[key]
        want = np.asarray(leaf)
        if tuple(arr.shape) != tuple(want.shape):
            raise ValueError(
                f"checkpoint leaf '{key}' shape {arr.shape} != {want.shape}"
            )
        import ml_dtypes

        if want.dtype == ml_dtypes.bfloat16 and arr.dtype == np.uint16:
            arr = arr.view(ml_dtypes.bfloat16)
        leaves.append(jax.numpy.asarray(arr.astype(want.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_arrays(path: str, groups: Dict[str, Dict[str, np.ndarray]],
                meta: Optional[Dict[str, Any]] = None):
    """Write named groups of arrays + a JSON meta blob into one npz."""
    flat = {}
    for g, arrays in groups.items():
        for k, v in arrays.items():
            flat[f"{g}::{k}"] = v
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **flat)


def load_arrays(path: str):
    """Inverse of save_arrays -> (groups, meta)."""
    data = np.load(path, allow_pickle=False)
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    meta: Dict[str, Any] = {}
    for k in data.files:
        if k == "__meta__":
            meta = json.loads(bytes(data[k]).decode())
            continue
        g, leaf = k.split("::", 1)
        groups.setdefault(g, {})[leaf] = data[k]
    return groups, meta


# ---------------------------------------------------------------------------
# System-level checkpoints
# ---------------------------------------------------------------------------

def save_slam(path: str, slam) -> None:
    """Checkpoint a StereoSlam: map + tracker + host counters + trajectory."""
    groups = {
        "map": pytree_to_arrays(slam.map),
        "state": pytree_to_arrays(slam.state),
        "trajectory": {"stack": np.stack(slam.trajectory)
                       if slam.trajectory else np.zeros((0, 4, 4))},
    }
    meta = {
        "kind": "slam",
        "frame_id": slam.frame_id,
        "initialized": slam._initialized,
        "loop_events": slam.loop_events,
    }
    save_arrays(path, groups, meta)


def load_slam(path: str, slam) -> None:
    """Restore into an already-constructed StereoSlam of identical config."""
    groups, meta = load_arrays(path)
    assert meta.get("kind") == "slam", "not a slam checkpoint"
    slam.map = arrays_to_pytree(slam.map, groups["map"])
    slam.state = arrays_to_pytree(slam.state, groups["state"])
    slam.trajectory = [T for T in groups["trajectory"]["stack"]]
    slam.frame_id = int(meta["frame_id"])
    slam._initialized = bool(meta["initialized"])
    slam.loop_events = list(meta.get("loop_events", []))


def save_active_system(path: str, system) -> None:
    """Checkpoint an ActiveSlamSystem: SLAM + clouds + roadmap +
    exploration host state (goal, blacklist, diagnostics, overlay).

    Drains the async frame path first: keyframe events (cloud association,
    loop closing) fire for every dispatched frame and the device-side
    outs_log is materialized into slam.trajectory, so a restored mission
    keeps its full history. Per-frame clouds of frames that have not become
    keyframes by save time are dropped (they would only ever be associated
    to a future keyframe)."""
    ex = system.explorer
    if hasattr(system.slam, "poll_keyframe_events"):  # fake backends skip
        system.slam.poll_keyframe_events()
        system.slam.finalize()
        system._pending_cloud.clear()
    if getattr(system, "ekf", None) is not None:
        # fold buffered measurement rows into the filter states before
        # snapshotting — otherwise sensor data received since the last flush
        # is silently dropped from the checkpoint
        system.ekf.flush()
        system._ekf_dirty = False
    groups = {
        "map": pytree_to_arrays(system.slam.map),
        "state": pytree_to_arrays(system.slam.state),
        "clouds": pytree_to_arrays(system.clouds),
        "roadmap": pytree_to_arrays(ex.roadmap),
        "overlay": {"lethal": np.asarray(ex.lethal_overlay),
                    **({"wedge_age": np.asarray(ex.wedge_age)}
                       if hasattr(ex, "wedge_age") else {})},
        "anchor": (
            pytree_to_arrays(system.T_anchor)
            if system.T_anchor is not None else {}
        ),
        "trajectory": {"stack": np.stack(system.slam.trajectory)
                       if system.slam.trajectory else np.zeros((0, 4, 4))},
        "explore_np": {
            "blacklist": np.stack([ex._circle3(c) for c in ex.blacklist_xy])
            if ex.blacklist_xy else np.zeros((0, 3)),
            "trailing": np.stack(ex.trailing_poses)
            if ex.trailing_poses else np.zeros((0, 3)),
            "goal": np.asarray(ex._goal_xy)
            if ex._goal_xy is not None else np.zeros((0,)),
        },
    }
    if getattr(system, "ekf", None) is not None:
        groups["ekf_odom"] = pytree_to_arrays(system.ekf.odom_state)
        groups["ekf_map"] = pytree_to_arrays(system.ekf.map_state)
    meta = {
        "kind": "active_slam",
        "frame_id": system.slam.frame_id,
        "initialized": system.slam._initialized,
        "grid_dirty": system._grid_dirty,
        "state_enum": ex.state.value,
        "diag": vars(ex.diag),
        "search_radius": ex._search_radius,
        "goal_heading": ex._goal_heading,
        "goal_sent_tick": ex._goal_sent_tick,
        "goal_failures": {f"{k[0]},{k[1]}": v
                          for k, v in ex._goal_failures.items()},
        "fi_exhaustive_retry": ex._fi_exhaustive_retry,
        "fi_retries": ex._fi_retries,
        "fi_drop_count": ex._fi_drop_count,
        "recovery_ticks_left": ex._recovery_ticks_left,
        "has_anchor": system.T_anchor is not None,
    }
    save_arrays(path, groups, meta)


def load_active_system(path: str, system) -> None:
    from fitslam_tpu.models.exploration import ExplorationState

    groups, meta = load_arrays(path)
    assert meta.get("kind") == "active_slam", "not an active_slam checkpoint"
    ex = system.explorer
    system.slam.map = arrays_to_pytree(system.slam.map, groups["map"])
    system.slam.state = arrays_to_pytree(system.slam.state, groups["state"])
    system.slam.trajectory = [T for T in groups["trajectory"]["stack"]]
    system.slam.frame_id = int(meta["frame_id"])
    system.slam._initialized = bool(meta["initialized"])
    system.clouds = arrays_to_pytree(system.clouds, groups["clouds"])
    ex.roadmap = arrays_to_pytree(ex.roadmap, groups["roadmap"])
    ex.lethal_overlay = jax.numpy.asarray(groups["overlay"]["lethal"])
    if "wedge_age" in groups["overlay"]:   # pre-r05 checkpoints lack it
        ex.wedge_age = jax.numpy.asarray(groups["overlay"]["wedge_age"])
    if meta["has_anchor"]:
        from fitslam_tpu.ops import lie

        system.T_anchor = arrays_to_pytree(
            lie.SE3.identity(), groups["anchor"]
        )
    system._grid_dirty = True  # refuse stale grids: re-fuse on first read
    system._restitch = True    # running aggregates are not checkpointed
    enp = groups["explore_np"]
    ex.blacklist_xy = [b for b in enp["blacklist"]]
    ex.trailing_poses = [t for t in enp["trailing"]]
    ex._goal_xy = enp["goal"] if enp["goal"].shape == (2,) else None
    ex.state = ExplorationState(int(meta["state_enum"]))
    for k, v in meta["diag"].items():
        setattr(ex.diag, k, v)
    ex._search_radius = float(meta["search_radius"])
    ex._goal_heading = float(meta["goal_heading"])
    ex._goal_sent_tick = int(meta["goal_sent_tick"])
    if getattr(system, "ekf", None) is not None and "ekf_map" in groups:
        system.ekf.odom_state = arrays_to_pytree(system.ekf.odom_state,
                                                 groups["ekf_odom"])
        system.ekf.map_state = arrays_to_pytree(system.ekf.map_state,
                                                groups["ekf_map"])
        # drop rows buffered BEFORE the load: flushing stale pre-load sensor
        # data into the freshly restored filter states would corrupt them
        system.ekf._odom_rows.clear()
        system.ekf._map_rows.clear()
        system._ekf_dirty = False
        system._slam_fuse_counter = 1  # datum already seeded from checkpoint
    ex._goal_failures = {
        tuple(int(x) for x in k.split(",")): v
        for k, v in meta["goal_failures"].items()
    }
    ex._fi_exhaustive_retry = bool(meta["fi_exhaustive_retry"])
    ex._fi_retries = int(meta.get("fi_retries", 0))
    ex._fi_drop_count = int(meta.get("fi_drop_count", 0))
    ex._recovery_ticks_left = int(meta["recovery_ticks_left"])

import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models import costs as cx
from fitslam_tpu.models import roadmap as rmx
from fitslam_tpu.ops import frontier as fx
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.ops import lie

SPEC = gr.GridSpec2D(size=80, resolution=0.25, origin_x=-10.0, origin_y=-10.0)
F = 16


def _setup():
    """Free left half, unknown right half; roadmap chain along y=0."""
    G = SPEC.size
    occ = np.full((G, G), gr.UNKNOWN, np.uint8)
    occ[:, : G // 2] = gr.FREE
    occ_j = jnp.asarray(occ)

    rm = rmx.empty_roadmap(64)
    kf = lie.inverse(lie.SE3(jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
                             jnp.array([[-8.0, 0.0, 1.0], [0.0, 0.0, 1.0]])))
    xs = jnp.arange(-8.0, 0.5, 1.0)
    cand = jnp.stack([xs, jnp.zeros_like(xs)], axis=-1)
    rm = rmx.add_nodes(rm, cand, jnp.ones(xs.shape[0], bool), jnp.zeros(xs.shape[0], bool), kf, jnp.int32(2))
    rm = rmx.connect_edges(rm, SPEC, occ_j, max_edge_length=1.5)
    robot_dist, parent, src = rmx.shortest_paths(rm, jnp.array([-8.0, 0.0]))

    # frontiers: on the free/unknown boundary (x ~ -0.15) at different y —
    # real frontier cells sit on this edge, so their arrival sweep is nearly
    # all unknown and clears the static achievability floor
    goal = np.zeros((F, 2), np.float32)
    valid = np.zeros((F,), bool)
    for i, y in enumerate([-2.0, 0.0, 2.0]):
        goal[i] = [-0.15, y]
        valid[i] = True
    fr = fx.Frontiers(
        uid=jnp.arange(F, dtype=jnp.int32),
        goal_xy=jnp.asarray(goal),
        centroid_xy=jnp.asarray(goal),
        size=jnp.where(jnp.asarray(valid), 10, 0),
        valid=jnp.asarray(valid),
    )
    return occ_j, rm, robot_dist, fr


def test_assign_costs_basic():
    occ, rm, robot_dist, fr = _setup()
    c = cx.assign_costs(SPEC, occ, fr, rm.xy, rm.valid, robot_dist,
                        jnp.zeros((F,), bool))
    a = np.asarray(c.achievable)
    assert a[:3].all() and not a[3:].any()
    info = np.asarray(c.arrival_info)
    assert (info[:3] > 5).all()          # unknown-facing frontiers see unknown
    pl = np.asarray(c.path_length)
    assert np.isfinite(pl[:3]).all() and (pl[:3] > 5.0).all()
    w = np.asarray(c.weighted_cost)
    assert np.isfinite(w[:3]).all() and (w[3:] > 1e8).all()


def test_blacklist_excludes():
    occ, rm, robot_dist, fr = _setup()
    bl = jnp.zeros((F,), bool).at[0].set(True)
    c = cx.assign_costs(SPEC, occ, fr, rm.xy, rm.valid, robot_dist, bl)
    w = np.asarray(c.weighted_cost)
    assert w[0] > 1e8 and np.isfinite(w[1])


def test_select_locals_and_tsp():
    occ, rm, robot_dist, fr = _setup()
    c = cx.assign_costs(SPEC, occ, fr, rm.xy, rm.valid, robot_dist,
                        jnp.zeros((F,), bool))
    sel, sel_valid, g_idx = cx.select_locals(c, fr, jnp.zeros((F,), bool),
                                             local_path_threshold=20.0)
    assert int(sel_valid.sum()) == 3
    assert int(g_idx) == -1  # all within threshold -> no global

    # pairwise BF distances: rows = [robot, local0..local4]
    node_rows = [jnp.array([-8.0, 0.0])] + [fr.goal_xy[sel[i]] for i in range(cx.MAX_LOCAL)]
    dists = []
    for xy in node_rows:
        d, _, _ = rmx.shortest_paths(rm, xy)
        dists.append(d)
    pairwise = jnp.stack(dists)
    plan = cx.optimize_full_path(c, fr, jnp.zeros((F,), bool), pairwise,
                                 sel, sel_valid, jnp.int32(-1))
    assert bool(plan.has_goal)
    assert int(plan.n_local) == 3
    order = np.asarray(plan.order)
    assert (order[:3] >= 0).all() and (order[3:] == -1).all()
    assert np.isfinite(float(plan.total_length))


def test_achievability_floor_excludes_low_info():
    """A frontier with arrival info below factor_of_max_info x max is
    unachievable (reference CostCalculator.cpp:123-191)."""
    occ, rm, robot_dist, fr = _setup()
    # frontier 3: set back from the boundary inside the FREE half -> its
    # 2 m raycast sees only a thin unknown slice, so its arrival information
    # is positive but far below the boundary frontiers'
    goal = np.array(fr.goal_xy)
    goal[3] = [-1.8, 1.0]
    fr = fr._replace(
        goal_xy=jnp.asarray(goal),
        centroid_xy=jnp.asarray(goal),
        size=fr.size.at[3].set(10),
        valid=fr.valid.at[3].set(True),
    )
    c = cx.assign_costs(SPEC, occ, fr, rm.xy, rm.valid, robot_dist,
                        jnp.zeros((F,), bool))
    info = np.asarray(c.arrival_info)
    assert info[3] < 0.7 * info[:3].max()
    assert not bool(c.achievable[3])
    assert float(c.weighted_cost[3]) > 1e8
    assert bool(np.asarray(c.achievable)[:3].all())
    # the knob has effect: floor 0 re-admits the low-info frontier
    c0 = cx.assign_costs(SPEC, occ, fr, rm.xy, rm.valid, robot_dist,
                         jnp.zeros((F,), bool), factor_of_max_info=0.0)
    assert bool(c0.achievable[3])


def test_goal_hysteresis():
    robot = np.array([0.0, 0.0])
    prev = np.array([1.0, 0.0])
    # new goal slightly closer: keep previous
    g, ok = cx.goal_hysteresis(prev, np.array([0.9, 0.0]), True, True, robot, 3.0)
    assert ok and np.allclose(g, prev)
    # new goal much closer: switch
    g2, _ = cx.goal_hysteresis(np.array([8.0, 0.0]), np.array([1.0, 0.0]), True, True, robot, 3.0)
    assert np.allclose(g2, [1.0, 0.0])
    # no previous goal: take new
    g3, ok3 = cx.goal_hysteresis(None, np.array([2.0, 0.0]), False, True, robot, 3.0)
    assert ok3 and np.allclose(g3, [2.0, 0.0])


def test_closest_frontier_ablation():
    """ClosestFrontier baseline (CostCalculator.cpp:499-510): the weighted
    cost is pure Euclidean distance — the nearest achievable frontier wins
    regardless of information."""
    occ, rm, robot_dist, fr = _setup()
    robot = jnp.array([-0.5, 1.5], jnp.float32)  # nearest to frontier at y=2
    c = cx.assign_costs(SPEC, occ, fr, rm.xy, rm.valid, robot_dist,
                        jnp.zeros((F,), bool),
                        methods=("ClosestFrontier",), robot_xy=robot)
    w = np.asarray(c.weighted_cost)
    assert np.isfinite(w[:3]).all() and (w[3:] > 1e8).all()  # exclusions hold
    assert w[:3].argmin() == 2  # y=2 frontier is euclidean-closest
    d = np.linalg.norm(np.asarray(fr.goal_xy[2]) - np.asarray(robot))
    np.testing.assert_allclose(w[2], d, rtol=1e-5)


def test_random_costs_ablation():
    """RandomCosts baseline (CostCalculator.cpp:487-497): random costs per
    frontier, different across keys, exclusions still infinite."""
    occ, rm, robot_dist, fr = _setup()
    c1 = cx.assign_costs(SPEC, occ, fr, rm.xy, rm.valid, robot_dist,
                         jnp.zeros((F,), bool), methods=("RandomCosts",),
                         rng_key=jax.random.PRNGKey(1))
    c2 = cx.assign_costs(SPEC, occ, fr, rm.xy, rm.valid, robot_dist,
                         jnp.zeros((F,), bool), methods=("RandomCosts",),
                         rng_key=jax.random.PRNGKey(2))
    w1, w2 = np.asarray(c1.weighted_cost), np.asarray(c2.weighted_cost)
    assert np.isfinite(w1[:3]).all() and (w1[:3] >= 1.0).all()
    assert (w1[3:] > 1e8).all()
    assert not np.allclose(w1[:3], w2[:3])  # seeds differ -> costs differ

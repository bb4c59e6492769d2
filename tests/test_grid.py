import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.ops import grid as gr
from fitslam_tpu.ops import frontier as fr
from fitslam_tpu.ops import lie

SPEC = gr.GridSpec2D(size=80, resolution=0.25, origin_x=-10.0, origin_y=-10.0)


def _flat_ground_cloud(key, n=2048, extent=8.0, z=0.0, noise=0.01):
    xy = jax.random.uniform(key, (n, 2), minval=-extent, maxval=extent)
    zz = z + noise * jax.random.normal(jax.random.fold_in(key, 1), (n,))
    return jnp.concatenate([xy, zz[:, None]], axis=-1)


def _identity_pose_cam_down():
    """Camera frame == world frame for simplicity: store clouds in world."""
    return lie.SE3.identity((4,))


def test_flat_ground_is_free():
    buf = gr.empty_cloud_buffer(4, 2048)
    cloud = _flat_ground_cloud(jax.random.PRNGKey(0))
    buf = gr.add_cloud(buf, cloud, jnp.ones((2048,), bool), jnp.int32(0))
    g = gr.fuse_clouds(SPEC, buf, _identity_pose_cam_down())
    known = np.asarray(g.cost) != gr.UNKNOWN
    assert known.sum() > 400
    cost_known = np.asarray(g.cost)[known]
    assert (cost_known < 55).mean() > 0.95  # flat ground almost all traversable


def test_wall_is_lethal_and_inflated():
    buf = gr.empty_cloud_buffer(4, 4096)
    ground = _flat_ground_cloud(jax.random.PRNGKey(1), n=2048)
    # wall at x = 2: points from z=0..2
    key = jax.random.PRNGKey(2)
    wy = jax.random.uniform(key, (2048,), minval=-4.0, maxval=4.0)
    wz = jax.random.uniform(jax.random.fold_in(key, 1), (2048,), minval=0.0, maxval=2.0)
    wall = jnp.stack([jnp.full((2048,), 2.0), wy, wz], axis=-1)
    cloud = jnp.concatenate([ground, wall])
    buf = gr.add_cloud(buf, cloud, jnp.ones((4096,), bool), jnp.int32(0))
    g = gr.fuse_clouds(SPEC, buf, _identity_pose_cam_down())
    occ = np.asarray(gr.threshold_grid(g, 55))
    # wall cells lethal
    wall_cells = occ[np.asarray((SPEC.world_to_cell(wall[:, :2])[0][:, 1])),
                     np.asarray((SPEC.world_to_cell(wall[:, :2])[0][:, 0]))]
    assert (wall_cells == gr.LETHAL).mean() > 0.9
    # inflation: cells adjacent to the wall along x also lethal
    near = jnp.stack([jnp.full((64,), 1.7), jnp.linspace(-3, 3, 64)], axis=-1)
    nc, _ = SPEC.world_to_cell(near)
    near_cells = occ[np.asarray(nc[:, 1]), np.asarray(nc[:, 0])]
    known_near = near_cells != gr.UNKNOWN
    assert known_near.sum() > 10
    assert (near_cells[known_near] == gr.LETHAL).mean() > 0.8


def test_restitch_follows_pose_update():
    """Clouds stored in KF frame: moving the KF pose moves the fused map
    (loop-closure re-stitch capability, SURVEY.md §3.4)."""
    buf = gr.empty_cloud_buffer(2, 1024)
    cloud = _flat_ground_cloud(jax.random.PRNGKey(3), n=1024, extent=2.0)
    buf = gr.add_cloud(buf, cloud, jnp.ones((1024,), bool), jnp.int32(0))
    poses_a = lie.SE3.identity((2,))
    g_a = gr.fuse_clouds(SPEC, buf, poses_a)
    # shift KF0 by 2 m in x: T_cw = exp(-2ex) => T_wc = +2 in x
    T_shift = lie.se3_exp(jnp.tile(jnp.array([[-2.0, 0, 0, 0, 0, 0]]), (2, 1)))
    poses_b = lie.compose(T_shift, poses_a)
    g_b = gr.fuse_clouds(SPEC, buf, poses_b)
    ka = np.asarray(g_a.count > 0)
    kb = np.asarray(g_b.count > 0)
    # shifted by 2 m = 8 cells in +x (axis 1)
    np.testing.assert_array_equal(kb[:, 8:], ka[:, :-8])


def test_frontier_detection_ring():
    """Free disk inside unknown: frontier = ring at the disk boundary."""
    G = SPEC.size
    occ = np.full((G, G), gr.UNKNOWN, np.uint8)
    yy, xx = np.mgrid[0:G, 0:G]
    c = G // 2
    disk = (xx - c) ** 2 + (yy - c) ** 2 <= 12**2
    occ[disk] = gr.FREE
    f = fr.extract_frontiers(
        SPEC, jnp.asarray(occ), jnp.zeros((2,)), jnp.float32(20.0),
        max_cells=2048, max_frontiers=64, max_cluster_size=20,
    )
    assert int(f.valid.sum()) >= 4  # ring split into <=20-cell clusters
    # all goals lie near the disk boundary radius (12 cells = 3 m)
    goals = np.asarray(f.goal_xy[np.asarray(f.valid)])
    center_w = np.asarray(SPEC.cell_to_world(jnp.array([c, c])))
    r = np.linalg.norm(goals - center_w, axis=1)
    assert np.all(np.abs(r - 3.0) < 0.8), r
    # cluster size cap respected
    assert int(f.size.max()) <= 20


def test_frontier_blocked_by_lethal():
    G = SPEC.size
    occ = np.full((G, G), gr.UNKNOWN, np.uint8)
    c = G // 2
    occ[c - 10 : c + 10, c - 10 : c + 10] = gr.FREE
    # lethal wall fully wrapping the free square boundary
    occ[c - 11, c - 11 : c + 11] = gr.LETHAL
    occ[c + 10, c - 11 : c + 11] = gr.LETHAL
    occ[c - 11 : c + 11, c - 11] = gr.LETHAL
    occ[c - 11 : c + 11, c + 10] = gr.LETHAL
    f = fr.extract_frontiers(
        SPEC, jnp.asarray(occ), jnp.zeros((2,)), jnp.float32(20.0),
        max_cells=2048, max_frontiers=64,
    )
    assert int(f.valid.sum()) == 0  # no frontier across a lethal boundary


def test_frontier_radius_limit():
    G = SPEC.size
    occ = np.full((G, G), gr.UNKNOWN, np.uint8)
    occ[: G // 2, :] = gr.FREE  # frontier row at y = G//2 boundary
    robot = jnp.asarray(SPEC.cell_to_world(jnp.array([G // 2, G // 2])))
    f_small = fr.extract_frontiers(SPEC, jnp.asarray(occ), robot, jnp.float32(1.0),
                                   max_cells=2048, max_frontiers=64)
    f_large = fr.extract_frontiers(SPEC, jnp.asarray(occ), robot, jnp.float32(8.0),
                                   max_cells=2048, max_frontiers=64)
    assert int(f_small.size.sum()) < int(f_large.size.sum())


def test_frontier_all_cells_sweep():
    """E18 FrontierSearchAllCells: frontiers found on the full map with no
    radius limit, including ones far from any query point."""
    from fitslam_tpu.ops import frontier as fx

    G = 64
    occ = np.full((G, G), gr.UNKNOWN, np.uint8)
    occ[4:12, 4:12] = gr.FREE          # a known pocket far from center
    occ[50:60, 50:60] = gr.FREE        # and another in the opposite corner
    spec = gr.GridSpec2D(size=G, resolution=0.25, origin_x=-8.0, origin_y=-8.0)
    fr = fx.extract_frontiers_all_cells(spec, jnp.asarray(occ), max_frontiers=64)
    assert int(fr.valid.sum()) >= 2
    xs = np.asarray(fr.goal_xy)[np.asarray(fr.valid)]
    # frontiers exist around both pockets (opposite map corners)
    assert xs[:, 0].min() < -4.0 and xs[:, 0].max() > 3.0


# ---------------------------------------------------------------------------
# Boundary polygon (SURVEY.md §2.3 E7: UpdateBoundaryPolygon)
# ---------------------------------------------------------------------------


def test_polygon_mask_square():
    from fitslam_tpu.ops import frontier as fx
    spec = gr.GridSpec2D(size=40, resolution=0.5, origin_x=-10.0, origin_y=-10.0)
    verts = jnp.array([[-5.0, -5.0], [5.0, -5.0], [5.0, 5.0], [-5.0, 5.0]])
    m = np.asarray(fx.polygon_mask(spec, verts))
    # inside
    cy, cx = 20, 20  # world (0.25, 0.25)
    assert m[cy, cx]
    # outside corners
    assert not m[0, 0] and not m[-1, -1]
    # area ~ (10/0.5)^2 = 400 cells
    assert abs(int(m.sum()) - 400) <= 42


def test_polygon_mask_concave():
    from fitslam_tpu.ops import frontier as fx
    spec = gr.GridSpec2D(size=40, resolution=0.5, origin_x=-10.0, origin_y=-10.0)
    # L-shape: notch cut out of the upper-right quadrant
    verts = jnp.array([
        [-8.0, -8.0], [8.0, -8.0], [8.0, 0.0], [0.0, 0.0], [0.0, 8.0],
        [-8.0, 8.0],
    ])
    m = np.asarray(fx.polygon_mask(spec, verts))
    # point in the notch (upper right) is outside
    cell_in_notch = spec.world_to_cell(jnp.array([4.0, 4.0]))[0]
    assert not m[int(cell_in_notch[1]), int(cell_in_notch[0])]
    cell_inside = spec.world_to_cell(jnp.array([-4.0, 4.0]))[0]
    assert m[int(cell_inside[1]), int(cell_inside[0])]


def test_extract_frontiers_respects_boundary():
    from fitslam_tpu.ops import frontier as fx
    spec = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)
    occ = np.full((64, 64), gr.UNKNOWN, np.uint8)
    occ[24:40, 24:40] = gr.FREE  # free block around origin => frontier ring
    occ_j = jnp.asarray(occ)
    robot = jnp.array([0.0, 0.0])
    fr_all = fx.extract_frontiers(spec, occ_j, robot, jnp.float32(20.0))
    assert int(fr_all.valid.sum()) > 0
    # boundary polygon covering only the left half-plane
    verts = jnp.array([[-8.0, -8.0], [0.0, -8.0], [0.0, 8.0], [-8.0, 8.0]])
    bnd = fx.polygon_mask(spec, verts)
    fr_b = fx.extract_frontiers(spec, occ_j, robot, jnp.float32(20.0),
                                boundary=bnd)
    goals = np.asarray(fr_b.goal_xy)[np.asarray(fr_b.valid)]
    assert len(goals) > 0
    assert (goals[:, 0] <= 0.0 + 0.25).all()  # all goals in the left half


# ---------------------------------------------------------------------------
# Costmap layers (N4): inflation, rolling window, resampling
# ---------------------------------------------------------------------------


def _grid_with_wall():
    """16x16 free grid with a lethal column at x-cell 8, some unknown."""
    occ = np.zeros((16, 16), np.uint8)
    occ[:, 8] = gr.LETHAL
    occ[0, :] = gr.UNKNOWN
    return jnp.asarray(occ)


def test_distance_to_lethal_chamfer():
    spec = gr.GridSpec2D(size=16, resolution=0.5, origin_x=0.0, origin_y=0.0)
    occ = _grid_with_wall()
    d = np.asarray(gr.distance_to_lethal(occ, spec.resolution, 3.0))
    assert d[5, 8] == 0.0
    np.testing.assert_allclose(d[5, 7], 0.5)
    np.testing.assert_allclose(d[5, 6], 1.0)
    # diagonal metric: one row off, one col off = res * sqrt2
    np.testing.assert_allclose(d[4, 7], 0.5, atol=1e-5)  # axial to (4,8)


def test_inflate_grid_nav2_profile():
    spec = gr.GridSpec2D(size=16, resolution=0.5, origin_x=0.0, origin_y=0.0)
    occ = _grid_with_wall()
    out = np.asarray(gr.inflate_grid(
        occ, spec.resolution, inflation_radius_m=2.0,
        cost_scaling_factor=0.6, inscribed_radius_m=0.5,
    ))
    # lethal preserved; unknown preserved
    assert (out[1:, 8] == gr.LETHAL).all()
    assert (out[0, :] == gr.UNKNOWN).all()
    # inscribed ring (d <= 0.5) = INSCRIBED
    assert out[5, 7] == gr.INSCRIBED
    # exponential decay beyond the inscribed radius, monotone in distance
    assert gr.INSCRIBED > out[5, 6] > out[5, 5] > out[5, 4]
    expected = round(252 * np.exp(-0.6 * (1.0 - 0.5)))
    assert out[5, 6] == expected
    # beyond the inflation radius untouched
    assert out[5, 1] == 0


def test_inflation_radius_is_per_costmap():
    """Two instances with different radii produce different footprints —
    the per-costmap inflation the reference configures (N4)."""
    spec = gr.GridSpec2D(size=16, resolution=0.5, origin_x=0.0, origin_y=0.0)
    occ = _grid_with_wall()
    small = np.asarray(gr.inflate_grid(occ, 0.5, inflation_radius_m=0.6))
    big = np.asarray(gr.inflate_grid(occ, 0.5, inflation_radius_m=4.0))
    assert small[5, 6] == 0 or small[5, 6] < big[5, 6]
    assert big[5, 2] > 0
    assert small[5, 2] == 0


def test_rolling_window_extraction():
    spec = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)
    occ = jnp.arange(64 * 64, dtype=jnp.int32).astype(jnp.uint8).reshape(64, 64)
    local, lspec = gr.rolling_window(spec, occ, np.array([0.0, 0.0]), 4.0)
    assert local.shape == (16, 16)
    assert lspec.size == 16 and lspec.resolution == 0.25
    # window is centered: its origin is 2 m left/below center
    np.testing.assert_allclose([lspec.origin_x, lspec.origin_y], [-2.0, -2.0])
    # the same world point reads the same cell through either spec
    p = jnp.array([0.6, -0.9])
    cg, _ = spec.world_to_cell(p)
    cl, okl = lspec.world_to_cell(p)
    assert bool(okl)
    assert int(occ[cg[1], cg[0]]) == int(local[cl[1], cl[0]])
    # clipping at the map edge
    local2, lspec2 = gr.rolling_window(spec, occ, np.array([-7.9, -7.9]), 4.0)
    np.testing.assert_allclose([lspec2.origin_x, lspec2.origin_y], [-8.0, -8.0])


def test_resample_grids():
    occ = np.zeros((8, 8), np.uint8)
    occ[2, 2] = gr.LETHAL
    occ[4:6, 4:6] = gr.UNKNOWN
    up = np.asarray(gr.upsample_grid(jnp.asarray(occ), 2))
    assert up.shape == (16, 16)
    assert (up[4:6, 4:6] == gr.LETHAL).all()
    down = np.asarray(gr.downsample_grid_max(jnp.asarray(occ), 2))
    assert down.shape == (4, 4)
    assert down[1, 1] == gr.LETHAL       # lethal wins in its block
    assert down[2, 2] == gr.UNKNOWN      # all-unknown block stays unknown
    assert down[0, 0] == 0               # free block stays free


def test_wall_does_not_poison_adjacent_floor_slope():
    """Regression: slope computed on mean-pooled elevation smeared a 2 m
    wall's height onto neighboring FLAT floor cells (slope 1.3-2.1 >> the
    0.7 lethal threshold), painting a phantom lethal skirt around every
    wall that sealed doorways. The ground surface (min-pooled z_min) must
    classify flat floor next to a wall as non-lethal-by-slope; the wall
    itself stays lethal via the step test, and only the intended
    security-distance inflation may mark the skirt."""
    key = jax.random.PRNGKey(7)
    n = 4096
    # flat floor covering [-6, 6]^2 ...
    floor = _flat_ground_cloud(key, n=n, extent=6.0, z=0.0, noise=0.01)
    # ... plus a dense vertical wall along x = 0 (z up to 2 m)
    wy = jax.random.uniform(jax.random.fold_in(key, 2), (1024,),
                            minval=-6.0, maxval=6.0)
    wz = jax.random.uniform(jax.random.fold_in(key, 3), (1024,),
                            minval=0.0, maxval=2.0)
    wall = jnp.stack([jnp.zeros((1024,)), wy, wz], axis=-1)
    buf = gr.empty_cloud_buffer(4, n)
    buf = gr.add_cloud(buf, floor, jnp.ones((n,), bool), jnp.int32(0))
    wall_pad = jnp.concatenate(
        [wall, jnp.zeros((n - 1024, 3))], axis=0)
    wall_valid = jnp.arange(n) < 1024
    buf = gr.add_cloud(buf, wall_pad, wall_valid, jnp.int32(1))
    g = gr.fuse_clouds(SPEC, buf, _identity_pose_cam_down(),
                       security_distance=0.0)  # isolate classification
    cost = np.asarray(g.cost)
    slope = np.asarray(g.slope)
    known = np.asarray(g.count) > 0

    # the wall column itself must be lethal
    wall_col = int((0.0 - SPEC.origin_x) / SPEC.resolution)
    wall_rows = known[:, wall_col]
    assert (cost[:, wall_col][wall_rows] >= gr.LETHAL).mean() > 0.8

    # floor cells 2+ cells away from the wall: no slope-lethal allowed
    floor_mask = known.copy()
    floor_mask[:, max(0, wall_col - 2):wall_col + 3] = False
    assert floor_mask.sum() > 300
    assert (slope[floor_mask] > 0.7).sum() == 0
    lethal_floor = (cost[floor_mask] >= gr.LETHAL) & (cost[floor_mask] != gr.UNKNOWN)
    assert lethal_floor.mean() < 0.02

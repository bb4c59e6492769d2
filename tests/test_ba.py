import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.data import synthetic
from fitslam_tpu.ops import ba, lie
from fitslam_tpu.ops.geometry import Intrinsics

K = Intrinsics(
    fx=jnp.float32(320.0), fy=jnp.float32(320.0),
    cx=jnp.float32(320.0), cy=jnp.float32(240.0),
    baseline=jnp.float32(0.12),
)


def test_jacobians_match_autodiff():
    key = jax.random.PRNGKey(0)
    T = lie.se3_exp(0.2 * jax.random.normal(key, (6,)))
    p_w = jnp.array([0.5, -0.3, 4.0])
    uvr = jnp.array([300.0, 250.0, 290.0])

    res, J_pose, J_point, _ = ba._residual_and_jac(K, T, p_w, uvr, jnp.bool_(True))

    def res_of_xi(xi):
        T2 = lie.compose(lie.se3_exp(xi), T)
        r, *_ = ba._residual_and_jac(K, T2, p_w, uvr, jnp.bool_(True))
        return r

    def res_of_p(p):
        r, *_ = ba._residual_and_jac(K, T, p, uvr, jnp.bool_(True))
        return r

    J_pose_ad = jax.jacfwd(res_of_xi)(jnp.zeros(6))
    J_point_ad = jax.jacfwd(res_of_p)(p_w)
    np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_pose_ad), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(J_point), np.asarray(J_point_ad), rtol=1e-3, atol=1e-3)


def _make_problem(key, n_kf=4, n_lm=256, n_obs=1024, noise_px=0.4,
                  pose_noise=0.05, point_noise=0.05):
    """Ground-truth world + perturbed initialization."""
    kw, kt, ko, kp, kq = jax.random.split(key, 5)
    world = synthetic.make_landmark_field(kw, n_lm, extent_xy=8.0, z_range=(0.0, 3.0))
    # cameras look at the field from y = -12
    x = jnp.linspace(-3.0, 3.0, n_kf)
    t_wc = jnp.stack([x, jnp.full_like(x, -12.0), jnp.full_like(x, 1.5)], axis=-1)
    fwd = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (n_kf, 3))
    down = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (n_kf, 3))
    right = jnp.cross(down, fwd)
    T_wc = lie.SE3(jnp.stack([right, down, fwd], axis=-1), t_wc)
    T_cw_gt = lie.inverse(T_wc)

    # observations: random (kf, lm) pairs
    kf_idx = jax.random.randint(ko, (n_obs,), 0, n_kf)
    lm_idx = jax.random.randint(jax.random.fold_in(ko, 1), (n_obs,), 0, n_lm)
    T_sel = lie.SE3(T_cw_gt.R[kf_idx], T_cw_gt.t[kf_idx])
    p_c = lie.apply(T_sel, world.landmarks[lm_idx])
    from fitslam_tpu.ops.geometry import project_stereo

    uvr, ok = project_stereo(K, p_c)
    vis = ok & (p_c[..., 2] > 0.5) & (p_c[..., 2] < 20.0)
    uvr = uvr + noise_px * jax.random.normal(kq, uvr.shape)
    obs = ba.Observations(
        kf=kf_idx.astype(jnp.int32),
        lm=lm_idx.astype(jnp.int32),
        uvr=uvr,
        sigma2=jnp.full((n_obs,), noise_px**2 + 0.25),
        valid=vis,
    )

    # perturb everything except kf 0 (gauge)
    dT = lie.se3_exp(pose_noise * jax.random.normal(kt, (n_kf, 6)))
    T_cw_init = lie.compose(dT, T_cw_gt)
    T_cw_init = jax.tree.map(
        lambda init, gt: init.at[0].set(gt[0]), T_cw_init, T_cw_gt
    )
    pts_init = world.landmarks + point_noise * jax.random.normal(kp, world.landmarks.shape)
    fixed_kf = jnp.zeros((n_kf,), bool).at[0].set(True)
    fixed_lm = jnp.zeros((n_lm,), bool)
    prob = ba.BAProblem(T_cw_init, pts_init, obs, fixed_kf, fixed_lm)
    return prob, T_cw_gt, world.landmarks


def test_bundle_adjust_converges():
    prob, T_gt, pts_gt = _make_problem(jax.random.PRNGKey(1))
    out, stats = ba.bundle_adjust(K, prob, iters=8, damping=1e-3)
    chi2 = np.asarray(stats.chi2)
    # stats.chi2[0] is already post-first-step; monotone non-increasing overall
    assert chi2[-1] < chi2[0] * 0.5, chi2
    assert np.all(np.diff(chi2) <= 1e-3), chi2
    # pose error vs ground truth (first kf is gauge-fixed)
    err = np.asarray(jnp.linalg.norm(lie.se3_log(lie.compose(out.T_cw, lie.inverse(T_gt))), axis=-1))
    init_err = np.asarray(jnp.linalg.norm(lie.se3_log(lie.compose(prob.T_cw, lie.inverse(T_gt))), axis=-1))
    assert err[1:].max() < 0.02, (init_err, err)
    assert err[1:].max() < init_err[1:].max() * 0.5


def test_fixed_keyframe_does_not_move():
    prob, _, _ = _make_problem(jax.random.PRNGKey(2))
    out, _ = ba.bundle_adjust(K, prob, iters=4, damping=1e-3)
    np.testing.assert_allclose(np.asarray(out.T_cw.t[0]), np.asarray(prob.T_cw.t[0]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.T_cw.R[0]), np.asarray(prob.T_cw.R[0]), atol=1e-7)


def test_invalid_observations_are_inert():
    prob, _, _ = _make_problem(jax.random.PRNGKey(3), n_obs=512)
    # clone with 256 extra garbage observations, all invalid
    obs = prob.obs
    pad = ba.Observations(
        kf=jnp.zeros((256,), jnp.int32),
        lm=jnp.zeros((256,), jnp.int32),
        uvr=jnp.full((256, 3), 1e6),
        sigma2=jnp.ones((256,)),
        valid=jnp.zeros((256,), bool),
    )
    obs2 = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), obs, pad)
    prob2 = prob._replace(obs=obs2)
    out1, _ = ba.bundle_adjust(K, prob, iters=4, damping=1e-3)
    out2, _ = ba.bundle_adjust(K, prob2, iters=4, damping=1e-3)
    np.testing.assert_allclose(np.asarray(out1.T_cw.t), np.asarray(out2.T_cw.t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.points), np.asarray(out2.points), atol=1e-5)


def test_solve_pose_recovers_pose():
    key = jax.random.PRNGKey(4)
    kw, kn, kp = jax.random.split(key, 3)
    world = synthetic.make_landmark_field(kw, 256, extent_xy=6.0, z_range=(0.0, 3.0))
    t_wc = jnp.array([0.0, -10.0, 1.5])
    fwd = jnp.array([0.0, 1.0, 0.0]); down = jnp.array([0.0, 0.0, -1.0])
    R_wc = jnp.stack([jnp.cross(down, fwd), down, fwd], axis=-1)
    T_cw_gt = lie.inverse(lie.SE3(R_wc, t_wc))
    p_c = lie.apply(T_cw_gt, world.landmarks)
    from fitslam_tpu.ops.geometry import project_stereo

    uvr, ok = project_stereo(K, p_c)
    vis = ok & (p_c[..., 2] > 0.5)
    uvr = uvr + 0.3 * jax.random.normal(kn, uvr.shape)

    T0 = lie.compose(lie.se3_exp(jnp.asarray([0.1, -0.1, 0.05, 0.03, -0.02, 0.04])), T_cw_gt)
    T_est, inliers, chi2 = ba.solve_pose(
        K, T0, world.landmarks, uvr, jnp.full((256,), 0.5), vis, iters=10
    )
    err = float(jnp.linalg.norm(lie.se3_log(lie.compose(T_est, lie.inverse(T_cw_gt)))))
    assert err < 5e-3, err
    assert int(inliers.sum()) > 100

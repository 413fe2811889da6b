"""Adopt the remaining reference task assets (round-3 verdict item 5), the
way scripts/adopt_goals.py adopted the goal clouds:

- **fold_tshirt cloth mask** from the reference's t-shirt image
  (fold_cloth_tshirt_env.py:51-71: cv2 resize to N/2, rotate 90 CW,
  threshold channel-sum < 100, center on the N-grid). cv2 is not installed
  here; the resize is reimplemented with cv2's exact INTER_LINEAR
  convention (half-pixel centers, round-half-away for uint8) — verified by
  the particle count matching the reference's recorded goal cloud exactly
  (3573 = goals/fold_tshirt/goal.npy rows).
- **pour_soup vegetable point cloud** from the reference's .pcd model
  (pour_soup_env.py:152-160: open3d read_point_cloud + voxel_down_sample
  (0.5) + center/scale by 400). The binary PCD is parsed directly; the
  voxel downsample averages points per occupied voxel like open3d, ordered
  by first occurrence in file order (open3d's hash-map order is
  implementation-defined; this choice is deterministic — positions as a
  set and the count (4131) match).

Writes unidom_tpu/assets/{tshirt_mask.npy,pour_soup_veg.npy}; both are
committed so the envs never depend on /root/reference at runtime.
"""

import os

import numpy as np

REF = "/root/reference/DaXBench/daxbench/core"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "unidom_tpu", "assets")


def cv2_resize_bilinear(img, dsize):
    """cv2.resize(..., interpolation=INTER_LINEAR) for uint8 HxWxC."""
    h, w = img.shape[:2]
    dw, dh = dsize
    sx, sy = w / dw, h / dh
    xs = (np.arange(dw) + 0.5) * sx - 0.5
    ys = (np.arange(dh) + 0.5) * sy - 0.5
    x0 = np.floor(xs).astype(int)
    y0 = np.floor(ys).astype(int)
    fx = xs - x0
    fy = ys - y0
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    fx = np.where(x0 < 0, 0.0, fx)
    fx = np.where(x0 + 1 > w - 1, 0.0, fx)
    fy = np.where(y0 < 0, 0.0, fy)
    fy = np.where(y0 + 1 > h - 1, 0.0, fy)
    im = img.astype(np.float64)
    a = im[y0c][:, x0c]
    b = im[y0c][:, x1c]
    c = im[y1c][:, x0c]
    d = im[y1c][:, x1c]
    fy_ = fy[:, None, None]
    fx_ = fx[None, :, None]
    out = (a * (1 - fx_) + b * fx_) * (1 - fy_) + (c * (1 - fx_) + d * fx_) * fy_
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def adopt_tshirt_mask(N=180):
    import imageio.v2 as imageio

    img = imageio.imread(f"{REF}/envs/others/t-shirt.jpg")
    size = N // 2
    h_size = size // 2
    r = cv2_resize_bilinear(img, (size, size))
    rot = np.rot90(r, k=-1, axes=(0, 1)).copy()  # cv2.ROTATE_90_CLOCKWISE
    m = (rot.astype(np.int64).sum(-1) < 100).astype(np.float32)
    mask = np.zeros((N, N), dtype=np.float32)
    c = N // 2
    mask[c - h_size : c + h_size, c - h_size : c + h_size] = m

    goal = np.load(f"{REF}/envs/goals/fold_tshirt/goal.npy")
    n = int(mask.sum())
    assert n == goal.shape[0], (n, goal.shape)
    np.save(os.path.join(OUT, "tshirt_mask.npy"), mask)
    print(f"tshirt_mask.npy: {mask.shape}, {n} particles (= goal rows)")


def adopt_pour_soup_veg():
    path = f"{REF}/engine/pyrender/models/veg/model.pcd"
    raw = open(path, "rb").read()
    hdr = raw[: raw.index(b"DATA binary\n")].decode()
    n_points = int([l for l in hdr.splitlines() if l.startswith("POINTS")][0].split()[1])
    dt = np.dtype([
        ("rgb", "<f4"), ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
        ("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("_", "u1", 4),
    ])
    start = raw.index(b"DATA binary\n") + len(b"DATA binary\n")
    arr = np.frombuffer(raw[start:], dtype=dt, count=n_points)
    pts = np.stack([arr["x"], arr["y"], arr["z"]], -1).astype(np.float64)

    # open3d voxel_down_sample(0.5): mean of points per occupied voxel
    vox = np.floor((pts - pts.min(0)) / 0.5).astype(np.int64)
    key = (vox[:, 0] << 42) + (vox[:, 1] << 21) + vox[:, 2]
    uniq, first_idx, inv = np.unique(key, return_index=True, return_inverse=True)
    counts = np.bincount(inv)
    means = np.stack(
        [np.bincount(inv, weights=pts[:, d]) / counts for d in range(3)], -1
    )
    means = means[np.argsort(first_idx)]  # first-occurrence order

    out = (means - means.mean(0)) / 400.0 + np.array([0.55, 0.2, 0.5])
    np.save(os.path.join(OUT, "pour_soup_veg.npy"), out.astype(np.float32))
    print(f"pour_soup_veg.npy: {out.shape} from {n_points} raw points")


if __name__ == "__main__":
    adopt_tshirt_mask()
    adopt_pour_soup_veg()

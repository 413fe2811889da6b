"""Robot-side perception utilities: point-cloud -> heightmap, frame
transforms, NaN repair, color segmentation, action rescaling.

Reference: DaXBench/exp/robot_utils.py (heightmap projection :50-110, pc
cleanup :112-130, workspace action mapping :131-183, HSV rope/bean
segmentation :184-250). Pure numpy — these run on the robot host next to
the camera driver, not on the accelerator.
"""

import numpy as np


def transform_to_base(xyz, tf_mat):
    """Apply a 4x4 homogeneous transform to (N, 3) camera-frame points
    (robot_utils.py:26-34)."""
    xyz = np.asarray(xyz)
    hom = np.concatenate([xyz, np.ones((len(xyz), 1))], axis=1)
    return (hom @ np.asarray(tf_mat).T)[:, :3]


def remove_nan(pc):
    """Drop NaN points (robot_utils.py:124-129)."""
    pc = np.asarray(pc)
    return pc[np.isfinite(pc).all(axis=1)]


def fill_missing(pc):
    """Replace NaN points with the nearest preceding valid point
    (robot_utils.py:112-122 semantics: forward-fill)."""
    pc = np.asarray(pc).copy()
    bad = ~np.isfinite(pc).all(axis=1)
    last = None
    for i in range(len(pc)):
        if bad[i]:
            if last is not None:
                pc[i] = last
        else:
            last = pc[i]
    if bad.any() and last is not None:
        # leading NaNs: backfill with the first valid point
        first_valid = pc[~bad][0] if (~bad).any() else np.zeros(3)
        pc[bad & (np.arange(len(pc)) < np.argmax(~bad))] = first_valid
    return pc


def get_heightmap(xyz, bounds=((0.0, 1.0), (0.0, 1.0)), grid_size=0.003125,
                  rgb=None):
    """Top-down heightmap (and optional colormap) from base-frame points
    (robot_utils.py:50-110). Returns (H, W) height image [+ (H, W, 3) rgb]."""
    xyz = remove_nan(xyz)
    (x0, x1), (z0, z1) = bounds
    W = int(round((x1 - x0) / grid_size))
    H = int(round((z1 - z0) / grid_size))
    px = np.clip(((xyz[:, 0] - x0) / grid_size).astype(int), 0, W - 1)
    pz = np.clip(((xyz[:, 2] - z0) / grid_size).astype(int), 0, H - 1)
    order = np.argsort(xyz[:, 1])  # highest point wins
    hm = np.zeros((H, W), np.float32)
    hm[pz[order], px[order]] = xyz[order, 1]
    if rgb is not None:
        rgb = np.asarray(rgb).reshape(-1, 3)[np.isfinite(np.asarray(xyz)).all(axis=1)] \
            if rgb.shape[0] != len(xyz) else np.asarray(rgb)
        cm = np.zeros((H, W, 3), rgb.dtype)
        cm[pz[order], px[order]] = rgb[order]
        return hm, cm
    return hm


def segment_by_color(rgb_image, lo, hi):
    """Binary mask of pixels inside an RGB box — the primitive behind the
    rope/bean segmenters (robot_utils.py:184-250)."""
    img = np.asarray(rgb_image)
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    return np.all((img >= lo) & (img <= hi), axis=-1)


def rescale_action_to_workspace(action, sim_bounds=((0, 1), (0, 1)),
                                ws_bounds=((0.2, 0.6), (-0.3, 0.3))):
    """Map a sim pick/place action (6,) into robot workspace coordinates
    (robot_utils.py:131-183 get_executable_actions semantics)."""
    action = np.asarray(action, np.float64).copy()
    for (lo_s, hi_s), (lo_w, hi_w), idx in zip(
        sim_bounds * 1, ws_bounds * 1, ((0, 3), (2, 5))
    ):
        for i in idx:
            action[i] = (action[i] - lo_s) / (hi_s - lo_s) * (hi_w - lo_w) + lo_w
    return action

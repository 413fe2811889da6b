"""Interactive expert UI: click-to-act projection maps and keyboard teleop.

Reference: DaXBench/daxbench/core/utils/util.py:8-125 (OpenCV windows where
a human clicks pick/place points on a top-down projection; whip_rope's
keyboard control pad, whip_rope_env.py:186-210). Headless-safe: everything
that needs a display is gated behind ``interactive=True``; the projection
helpers are pure numpy and power goals/demos either way.
"""

import numpy as np

try:
    import cv2

    HAVE_CV2 = True
except Exception:  # pragma: no cover
    HAVE_CV2 = False


def get_projection(x, size=64):
    """Binary top-down occupancy maps for a batch of point clouds.
    x: (B, N, 3) -> (B, size, size) float32."""
    x = np.clip(np.asarray(x), 0.0, 1.0)
    ij = (x[..., [0, 2]] * size).astype(np.int32)
    ij = np.clip(ij, 0, size - 1)
    maps = np.zeros((x.shape[0], size, size), np.float32)
    for b in range(x.shape[0]):
        maps[b, ij[b, :, 1], ij[b, :, 0]] = 1.0
    return maps


def get_expert_start_end(colormap, bounds=((0, 1), (0, 1))):
    """Blocking click-to-act: two clicks -> (B, 6) [start, 0, end, 0] action
    (util.py:61-110). Requires a display."""
    assert HAVE_CV2, "cv2 unavailable"
    batch_size = colormap.shape[0]
    img = colormap[0]
    clicks = []

    def on_mouse(event, x, y, flags, _):
        if event == cv2.EVENT_LBUTTONDOWN:
            cv2.circle(img, (x, y), 3, (255, 0, 0), 2)
            clicks.append((float(x), float(y)))

    cv2.namedWindow("image")
    cv2.setMouseCallback("image", on_mouse, img)
    while len(clicks) < 2:
        cv2.imshow("image", img)
        if cv2.waitKey(10) & 0xFF == ord("q"):
            break

    (x0, y0), (x1, y1) = clicks[0], clicks[1]
    h, w = img.shape[:2]
    sx = x0 / w * (bounds[0][1] - bounds[0][0]) + bounds[0][0]
    sy = y0 / h * (bounds[1][1] - bounds[1][0]) + bounds[1][0]
    ex = x1 / w * (bounds[0][1] - bounds[0][0]) + bounds[0][0]
    ey = y1 / h * (bounds[1][1] - bounds[1][0]) + bounds[1][0]
    action = np.array([sx, 0.0, sy, ex, 0.0, ey], np.float32)
    return np.repeat(action[None], batch_size, axis=0)


def get_expert_start_end_cloth(x_grid, cloth_mask, goal_map=None, size=512):
    mask = np.asarray(cloth_mask) > 0
    pts = np.asarray(x_grid)[:, mask]
    cm = get_projection(pts, size)
    if goal_map is not None:
        cm = cm + np.asarray(goal_map) * 0.3
    return get_expert_start_end(cm)


def get_expert_start_end_mpm(x, size=512, goal_map=None):
    cm = get_projection(np.asarray(x), size)
    if goal_map is not None:
        cm = cm + np.asarray(goal_map) * 0.5
    return get_expert_start_end(cm)


# keyboard control pad (whip_rope_env.py:186-210)
_KEYMAP = {
    119: np.array([-1.0, 0, 0, 0, 0, 0]),  # w
    115: np.array([1.0, 0, 0, 0, 0, 0]),   # s
    97: np.array([0, 0, -1.0, 0, 0, 0]),   # a
    100: np.array([0, 0, 1.0, 0, 0, 0]),   # d
    225: np.array([0, -1.0, 0, 0, 0, 0]),  # shift
    9: np.array([0, 1.0, 0, 0, 0, 0]),     # tab
}


def get_keyboard_action(window="control pad"):
    """Blocking one-key teleop action; None on Enter."""
    assert HAVE_CV2, "cv2 unavailable"
    cv2.imshow(window, np.zeros((100, 100, 3), np.uint8))
    k = cv2.waitKey(0) & 0xFF
    if k == 13:
        return None
    return _KEYMAP.get(k, np.zeros(6)).astype(np.float32)

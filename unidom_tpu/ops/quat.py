"""Quaternion math for rigid-primitive kinematics.

Convention: quaternions are ``[w, x, y, z]`` with unit norm. Everything is
batched-friendly pure jnp (reference semantics:
DaXBench/daxbench/core/engine/primitives/primitives.py:73-109).
"""

import jax.numpy as jnp


def qmul(q, r):
    """Hamilton product q*r, renormalized to guard against drift."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    out = jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )
    norm = jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))
    return out / jnp.clip(norm, 1e-12, jnp.inf)


def w2quat(axis_angle):
    """Axis-angle (3,) -> unit quaternion, safe at zero rotation."""
    w = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True) + 1e-12
    v = (axis_angle / w) * jnp.sin(w / 2.0)
    return jnp.concatenate([jnp.cos(w / 2.0), v], axis=-1)


def qinv(q):
    """Conjugate of a unit quaternion (renormalized)."""
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    norm = jnp.linalg.norm(conj, axis=-1, keepdims=True) + 1e-12
    return conj / norm


def qrot(q, v):
    """Rotate vectors v (..., 3) by a single quaternion q (4,)."""
    qvec = q[..., 1:4]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., 0:1] * uv + uuv)


def qrot_inv(q, v):
    """Rotate v by the inverse of q."""
    return qrot(qinv(q), v)

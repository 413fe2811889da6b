"""Point-cloud ops for PointNet++: farthest-point sampling, ball query,
grouping, three-NN interpolation — pure JAX/XLA.

These replace the reference's three vendored C++/CUDA TF custom-op sets
(GenORM/policy/tf_ops/{sampling/tf_sampling_g.cu:7-199,
grouping/tf_grouping_g.cu:3-105, 3d_interpolation/interpolate.cpp}; same
copies under PlasticineLab/{real2sim,sim2sim}/tf_ops). On TPU the natural
formulation is batched dense distance matrices on the MXU + masked top-k —
no atomic scatter, no custom kernels, fully differentiable where the
reference ops define gradients (gather/interpolate), and vmap/jit/pjit
composable. A CPU C reference implementation lives in unidom_tpu/io/native
for host-side data pipelines.

All functions take batched arrays; semantics (first-k-in-index-order ball
query with first-hit padding, FPS starting from index 0) match the CUDA
kernels.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _sq_dist(a, b):
    """(..., N, 3) x (..., M, 3) -> (..., N, M) squared distances (MXU)."""
    a2 = jnp.sum(a * a, -1, keepdims=True)
    b2 = jnp.sum(b * b, -1, keepdims=True)
    ab = jnp.einsum("...nd,...md->...nm", a, b)
    return a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * ab


@partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(xyz, n_samples):
    """Iterative FPS starting at index 0 (tf_sampling_g.cu:93-180 semantics).

    xyz: (B, N, 3) -> (B, n_samples) int32 indices.
    """

    def one(pts):
        N = pts.shape[0]

        def body(carry, _):
            min_d2, last_idx = carry
            d2 = jnp.sum((pts - pts[last_idx]) ** 2, -1)
            min_d2 = jnp.minimum(min_d2, d2)
            nxt = jnp.argmax(min_d2).astype(jnp.int32)
            return (min_d2, nxt), nxt

        init = (jnp.full((N,), jnp.inf), jnp.array(0, jnp.int32))
        _, idx = jax.lax.scan(body, init, None, length=n_samples - 1)
        return jnp.concatenate([jnp.zeros((1,), jnp.int32), idx])

    return jax.vmap(one)(xyz)


def gather_points(points, idx):
    """points: (B, N, C), idx: (B, S) -> (B, S, C)."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


@partial(jax.jit, static_argnums=(0, 1))
def ball_query(radius, n_sample, xyz, centers):
    """First ``n_sample`` points (in index order) within ``radius`` of each
    center, padded with the first hit (tf_grouping_g.cu:3-40 semantics).

    xyz: (B, N, 3), centers: (B, S, 3) -> idx (B, S, n_sample) int32.
    """
    d2 = _sq_dist(centers, xyz)  # (B, S, N)
    within = d2 < radius * radius
    N = xyz.shape[1]
    order = jnp.arange(N, dtype=jnp.int32)
    # stable "first k true" selection: sort key pushes non-hits to the end
    key = jnp.where(within, order, N + order)
    if n_sample > N:  # fewer points than requested neighbors: pad misses
        key = jnp.pad(key, ((0, 0), (0, 0), (0, n_sample - N)), constant_values=2 * N)
    sel = jnp.sort(key, axis=-1)[..., :n_sample]
    first_hit = sel[..., :1]
    sel = jnp.where(sel < N, sel, first_hit)  # pad with first hit
    # centers with zero hits: fall back to index 0 (matches CUDA's cnt==0
    # leaving the buffer content; deterministic here)
    sel = jnp.where(first_hit < N, sel, 0)
    return sel.astype(jnp.int32)


def group_points(points, idx):
    """points: (B, N, C), idx: (B, S, K) -> (B, S, K, C). Differentiable
    (the VJP is the scatter-add the reference implements by hand,
    tf_grouping_g.cu:58-77)."""
    B, S, K = idx.shape

    def one(p, i):
        return p[i.reshape(-1)].reshape(S, K, p.shape[-1])

    return jax.vmap(one)(points, idx)


@jax.jit
def three_nn(unknown, known):
    """3 nearest neighbors of each unknown point among known points.

    unknown: (B, N, 3), known: (B, M, 3) -> (dist (B, N, 3), idx (B, N, 3)).
    """
    d2 = _sq_dist(unknown, known)
    neg_d2, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg_d2, 1e-10)), idx.astype(jnp.int32)


def three_interpolate(points, idx, dist):
    """Inverse-distance weighted interpolation (interpolate.cpp semantics).

    points: (B, M, C), idx/dist: (B, N, 3) -> (B, N, C).
    """
    w = 1.0 / jnp.maximum(dist, 1e-10)
    w = w / jnp.sum(w, -1, keepdims=True)
    gathered = group_points(points, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * w[..., None], axis=2)


def sample_and_group(n_centers, radius, n_sample, xyz, features):
    """One set-abstraction grouping step (pnet2_layers/layers.py:33-60):
    FPS centers, ball-query neighborhoods, center-relative coordinates,
    optional feature concat."""
    center_idx = farthest_point_sample(xyz, n_centers)
    centers = gather_points(xyz, center_idx)
    idx = ball_query(radius, n_sample, xyz, centers)
    grouped_xyz = group_points(xyz, idx) - centers[:, :, None, :]
    if features is not None:
        grouped_feat = group_points(features, idx)
        grouped = jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
    else:
        grouped = grouped_xyz
    return centers, grouped, idx


def prob_sample(weights, key, n_samples):
    """Inverse-CDF categorical sampling (tf_sampling_g.cu cumsum +
    binarysearch semantics). weights: (B, N) unnormalized -> (B, n_samples)."""
    logits = jnp.log(jnp.maximum(weights, 1e-20))
    return jax.random.categorical(key, logits[:, None, :], axis=-1,
                                  shape=weights.shape[:1] + (n_samples,)).astype(jnp.int32)

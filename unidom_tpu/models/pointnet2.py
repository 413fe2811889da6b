"""PointNet++ (SSG) models in flax: material-parameter regression and
parameter-conditioned policies.

Reference: GenORM/policy/models/cls_ssg_model.py:14-399 (``CLS_SSG_Model``
regresses (E, nu) from point clouds; ``CLS_SSG_Model_PARA`` conditions a
policy on point cloud + parameters; plain ``MLP``/``MLP_NO_PARA`` heads) built
on pnet2_layers/layers.py:7-190 which call the CUDA custom ops replaced by
unidom_tpu/models/pointnet_ops.py.

Delta: LayerNorm instead of BatchNorm (stateless under jit/pjit; the
regression targets are normalized so the effect is minor and documented).
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unidom_tpu.models.pointnet_ops import (
    sample_and_group,
    three_interpolate,
    three_nn,
)


class PointMLP(nn.Module):
    """Shared per-point MLP (the reference's Conv2D-1x1 stacks)."""

    channels: Sequence[int]
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        for c in self.channels:
            x = nn.Dense(c)(x)
            if self.norm:
                x = nn.LayerNorm()(x)
            x = nn.relu(x)
        return x


class PointNetSA(nn.Module):
    """Set-abstraction layer (Pointnet_SA, layers.py:7-64)."""

    n_centers: int
    radius: float
    n_sample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, features):
        centers, grouped, _ = sample_and_group(
            self.n_centers, self.radius, self.n_sample, xyz, features
        )
        feat = PointMLP(self.mlp)(grouped)  # (B, S, K, C)
        feat = jnp.max(feat, axis=2)
        return centers, feat


class PointNetSAMSG(nn.Module):
    """Multi-scale-grouping set abstraction (Pointnet_SA_MSG,
    pnet2_layers/layers.py:66-124): one shared FPS center set, a ball query
    + per-point MLP + max-pool per radius scale, features concatenated."""

    n_centers: int
    radii: Sequence[float]
    n_samples: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, features):
        from unidom_tpu.models.pointnet_ops import (
            ball_query,
            farthest_point_sample,
            gather_points,
            group_points,
        )

        center_idx = farthest_point_sample(xyz, self.n_centers)
        centers = gather_points(xyz, center_idx)
        scale_feats = []
        for radius, n_sample, mlp in zip(self.radii, self.n_samples, self.mlps):
            idx = ball_query(radius, n_sample, xyz, centers)
            grouped = group_points(xyz, idx) - centers[:, :, None, :]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped, group_points(features, idx)], axis=-1
                )
            feat = PointMLP(mlp)(grouped)  # (B, S, K, C)
            scale_feats.append(jnp.max(feat, axis=2))
        return centers, jnp.concatenate(scale_feats, axis=-1)


class PointNetSAAll(nn.Module):
    """Group-all set abstraction (the final SA with group_all=True)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, features):
        grouped = xyz if features is None else jnp.concatenate([xyz, features], -1)
        feat = PointMLP(self.mlp)(grouped)  # (B, N, C)
        return jnp.max(feat, axis=1)  # (B, C)


class PointNetFP(nn.Module):
    """Feature propagation layer (Pointnet_FP, layers.py:126-190)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, feat1, feat2):
        dist, idx = three_nn(xyz1, xyz2)
        interp = three_interpolate(feat2, idx, dist)
        if feat1 is not None:
            interp = jnp.concatenate([interp, feat1], axis=-1)
        return PointMLP(self.mlp)(interp)


class PointNet2Cls(nn.Module):
    """SSG classification/regression tower (CLS_SSG_Model:296-399).

    points (B, N, 3) -> (B, out_dim). Used for (E, nu[, yield]) regression.
    """

    out_dim: int
    extra_dim: int = 0  # optional conditioning vector appended to the global feature
    msg: bool = False  # multi-scale grouping in the first SA (SA-MSG parity)
    dropout: float = 0.4

    @nn.compact
    def __call__(self, points, extra: Optional[jnp.ndarray] = None, deterministic=True):
        xyz, feat = points, None
        if self.msg:
            xyz, feat = PointNetSAMSG(
                512, (0.1, 0.2, 0.4), (16, 32, 64),
                ((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            )(xyz, feat)
        else:
            xyz, feat = PointNetSA(512, 0.2, 32, (64, 64, 128))(xyz, feat)
        xyz, feat = PointNetSA(128, 0.4, 64, (128, 128, 256))(xyz, feat)
        global_feat = PointNetSAAll((256, 512, 1024))(xyz, feat)

        x = global_feat
        if extra is not None:
            x = jnp.concatenate([x, extra], axis=-1)
        x = nn.Dense(512)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(256)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.out_dim)(x)


class PointNet2Para(nn.Module):
    """Parameter-conditioned policy (CLS_SSG_Model_PARA): point cloud +
    material-parameter vector -> action."""

    action_dim: int

    @nn.compact
    def __call__(self, points, params, deterministic=True):
        return PointNet2Cls(self.action_dim, extra_dim=params.shape[-1])(
            points, extra=params, deterministic=deterministic
        )


class DenseHead(nn.Module):
    """Plain MLP heads (models/cls_ssg_model.py:14-180 MLP / MLP_NO_PARA):
    goal point (+ optional params) -> output."""

    out_dim: int
    hidden: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, x, params: Optional[jnp.ndarray] = None):
        if params is not None:
            x = jnp.concatenate([x, params], axis=-1)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)

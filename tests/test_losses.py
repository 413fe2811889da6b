"""Target-loss module tests: grid mass, JFA distance transform, loss terms."""

import jax
import jax.numpy as jnp
import numpy as np

from unidom_tpu.engine.losses import (
    LossTracker,
    LossWeights,
    TargetLoss,
    compute_grid_mass,
    target_sdf_jfa,
)


class TestGridMass:
    def test_mass_conserved(self):
        x = jnp.asarray(np.random.RandomState(0).uniform(0.2, 0.8, (100, 3)).astype(np.float32))
        grid = compute_grid_mass(x, (32, 32, 32), 32.0)
        np.testing.assert_allclose(float(grid.sum()), 100.0, rtol=1e-5)

    def test_mass_located(self):
        x = jnp.asarray([[0.5, 0.5, 0.5]], dtype=jnp.float32)
        grid = compute_grid_mass(x, (16, 16, 16), 16.0)
        # peak near cell (8, 8, 8)
        peak = np.unravel_index(int(jnp.argmax(grid)), (16, 16, 16))
        assert all(abs(p - 8) <= 1 for p in peak)

    def test_differentiable(self):
        x = jnp.asarray([[0.5, 0.5, 0.5], [0.3, 0.3, 0.3]], dtype=jnp.float32)
        g = jax.grad(lambda x: (compute_grid_mass(x, (16,) * 3, 16.0) ** 2).sum())(x)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).sum() > 0


class TestJFA:
    def test_sdf_zero_on_target(self):
        density = jnp.zeros((16, 16, 16)).at[8, 8, 8].set(1.0)
        sdf, nearest = target_sdf_jfa(density, 1.0 / 16)
        assert float(sdf[8, 8, 8]) == 0.0

    def test_sdf_matches_exact_distance(self):
        density = jnp.zeros((16, 16, 16)).at[4, 4, 4].set(1.0).at[12, 12, 12].set(1.0)
        sdf, _ = target_sdf_jfa(density, 1.0)
        pts = np.array([[4, 4, 4], [12, 12, 12]], float)
        ii, jj, kk = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
        grid = np.stack([ii, jj, kk], -1).astype(float)
        exact = np.minimum(
            np.linalg.norm(grid - pts[0], axis=-1), np.linalg.norm(grid - pts[1], axis=-1)
        )
        np.testing.assert_allclose(np.asarray(sdf), exact, atol=1e-2)


class TestTargetLoss:
    def _loss(self):
        target = np.zeros((16, 16, 16), np.float32)
        target[8:10, 2:4, 8:10] = 1.0
        return TargetLoss(target, (16, 16, 16), 16.0)

    def test_zero_loss_at_target(self):
        tl = self._loss()
        # particles exactly reproducing the target mass
        occ = np.argwhere(np.asarray(tl.target_density) > 0)
        x = jnp.asarray((occ + 0.0) / 16.0, jnp.float32)
        info_far = tl.losses(x + 0.4)
        info_near = tl.losses(x)
        assert float(info_near["sdf_loss"]) < float(info_far["sdf_loss"])
        assert float(info_near["density_loss"]) < float(info_far["density_loss"])
        assert float(info_near["iou"]) > float(info_far["iou"])

    def test_contact_loss_modes(self):
        tl = self._loss()
        d = jnp.asarray([0.5, 0.1, 0.3])
        hard = tl.contact_loss([d])
        np.testing.assert_allclose(float(hard), 0.01, rtol=1e-5)
        tl.soft_contact = True
        soft = tl.contact_loss([d])
        assert float(soft) > 0

    def test_tracker_reward(self):
        tl = self._loss()
        x0 = jnp.asarray(np.random.RandomState(0).uniform(0.3, 0.7, (50, 3)), jnp.float32)
        info0 = tl.losses(x0)
        tracker = LossTracker.init(info0)
        # moving particles onto the target reduces loss -> positive reward delta
        occ = np.argwhere(np.asarray(tl.target_density) > 0)
        x1 = jnp.asarray((occ[np.random.RandomState(1).randint(0, len(occ), 50)]) / 16.0,
                         jnp.float32)
        tracker, info1 = tracker.step(tl.losses(x1))
        assert float(info1["reward"]) > 0
        assert 0.0 <= float(info1["incremental_iou"]) <= 1.0

    def test_loss_differentiable_through_particles(self):
        tl = self._loss()
        x = jnp.asarray(np.random.RandomState(0).uniform(0.3, 0.7, (20, 3)), jnp.float32)
        g = jax.grad(lambda x: tl.losses(x)["loss"])(x)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).sum() > 0

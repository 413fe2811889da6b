"""Native C++ point ops + record codec: build, correctness vs the JAX ops."""

import numpy as np
import pytest

from unidom_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable")
    return lib


class TestNativeOps:
    def test_fps_matches_jax(self, lib):
        import jax.numpy as jnp
        from unidom_tpu.models.pointnet_ops import farthest_point_sample

        pts = np.random.RandomState(0).rand(200, 3).astype(np.float32)
        nat = native.fps(pts, 16)
        jx = np.asarray(farthest_point_sample(jnp.asarray(pts[None]), 16))[0]
        np.testing.assert_array_equal(nat, jx)

    def test_ball_query_matches_jax(self, lib):
        import jax.numpy as jnp
        from unidom_tpu.models.pointnet_ops import ball_query as bq_jax

        pts = np.random.RandomState(1).rand(100, 3).astype(np.float32)
        centers = pts[:10]
        nat = native.ball_query(pts, centers, 0.2, 8)
        jx = np.asarray(bq_jax(0.2, 8, jnp.asarray(pts[None]), jnp.asarray(centers[None])))[0]
        np.testing.assert_array_equal(nat, jx)

    def test_three_nn_matches_numpy(self, lib):
        rng = np.random.RandomState(2)
        unknown = rng.rand(20, 3).astype(np.float32)
        known = rng.rand(50, 3).astype(np.float32)
        d, i = native.three_nn(unknown, known)
        d2 = ((unknown[:, None] - known[None]) ** 2).sum(-1)
        ref_i = np.argsort(d2, -1)[:, :3]
        np.testing.assert_array_equal(i, ref_i)
        np.testing.assert_allclose(d, np.sqrt(np.take_along_axis(d2, ref_i, -1)),
                                   rtol=1e-5)


class TestRecordCodec:
    def test_roundtrip(self, lib, tmp_path):
        clouds = [np.random.rand(n, 3).astype(np.float32) for n in (10, 25, 7)]
        path = str(tmp_path / "clouds.bin")
        native.write_record_file(path, clouds)
        back = native.read_record_file(path)
        assert len(back) == 3
        for a, b in zip(clouds, back):
            np.testing.assert_allclose(a, b)

    def test_python_fallback_read(self, lib, tmp_path, monkeypatch):
        clouds = [np.random.rand(5, 3).astype(np.float32)]
        path = str(tmp_path / "c.bin")
        native.write_record_file(path, clouds)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "get_lib", lambda: None)
        back = native.read_record_file(path)
        np.testing.assert_allclose(back[0], clouds[0])

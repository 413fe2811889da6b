"""Renderer + USD export tests (software path; GL gated off in CI)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from unidom_tpu.render.software import (
    render_points_front,
    render_points_topdown,
    render_side_by_side,
    save_gif,
)
from unidom_tpu.render.mesh import MeshRenderer, ParticleRenderer
from unidom_tpu.render.usd import (
    create_usd_cloth_scene,
    create_usd_mix_scene,
    create_usd_points_scene,
)


def test_software_renderers():
    pts = np.random.RandomState(0).uniform(0.2, 0.8, (100, 3))
    top = render_points_topdown(pts, 64)
    front = render_points_front(pts, 64)
    combo = render_side_by_side(pts, goal=pts, size=64)
    assert top.shape == (64, 64, 3) and top.dtype == np.uint8
    assert front.shape == (64, 64, 3)
    assert combo.shape == (64, 128, 3)
    assert top.std() > 0  # actually drew something


def test_mesh_and_particle_renderers():
    x_grid = np.random.RandomState(0).uniform(0, 1, (20, 20, 3))
    rgb, depth = MeshRenderer().render(x_grid, np.zeros((0, 3)), np.array([0.5, 0.5, 0.5, 0.01]))
    assert rgb.shape[-1] == 3
    rgb2, _ = ParticleRenderer().render(np.random.rand(50, 3))
    assert rgb2.shape[-1] == 3


def test_save_gif(tmp_path):
    frames = [np.zeros((16, 16, 3), np.uint8) for _ in range(3)]
    out = save_gif(frames, str(tmp_path / "t.gif"))
    assert os.path.exists(out)


def test_usd_exports(tmp_path):
    verts = np.random.rand(3, 12, 3)
    tris = np.array([[0, 1, 2], [2, 3, 0]])
    p1 = create_usd_cloth_scene(verts, tris, str(tmp_path / "cloth.usda"))
    p2 = create_usd_points_scene(np.random.rand(2, 30, 3), str(tmp_path / "pts.usda"))
    p3 = create_usd_mix_scene(verts, tris, np.random.rand(3, 10, 3), str(tmp_path / "mix.usda"))
    for p in (p1, p2, p3):
        txt = open(p).read()
        assert txt.startswith("#usda 1.0")
        assert "timeSamples" in txt


def test_env_step_with_render():
    from unidom_tpu.engine.cloth import ClothConf
    from unidom_tpu.envs.cloth_tasks import FoldCloth1Env

    conf = ClothConf(N=20, mem_saving_level=1, n_substeps=5, task="t", goal_path="")
    env = FoldCloth1Env(batch_size=1, conf=conf)
    _, state = env.reset(jax.random.PRNGKey(0))
    actions = env.get_random_fold_action(state)
    obs, reward, done, info = env.step_with_render(actions, state)
    assert len(info["img_list"]) == 40
    assert info["img_list"][0].shape[-1] == 3

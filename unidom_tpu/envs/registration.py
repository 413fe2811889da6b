"""Environment registry (name -> constructor), mirroring
DaXBench/daxbench/core/envs/registration.py:13-27 including aliases."""

from unidom_tpu.envs.cloth_tasks import (
    FoldCloth1Env,
    FoldCloth1ParaEnv,
    FoldCloth3Env,
    FoldTshirtEnv,
    UnfoldCloth1Env,
    UnfoldCloth3Env,
)

env_functions = {
    "fold_cloth1": FoldCloth1Env,
    "fold_cloth1_para": FoldCloth1ParaEnv,
    "fold_cloth3": FoldCloth3Env,
    "fold_tshirt": FoldTshirtEnv,
    "unfold_cloth1": UnfoldCloth1Env,
    "unfold_cloth3": UnfoldCloth3Env,
}


def register(name, ctor):
    env_functions[name] = ctor


def _register_mpm():
    from unidom_tpu.envs.mpm_tasks import (
        PourSoupEnv,
        PourWaterEnv,
        ShapeElastoPlasticEnv,
        ShapeRopeEnv,
        ShapeRopeHardEnv,
        WhipRopeEnv,
    )

    env_functions.update(
        {
            "shape_rope": ShapeRopeEnv,
            "push_rope": ShapeRopeEnv,
            "shape_rope_hard": ShapeRopeHardEnv,
            "push_rope_hard": ShapeRopeHardEnv,
            "whip_rope": WhipRopeEnv,
            "pour_water": PourWaterEnv,
            "pour_soup": PourSoupEnv,
            "shape_elasto_plastic": ShapeElastoPlasticEnv,
        }
    )


def _register_plb():
    from unidom_tpu.envs.plb_tasks import PLB_SCENES, make_plb_env

    for name in PLB_SCENES:
        env_functions[name] = make_plb_env(name)


try:
    _register_mpm()
    _register_plb()
except ImportError:  # pragma: no cover - during incremental construction
    pass

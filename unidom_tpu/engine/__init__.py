from unidom_tpu.engine.cloth import ClothSimulator, ClothState, ClothConf  # noqa: F401

from unidom_tpu.parallel.mesh import make_env_mesh, initialize_distributed  # noqa: F401

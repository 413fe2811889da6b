"""UniDOM-TPU: a TPU-native differentiable deformable-object manipulation framework.

A ground-up JAX/XLA/Pallas re-design of the capability set of
Kuroki1931/UniDOM (DaXBench differentiable MPM + mass-spring cloth, APG
training, parameter-aware policies, trajectory optimization, PointNet++
parameter estimation), built TPU-first:

- pure-functional simulators over typed state pytrees (zero recompiles for
  parameter randomization),
- `vmap` env batching sized to fill a chip, `shard_map` over a device mesh for
  data parallelism with `psum` gradient reduction over ICI,
- Pallas kernels for the P2G/G2P scatter-gather hot path,
- `jax.checkpoint`-based rematerialization replacing hand-rolled
  recompute-VJP machinery.
"""

__version__ = "0.1.0"


def make_env(name, **kwargs):
    """Instantiate a registered environment by name (lazy import to keep the
    base package import light)."""
    from unidom_tpu.envs.registration import env_functions

    return env_functions[name](**kwargs)

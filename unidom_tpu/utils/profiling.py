"""Profiling helpers: steps/s accounting and jax.profiler traces.

The reference only logs wall-clock deltas (apg.py:295-341,
fold_cloth1_env.py:68-76). Here: a context manager around
``jax.profiler.trace`` for Perfetto/XProf dumps, and a Timer with an
explicit ``block_until_ready`` sync point.
"""

import contextlib
import time

import jax


class Timer:
    """Wall-clock timer that forces device completion before reading."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.t0
        return False

    def sync(self, *arrays):
        for a in arrays:
            jax.block_until_ready(a)
        self.elapsed = time.time() - self.t0
        return self.elapsed


def steps_per_second(episode_length, num_envs, walltime):
    """The reference's throughput probe (apg.py:340)."""
    return episode_length * num_envs / max(walltime, 1e-9)


@contextlib.contextmanager
def profile_trace(logdir, enabled=True):
    """Capture an XProf/Perfetto trace of the enclosed block."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

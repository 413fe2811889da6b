"""Layered configuration system.

The reference has three config layers (SURVEY.md §5): per-env DefaultConf
dataclasses (DaXBench), yacs CfgNode + per-task .yml with a VARIANTS list
indexed by env version (plb/config/default_config.py:12-24,
plb/envs/__init__.py:5-21 registers Task-v1..v1000), and CLI flags.

Here: the dataclass confs stay the source of truth; this module adds the
yacs-equivalent YAML layer — task .yml files with a ``variants`` list — and
versioned env construction ``make("shape_rope-v3")`` that applies variant 3
on top of the task defaults. Unlike the reference, overridden physical
parameters that live in traced state (stiffness, E, nu, yield_stress,
friction) do not retrigger compilation.
"""

import dataclasses
import os
import re

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def load_task_yaml(task: str):
    path = os.path.join(CONFIG_DIR, f"{task}.yml")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def resolve_variant(task: str, version: int):
    """Merge task defaults with variants[version - 1] (v1 = defaults only,
    matching plb where VARIANTS[0] corresponds to -v1's overrides)."""
    spec = load_task_yaml(task)
    base = dict(spec.get("defaults", {}))
    variants = spec.get("variants", [])
    if version >= 1 and version - 1 < len(variants):
        base.update(variants[version - 1] or {})
    return base


_SPEC_RE = re.compile(r"^(?P<task>[a-z0-9_]+?)(?:-v(?P<version>\d+))?$")


def parse_env_spec(spec: str):
    m = _SPEC_RE.match(spec.lower())
    if not m:
        raise ValueError(f"bad env spec {spec!r}")
    return m.group("task"), int(m.group("version") or 1)


def make(spec: str, batch_size: int = 1, **kwargs):
    """Versioned env factory: ``make("shape_rope-v2", batch_size=4)``.

    YAML overrides whose names match conf dataclass fields are applied to
    the conf; the rest are passed to the env constructor.
    """
    from unidom_tpu.envs.registration import env_functions

    task, version = parse_env_spec(spec)
    if task not in env_functions:
        raise KeyError(f"unknown task {task!r}")
    overrides = resolve_variant(task, version)
    overrides.update(kwargs)

    ctor = env_functions[task]
    return ctor(batch_size=batch_size, **overrides)


def conf_override(conf, **overrides):
    """Return a copy of a dataclass conf with fields replaced."""
    if dataclasses.is_dataclass(conf):
        return dataclasses.replace(conf, **overrides)
    import copy

    c = copy.copy(conf)
    for k, v in overrides.items():
        setattr(c, k, v)
    return c

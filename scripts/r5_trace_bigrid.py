"""Capture + parse a device trace of big-grid training iterations.

Writes a jax.profiler trace of N minimize() iterations to
runs/r5/traces/<env>/ and parses the perfetto .trace.json.gz into a
per-kernel device-time table (the axon runtime executes the whole jit as
one program, so only a real trace can attribute fwd kernel vs bwd kernel
vs XLA glue).

    TRACE_ENV=pour_soup TRACE_B=8 python scripts/r5_trace_bigrid.py
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from unidom_tpu.algorithms.apg import build_apg
from unidom_tpu.envs.registration import env_functions
from unidom_tpu.parallel.mesh import make_env_mesh
from unidom_tpu.utils.cache import enable_compilation_cache


def parse_perfetto(trace_dir):
    """Aggregate device-lane event durations by op name prefix."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose name mentions TPU / device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e6  # us -> s
        total += dur
        key = name.split(".")[0].split("(")[0][:60]
        agg[key] += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    return {"path": path, "total_device_s": total, "rows": rows[:25]}


def main():
    enable_compilation_cache()
    name = os.environ.get("TRACE_ENV", "pour_soup")
    B = int(os.environ.get("TRACE_B", 8))
    ep = int(os.environ.get("TRACE_EP", 3))
    iters = int(os.environ.get("TRACE_ITERS", 2))
    out_dir = f"runs/r5/traces/{name}"
    os.makedirs(out_dir, exist_ok=True)

    env = env_functions[name](batch_size=B, seed=0)
    env.reset(jax.random.PRNGKey(0))
    mesh = make_env_mesh()
    init_ts, minimize, reset_batch, _ = build_apg(
        env, episode_length=ep, mesh=mesh
    )
    ts = init_ts(0)
    state = reset_batch(jax.random.PRNGKey(0))
    ts, m = minimize(ts, state)  # compile + warm
    jax.block_until_ready(m)

    with jax.profiler.trace(out_dir):
        for _ in range(iters):
            ts, m = minimize(ts, state)
        jax.block_until_ready(m)

    rep = parse_perfetto(out_dir)
    if rep is None:
        print("no perfetto trace found under", out_dir)
        return
    print(f"trace: {rep['path']}")
    print(f"total device time over {iters} iters: "
          f"{rep['total_device_s']:.3f}s")
    for name_, dur in rep["rows"]:
        print(f"  {dur:9.3f}s  {name_}")
    with open(f"runs/r5/trace_summary_{name}.json", "w") as f:
        json.dump({"env": name, "B": B, "iters": iters,
                   "total_device_s": rep["total_device_s"],
                   "rows": rep["rows"]}, f, indent=1)


if __name__ == "__main__":
    main()

"""Extract golden-trajectory fixtures from the reference's recorded data.

The reference ships human-collected expert demos
(DaXBench/daxbench/algorithms/expert_demo/<task>/demo_*.pkl: obs/action/state
lists appended *before* each ``step_diff`` call, cloth_env.py:274-321) and
real-robot calibration episodes (DaXBench/exp/calibration_data/*.pkl:
(before_pcd, action, after_pcd) tuples used by exp/calibrate.py:65-166).
They were pickled under jax 0.3 / python2-era numpy, so we decode them with
a tolerant unpickler and persist plain .npz fixtures under tests/fixtures/
— the regression targets for tests/test_golden.py.

Run (needs /root/reference mounted):
    python scripts/extract_reference_fixtures.py
"""

import glob
import os
import pickle

import numpy as np

REF = "/root/reference/DaXBench"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


class _Blob:
    """Stand-in for unimportable classes (old daxbench NamedTuples)."""

    def __new__(cls, *args, **kw):
        self = object.__new__(cls)
        self.args, self.kw = args, kw
        return self

    def __setstate__(self, state):
        self.state = state


def _reconstruct_device_array(fun, args, arr_state, aval_state=None):
    """jax 0.3 DeviceArray reduce payload -> plain numpy array."""
    arr = fun(*args)
    arr.__setstate__(arr_state)
    return arr


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:
            if name == "reconstruct_device_array":
                return _reconstruct_device_array
            return type(name, (_Blob,), {"__module__": module})


def extract_cloth_demo(task, idx):
    path = f"{REF}/daxbench/algorithms/expert_demo/{task}/demo_{idx}.pkl"
    with open(path, "rb") as f:
        demo = _TolerantUnpickler(f).load()
    actions = np.stack([np.asarray(a).reshape(6) for a in demo["action"]])
    # ClothState fields (cloth_simulator.py:13-23): x, v, primitive0,
    # primitive1, primitive0_v?, ... — field 0 is x (1, P, 3)
    xs = np.stack([np.asarray(s.args[0]).reshape(-1, 3) for s in demo["state"]])
    obs = np.stack([np.asarray(o).reshape(-1) for o in demo["obs"]])
    out = os.path.join(OUT, f"{task}_demo{idx}.npz")
    np.savez_compressed(out, actions=actions, x=xs, obs=obs)
    print(f"{out}: actions {actions.shape} x {xs.shape} obs {obs.shape}")


def extract_calibration(n=2):
    paths = sorted(glob.glob(f"{REF}/exp/calibration_data/*.pkl"))[:n]
    for i, path in enumerate(paths):
        with open(path, "rb") as f:
            before, action, after = pickle.load(f, encoding="latin1")
        params = np.asarray(action).ravel()[0]["params"]
        pick = np.asarray(params["pose0"][0], np.float32)
        place = np.asarray(params["pose1"][0], np.float32)
        out = os.path.join(OUT, f"calibration_rope_{i}.npz")
        np.savez_compressed(
            out,
            before=np.asarray(before, np.float32),
            after=np.asarray(after, np.float32),
            pick=pick,
            place=place,
        )
        print(f"{out}: before {np.asarray(before).shape} after {np.asarray(after).shape}")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    for idx in (0, 1):
        extract_cloth_demo("fold_cloth1", idx)
    extract_calibration()

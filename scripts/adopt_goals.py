"""Adopt the reference's shipped goal clouds as the task definitions.

The goal.npy files under the reference's ``daxbench/core/envs/goals/<task>/``
are task-definition *data* (recorded target point clouds the rewards are
computed against; loaded at ``cloth_env.py:60-64`` / ``mpm_env.py:46-51``).
Round-2 review found our self-generated goals (scripts/make_goals.py) differ
materially from the reference's, which made every reward number incomparable.
This script copies the reference data verbatim so the tasks are numerically
the reference's tasks.

Special cases (behavior-faithful, not file-faithful):
  * shape_rope_hard — the reference env inherits ``task = "shape_rope"``
    (shape_rope_hard_env.py:8 aliases ShapeRopeEnv's DefaultConf), so it
    trains against the *shape_rope* goal; the 870-point
    goals/shape_rope_hard/goal.npy that also ships is unused by its reward
    path. We copy the shape_rope goal into our shape_rope_hard slot.
  * pour_soup — the reference conf points at ``goals/pour_soup2/goal.npy``
    (pour_soup_env.py:59) which does not exist in the reference tree; its env
    therefore warns and uses a degenerate zeros((1,3)) goal. We keep our
    generated goal (matches our particle count) rather than replicate the
    broken path.
  * shape_elasto_plastic — the reference ships no goal for this task either;
    ours is kept.

Run from the repo root:  python scripts/adopt_goals.py
"""

import shutil
from pathlib import Path

import numpy as np

REF = Path("/root/reference/DaXBench/daxbench/core/envs/goals")
OURS = Path(__file__).resolve().parent.parent / "unidom_tpu" / "assets" / "goals"

# task -> reference goal directory it trains against
ADOPT = {
    "fold_cloth1": "fold_cloth1",
    "fold_cloth3": "fold_cloth3",
    "fold_tshirt": "fold_tshirt",
    "unfold_cloth1": "unfold_cloth1",
    "unfold_cloth3": "unfold_cloth3",
    "whip_rope": "whip_rope",
    "shape_rope": "shape_rope",
    "shape_rope_hard": "shape_rope",  # see module docstring
    "pour_water": "pour_water",
}


def main():
    for task, ref_task in sorted(ADOPT.items()):
        src = REF / ref_task / "goal.npy"
        dst = OURS / task / "goal.npy"
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src, dst)
        g = np.load(dst)
        print(f"{task:18s} <- goals/{ref_task}/goal.npy  {g.shape}  mean={g.mean(0).round(3)}")


if __name__ == "__main__":
    main()

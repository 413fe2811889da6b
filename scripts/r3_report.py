"""Assemble the round-3 convergence/parity report from runs/r3 artifacts.

Reads:
  runs/r3/<run>/metrics.jsonl + <run>.log   (our trainer runs)
  runs/r3/reference_<env>.jsonl             (reference-code runs via shim)
Emits a markdown table (stdout) with best/final eval rewards and final
costs, plus the ±5% comparison against the reference where both exist.

Usage: python scripts/r3_report.py [--update-baseline]
  --update-baseline writes published.final_cost_* entries into BASELINE.json
"""

import argparse
import glob
import json
import os
import re

R = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runs", "r3")


def read_jsonl(path):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def our_run(logname):
    """Parse test_reward lines from a trainer log."""
    path = os.path.join(R, logname)
    if not os.path.exists(path):
        return None
    evals = []
    for line in open(path):
        m = re.match(r"\[it (\d+)\] test_reward ([\d.eE+-]+)(?: det ([\d.eE+-]+))?", line)
        if m:
            evals.append(
                (int(m.group(1)), float(m.group(2)),
                 float(m.group(3)) if m.group(3) else None)
            )
    if not evals:
        return None
    best = max(evals, key=lambda e: e[1])
    return {
        "it0": evals[0][1],
        "best": best[1],
        "best_it": best[0],
        "best_det": best[2],
        "final": evals[-1][1],
        "final_it": evals[-1][0],
        "n_evals": len(evals),
    }


def ref_run(name):
    path = os.path.join(R, name)
    if not os.path.exists(path):
        return None
    recs = read_jsonl(path)
    if not recs:
        return None
    key = "final_l2" if "final_l2" in recs[0] else "final_chamfer"
    best = max(recs, key=lambda r: r["test_reward"])
    bestc = min(recs, key=lambda r: r[key])
    return {
        "it0": recs[0]["test_reward"],
        "best": best["test_reward"],
        "best_it": best["it"],
        "final": recs[-1]["test_reward"],
        "final_it": recs[-1]["it"],
        "cost_key": key,
        "best_cost": bestc[key],
        "final_cost": recs[-1][key],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    pairs = [
        ("fold_cloth3 @4", "fold_cloth3_4.log", "reference_fold_cloth3.jsonl"),
        ("whip_rope @4", "whip_rope_4.log", "reference_whip_rope.jsonl"),
        ("fold_cloth1 @4", "fold_cloth1_4.log", "reference_fold_cloth1_tpu.jsonl"),
        ("fold_cloth3 @1024", "fold_cloth3_1024_record.log", None),
        ("fold_cloth3 @4 s1", "fold_cloth3_4_s1.log", None),
        ("fold_cloth3 @4 s3", "fold_cloth3_4_s3.log", None),
    ]
    print("| config | ours it0 -> best (it) -> final | reference it0 -> best (it) -> final | ref final cost |")
    print("|---|---|---|---|")
    published = {}
    for label, ours_log, ref_log in pairs:
        o = our_run(ours_log)
        r = ref_run(ref_log) if ref_log else None
        ocell = (
            f"{o['it0']:.2f} -> **{o['best']:.2f}** ({o['best_it']}) -> {o['final']:.2f}"
            if o else "—"
        )
        rcell = (
            f"{r['it0']:.2f} -> **{r['best']:.2f}** ({r['best_it']}) -> {r['final']:.2f}"
            if r else "—"
        )
        ccell = f"{r['cost_key']}={r['final_cost']:.4f} (best {r['best_cost']:.4f})" if r else "—"
        print(f"| {label} | {ocell} | {rcell} | {ccell} |")
        if r:
            env = label.split(" ")[0]
            published[f"final_cost_{env}_reference"] = round(r["best_cost"], 5)
            published[f"test_reward_best_{env}_reference"] = round(r["best"], 4)
        if o:
            env = label.split(" ")[0]
            published.setdefault(f"test_reward_best_{env}_ours", round(o["best"], 4))

    if args.update_baseline:
        bpath = os.path.join(os.path.dirname(R), "..", "BASELINE.json")
        bpath = os.path.normpath(bpath)
        with open(bpath) as f:
            b = json.load(f)
        b.setdefault("published", {}).update(published)
        with open(bpath, "w") as f:
            json.dump(b, f, indent=2)
        print(f"\nupdated {bpath} published: {sorted(published)}")


if __name__ == "__main__":
    main()

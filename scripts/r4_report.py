"""Assemble the round-4 records from runs/r4 (+ the r3 seed sweep):

1. Symmetric fold_cloth3 parity (verdict item 3): reference shim seeds 0-3
   (min final_chamfer per run) vs our 4 best-checkpoint evals — median4 and
   best4 on both stacks, same counts.
2. Big-grid rows (items 1/2): pallas_big parity + bench numbers for
   pour_soup / shape_elasto_plastic vs the r3 XLA rows.
3. bf16 probe rows (items 4/10) vs the f32 bench.
4. Identification (item 8) and PPO (item 7) records.

Usage: python scripts/r4_report.py [--update-baseline]
"""

import argparse
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R4 = os.path.join(HERE, "runs", "r4")
R3 = os.path.join(HERE, "runs", "r3")


def read_jsonl(path):
    if not os.path.exists(path):
        return []
    out = []
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return (xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])) if xs else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()
    pub = {}

    # ---- 1. symmetric fold_cloth3 parity ----
    ref_costs, ref_rewards = [], []
    for path in (
        os.path.join(R3, "reference_fold_cloth3.jsonl"),
        os.path.join(R4, "reference_fold_cloth3_s1.jsonl"),
        os.path.join(R4, "reference_fold_cloth3_s2.jsonl"),
        os.path.join(R4, "reference_fold_cloth3_s3.jsonl"),
    ):
        rows = read_jsonl(path)
        if rows:
            ref_costs.append(min(r["final_chamfer"] for r in rows))
            ref_rewards.append(max(r["test_reward"] for r in rows))
    ours = read_jsonl(os.path.join(R4, "ours_fold_cloth3_seed_costs_r4.jsonl"))
    if len(ours) < 4:  # fall back to the r3-checkpoint evals
        ours = read_jsonl(os.path.join(R4, "ours_fold_cloth3_seed_costs.jsonl"))
    our_costs = [min(r["final_cost_det"], r["final_cost_sampled"]) for r in ours]
    our_rewards = [max(r["test_reward_det"], r["test_reward_sampled"]) for r in ours]

    print("## fold_cloth3 symmetric parity (4 seeds each, 300-it reference runs"
          " vs our best checkpoints)")
    print(f"reference per-seed best final cost: {[round(c, 5) for c in ref_costs]}")
    print(f"ours      per-seed best final cost: {[round(c, 5) for c in our_costs]}")
    if len(ref_costs) >= 3 and len(our_costs) >= 3:
        m_ref, m_our = median(ref_costs), median(our_costs)
        print(f"median4: ref {m_ref:.5f} vs ours {m_our:.5f} "
              f"({'OURS BETTER' if m_our <= m_ref else 'REF BETTER'}, "
              f"ratio {m_our / m_ref:.3f})")
        print(f"best4:   ref {min(ref_costs):.5f} vs ours {min(our_costs):.5f}")
        print(f"best test_reward: ref {max(ref_rewards):.4f} vs ours "
              f"{max(our_rewards):.4f}")
        pub["final_cost_fold_cloth3_ref_median4"] = round(m_ref, 5)
        pub["final_cost_fold_cloth3_ours_median4"] = round(m_our, 5)
        pub["final_cost_fold_cloth3_ref_best4"] = round(min(ref_costs), 5)
        pub["final_cost_fold_cloth3_ours_best4"] = round(min(our_costs), 5)
        pub["test_reward_best4_fold_cloth3_reference"] = round(max(ref_rewards), 4)
        pub["test_reward_best4_fold_cloth3_ours"] = round(max(our_rewards), 4)
        pub["fold_cloth3_parity_protocol"] = (
            "4 seeds each; reference = min eval final_chamfer over a 300-it "
            "shim run of the reference's own code on this chip (~6 s/it, "
            "~1800 s/seed); ours = best-checkpoint eval (eval_chamfer.py, "
            "best of det/sampled) from the r3 4-env runs (<=1000 it at "
            "~0.26 s/it, i.e. <=270 s/seed — ours gets 6x LESS walltime); "
            "median-vs-median and best-vs-best at equal seed counts"
        )

    # ---- 2. big-grid rows ----
    print("\n## big-grid kernel (pour_soup / shape_elasto_plastic)")
    for row in read_jsonl(os.path.join(R4, "bigrid_parity.jsonl")):
        print(json.dumps(row))
    for name, r3sps in (("pour_soup", 0.41), ("shape_elasto", None),
                        ("pour_water", 13.69)):
        rows = read_jsonl(os.path.join(R4, f"bench_{name}.json"))
        if rows:
            row = rows[0]
            sps = row.get("value")
            base = f" (r3 XLA path: {r3sps} sps)" if r3sps else " (r3: device fault)"
            print(f"{name}: {sps} env-steps/s/chip @ {row.get('num_envs')} envs"
                  f"{base}")
            pub[f"sps_{name}_r4"] = sps
            if r3sps:
                pub[f"sps_{name}_vs_r3_xla"] = round(sps / r3sps, 1)

    # ---- 3. bf16 probe ----
    print("\n## bf16 kernel-dtype probe")
    f32 = read_jsonl(os.path.join(R4, "bench_check.json"))
    bf16 = read_jsonl(os.path.join(R4, "bench_bf16.json"))

    def rows_of(recs):
        return {r["metric"]: r for rec in recs for r in rec.get("rows", [rec])
                if "metric" in r}

    rf, rb = rows_of(f32), rows_of(bf16)
    for metric in rb:
        if metric in rf:
            a, b = rf[metric]["value"], rb[metric]["value"]
            print(f"{metric}: f32 {a} -> bf16 {b} ({b / a:.2f}x)")
            key = "cloth" if "fold_cloth" in metric else "whip_rope"
            pub[f"sps_bf16_{key}"] = b
            pub[f"sps_bf16_{key}_speedup"] = round(b / a, 2)

    # ---- 4. identify + ppo ----
    ident = os.path.join(R4, "identify", "result.json")
    if os.path.exists(ident):
        d = json.load(open(ident))
        print("\n## identification:", json.dumps(d))
        pub["identify_stiffness_mae_test"] = d.get("stiffness_mae_test")
        pub["identify_stiffness_mae_r3_protocol"] = d.get(
            "stiffness_mae_all_r3_protocol")
        pub["identify_n_experts"] = d.get("n_experts")
    ppo = read_jsonl(os.path.join(R4, "ppo_shape_rope", "metrics.jsonl"))
    if ppo:
        first, best = ppo[0]["eval_reward"], max(r["eval_reward"] for r in ppo)
        last = ppo[-1]["eval_reward"]
        print(f"\n## ppo shape_rope: eval {first:.4f} -> best {best:.4f} "
              f"(last {last:.4f}, {len(ppo)} evals)")
        pub["ppo_shape_rope_eval_first"] = round(first, 4)
        pub["ppo_shape_rope_eval_best"] = round(best, 4)

    if args.update_baseline and pub:
        bpath = os.path.join(HERE, "BASELINE.json")
        b = json.load(open(bpath))
        b.setdefault("published", {}).update(pub)
        with open(bpath, "w") as f:
            json.dump(b, f, indent=1)
        print(f"\nBASELINE.json updated with {len(pub)} entries")


if __name__ == "__main__":
    main()

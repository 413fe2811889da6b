"""Assemble round-5 records from runs/r5 (+ prior-round references):

1. fold_cloth3 symmetric parity at 4 reference seeds (r3 s0 + r4 s1/s2 +
   r5 s3) vs our fresh 2000-it seed arms with the pre-squash penalty
   off/on (verdict item 6) — median4/best4 per arm.
2. Big-grid rows (item 1): pour_soup/shape_elasto clean steady-state
   benches vs the r3 XLA baselines + on-chip true-res parity rows.
3. B=16 bisect table (item 2).
4. PPO entropy-floor record + identify result (item 9).

Usage: python scripts/r5_report.py [--update-baseline]
"""

import argparse
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R5 = os.path.join(HERE, "runs", "r5")
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

    # ---- 1. fold_cloth3 symmetric parity ----
    ref_costs, ref_rewards = [], []
    for path in (
        os.path.join(R3, "reference_fold_cloth3.jsonl"),
        os.path.join(R4, "reference_fold_cloth3_s1.jsonl"),
        os.path.join(R4, "reference_fold_cloth3_s2.jsonl"),
        os.path.join(R5, "reference_fold_cloth3_s3.jsonl"),
    ):
        rows = read_jsonl(path)
        if rows:
            ref_costs.append(min(r["final_chamfer"] for r in rows))
            ref_rewards.append(max(r["test_reward"] for r in rows))
    print("## fold_cloth3 symmetric parity (reference: 4 seeds x 300 shim its)")
    print(f"reference per-seed best final cost: {[round(c, 5) for c in ref_costs]}")
    m_ref = median(ref_costs)
    if m_ref is not None:
        print(f"reference median{len(ref_costs)}: {m_ref:.5f} "
              f"best: {min(ref_costs):.5f}")
        pub["final_cost_fold_cloth3_ref_median4"] = round(m_ref, 5)
        pub["final_cost_fold_cloth3_ref_best4"] = round(min(ref_costs), 5)

    for tag in ("off", "on"):
        ours = read_jsonl(
            os.path.join(R5, f"ours_fold_cloth3_costs_pen{tag}.jsonl")
        )
        if not ours:
            print(f"(pen{tag} arm: no rows yet)")
            continue
        costs = [min(r["final_cost_det"], r["final_cost_sampled"]) for r in ours]
        rewards = [max(r["test_reward_det"], r["test_reward_sampled"]) for r in ours]
        m = median(costs)
        print(f"ours pen={tag}: per-seed best cost {[round(c, 5) for c in costs]}")
        print(f"  median{len(costs)}: {m:.5f} best: {min(costs):.5f} "
              f"best reward: {max(rewards):.4f}"
              + (f"  (vs ref median ratio {m / m_ref:.3f})" if m_ref else ""))
        pub[f"final_cost_fold_cloth3_ours_median4_pen_{tag}"] = round(m, 5)
        pub[f"final_cost_fold_cloth3_ours_best4_pen_{tag}"] = round(min(costs), 5)
        pub[f"test_reward_best4_fold_cloth3_ours_pen_{tag}"] = round(max(rewards), 4)

    # ---- 2. big-grid rows ----
    print("\n## big-grid rows (steady-state, double-warmup)")
    for name, jf, r3sps in (
        ("pour_soup", "bench_pour_soup_v2.json", 0.41),
        ("shape_elasto_plastic", "bench_shape_elasto_v3.json", None),
        ("shape_elasto_plastic(v2)", "bench_shape_elasto_v2.json", None),
    ):
        rows = read_jsonl(os.path.join(R5, jf))
        if rows:
            row = rows[0]
            base = f" ({row['value'] / r3sps:.1f}x the r3 XLA path)" if r3sps \
                else " (r3 XLA: device fault)"
            print(f"{name}: {row['value']} sps @ {row['num_envs']} envs{base}")
            key = name.replace("(v2)", "_v2")
            pub[f"sps_{key}_r5"] = row["value"]
    for row in read_jsonl(os.path.join(R5, "onchip_parity.jsonl")):
        print(f"on-chip true-res parity {row['env']}: x reldiff "
              f"{row['reldiff_x']:.2e} grad cosine {row['grad_cosine']:.7f}")
        pub[f"onchip_grad_cosine_{row['env']}"] = round(row["grad_cosine"], 7)

    # ---- 3. B=16 bisect ----
    rows = read_jsonl(os.path.join(R5, "b16_bisect.jsonl"))
    if rows:
        print("\n## shape_elasto B-boundary bisect")
        for r in rows:
            print(json.dumps(r))

    # ---- 4. PPO + identify ----
    # v3 (structural min_std floor) is the final record; fall back to the
    # hinge-only arm if v3 is absent.
    ppo = read_jsonl(os.path.join(R5, "ppo_shape_rope_v3", "metrics.jsonl")) \
        or read_jsonl(os.path.join(R5, "ppo_shape_rope", "metrics.jsonl"))
    if ppo:
        evals = [(r["it"], r.get("eval_reward")) for r in ppo
                 if r.get("eval_reward") is not None]
        ents = [r.get("entropy") for r in ppo if r.get("entropy") is not None]
        if evals:
            best = max(evals, key=lambda t: t[1])
            ent_s = f"; min entropy {min(ents):.2f}" if ents else ""
            print(f"\n## PPO shape_rope (entropy floor): best eval "
                  f"{best[1]:.3f} @ it {best[0]}; final eval {evals[-1][1]:.3f}"
                  f" @ it {evals[-1][0]}{ent_s}")
            pub["ppo_shape_rope_best_eval_r5"] = round(best[1], 3)
            pub["ppo_shape_rope_final_eval_r5"] = round(evals[-1][1], 3)
            if ents:
                pub["ppo_shape_rope_min_entropy_r5"] = round(min(ents), 2)
    res = os.path.join(R5, "identify", "result.json")
    if os.path.exists(res):
        r = json.load(open(res))
        print(f"\n## identify: {json.dumps(r)}")
        for k in ("mae_test", "mae_train", "resim_chamfer"):
            if k in r:
                pub[f"identify_{k}_r5"] = r[k]

    if args.update_baseline and pub:
        bpath = os.path.join(HERE, "BASELINE.json")
        data = json.load(open(bpath))
        data.setdefault("published", {}).update(pub)
        with open(bpath, "w") as f:
            json.dump(data, f, indent=2)
        print(f"\nBASELINE.json published updated with {len(pub)} keys")


if __name__ == "__main__":
    main()

#!/usr/bin/env bash
# Round-3 fold_cloth3 diagnosis sweep (VERDICT "Next round" #2): the r3
# baseline run (runs/r3/fold_cloth3_1024) improved eval 1.24 -> 1.93 by it 20
# then saturated (actions pinned at sigmoid(+-1), grad_norm exploding).
# Probe the mitigations one at a time, 200 iters each, same seed/envs.
set -e
cd "$(dirname "$0")/.."
COMMON="--env fold_cloth3 --ep_len 3 --num_envs 1024 --max_grad_norm 0.3 --seed 0 --eval_freq 20 --max_it 200"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  python -m unidom_tpu.algorithms.apg $COMMON --logdir "runs/r3/sweep_$name" "$@" \
    > "runs/r3/sweep_$name.log" 2>&1
  grep test_reward "runs/r3/sweep_$name.log" | tail -3
}

run lr3e-5 --lr 3e-5
run lrdecay --lr 1e-4 --lr_decay
run normobs --lr 1e-4 --normalize_obs
run noaux --lr 1e-4 --no_aux_reward
echo "sweep done"

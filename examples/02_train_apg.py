"""Train an APG policy on fold_cloth1, data-parallel over all local devices.

Equivalent CLI: unidom train --env fold_cloth1 --ep_len 3 --num_envs 8 ...
"""

from unidom_tpu.algorithms.apg import train

training_state, history = train(
    env_name="fold_cloth1",
    episode_length=3,
    num_envs=8,
    learning_rate=1e-4,
    max_it=20,
    max_gradient_norm=0.3,
    eval_freq=10,
    num_eval_envs=4,
    seed=0,
)
print("final train reward:", history[-1]["train_reward"])

"""Uniform replay buffer (host-side numpy ring, device-side jitted updates)
shared by the off-policy baselines (SAC/TD3)."""

import numpy as np


class ReplayBuffer:
    def __init__(self, capacity, obs_size, action_size):
        self.capacity = capacity
        self.obs = np.zeros((capacity, obs_size), np.float32)
        self.actions = np.zeros((capacity, action_size), np.float32)
        self.rewards = np.zeros((capacity,), np.float32)
        self.next_obs = np.zeros((capacity, obs_size), np.float32)
        self.dones = np.zeros((capacity,), np.float32)
        self.ptr = 0
        self.size = 0

    def add_batch(self, obs, actions, rewards, next_obs, dones):
        n = len(obs)
        idx = (self.ptr + np.arange(n)) % self.capacity
        self.obs[idx] = obs
        self.actions[idx] = actions
        self.rewards[idx] = rewards
        self.next_obs[idx] = next_obs
        self.dones[idx] = dones
        self.ptr = (self.ptr + n) % self.capacity
        self.size = min(self.size + n, self.capacity)

    def sample(self, batch_size, rng):
        idx = rng.randint(0, self.size, batch_size)
        return (self.obs[idx], self.actions[idx], self.rewards[idx],
                self.next_obs[idx], self.dones[idx])

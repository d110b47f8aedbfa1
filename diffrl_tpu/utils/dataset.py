"""Minibatch dataset over flattened rollout buffers
(reference: /root/reference/utils/dataset.py:11-36).

SHAC's jitted critic update does its minibatching inside the compiled scan
(algorithms/shac.py), so this host-side iterator exists for API parity and
for host-driven experimentation/tooling.
"""

from __future__ import annotations

import numpy as np


class CriticDataset:
    def __init__(self, batch_size, obs, target_values, shuffle=False,
                 drop_last=False):
        self.obs = np.asarray(obs).reshape(-1, np.asarray(obs).shape[-1])
        self.target_values = np.asarray(target_values).reshape(-1)
        self.batch_size = batch_size

        if shuffle:
            self.shuffle()

        if drop_last:
            self.length = self.obs.shape[0] // self.batch_size
        else:
            self.length = (self.obs.shape[0] + self.batch_size - 1) // self.batch_size

    def shuffle(self):
        index = np.random.permutation(self.obs.shape[0])
        self.obs = self.obs[index]
        self.target_values = self.target_values[index]

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        start_idx = index * self.batch_size
        end_idx = min((index + 1) * self.batch_size, self.obs.shape[0])
        return {
            "obs": self.obs[start_idx:end_idx],
            "target_values": self.target_values[start_idx:end_idx],
        }

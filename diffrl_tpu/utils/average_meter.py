"""Windowed running mean of episode statistics
(reference: /root/reference/utils/average_meter.py)."""

from __future__ import annotations

import numpy as np


class AverageMeter:
    def __init__(self, in_shape=1, max_size=100):
        self.max_size = max_size
        self.current_size = 0
        self.mean = np.zeros(in_shape, dtype=np.float64)

    def update(self, values):
        values = np.asarray(values, dtype=np.float64).reshape(-1)
        size = values.shape[0]
        if size == 0:
            return
        new_mean = float(np.mean(values))
        size = int(np.clip(size, 0, self.max_size))
        old_size = min(self.max_size - size, self.current_size)
        size_sum = old_size + size
        self.current_size = size_sum
        self.mean = (self.mean * old_size + new_mean * size) / size_sum

    def clear(self):
        self.current_size = 0
        self.mean.fill(0)

    def __len__(self):
        return self.current_size

    def get_mean(self):
        return float(np.squeeze(self.mean))

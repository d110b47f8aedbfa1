"""Misc helpers: seeding, colored prints, timestamps
(reference: /root/reference/utils/common.py)."""

from __future__ import annotations

import datetime
import os
import random

import numpy as np


def seeding(seed=0):
    """Seed host-side RNGs; device RNG is explicit jax.random keys."""
    print(f"Setting seed: {seed}")
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def get_time_stamp():
    now = datetime.datetime.now()
    return "{:02d}-{:02d}-{:02d}-{:02d}-{:02d}-{:02d}".format(
        now.year % 100, now.month, now.day, now.hour, now.minute, now.second
    )


class _Color:
    GREEN = "\033[92m"
    RED = "\033[91m"
    YELLOW = "\033[93m"
    CYAN = "\033[96m"
    END = "\033[0m"


def print_info(*message):
    print(_Color.GREEN, *message, _Color.END)


def print_ok(*message):
    print(_Color.GREEN, *message, _Color.END)


def print_warning(*message):
    print(_Color.YELLOW, *message, _Color.END)


def print_error(*message):
    print(_Color.RED, *message, _Color.END)


def parse_diff_env_kwargs(cfg_env: dict) -> dict:
    """Extract env ctor kwargs from a cfg['params']['diff_env'] block."""
    kwargs = {}
    for key, value in cfg_env.items():
        if key in ("name",):
            continue
        kwargs[key] = value
    return kwargs

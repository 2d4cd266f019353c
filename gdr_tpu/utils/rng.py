"""Seeding (ref main_utils.py:12-18 seeds python/numpy/torch/cuda; here
python/numpy/jax — device-side randomness is all threaded PRNG keys)."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)

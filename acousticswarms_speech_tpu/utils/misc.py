"""Seeding, JSON helpers and device-accurate timing.

Counterpart of /root/reference/sep/helpers/utils.py:20-77 without torch:
JAX programs take explicit PRNG keys, so `seed_all` only seeds the host-side
numpy/python RNGs used by datasets and search heuristics.
"""
from __future__ import annotations

import json
import os
import random
import time
from typing import List

import numpy as np


def seed_all(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def read_json(path: str):
    assert os.path.exists(path), f"File not found: {path}"
    with open(path, "rb") as f:
        return json.load(f)


def write_json(obj, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=4)


def read_metadata(dir_path: str) -> dict:
    metadata = read_json(os.path.join(dir_path, "metadata.json"))
    assert metadata, "Empty scene metadata"
    return metadata


def list_top_level_directories(path: str) -> List[str]:
    return sorted(a for a in os.listdir(path) if os.path.isdir(os.path.join(path, a)))


class Timer:
    """Wall-clock timer that blocks on outstanding device work, giving
    device-accurate timings (the reference used CUDA events, utils.py:38-64)."""

    def __init__(self, sync=None) -> None:
        # `sync` is an optional callable; defaults to jax.block_until_ready on
        # a sentinel, imported lazily so host-only code avoids jax import cost.
        self._sync = sync
        self.t1 = 0.0

    def _barrier(self):
        if self._sync is not None:
            self._sync()
        else:
            try:
                import jax

                jax.effects_barrier()
            except Exception:
                pass

    def start_recording(self) -> None:
        self._barrier()
        self.t1 = time.perf_counter()

    def stop_recording(self) -> float:
        self._barrier()
        return time.perf_counter() - self.t1

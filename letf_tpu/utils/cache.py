"""Pickle-backed artifact cache (reference letf/utils.py:8-23).

Calibrated model pytrees are cached to disk keyed by analysis date range;
see also letf_tpu.checkpoint for orbax-style array checkpoints.
"""

from __future__ import annotations

import pickle
from pathlib import Path


def save_cache(data, filepath: Path) -> None:
    try:
        with open(filepath, "wb") as f:
            pickle.dump(data, f)
    except Exception as e:  # noqa: BLE001 - cache failures are non-fatal
        print(f"Cache save failed: {e}")


def load_cache(filepath: Path):
    if not Path(filepath).exists():
        return None
    try:
        with open(filepath, "rb") as f:
            return pickle.load(f)
    except Exception as e:  # noqa: BLE001
        print(f"Cache load failed: {e}")
        return None

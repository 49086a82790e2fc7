"""Nearest-PSD projection for correlation matrices.

Calibration-time only (host or device); eigen-clip + diagonal renormalize,
matching reference semantics (letf/utils.py:42-53).
"""

from __future__ import annotations

import numpy as np


def nearest_psd_matrix(corr_matrix: np.ndarray) -> np.ndarray:
    """Eigen-clip to 1e-8 and renormalize to unit diagonal."""
    w, v = np.linalg.eigh(np.asarray(corr_matrix, dtype=np.float64))
    w = np.maximum(w, 1e-8)
    m = (v * w) @ v.T
    d = np.sqrt(np.diag(m))
    return m / np.outer(d, d)

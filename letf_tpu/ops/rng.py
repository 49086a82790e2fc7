"""Counter-based RNG stream discipline.

The reference uses a zoo of seeds (sim_id+50000 for paths, sim_id+99999 for
start conditions, a per-(sim, asset) hash for tracking error — engine.py:436,
random_start.py:157, engine.py:352-357). Here every trial derives one threefry
key by folding the trial id into the run key, and every consumer folds in a
static stream id below. Antithetic pairs share the same trial id (and hence
every stream) and negate the joint normal innovations only — reproducing the
reference's pairing semantics (mc_runner.py:145-153, calibration.py:563-564).
"""

from __future__ import annotations

import jax

# Stream ids (stable across versions; new consumers append).
START = 0          # random start conditions
REGIME = 1         # semi-Markov dwell / next-regime draws
JOINT_EPS = 2      # standard normals for the multivariate-t core
JOINT_CHI = 3      # chi-square mixing draws
VIX_NOISE = 4      # VIX AR(1) innovations
IRX_NOISE = 5      # short-rate noise
STRESS_NORM = 6    # liquidity/credit AR(1) innovations
STRESS_JUMP = 7    # jump uniforms + t-magnitudes + signs
TRACKING = 8       # tracking-error t innovations
BOOTSTRAP = 9      # block bootstrap block/offset/noise draws
LHS = 10           # Latin hypercube stratification


def trial_key(run_key: jax.Array, trial_id) -> jax.Array:
    return jax.random.fold_in(run_key, trial_id)


def stream(tk: jax.Array, stream_id: int) -> jax.Array:
    return jax.random.fold_in(tk, stream_id)

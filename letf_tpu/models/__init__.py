"""Stochastic process models (device-side, scan-formulated).

- params.py       : pytree parameter containers + reference-default builders
- regime_path.py  : semi-Markov regime path (in-scan dwell sampling)
- joint.py        : regime-conditional multivariate-t with GARCH/DCC-lite
                    dynamics fused with the VIX AR(1)+jump recursion
- stress.py       : latent liquidity/credit AR(1) channels + crisis jumps
- tracking.py     : per-asset AR(1) tracking error with EMA de-bias
- random_start.py : randomized start conditions (regime draw / buffer offset)
"""

from letf_tpu.models.params import (
    SimModel,
    build_sim_model,
    default_sim_model,
)

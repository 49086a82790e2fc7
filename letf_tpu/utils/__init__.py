"""Shared utilities: caching, PSD projection, regime inference, borrow cost."""

from letf_tpu.utils.cache import load_cache, save_cache
from letf_tpu.utils.psd import nearest_psd_matrix
from letf_tpu.utils.regime import (
    compute_high_vol_probability,
    infer_regime_from_vix,
)
from letf_tpu.utils.finance import (
    calculate_daily_borrow_cost,
    get_borrow_cost_series,
    get_max_underwater_days,
    fill_missing_with_dynamic_factor,
)
